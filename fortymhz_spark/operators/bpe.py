"""BPE tokenizer induction at corpus scale.

Learns byte-pair-encoding merges (Sennrich et al., ACL 2016 — the
`get_stats` / `merge_vocab` loop) as a Spark driver loop over a
DISTRIBUTED word-count table:

- ONE corpus pass builds ``(word, n)`` — at 100 TB this is the only
  step that touches the text; the vocabulary table it produces is
  orders of magnitude smaller and stays distributed.
- each merge round is one pair-count aggregate over the vocab plus a
  ``TakeOrdered(1)`` — a SINGLE ROW crosses to the driver per round.
- the merge is applied as a pure column fold (left-to-right,
  non-overlapping — exactly the reference algorithm's `merge_vocab`)
  and the vocab is ``localCheckpoint``-ed so the plan stays flat
  across rounds (the near_dup_components lineage discipline).

Determinism: ties in the top-pair selection break by (count DESC,
left ASC, right ASC) — a total order, so the same corpus always
yields the same merge table (pinned against a pure-Python reference
in tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n): lowercase whitespace-token frequencies — the one
    full-corpus pass; everything after operates on this table."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda x: x != "",
    )
    return (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word_col):
    """Character symbols plus the end-of-word marker (the reference
    algorithm's representation: 'low' → [l, o, w, </w>])."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: word_col.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _adjacent_pairs(sym_col):
    """array<struct<l,r>> of every adjacent symbol pair (duplicates
    kept — `get_stats` counts every occurrence)."""
    n = F.size(sym_col)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(sym_col, i.cast("int")).alias("l"),
                F.element_at(sym_col, (i + F.lit(1)).cast("int")).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _apply_merge(sym_col, left: str, right: str):
    """Replace every left-to-right NON-OVERLAPPING (left, right)
    adjacency with the merged symbol — `merge_vocab` as a column
    fold: append each symbol unless it completes the pair with the
    accumulator's last element, in which case the last element is
    rewritten to the merge."""
    merged = left + right

    def step(acc, x):
        last = F.element_at(acc, -1)
        return F.when(
            (F.size(acc) > 0)
            & (last == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(sym_col, F.array().cast("array<string>"), step)


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 8,
    min_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; returns
    ``[(left, right, pair_count), ...]`` in merge order.  Stops early
    when the best remaining pair's corpus count drops below
    ``min_count``.  Driver traffic: one (pair, count) row per round."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    vocab = (
        word_counts(docs, text_col)
        .select("n", _initial_symbols(F.col("w")).alias("sym"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    # NB each round's localCheckpoint leaves its block set alive until
    # the ContextCleaner reaps the unreferenced RDD — Dataset.unpersist
    # would NOT free it (it only talks to the cache manager), so no
    # cleanup call is made here; the vocab table is small relative to
    # the corpus by construction (the near_dup_components posture).
    for _ in range(n_merges):
        top = (
            vocab.select("n", F.explode(_adjacent_pairs(F.col("sym"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["c"]) < min_count:
            break
        left, right, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((left, right, c))
        vocab = vocab.select(
            "n", _apply_merge(F.col("sym"), left, right).alias("sym")
        ).localCheckpoint()
    return merges


def _merge_syms(
    syms: tuple[str, ...], left: str, right: str
) -> tuple[str, ...]:
    """Pure-Python `merge_vocab` for one word: replace every
    left-to-right NON-OVERLAPPING (left, right) adjacency — the same
    semantics as the :func:`_apply_merge` column fold (differentially
    pinned in tests/test_properties.py)."""
    merged = left + right
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _local_merge_loop(
    vocab: list[tuple[tuple[str, ...], int]],
    n_merges: int,
    min_count: int,
) -> list[tuple[str, str, int]]:
    """The Sennrich `get_stats` / `merge_vocab` loop over a DRIVER-SIDE
    (symbols, count) vocabulary.  Tie-break identical to the
    distributed path: (count DESC, left ASC, right ASC)."""
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for syms, n in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + n
        if not stats:
            break
        (left, right), c = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_count:
            break
        merges.append((left, right, c))
        vocab = [(_merge_syms(s, left, right), n) for s, n in vocab]
    return merges


def learn_bpe_merges_local(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 8,
    min_count: int = 2,
    top_v: int | None = 65536,
) -> list[tuple[str, str, int]]:
    """Learn BPE merges the way you would actually build a 32k–50k
    tokenizer at corpus scale: ONE distributed pass builds the
    ``(word, n)`` vocabulary, the ``top_v`` most frequent words come
    to the driver in a single bounded TakeOrdered (ties break by word
    so the collect is deterministic), and the Sennrich merge loop runs
    LOCALLY over that vocabulary — zero Spark jobs per merge round,
    vs :func:`learn_bpe_merges`'s one aggregate per round (correct,
    but job count ∝ n_merges: a 32k-merge build is 32k sequential
    jobs).  This is the standard recipe — HuggingFace tokenizers and
    SentencePiece likewise train on a bounded word-frequency table,
    not by re-scanning the corpus per merge.

    ``top_v=None`` collects the whole vocabulary (exact — use when the
    distinct-word table is known small); the default bounds driver
    memory at web scale, where tail words carry negligible pair mass.
    :func:`learn_bpe_merges` remains the distributed validation twin —
    with ``top_v=None`` the two produce IDENTICAL merge tables
    (pinned in tests/test_properties.py)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_v is not None and top_v < 1:
        raise ValueError(f"top_v must be >= 1 or None, got {top_v}")
    wc = word_counts(docs, text_col)
    if top_v is not None:
        wc = wc.orderBy(F.desc("n"), F.asc("w")).limit(top_v)
    rows = wc.collect()
    vocab = [
        (tuple(r["w"]) + (END_OF_WORD,), int(r["n"])) for r in rows
    ]
    return _local_merge_loop(vocab, n_merges, min_count)


_BPE_NOTE = "bpe_merges "


def save_bpe_merges(
    spark,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    table_dir: str,
) -> int:
    """Publish a learned merge table as a versioned snapshot artifact
    — the train-once/serve-many lifecycle for the tokenizer itself
    (the GPT-2 ``merges.txt`` role, with the snapshot table's atomic
    publish and time travel instead of a bare file): a retrained
    tokenizer lands as v=N+1 while running encode jobs keep the
    version they loaded, and an experiment can pin ``version=`` for
    exact reproducibility.  One row per merge, LEARNED ORDER pinned by
    an explicit rank column (never file order)."""
    import json as _json

    from fortymhz_spark.sources.snapshots import write_snapshot

    rows = [
        (i, m[0], m[1], int(m[2]) if len(m) > 2 else None)
        for i, m in enumerate(merges)
    ]
    df = spark.createDataFrame(
        rows, "rank int, left string, right string, pair_count long"
    )
    return write_snapshot(
        df, table_dir,
        note=_BPE_NOTE + _json.dumps({"n_merges": len(rows)}),
    )


def load_bpe_merges(
    spark, table_dir: str, *, version: int | None = None
) -> list[tuple[str, str, int]]:
    """Load a persisted merge table (current or pinned version) back
    into the driver-side list every encode path consumes — a bounded
    collect of n_merges rows, validated against the note's count so a
    truncated artifact fails here, not as silently-worse tokenization
    downstream."""
    from fortymhz_spark.sources.snapshots import (
        read_snapshot,
        resolve_artifact,
    )

    version, params = resolve_artifact(table_dir, _BPE_NOTE, version=version)
    want = int(params["n_merges"])
    rows = sorted(
        read_snapshot(spark, table_dir, version=version).collect(),
        key=lambda r: r["rank"],
    )
    if len(rows) != want or [r["rank"] for r in rows] != list(range(want)):
        raise ValueError(
            f"bpe_merges v={version} at {table_dir} is incomplete: "
            f"{len(rows)}/{want} rows"
        )
    return [
        (r["left"], r["right"], int(r["pair_count"] or 0)) for r in rows
    ]


def encode_words(
    df: DataFrame,
    word_col: str = "w",
    *,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    out_col: str = "symbols",
) -> DataFrame:
    """Tokenize with a LEARNED merge table: apply every merge, in
    learned order, to each word's character symbols — the encode side
    of :func:`learn_bpe_merges` (the reference algorithm applies
    merges by rank exactly like this).  Map-only: the merge table is
    a few hundred literals in the task binary; no shuffle, no UDF.

    Plan depth grows with ``len(merges)`` (one fold per merge) — fine
    for the tens of merges a test corpus learns; a production
    vocabulary (tens of thousands of merges) would move the merge
    loop into an Arrow ``mapInPandas`` kernel, the same
    expression-vs-kernel split as ``kmeans_assign``'s
    ``assign="arrow"``.
    """
    sym = _initial_symbols(F.col(word_col))
    for m in merges:
        left, right = m[0], m[1]
        sym = _apply_merge(sym, left, right)
    return df.withColumn(out_col, sym)


def vocab_from_merges(
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    *,
    base_chars: list[str] | None = None,
    specials: list[str] = ("<unk>", "<pad>"),
) -> dict[str, int]:
    """symbol → token-id table from a learned merge list — the
    artifact a trained tokenizer actually ships (GPT-2's vocab.json
    role).  Id assignment is deterministic and rank-structured:
    specials first, then the base alphabet (the merges' constituent
    characters plus ``END_OF_WORD``, or an explicit ``base_chars``
    list, sorted), then one id per merge in LEARNED ORDER — so, for a
    FIXED base alphabet (pass ``base_chars``; byte-level tokenizers
    fix it at 256 by construction), a longer-trained vocabulary is a
    strict prefix-extension of a shorter one — the property that lets
    checkpointed training resume against a grown tokenizer.  With the
    default inferred alphabet the ids are still deterministic, but
    inference sees only the merges' constituent chars, so different
    merge prefixes can infer different alphabets."""
    vocab: dict[str, int] = {}
    for s in specials:
        vocab[s] = len(vocab)
    if base_chars is None:
        chars: set[str] = set()
        for m in merges:
            for part in (m[0], m[1]):
                for ch in part:
                    chars.add(ch)
        base = sorted(chars) + [END_OF_WORD]
    else:
        base = list(base_chars)
        if END_OF_WORD not in base:
            base.append(END_OF_WORD)
    for ch in base:
        if ch not in vocab:
            vocab[ch] = len(vocab)
    for m in merges:
        merged = m[0] + m[1]
        if merged not in vocab:
            vocab[merged] = len(vocab)
    return vocab


def _bpe_encode_word(
    rank: dict[tuple[str, str], int], word: str
) -> list[str]:
    """Rank-priority BPE encode of ONE word — the single shared kernel
    behind :func:`encode_words_arrow` and :func:`encode_token_ids`
    (one copy so a future change to the tie/rescan rule cannot drift
    between them).  Repeatedly merges the LOWEST-RANK mergeable
    adjacency (all non-overlapping occurrences left-to-right, the
    merge_vocab contract), which for a learn-loop merge table is a
    fixpoint of rank-order application."""
    n_rank = len(rank)
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_i, best_r = -1, n_rank
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]), n_rank)
            if r < best_r:
                best_i, best_r = i, r
        if best_i < 0 or best_r >= n_rank:
            break
        left, right = syms[best_i], syms[best_i + 1]
        syms = list(_merge_syms(tuple(syms), left, right))
    return syms


def encode_token_ids(
    df: DataFrame,
    text_col: str = "text",
    *,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    vocab: dict[str, int] | None = None,
    out_col: str = "token_ids",
    count_col: str | None = "n_tok",
) -> DataFrame:
    """Document text → ``array<int>`` token ids: lowercase whitespace
    words → rank-priority BPE encode (:func:`encode_words_arrow`'s
    kernel) → vocabulary lookup (:func:`vocab_from_merges`; symbols a
    grown corpus produced that the vocab lacks map to ``<unk>``).
    This is the column a training-data EXPORT actually writes, and
    ``count_col`` (the id count) is exactly what
    ``operators/packing.py::pack_sequences`` budgets on — learn →
    encode → pack, end to end in-engine.

    Map-only: merge table + vocab ride the task closure (a 50k-entry
    vocab is ~1 MB); one Arrow batch boundary, no shuffle."""
    if vocab is None:
        vocab = vocab_from_merges(merges)
    unk = vocab.get("<unk>")
    if unk is None:
        raise ValueError("vocab must contain '<unk>' for OOV symbols")
    rank: dict[tuple[str, str], int] = {
        (m[0], m[1]): i for i, m in enumerate(merges)
    }

    def encode_one(text: str) -> list[int]:
        ids: list[int] = []
        # Split on a SINGLE SPACE, dropping empties — the exact
        # tokenization word_counts uses (F.split(lower, " ") + filter),
        # so the encoder sees the same words the merge table was
        # learned from; str.split() (any whitespace run) would treat
        # "foo\tbar" as two words the learner counted as one.
        for word in (text or "").lower().split(" "):
            if not word:
                continue
            ids.extend(
                vocab.get(s, unk) for s in _bpe_encode_word(rank, word)
            )
        return ids

    @F.pandas_udf("array<int>")
    def _encode(texts):
        return texts.map(encode_one)

    out = df.withColumn(out_col, _encode(F.col(text_col)))
    if count_col is not None:
        out = out.withColumn(count_col, F.size(out_col))
    return out


def encode_words_arrow(
    df: DataFrame,
    word_col: str = "w",
    *,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    out_col: str = "symbols",
) -> DataFrame:
    """:func:`encode_words` for PRODUCTION merge-table sizes: the
    expression form nests one fold per merge, so its plan depth grows
    with ``len(merges)`` and Catalyst planning stalls long before a
    32k-merge vocabulary.  This twin ships the merge table to the
    executors once (closure capture — a few hundred KB for 32k
    merges) and applies it inside an Arrow-batched pandas UDF with
    rank-priority encoding: repeatedly merge the LOWEST-RANK mergeable
    adjacency, which for a table produced by the learn loop yields the
    same result as applying merges in rank order (each is a fixpoint
    of the other's output) while doing one dict lookup per adjacency
    instead of one pass per merge.  Differentially pinned against the
    expression form in tests/test_properties.py.

    Map-only: no shuffle; the only Python boundary is this Arrow
    batch (``ArrowEvalPython`` in the plan, never ``BatchEvalPython``).
    """
    rank: dict[tuple[str, str], int] = {
        (m[0], m[1]): i for i, m in enumerate(merges)
    }

    def encode_one(word: str) -> list[str]:
        return _bpe_encode_word(rank, word)

    @F.pandas_udf("array<string>")
    def _encode(words):  # pandas Series[str] -> Series[list[str]]
        return words.map(encode_one)

    return df.withColumn(out_col, _encode(F.col(word_col)))
