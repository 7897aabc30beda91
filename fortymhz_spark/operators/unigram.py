"""Unigram-LM tokenizer induction (SentencePiece-style, Kudo 2018,
arXiv:1804.10959 — public method): the OTHER production tokenizer
family beside BPE.  Where BPE grows a vocabulary bottom-up by merging
frequent pairs, unigram starts from a LARGE seed vocabulary of
frequent substrings and prunes it down under a unigram language
model: EM re-estimates piece probabilities from the corpus
segmentations, then low-contribution pieces are dropped until the
target size, and encoding is Viterbi (the most probable segmentation
of each word).

Faithfulness notes (documented simplifications, semantics pinned by
tests):

- **Hard EM** (Viterbi counts) is the default E-step — the standard
  "lightweight unigram" variant; ``em="soft"`` switches to the full
  forward–backward EXPECTED piece counts over every segmentation of
  each word (SentencePiece's actual E-step), which differs exactly
  where segmentations are ambiguous: hard EM gives the single best
  segmentation all the mass, soft EM splits it across the lattice in
  proportion to posterior probability (divergence pinned by
  tests/test_unigram.py).
- **Pruning by contribution** (a piece's expected count mass) instead
  of the exact leave-one-out likelihood loss; single characters are
  NEVER pruned, so every word stays encodable (full coverage — the
  SentencePiece ``character_coverage=1.0`` behavior for a known
  alphabet).

Scale shape — the :func:`operators/bpe.py::learn_bpe_merges_local`
recipe: ONE distributed corpus pass builds the bounded ``(word, n)``
frequency table, a single ``TakeOrdered(top_v)`` brings it to the
driver, and the whole EM/prune loop runs LOCALLY over that table —
zero Spark jobs per round, driver cost ∝ vocabulary, not corpus.
Encoding ships the final ``{piece: logprob}`` model in the task
closure and segments via an Arrow-batched pandas UDF (one Python
boundary, map-only, no shuffle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fortymhz_spark.operators.bpe import word_counts

__all__ = [
    "collect_word_vocab",
    "learn_unigram_vocab",
    "viterbi_segment",
    "encode_unigram",
    "vocab_from_model",
    "encode_token_ids_unigram",
]


def collect_word_vocab(
    docs: DataFrame, text_col: str = "text", top_v: int | None = 65536
) -> list[tuple[str, int]]:
    """The trainer's one distributed pass, exposed: ``(word, count)``
    for the ``top_v`` most frequent words (ties lexicographic),
    collected to the driver.  Callers training SEVERAL models over the
    same corpus (e.g. the soft-vs-hard divergence grade) collect once
    and pass the table to each :func:`learn_unigram_vocab` via
    ``vocab_table=`` instead of paying the corpus pass per model."""
    wc = word_counts(docs, text_col)
    if top_v is not None:
        wc = wc.orderBy(F.desc("n"), F.asc("w")).limit(top_v)
    return [(r["w"], int(r["n"])) for r in wc.collect()]


def _seed_vocab(
    vocab: list[tuple[str, int]], *, max_piece_len: int, seed_size: int
) -> dict[str, float]:
    """Candidate pieces: every substring (length ≤ max_piece_len) of
    every word, weighted by word frequency; keep the ``seed_size``
    highest-mass multi-char pieces plus ALL single characters."""
    counts: dict[str, int] = {}
    for w, n in vocab:
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                piece = w[i:j]
                counts[piece] = counts.get(piece, 0) + n
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )[: max(seed_size - len(chars), 0)]
    kept = chars | set(multi)
    total = sum(counts[p] for p in kept)
    return {p: counts[p] / total for p in kept}


def viterbi_segment(
    word: str, logp: dict[str, float], *, max_piece_len: int = 16
) -> list[str]:
    """Most-probable segmentation of ``word`` under piece log-probs —
    textbook Viterbi over cut positions.  Ties break toward FEWER
    pieces, then lexicographically-earliest piece at each step
    (deterministic across runs and engines); unknown single chars get
    a floor log-prob so any word segments (full coverage)."""
    n = len(word)
    floor = min(logp.values(), default=-1e9) - 10.0
    # best[i] = (score, n_pieces, backpointer start, piece)
    best: list[tuple[float, int, int, str] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, 0, "")
    for end in range(1, n + 1):
        cand = None
        for start in range(max(0, end - max_piece_len), end):
            prev = best[start]
            if prev is None:
                continue
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) > 1:
                    continue
                lp = floor
            score = prev[0] + lp
            n_pieces = prev[1] + 1
            better = cand is None or (score, -n_pieces) > (
                cand[0],
                -cand[1],
            )
            tie_earlier = (
                cand is not None
                and (score, -n_pieces) == (cand[0], -cand[1])
                and piece < cand[3]
            )
            if better or tie_earlier:
                cand = (score, n_pieces, start, piece)
        best[end] = cand
    pieces: list[str] = []
    pos = n
    while pos > 0:
        entry = best[pos]
        assert entry is not None  # floor guarantees reachability
        pieces.append(entry[3])
        pos = entry[2]
    return list(reversed(pieces))


def _accumulate_expected_counts(
    word: str,
    logp: dict[str, float],
    weight: float,
    counts: dict[str, float],
    *,
    max_piece_len: int,
) -> None:
    """Soft-EM E-step for one word: forward–backward over the
    segmentation lattice (nodes = cut positions, edges = vocabulary
    pieces), accumulating ``weight × P(edge | word)`` into ``counts``
    for every piece occurrence — the posterior expected counts
    SentencePiece's EM uses (Kudo 2018 §3.2).  Log-domain with
    log-sum-exp, so short-word lattices are numerically exact;
    unknown single characters ride the same floor log-prob as
    :func:`viterbi_segment` (full coverage, consistent semantics
    between training and encoding)."""
    n = len(word)
    if n == 0:
        return
    floor = min(logp.values(), default=-1e9) - 10.0
    neg_inf = float("-inf")

    def _lse(vals: list[float]) -> float:
        if not vals:
            return neg_inf
        m = max(vals)
        if m == neg_inf:
            return neg_inf
        return m + math.log(sum(math.exp(v - m) for v in vals))

    def _piece_lp(piece: str) -> float | None:
        lp = logp.get(piece)
        if lp is None:
            return floor if len(piece) == 1 else None
        return lp

    alpha = [neg_inf] * (n + 1)
    alpha[0] = 0.0
    for end in range(1, n + 1):
        acc = []
        for start in range(max(0, end - max_piece_len), end):
            lp = _piece_lp(word[start:end])
            if lp is None or alpha[start] == neg_inf:
                continue
            acc.append(alpha[start] + lp)
        alpha[end] = _lse(acc)
    beta = [neg_inf] * (n + 1)
    beta[n] = 0.0
    for start in range(n - 1, -1, -1):
        acc = []
        for end in range(start + 1, min(start + max_piece_len, n) + 1):
            lp = _piece_lp(word[start:end])
            if lp is None or beta[end] == neg_inf:
                continue
            acc.append(lp + beta[end])
        beta[start] = _lse(acc)
    z = alpha[n]
    if z == neg_inf:  # unreachable given the single-char floor
        return
    for start in range(n):
        for end in range(start + 1, min(start + max_piece_len, n) + 1):
            piece = word[start:end]
            lp = _piece_lp(piece)
            if lp is None:
                continue
            gamma = alpha[start] + lp + beta[end] - z
            if gamma == neg_inf:
                continue
            counts[piece] = counts.get(piece, 0.0) + weight * math.exp(
                gamma
            )


def learn_unigram_vocab(
    docs: DataFrame,
    text_col: str = "text",
    *,
    vocab_size: int = 512,
    em_rounds: int = 2,
    max_piece_len: int = 8,
    seed_multiplier: int = 4,
    top_v: int | None = 65536,
    em: str = "hard",
    vocab_table: list[tuple[str, int]] | None = None,
) -> dict[str, float]:
    """Train the unigram model and return ``{piece: logprob}`` (driver
    memory ∝ vocab, NOT corpus).  One distributed word-count pass +
    bounded TakeOrdered, then seed → (EM → prune) rounds locally:
    each EM step re-estimates probabilities from weighted piece counts
    over every vocabulary word, and each prune step drops the
    lowest-mass multi-char pieces until ``vocab_size``.  Single
    characters are never pruned (coverage).

    ``em="hard"`` (default) counts each word's single Viterbi
    segmentation; ``em="soft"`` counts the forward–backward posterior
    expectation over ALL segmentations
    (:func:`_accumulate_expected_counts` — SentencePiece's E-step).
    The two agree wherever segmentation is unambiguous and diverge on
    ambiguous words, where soft EM keeps mass on competitive
    alternative pieces that hard EM starves (pinned differentially in
    tests/test_unigram.py).  Same cost shape: driver time ∝ vocabulary
    × word length × max_piece_len either way.

    ``vocab_table`` supplies a pre-collected ``(word, count)`` table
    (:func:`collect_word_vocab`) and skips the distributed pass —
    train several models over one corpus for one scan."""
    if vocab_size < 2:
        raise ValueError(f"vocab_size must be >= 2, got {vocab_size}")
    if em_rounds < 1:
        raise ValueError(f"em_rounds must be >= 1, got {em_rounds}")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    if em not in ("hard", "soft"):
        raise ValueError(f"em must be 'hard' or 'soft', got {em!r}")
    vocab = (
        list(vocab_table)
        if vocab_table is not None
        else collect_word_vocab(docs, text_col, top_v)
    )
    if not vocab:
        raise ValueError("learn_unigram_vocab: empty corpus")

    probs = _seed_vocab(
        vocab,
        max_piece_len=max_piece_len,
        seed_size=vocab_size * seed_multiplier,
    )
    for _ in range(em_rounds):
        logp = {p: math.log(q) for p, q in probs.items()}
        # E-step: piece counts weighted by word frequency — hard takes
        # each word's single Viterbi path, soft the forward-backward
        # posterior expectation over the whole segmentation lattice
        counts: dict[str, float] = {}
        if em == "soft":
            for w, n in vocab:
                _accumulate_expected_counts(
                    w, logp, float(n), counts,
                    max_piece_len=max_piece_len,
                )
        else:
            for w, n in vocab:
                for piece in viterbi_segment(
                    w, logp, max_piece_len=max_piece_len
                ):
                    counts[piece] = counts.get(piece, 0.0) + n
        # never lose alphabet coverage, even for pieces EM zeroed
        for p in probs:
            if len(p) == 1 and p not in counts:
                counts[p] = 1e-6
        # prune: lowest-mass multi-char pieces out, down to vocab_size
        multi = sorted(
            (p for p in counts if len(p) > 1),
            key=lambda p: (counts[p], p),
        )
        n_chars = sum(1 for p in counts if len(p) == 1)
        excess = len(counts) - max(vocab_size, n_chars)
        for p in multi[: max(excess, 0)]:
            del counts[p]
        total = sum(counts.values())
        probs = {p: c / total for p, c in counts.items()}
    return {p: math.log(q) for p, q in probs.items()}


_UNIGRAM_NOTE = "unigram_model "


def save_unigram_model(
    spark, model: dict[str, float], table_dir: str
) -> int:
    """Publish a trained ``{piece: logprob}`` model as a versioned
    snapshot artifact (the SentencePiece ``.model`` role with atomic
    publish + time travel) — one row per piece; the note pins the
    piece count so a truncated artifact fails the load, and logprobs
    round-trip EXACTLY (double column, no stringification)."""
    import json as _json

    from fortymhz_spark.sources.snapshots import write_snapshot

    rows = sorted((p, float(lp)) for p, lp in model.items())
    df = spark.createDataFrame(rows, "piece string, logp double")
    return write_snapshot(
        df, table_dir,
        note=_UNIGRAM_NOTE + _json.dumps({"n_pieces": len(rows)}),
    )


def load_unigram_model(
    spark, table_dir: str, *, version: int | None = None
) -> dict[str, float]:
    """Load a persisted unigram model (current or pinned version) —
    bounded collect ∝ vocabulary, inventory validated against the
    note."""
    from fortymhz_spark.sources.snapshots import (
        read_snapshot,
        resolve_artifact,
    )

    version, params = resolve_artifact(
        table_dir, _UNIGRAM_NOTE, version=version
    )
    want = int(params["n_pieces"])
    rows = read_snapshot(spark, table_dir, version=version).collect()
    model = {r["piece"]: float(r["logp"]) for r in rows}
    if len(model) != want:
        raise ValueError(
            f"unigram_model v={version} at {table_dir} is incomplete: "
            f"{len(model)}/{want} pieces"
        )
    return model


def encode_unigram(
    df: DataFrame,
    word_col: str = "w",
    *,
    model: dict[str, float],
    max_piece_len: int = 8,
    out_col: str = "pieces",
) -> DataFrame:
    """Viterbi-encode a word column under a trained unigram model —
    map-only, the model rides the task closure (a 32k-piece model is
    ~1 MB), one Arrow batch boundary (``ArrowEvalPython``, never
    ``BatchEvalPython``)."""
    logp = dict(model)

    @F.pandas_udf("array<string>")
    def _encode(words):  # pandas Series[str] -> Series[list[str]]
        # NULL word -> empty segmentation (the encode_token_ids_unigram
        # totality contract), not a TypeError inside the batch
        return words.map(
            lambda w: viterbi_segment(
                w or "", logp, max_piece_len=max_piece_len
            )
        )

    return df.withColumn(out_col, _encode(F.col(word_col)))


def vocab_from_model(model: dict[str, float]) -> dict[str, int]:
    """piece → id table from a trained model: ``<unk>`` first, then
    pieces by DESCENDING probability (frequent pieces get small ids —
    the convention token-id distributions and embedding tables
    assume), ties lexicographic.  Deterministic for a given model."""
    vocab = {"<unk>": 0}
    for p in sorted(model, key=lambda p: (-model[p], p)):
        vocab[p] = len(vocab)
    return vocab


def encode_token_ids_unigram(
    df: DataFrame,
    text_col: str = "text",
    *,
    model: dict[str, float],
    vocab: dict[str, int] | None = None,
    max_piece_len: int = 8,
    out_col: str = "token_ids",
    count_col: str | None = "n_tok",
) -> DataFrame:
    """Document text → ``array<int>`` token ids under the unigram
    model — the column a training-data EXPORT writes, mirroring
    ``operators/bpe.py::encode_token_ids`` so either tokenizer family
    plugs into the same downstream (``packing.py::pack_sequences``
    budgets on ``count_col``).  Words split on the repo-wide
    single-space convention; Viterbi segments each word; pieces the
    vocab lacks (possible when a caller passes a TRIMMED vocab) map
    to ``<unk>``.

    Map-only: model + vocab ride the task closure; one Arrow batch
    boundary, no shuffle."""
    if vocab is None:
        vocab = vocab_from_model(model)
    unk = vocab.get("<unk>")
    if unk is None:
        raise ValueError("vocab must contain '<unk>' for OOV pieces")
    logp = dict(model)

    def encode_one(text: str | None) -> list[int]:
        ids: list[int] = []
        for word in (text or "").lower().split(" "):
            if not word:
                continue
            ids.extend(
                vocab.get(p, unk)
                for p in viterbi_segment(
                    word, logp, max_piece_len=max_piece_len
                )
            )
        return ids

    @F.pandas_udf("array<int>")
    def _encode(texts):
        return texts.map(encode_one)

    out = df.withColumn(out_col, _encode(F.col(text_col)))
    if count_col is not None:
        out = out.withColumn(count_col, F.size(out_col))
    return out
