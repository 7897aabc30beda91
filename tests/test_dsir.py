"""DSIR importance-resampling selection (operators/dsir.py).

Strategy: a pure-Python reference implementation of the WHOLE chain
(tokenize → grams → portable buckets → fits → bit-length weights →
scores → selection) pins every stage against the Spark operators on a
small fixture with known overlaps; partition hostility and plan-shape
assertions cover the scale contract (map-only scoring, no Python
boundary).  The Gumbel variant is float-bearing, so it gets a
pure-Python twin instead of an oracle (repo float discipline).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from fortymhz_spark.operators import dsir

DOCS = [
    # (doc_id, text, lang) — en docs share "spark table" vocabulary
    # with enough repetition that the per-bucket target/raw ratio
    # clears the floor-log2 quantization step (one OCTAVE — a tiny
    # fixture with single-occurrence grams quantizes every weight to
    # ~0 and the selection degenerates); others diverge; one empty
    # and one None text for the edge rows.
    (0, "spark table join scan spark table join scan spark table join", "en"),
    (1, "table spark join table spark join table spark join", "en"),
    (2, "der baum und wald der baum und wald der baum", "de"),
    (3, "le chat et chien le chat et chien le chat", "fr"),
    (4, "spark table join scan spark table join scan", "de"),
    (5, "", "en"),
    (6, None, "fr"),
    (7, "wald und baum der wald und baum der wald", "de"),
]
NB = 64


def _py_buckets(text: str | None, n_buckets: int) -> list[int]:
    toks = [t for t in (text or "").lower().split(" ") if t != ""]
    grams = list(toks)
    grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
        for g in grams
    ]


def _py_fit(target_texts, raw_texts, n_buckets):
    t_cnt: dict[int, int] = {}
    r_cnt: dict[int, int] = {}
    for txt in target_texts:
        for b in _py_buckets(txt, n_buckets):
            t_cnt[b] = t_cnt.get(b, 0) + 1
    for txt in raw_texts:
        for b in _py_buckets(txt, n_buckets):
            r_cnt[b] = r_cnt.get(b, 0) + 1
    t_tot = sum(t_cnt.values()) + n_buckets
    r_tot = sum(r_cnt.values()) + n_buckets
    return [
        ((t_cnt.get(b, 0) + 1) * r_tot).bit_length()
        - ((r_cnt.get(b, 0) + 1) * t_tot).bit_length()
        for b in range(n_buckets)
    ]


def _fixture(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_fit_weights_match_pure_python(spark):
    docs = _fixture(spark)
    target = docs.filter(F.col("lang") == "en")
    got = dsir.dsir_fit_weights(
        target, docs, text_col="text", n_buckets=NB
    )
    want = _py_fit(
        [t for _, t, lang in DOCS if lang == "en"],
        [t for _, t, _ in DOCS],
        NB,
    )
    assert got == want
    # the fused one-pass form (predicate target) must produce the
    # IDENTICAL weight table
    fused = dsir.dsir_fit_weights(
        F.col("lang") == "en", docs, text_col="text", n_buckets=NB
    )
    assert fused == want


def test_scores_match_pure_python_and_empty_docs_score_zero(spark):
    docs = _fixture(spark)
    weights = _py_fit(
        [t for _, t, lang in DOCS if lang == "en"],
        [t for _, t, _ in DOCS],
        NB,
    )
    rows = {
        r["doc_id"]: r["dsir_q"]
        for r in dsir.dsir_score(docs, weights, text_col="text").collect()
    }
    for doc_id, text, _ in DOCS:
        want = sum(weights[b] for b in _py_buckets(text, NB))
        assert rows[doc_id] == want, doc_id
    assert rows[5] == 0 and rows[6] == 0


def test_select_prefers_target_like_docs_and_is_partition_invariant(spark):
    docs = _fixture(spark)
    target = docs.filter(F.col("lang") == "en")
    sel = dsir.dsir_select(docs, target, 3, n_buckets=NB)
    ids = [r["doc_id"] for r in sel.collect()]
    # doc 4 shares the en vocabulary despite its 'de' label — DSIR
    # selects by CONTENT, so the top-3 must be drawn from the
    # spark/table docs, never the de/fr-vocabulary ones.
    assert set(ids) <= {0, 1, 4}
    hostile = dsir.dsir_select(
        docs.repartition(7), target.repartition(3), 3, n_buckets=NB
    )
    assert [r["doc_id"] for r in hostile.collect()] == ids


def test_score_plan_is_map_only_no_python_boundary(spark):
    docs = _fixture(spark)
    weights = [1] * NB
    scored = dsir.dsir_score(docs, weights, text_col="text")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_gumbel_topk_matches_pure_python_twin(spark):
    docs = _fixture(spark)
    weights = _py_fit(
        [t for _, t, lang in DOCS if lang == "en"],
        [t for _, t, _ in DOCS],
        NB,
    )
    scored = dsir.dsir_score(docs, weights, text_col="text")
    got = [
        r["doc_id"]
        for r in dsir.gumbel_topk_select(
            scored, 4, temperature=2.0, seed=7
        ).collect()
    ]

    def key(doc_id, score):
        h = int(
            hashlib.md5(f"7|{doc_id}".encode()).hexdigest()[:8], 16
        )
        u = (h + 1) / float((1 << 32) + 1)
        return score / 2.0 + -math.log(-math.log(u))

    scores = {
        doc_id: sum(weights[b] for b in _py_buckets(text, NB))
        for doc_id, text, _ in DOCS
    }
    want = sorted(
        scores, key=lambda d: (-key(d, scores[d]), d)
    )[:4]
    assert got == want


def test_gumbel_sampling_is_seed_sensitive_but_seed_stable(spark):
    docs = _fixture(spark)
    scored = dsir.dsir_score(docs, [0] * NB, text_col="text")
    a = [r["doc_id"] for r in dsir.gumbel_topk_select(scored, 4, seed=1).collect()]
    b = [r["doc_id"] for r in dsir.gumbel_topk_select(scored, 4, seed=1).collect()]
    c = [r["doc_id"] for r in dsir.gumbel_topk_select(scored, 4, seed=2).collect()]
    assert a == b
    # with flat scores the draw is pure noise — different seeds must
    # be able to pick different sets (8 choose 4; collision would be
    # a constant-noise bug, not chance)
    assert a != c


def test_validation_errors():
    with pytest.raises(ValueError, match="n_buckets"):
        dsir.hashed_gram_buckets("text", 1)
    with pytest.raises(ValueError, match="temperature"):
        dsir.gumbel_topk_select(None, 1, temperature=0.0)


# ---------------------------------------------------------------------------
# strip_crossdoc_blocks (operators/text.py) — the rewriting half of
# the cross-doc boilerplate story; colocated here with the other
# round-5 curation operators.
# ---------------------------------------------------------------------------


def _strip_fixture(spark):
    from fortymhz_spark.operators import text as tx

    block = " ".join(f"b{i}" for i in range(8))
    uniq = lambda p: " ".join(f"{p}{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (0, f"{block} {uniq('x')} tail1 tail2"),
            (1, f"{uniq('y')} {block}"),
            (2, "short doc only"),
            (3, None),
            (4, f"{block} {block}"),
        ],
        "doc_id long, text string",
    )
    return tx, docs, block


def test_strip_crossdoc_blocks_semantics(spark):
    tx, docs, _ = _strip_fixture(spark)
    out = {
        r["doc_id"]: (r["n_removed_blocks"], r["clean_text"])
        for r in tx.strip_crossdoc_blocks(docs).collect()
    }
    # shared block removed everywhere, unique blocks + tails kept
    assert out[0] == (1, "x0 x1 x2 x3 x4 x5 x6 x7 tail1 tail2")
    assert out[1] == (1, "y0 y1 y2 y3 y4 y5 y6 y7")
    # sub-block docs and NULL text pass through untouched (lowercased)
    assert out[2] == (0, "short doc only")
    assert out[3] == (0, "")
    # a cross-doc-banned block loses ALL its within-doc occurrences
    assert out[4] == (2, "")


def test_strip_crossdoc_blocks_within_doc_repetition_alone_survives(spark):
    tx, _, block = _strip_fixture(spark)
    docs = spark.createDataFrame(
        [(0, f"{block} {block}"), (1, "something else entirely here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_removed_blocks"]
        for r in tx.strip_crossdoc_blocks(docs).collect()
    }
    # the block repeats only INSIDE doc 0 — distinct-doc df is 1,
    # nothing is banned (within-doc repetition is the repetition
    # filter's job, not this operator's)
    assert out == {0: 0, 1: 0}


def test_strip_crossdoc_blocks_partition_invariant_and_validates(spark):
    import pytest as _pytest

    tx, docs, _ = _strip_fixture(spark)
    a = sorted(
        map(tuple, tx.strip_crossdoc_blocks(docs).collect())
    )
    b = sorted(
        map(tuple, tx.strip_crossdoc_blocks(docs.repartition(7)).collect())
    )
    assert a == b
    with _pytest.raises(ValueError, match="block_tokens"):
        tx.strip_crossdoc_blocks(docs, block_tokens=0)
    with _pytest.raises(ValueError, match="max_df"):
        tx.strip_crossdoc_blocks(docs, max_df=0)


# ---------------------------------------------------------------------------
# duplicated_spans / strip_duplicated_spans (operators/text.py) — the
# alignment-free form of the cross-doc story; the r6 verdict's gap was
# exactly that the 8-token-ALIGNED blocks above miss offset spans.
# ---------------------------------------------------------------------------


def test_duplicated_spans_finds_misaligned_span_blocks_miss(spark):
    from fortymhz_spark.operators import text as tx

    # a 10-token span at 0-based offset 3 in doc 1 and offset 5 in
    # doc 2 — no 8-aligned block boundary coincides in the two docs
    t1 = "a b c d e f g h i j k l m n o p q r"
    t2 = "z y x w v d e f g h i j k l m q2 r2 s2 t2 u2"
    docs = spark.createDataFrame(
        [(1, t1), (2, t2), (3, "unrelated words only here nothing shared at all")],
        "doc_id long, text string",
    )
    spans = {
        (r["doc_id"]): (r["span_start"], r["span_len"])
        for r in tx.duplicated_spans(docs, shingle_tokens=8).collect()
    }
    assert spans == {1: (3, 10), 2: (5, 10)}
    # the aligned block form sees nothing — the documented gap
    blk = {
        r["doc_id"]: r["n_removed_blocks"]
        for r in tx.strip_crossdoc_blocks(docs, block_tokens=8).collect()
    }
    assert blk == {1: 0, 2: 0, 3: 0}
    # removal strips exactly the span, keeps everything else
    out = {
        r["doc_id"]: (r["n_removed_tokens"], r["clean_text"])
        for r in tx.strip_duplicated_spans(docs, shingle_tokens=8).collect()
    }
    assert out[1] == (10, "a b c n o p q r")
    assert out[2] == (10, "z y x w v q2 r2 s2 t2 u2")
    assert out[3] == (0, "unrelated words only here nothing shared at all")


def test_duplicated_spans_within_doc_repetition_and_union_coverage(spark):
    from pyspark.sql import functions as F

    from fortymhz_spark.operators import text as tx

    rep = " ".join(f"r{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            # within-doc repetition only: distinct-doc df is 1, no ban
            (0, f"{rep} {rep} filler here now"),
            (1, "completely different text with enough tokens to shingle"),
        ],
        "doc_id long, text string",
    )
    assert tx.duplicated_spans(docs, shingle_tokens=8).count() == 0

    # overlapping coverage: doc 0 shares tokens 0..9 with doc 1 and
    # tokens 6..15 with doc 2 — two maximal runs whose covered ranges
    # overlap; union coverage must count 16 tokens, not 20
    common = [f"c{i}" for i in range(16)]
    d0 = " ".join(common)
    d1 = " ".join(common[:10]) + " u1 u2 u3 u4 u5 u6 u7 u8"
    d2 = "v1 v2 v3 v4 v5 v6 v7 v8 " + " ".join(common[6:16])
    docs2 = spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2)], "doc_id long, text string"
    )
    out = (
        tx.strip_duplicated_spans(docs2, shingle_tokens=8)
        .filter(F.col("doc_id") == 0)
        .first()
    )
    assert out["n_removed_tokens"] == 16 and out["clean_text"] == ""


def test_duplicated_spans_partition_invariant_nulls_and_validation(spark):
    import pytest as _pytest

    from fortymhz_spark.operators import text as tx

    t1 = "a b c d e f g h i j k l m n o p q r"
    t2 = "z y x w v d e f g h i j k l m"
    docs = spark.createDataFrame(
        [(1, t1), (2, t2), (3, None), (4, "short")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, tx.strip_duplicated_spans(docs).collect()))
    b = sorted(
        map(tuple, tx.strip_duplicated_spans(docs.repartition(7)).collect())
    )
    assert a == b
    out = {
        r["doc_id"]: (r["n_removed_tokens"], r["clean_text"])
        for r in tx.strip_duplicated_spans(docs).collect()
    }
    assert out[3] == (0, "") and out[4] == (0, "short")
    with _pytest.raises(ValueError, match="shingle_tokens"):
        tx.duplicated_spans(docs, shingle_tokens=0)
    with _pytest.raises(ValueError, match="max_df"):
        tx.duplicated_spans(docs, max_df=0)


# ---------------------------------------------------------------------------
# rrf_fuse (operators/retrieval.py)
# ---------------------------------------------------------------------------


def test_rrf_fuse_matches_pure_python_and_validates(spark):
    from fortymhz_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank int"
    )
    got = {
        r["doc_id"]: (r["rrf_q"], r["n_lists"])
        for r in rrf_fuse([lex, vec], k=60, scale=720720).collect()
    }
    c = lambda r: 720720 // (60 + r)
    assert got == {
        10: (c(1) + c(3), 2),
        20: (c(2) + c(1), 2),
        30: (c(3), 1),
        40: (c(2), 1),
    }
    # docs in both lists outrank the single-list docs; among singles
    # the better rank (40 at rank 2) beats the worse (30 at rank 3)
    order = sorted(got, key=lambda d: (-got[d][0], d))
    assert order == [20, 10, 40, 30]
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k must"):
        rrf_fuse([lex], k=0)
    with pytest.raises(ValueError, match="scale"):
        rrf_fuse([lex], scale=0)


def test_decontaminate_spans_localizes_misaligned_eval_overlap(spark):
    """Span decontamination must localize a verbatim eval span at
    arbitrary alignment, report exact union coverage, and stay total
    (clean and NULL docs report zeros)."""
    from fortymhz_spark.operators import text as tx

    train = spark.createDataFrame(
        [
            (1, "t1 t2 e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 t3 t4"),
            (2, "clean document nothing shared with any eval item at all"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "prefix e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 suffix")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_spans, r.contaminated_tokens, r.is_contaminated)
        for r in tx.decontaminate_spans(train, ev, shingle_tokens=8).collect()
    }
    # the 10-token eval span sits at train offset 2, eval offset 1 —
    # no aligned-block form could pair those
    assert out == {1: (1, 10, True), 2: (0, 0, False), 3: (0, 0, False)}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shingle_tokens"):
        tx.decontaminate_spans(train, ev, shingle_tokens=0)


def test_decontaminate_spans_union_coverage_over_overlapping_runs(spark):
    """The O(spans) coverage fold must union correctly when SEPARATE
    maximal runs overlap in token coverage: hit positions {0, 2} (but
    not 1) produce two spans covering tokens 0-7 and 2-9 — union 10,
    never 16.  Construction: eval docs are exactly the train's token
    windows 0-7 and 2-9; window 1-8 appears nowhere in eval."""
    from fortymhz_spark.operators import text as tx

    train = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 tail1 tail2")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "t0 t1 t2 t3 t4 t5 t6 t7"),
         (101, "t2 t3 t4 t5 t6 t7 t8 t9")],
        "doc_id long, text string",
    )
    row = tx.decontaminate_spans(train, ev, shingle_tokens=8).first()
    assert (row.n_spans, row.contaminated_tokens, row.is_contaminated) == (
        2, 10, True,
    )
    # disjoint-spans sanity on the same fold: two eval windows far
    # apart cover exactly 8 + 8 tokens
    train2 = spark.createDataFrame(
        [(1, "a0 a1 a2 a3 a4 a5 a6 a7 gap1 gap2 gap3 "
             "b0 b1 b2 b3 b4 b5 b6 b7 tail")],
        "doc_id long, text string",
    )
    ev2 = spark.createDataFrame(
        [(100, "a0 a1 a2 a3 a4 a5 a6 a7"),
         (101, "b0 b1 b2 b3 b4 b5 b6 b7")],
        "doc_id long, text string",
    )
    row2 = tx.decontaminate_spans(train2, ev2, shingle_tokens=8).first()
    assert (row2.n_spans, row2.contaminated_tokens) == (2, 16)


def test_contamination_report_leak_fraction_and_blast_radius(spark):
    """contamination_report: per eval doc, exact distinct-shingle
    denominator, leaked-shingle count, and distinct-train-doc blast
    radius — total over eval (clean items report zeros), duplicate
    leaks in one train doc counted once, and multiple train copies
    counted per doc."""
    from fortymhz_spark.operators import text as tx

    # eval 100: its window e1..e8 appears in TWO train docs (blast
    # radius 2); eval 101 is clean; eval 102 has NULL text
    train = spark.createDataFrame(
        [
            (1, "x e1 e2 e3 e4 e5 e6 e7 e8 y"),
            (2, "e1 e2 e3 e4 e5 e6 e7 e8"),
            (3, "nothing shared here at all with anything beyond"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (100, "pre e1 e2 e3 e4 e5 e6 e7 e8 post"),
            (101, "totally clean benchmark item nothing leaked anywhere ok"),
            (102, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            r.n_eval_shingles,
            r.n_shingles_leaked,
            r.n_train_docs_hit,
            r.is_leaked,
        )
        for r in tx.contamination_report(train, ev, shingle_tokens=8)
        .collect()
    }
    # eval 100 has 10 tokens -> 3 shingles; only the middle one
    # (e1..e8) exists in train, in docs 1 AND 2.  eval 101's 8 tokens
    # are exactly one (clean) shingle; NULL-text 102 has none.
    assert got == {
        100: (3, 1, 2, True),
        101: (1, 0, 0, False),
        102: (0, 0, 0, False),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shingle_tokens"):
        tx.contamination_report(train, ev, shingle_tokens=0)


def test_source_overlap_matrix_counts_and_validation(spark):
    """source_overlap: per source pair, distinct shared shingles —
    within-source repetition never counts, a 3-source shingle hits all
    three pairs once, doc-level repetition of the same shingle counts
    once, and order is canonical (source_a < source_b)."""
    from fortymhz_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "A", "s1 s2 s3 s4 s5 s6 s7 s8 extraA"),
            (2, "B", "pre s1 s2 s3 s4 s5 s6 s7 s8"),
            (3, "C", "totally different content with nothing shared here ok"),
            # c1..c8 in ALL THREE sources; repeated twice inside A
            (4, "A", "c1 c2 c3 c4 c5 c6 c7 c8"),
            (5, "A", "again c1 c2 c3 c4 c5 c6 c7 c8"),
            (6, "B", "c1 c2 c3 c4 c5 c6 c7 c8 tailB"),
            (7, "C", "z c1 c2 c3 c4 c5 c6 c7 c8"),
            (8, "C", None),
        ],
        "doc_id long, source string, text string",
    )
    got = sorted(
        map(tuple, tx.source_overlap(docs, shingle_tokens=8).collect())
    )
    assert got == [("A", "B", 2), ("A", "C", 1), ("B", "C", 1)]
    rep = sorted(
        map(
            tuple,
            tx.source_overlap(
                docs.repartition(7), shingle_tokens=8
            ).collect(),
        )
    )
    assert rep == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shingle_tokens"):
        tx.source_overlap(docs, shingle_tokens=0)


def test_strip_contaminated_spans_rewrites_and_stays_total(spark):
    """strip_contaminated_spans removes exactly the union-covered
    tokens (overlapping runs never double-remove), rebuilds the text,
    passes clean/NULL docs through with zero removed, and is
    partition-invariant."""
    from fortymhz_spark.operators import text as tx

    train = spark.createDataFrame(
        [
            (1, "t1 t2 e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 t3 t4"),
            (2, "clean document nothing shared with any eval item at all"),
            (3, None),
            # overlapping-runs doc: eval windows 0-7 and 2-9 of its text
            (4, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 tail1 tail2"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "prefix e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 suffix"),
         (101, "t0 t1 t2 t3 t4 t5 t6 t7"),
         (102, "t2 t3 t4 t5 t6 t7 t8 t9")],
        "doc_id long, text string",
    )
    out = tx.strip_contaminated_spans(train, ev, shingle_tokens=8)
    got = {
        r.doc_id: (r.n_removed_tokens, r.clean_text)
        for r in out.select(
            "doc_id", "n_removed_tokens", "clean_text"
        ).collect()
    }
    assert got == {
        1: (10, "t1 t2 t3 t4"),
        2: (0, "clean document nothing shared with any eval item at all"),
        3: (0, ""),
        4: (10, "tail1 tail2"),
    }
    rep = {
        r.doc_id: (r.n_removed_tokens, r.clean_text)
        for r in tx.strip_contaminated_spans(
            train.repartition(7), ev.repartition(3), shingle_tokens=8
        ).select("doc_id", "n_removed_tokens", "clean_text").collect()
    }
    assert rep == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shingle_tokens"):
        tx.strip_contaminated_spans(train, ev, shingle_tokens=0)
