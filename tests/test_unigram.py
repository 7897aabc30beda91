"""Unigram-LM tokenizer (operators/unigram.py): Viterbi optimality
against brute-force enumeration, training invariants, coverage, and
the encode path's plan shape."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from fortymhz_spark.operators import unigram as ug


def _brute_force_best(word, logp, max_len):
    """All segmentations by cut masks; best (score, -n_pieces) with
    every piece either in-vocab or a single char."""
    n = len(word)
    floor = min(logp.values()) - 10.0
    best = None
    for mask in itertools.product([0, 1], repeat=max(n - 1, 0)):
        cuts = [0] + [i + 1 for i, b in enumerate(mask) if b] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(len(p) > max_len for p in pieces):
            continue
        score = 0.0
        ok = True
        for p in pieces:
            if p in logp:
                score += logp[p]
            elif len(p) == 1:
                score += floor
            else:
                ok = False
                break
        if not ok:
            continue
        key = (score, -len(pieces))
        if best is None or key > best[0]:
            best = (key, pieces)
    return best


def test_viterbi_matches_brute_force_enumeration():
    logp = {
        "a": math.log(0.3),
        "b": math.log(0.2),
        "ab": math.log(0.25),
        "ba": math.log(0.15),
        "aba": math.log(0.1),
    }
    for word in ["ababa", "aabb", "baba", "abab", "aaaa", "b"]:
        got = ug.viterbi_segment(word, logp, max_piece_len=3)
        want_key, _ = _brute_force_best(word, logp, 3)
        got_score = sum(
            logp.get(p, min(logp.values()) - 10.0) for p in got
        )
        assert "".join(got) == word
        assert (round(got_score, 9), -len(got)) == (
            round(want_key[0], 9),
            want_key[1],
        ), word


def test_oov_characters_fall_to_floor_not_crash():
    logp = {"a": math.log(0.5), "b": math.log(0.5)}
    assert ug.viterbi_segment("axb", logp) == ["a", "x", "b"]
    assert ug.viterbi_segment("zzz", logp) == ["z", "z", "z"]


def _corpus(spark):
    rows = [
        (i, "the sparkle sparks sparkling spark plug " * 3)
        for i in range(4)
    ]
    rows.append((9, "unrelated words here entirely different tokens"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_training_learns_multichar_pieces_and_keeps_coverage(spark):
    docs = _corpus(spark)
    model = ug.learn_unigram_vocab(docs, vocab_size=64, em_rounds=2)
    # every corpus character survives as a single-char piece …
    corpus_chars = {
        ch
        for r in docs.collect()
        for ch in (r["text"] or "")
        if ch != " "
    }
    assert corpus_chars <= {p for p in model if len(p) == 1}
    # … frequent words become whole pieces …
    assert "spark" in model
    # … probabilities are a (log-)distribution
    total = sum(math.exp(lp) for lp in model.values())
    assert abs(total - 1.0) < 1e-9
    # hard cap honored (chars can exceed it, multi-char pieces cannot)
    n_multi = sum(1 for p in model if len(p) > 1)
    assert n_multi + len(corpus_chars) <= 64 + len(corpus_chars)


def test_training_is_deterministic_and_partition_invariant(spark):
    docs = _corpus(spark)
    a = ug.learn_unigram_vocab(docs, vocab_size=48, em_rounds=2)
    b = ug.learn_unigram_vocab(
        docs.repartition(7), vocab_size=48, em_rounds=2
    )
    assert a == b


def test_encode_reconstructs_and_is_arrow_batched(spark):
    docs = _corpus(spark)
    model = ug.learn_unigram_vocab(docs, vocab_size=64, em_rounds=2)
    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), " "),
                    lambda x: x != "",
                )
            ).alias("w")
        )
        .distinct()
    )
    enc = ug.encode_unigram(words, model=model)
    rows = enc.collect()
    assert rows
    for r in rows:
        assert "".join(r["pieces"]) == r["w"]
        assert 1 <= len(r["pieces"]) <= len(r["w"])
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_soft_em_expected_counts_sum_to_path_posterior():
    """The forward–backward E-step's per-word invariant: summing the
    expected counts of the pieces on any single full path, weighted by
    posterior, reproduces the lattice total — concretely, for a word
    with exactly two segmentations of equal probability, each path's
    distinctive piece gets expected count 0.5 while shared structure
    gets 1.0-ish mass."""
    import math as m

    from fortymhz_spark.operators.unigram import _accumulate_expected_counts

    # 'ab' under {a, b, ab} all equal prob p: paths a+b (p^2) and ab (p)
    p = 1.0 / 3.0
    logp = {x: m.log(p) for x in ("a", "b", "ab")}
    counts: dict[str, float] = {}
    _accumulate_expected_counts("ab", logp, 1.0, counts, max_piece_len=8)
    z = p + p * p
    assert counts["ab"] == pytest.approx(p / z)
    assert counts["a"] == pytest.approx(p * p / z)
    assert counts["b"] == pytest.approx(p * p / z)


def test_soft_em_matches_hard_em_when_unambiguous(spark):
    """On a corpus of single-character words every lattice has exactly
    one path, so soft EM's posterior expectation IS the Viterbi count
    and the two modes produce identical models.  (Any multi-char word
    is ambiguous BY CONSTRUCTION here — single characters are never
    pruned, so the char-by-char path always competes — which is
    exactly why the divergence test below uses one.)"""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a c c")],
        "doc_id long, text string",
    )
    hard = ug.learn_unigram_vocab(docs, vocab_size=4, em_rounds=2, em="hard")
    soft = ug.learn_unigram_vocab(docs, vocab_size=4, em_rounds=2, em="soft")
    assert set(hard) == set(soft) == {"a", "b", "c"}
    for piece in hard:
        assert hard[piece] == pytest.approx(soft[piece], abs=1e-12), piece


def test_soft_em_diverges_from_hard_on_ambiguous_corpus(spark):
    """The documented fidelity gap, pinned: on an ambiguous corpus
    (words segmentable several competitive ways), hard EM starves the
    runner-up pieces (Viterbi winner-take-all) while soft EM keeps
    posterior mass on them — the models' probabilities differ."""
    # 'abab' splits as ab+ab / a+b+ab / ab+a+b / a+b+a+b ...; 'aba'
    # as ab+a / a+ba ...; rich ambiguity for pieces a, b, ab, ba
    docs = spark.createDataFrame(
        [(1, "abab aba bab"), (2, "abab bab"), (3, "aba abab")],
        "doc_id long, text string",
    )
    hard = ug.learn_unigram_vocab(docs, vocab_size=6, em_rounds=3, em="hard")
    soft = ug.learn_unigram_vocab(docs, vocab_size=6, em_rounds=3, em="soft")
    diverged = [
        p
        for p in set(hard) & set(soft)
        if abs(hard[p] - soft[p]) > 1e-6
    ]
    assert diverged, (hard, soft)
    # both remain valid normalized models over full-coverage vocabs
    for model in (hard, soft):
        assert sum(map(math.exp, model.values())) == pytest.approx(1.0)
        assert {"a", "b"} <= set(model)


def test_soft_em_validates_mode(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="em must be"):
        ug.learn_unigram_vocab(docs, em="viterbi-ish")


def test_encode_unigram_null_word_yields_empty(spark):
    """NULL words must encode to [] (the encode_token_ids_unigram
    totality contract), not TypeError inside the Arrow batch."""
    docs = _corpus(spark)
    model = ug.learn_unigram_vocab(docs, vocab_size=64, em_rounds=1)
    words = spark.createDataFrame([("ab",), (None,), ("",)], "w string")
    got = {r["w"]: r["pieces"] for r in ug.encode_unigram(words, model=model).collect()}
    assert got[None] == []
    assert got[""] == []
    assert "".join(got["ab"]) == "ab"


def test_validation_errors(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="vocab_size"):
        ug.learn_unigram_vocab(docs, vocab_size=1)
    with pytest.raises(ValueError, match="em_rounds"):
        ug.learn_unigram_vocab(docs, em_rounds=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        ug.learn_unigram_vocab(empty)


def test_id_level_encode_round_trips_through_vocab(spark):
    docs = _corpus(spark)
    model = ug.learn_unigram_vocab(docs, vocab_size=64, em_rounds=2)
    vocab = ug.vocab_from_model(model)
    # id 0 is <unk>; frequent pieces get small ids
    assert vocab["<unk>"] == 0
    assert sorted(vocab.values()) == list(range(len(vocab)))
    inv = {i: p for p, i in vocab.items()}

    enc = ug.encode_token_ids_unigram(docs, model=model)
    for r in enc.select("text", "token_ids", "n_tok").collect():
        assert r["n_tok"] == len(r["token_ids"])
        # decode: ids → pieces → concatenation == the lowercased,
        # space-stripped text (no <unk> on in-corpus text: the model
        # covers every char, vocab is untrimmed)
        decoded = "".join(inv[i] for i in r["token_ids"])
        want = "".join(
            w for w in (r["text"] or "").lower().split(" ") if w
        )
        assert decoded == want
        assert 0 not in r["token_ids"] or want == ""


def test_id_level_encode_trimmed_vocab_maps_to_unk(spark):
    docs = _corpus(spark)
    model = ug.learn_unigram_vocab(docs, vocab_size=64, em_rounds=2)
    # trim every multi-char piece out of the vocab (but not the model):
    # segmentation still picks multi-char pieces, which must map to unk
    trimmed = {"<unk>": 0}
    for p in sorted(model):
        if len(p) == 1:
            trimmed[p] = len(trimmed)
    enc = ug.encode_token_ids_unigram(
        docs.limit(2), model=model, vocab=trimmed
    )
    rows = enc.collect()
    assert any(0 in r["token_ids"] for r in rows)
    with pytest.raises(ValueError, match="<unk>"):
        ug.encode_token_ids_unigram(docs, model=model, vocab={"a": 1})


# ---------------------------------------------------------------------------
# normalize_text (operators/text.py) — colocated with the round-5
# text operators.
# ---------------------------------------------------------------------------


def test_normalize_text_cleans_and_is_idempotent(spark):
    from fortymhz_spark.operators import text as tx

    rows = [
        (0, "plain text stays"),
        (1, "curly ‘quotes’ and “double” ones"),
        (2, "dash–types—here and ellipsis… done"),
        (3, "zero​width‌chars﻿gone and ctrl\x07bell"),
        (4, "nbsp and　ideographic   runs\t\ncollapse"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    once = df.select(
        "i", tx.normalize_text("text").alias("t")
    )
    got = {r["i"]: r["t"] for r in once.collect()}
    assert got[0] == "plain text stays"
    assert got[1] == "curly 'quotes' and \"double\" ones"
    assert got[2] == "dash-types-here and ellipsis... done"
    assert got[3] == "zerowidthcharsgone and ctrlbell"
    assert got[4] == "nbsp and ideographic runs collapse"
    assert got[5] is None
    # idempotent: a second pass changes nothing
    twice = once.select(
        "i", tx.normalize_text("t").alias("t2"), "t"
    )
    assert all(r["t2"] == r["t"] for r in twice.collect())
    # JVM-side only: no Python boundary in the plan
    plan = once._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
