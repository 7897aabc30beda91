"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is seed-stable only for a fixed partitioning — a
repartition, a cluster resize, or AQE re-planning changes which rows
are picked.  At 100 TB that breaks reproducibility (and makes
train/test splits drift between runs).  Everything here derives the
keep/drop decision from the DATA (a key column), so the same rows are
selected on any cluster, any partitioning, any engine:

    score(key) = (key * KNUTH) mod SCORE_MOD          -- pure int ops
    keep  ⟺  score < rate * SCORE_MOD

Multiplicative (Knuth) hashing over a unique key spreads scores
uniformly; the arithmetic is plain 64-bit integer multiply/mod, so a
SQL oracle (DuckDB) reproduces the exact sample — no engine-specific
hash function in the contract.  All operators are single column
expressions (no shuffle, no Python); stratified sampling adds one
broadcast-sized map at plan time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Knuth's multiplicative constant (2^32 / phi) and a prime modulus.
KNUTH = 2_654_435_761
SCORE_MOD = 1_000_003


def sample_score(key: Column | str) -> Column:
    """Deterministic pseudo-uniform score in [0, SCORE_MOD) from an
    integer key.  ``pmod`` keeps it non-negative for negative keys."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(k.cast("long") * F.lit(KNUTH), F.lit(SCORE_MOD))


def hash_sample(df: DataFrame, rate: float, key_col: str) -> DataFrame:
    """Keep ~``rate`` of rows, chosen deterministically by key.

    Reproducible across partitionings/engines (unlike ``df.sample``);
    the filter is a pure column predicate, so it pushes into the scan
    stage and composes with column pruning.
    """
    return df.filter(sample_score(key_col) < int(rate * SCORE_MOD))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float], key_col: str
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language quotas when
    rebalancing a pretraining mix).  ``fractions`` maps stratum value →
    keep rate; missing strata keep rate 0.  The per-stratum threshold is
    a small CASE expression (plan-time literal map — no join)."""
    thresh = None
    for value, rate in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        lit = F.lit(int(rate * SCORE_MOD))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    thresh = thresh.otherwise(F.lit(0)) if thresh is not None else F.lit(0)
    return df.filter(sample_score(key_col) < thresh)


def take_per_group(
    df: DataFrame, group_col: str, n: int, key_col: str
) -> DataFrame:
    """Deterministic fixed-size per-group sample (reservoir-style
    semantics without the randomness): the ``n`` rows with the lowest
    hash score per group.  One shuffle on the group key; the window
    keeps n rows per partition-group, so skewed groups cost sort time
    but bounded output."""
    w = Window.partitionBy(group_col).orderBy(
        sample_score(key_col).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .drop("__rn__")
    )


def epoch_shuffle_key(key: Column | str, epoch: int) -> Column:
    """Deterministic per-epoch shuffle position for a row.

    Training runs re-shuffle the corpus every epoch, but the
    permutation must be REPRODUCIBLE (resume mid-epoch, re-run a job,
    audit what the model saw).  Mixing the epoch into the
    multiplicative hash gives each epoch an independent-looking,
    engine-portable permutation from pure integer arithmetic:

        pos(key, epoch) = ((key + epoch·P) · KNUTH) mod SCORE_MOD

    Sorting by (pos, key) is a total order (key breaks score ties).
    At scale the sort is a range-partitioned exchange — the standard
    price of a global permutation; for shard-local shuffling partition
    first and sort within partitions (`sortWithinPartitions`).
    """
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        (k.cast("long") + F.lit(epoch * 1_000_000_007)) * F.lit(KNUTH),
        F.lit(SCORE_MOD),
    )


def repeat_weighted(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
) -> DataFrame:
    """Deterministic UPSAMPLING: replicate each row ``w`` times where
    ``w`` may be fractional — weight 2.5 yields 2 copies always plus a
    3rd for a deterministic 50% of keys.  The mixture-rebalancing
    counterpart to ``stratified_sample`` (which can only drop):
    low-resource strata get repeated into the training mix with an
    auditable, engine-portable decision (integer hash, no RNG state).

    Adds ``copy_idx`` (0-based).  Rows in strata missing from
    ``weights`` keep weight 1.  The replication is an ``explode`` over
    a per-row sequence — fan-out is w per row with no shuffle, and the
    copies land next to their original (shuffle only when a downstream
    op asks)."""
    whole = None
    frac_t = None
    for value, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative weight for {value!r}: {w}")
        cond = F.col(strata_col) == value
        wi, fr = int(w), int(round((w - int(w)) * SCORE_MOD))
        whole = F.when(cond, wi) if whole is None else whole.when(cond, wi)
        frac_t = F.when(cond, fr) if frac_t is None else frac_t.when(cond, fr)
    whole = (whole.otherwise(1) if whole is not None else F.lit(1)).cast("int")
    frac_t = frac_t.otherwise(0) if frac_t is not None else F.lit(0)
    n_copies = whole + F.when(sample_score(key_col) < frac_t, 1).otherwise(0)
    # 0-based indices directly (a generator cannot be nested inside
    # arithmetic); sequence(0, -1) would descend, hence greatest+slice.
    copies = F.slice(
        F.sequence(F.lit(0), F.greatest(n_copies - 1, F.lit(0))), 1, n_copies
    )
    return df.withColumn("copy_idx", F.explode(copies))
