"""Deterministic sampling operators for training-data curation.

The reference has no sampling (SURVEY.md §2.2 sampling row: engine
addition); a training pipeline needs per-stratum rates (language / source
mixes), reproducibility (re-runs must pick the same rows), and skew
safety — one dominant stratum must not serialize into a single window
partition at 100 TB. ``stratified_sample`` provides all three: systematic
every-k selection per stratum with an optional deterministic salt that
splits each stratum into ``salt_k`` independently-sampled sub-strata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    every: int,
    salt_k: int = 1,
) -> DataFrame:
    """Every ``every``-th row per stratum, deterministic in ``order_col``.

    ``salt_k`` (VERDICT r4 #8): with 1 (default) each stratum is one
    window partition — exact rate, but a dominant stratum (say 60% of a
    100-TB corpus in one language) serializes into a single task. With
    ``salt_k > 1`` the window partitions by ``(stratum, order_col %
    salt_k)``: ``salt_k`` parallel sub-strata, each sampled independently
    at the same systematic rate. The salt is a function of the row (not
    ``rand()``), so re-runs select the identical rows.

    Per-salt rate guarantee: a sub-stratum with ``n_s`` rows emits exactly
    ``ceil(n_s / every)`` rows, so a stratum with ``n`` rows emits between
    ``ceil(n / every)`` and ``ceil(n / every) + salt_k - 1`` rows — the
    rate error is bounded by ``salt_k`` rows per stratum, independent of
    stratum size (proof pinned in ``test_stratified_sample_salted``).

    ``order_col`` must be non-null and integer-like when ``salt_k > 1``
    (the salt is ``order_col % salt_k``); ties in ``order_col`` within a
    sub-stratum would make row numbering nondeterministic, so it should be
    unique per stratum (doc ids are).
    """
    if every < 1 or salt_k < 1:
        raise ValueError(f"every and salt_k must be >= 1, got {every}, {salt_k}")
    # internal working columns: refuse inputs that already carry them —
    # silently overwriting and then dropping a user column loses data
    # (ADVICE r5)
    clash = {"_rn", "_salt"} & set(df.columns)
    if clash:
        raise ValueError(
            f"stratified_sample reserves column name(s) {sorted(clash)}; "
            "rename them on the input first"
        )
    parts = [F.col(stratum_col)]
    if salt_k > 1:
        parts.append((F.col(order_col) % salt_k).alias("_salt"))
    w = Window.partitionBy(*parts).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") - 1) % every == 0)
        .drop("_rn")
    )
