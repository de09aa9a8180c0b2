"""As-of (backward, inclusive) join — an operator Spark lacks natively.

Implemented as a composition of built-in DataFrame ops (the task's
preference tier (a): no UDF at all): union the tagged sides, sort within
each key partition by (ts, right-before-left), and forward-fill the right
side's columns with ``last(..., ignorenulls=True)`` over an unbounded-
preceding window. One shuffle on the key; scales like any windowed agg
(skewed keys can be pre-salted with salt_groups just like the encoder).

DuckDB's native ASOF JOIN serves as the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """For each left row: the right row with the greatest ``ts`` ≤ left.ts
    within the same ``key`` (backward inclusive). Right must be unique per
    (key, ts) — pre-aggregate if not.

    Returns all left columns plus ``<col><suffix>`` for each right col and
    ``<ts><suffix>`` (the matched right timestamp; null when no match).
    """
    marker = "_asof_is_right"
    payload = "_asof_payload"
    # forward-fill ONE struct of (ts, *right_cols) so every filled value
    # comes from the SAME matched right row — per-column fills would stitch
    # values from different right rows when the matched row has NULLs
    # (DuckDB's ASOF JOIN oracle returns the matched row's NULL instead)
    r = right.select(
        F.col(key),
        F.col(ts),
        F.struct(
            F.col(ts).alias(f"{ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        ).alias(payload),
    ).withColumn(marker, F.lit(1))
    l = left.withColumn(marker, F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col(marker).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn(payload, F.last(payload, ignorenulls=True).over(w))
    return (
        u.filter(F.col(marker) == 0)
        .select(*left.columns, f"{payload}.*")
    )
