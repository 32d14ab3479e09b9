"""Exact distributed quantiles / equi-depth edges.

``exact_quantile_values``: value at exact global rank positions per key —
distributed sort + row_number, then a tiny semi-join on the wanted ranks.
No approximation: unlike percentile_approx/approxQuantile this reproduces
the reference's duplicate handling bit-for-bit and is partition-count
invariant.

This is the distributed backbone of the reference's two-phase histogram
flow (SURVEY.md §3.2): DetermineHistogramBinEdges samples values, sorts,
and picks positions (tools/DetermineHistogramBinEdges_MultiScaleEigenvalue
Features.cxx:283, DetermineEdgesForEqualizedHistogram.h:21-139). The
duplicate-aware edge ADJUSTMENT (which walks positions sequentially) runs
on the collected edge candidates — O(n_bins) driver work — while the rank
selection over billions of rows stays distributed.

Shuffle structure: one hash exchange on the key (the window partition),
one in-partition sort; the rank filter is evaluated inside the window
projection, so only n_bins rows per key leave the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_list(x):
    return [x] if isinstance(x, str) else list(x)


def exact_quantile_values(
    df: DataFrame,
    value: str,
    keys,
    n_bins: int,
) -> DataFrame:
    """Equi-depth edge positions per key group: for j in 1..n_bins-1 the
    value at 0-based sorted position floor(j * n / n_bins) (n = group row
    count). Deterministic for ties (values equal at a position are equal).

    Returns one row per (keys..., edge_idx) with `edge_value` and the
    group size `n`.

    Null values are excluded before ranking: Spark sorts NULLS FIRST
    while the DuckDB oracle sorts them last, so including them would
    shift every position engine-dependently (and edge_value could come
    back null). n counts non-null values only. NaN still sorts greatest
    in both engines (occupying top ranks) — filter NaN upstream if the
    value column can contain it.
    """
    keys_l = _as_list(keys)
    df = df.where(F.col(value).isNotNull())
    w = Window.partitionBy(*keys_l).orderBy(F.col(value).asc())
    wcnt = Window.partitionBy(*keys_l)
    ranked = df.select(
        *keys_l,
        F.col(value),
        (F.row_number().over(w) - 1).alias("_pos"),
        F.count(F.lit(1)).over(wcnt).alias("n"),
    )
    # wanted 0-based positions: floor(j*n/n_bins), j = 1..n_bins-1
    want = F.array(
        *[(F.lit(j) * F.col("n") / F.lit(n_bins)).cast("long") for j in range(1, n_bins)]
    )
    out = (
        ranked.withColumn("_edge_idx", F.array_position(want, F.col("_pos")))
        .where(F.col("_edge_idx") > 0)
        .select(
            *keys_l,
            (F.col("_edge_idx") - 1).cast("int").alias("edge_idx"),
            F.col(value).alias("edge_value"),
            "n",
        )
    )
    # duplicate positions (same pos wanted for several j when n < n_bins)
    # are resolved by array_position returning the FIRST match — callers
    # needing every j should ensure n >= n_bins (the reference throws
    # otherwise, DetermineEdgesForEqualizedHistogram.h:36-38).
    return out
