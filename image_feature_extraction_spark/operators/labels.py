"""Label aggregation (SURVEY §2.5 A5): majority label per group with the
reference's full option set (/root/reference/tools/ExtractLabels.cxx:159-212,
cited for parity-checking, not copied):

- deterministic tie-break: count desc, then label asc;
- ignore-list: labels excluded from voting entirely (the reference's
  ignored-label set, ExtractLabels.cxx:190-194);
- dominant-label override: if a designated label reaches a share
  threshold of the non-ignored rows, it wins regardless of the majority
  (the reference's dominant-label rule, ExtractLabels.cxx:195-198).

One keyed shuffle (groupBy on (group, label)) + windows over the small
per-group label-count frame — scales to any group cardinality; the window
partition holds #distinct-labels rows per group, not #rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mode_label(
    df: DataFrame,
    by,
    label_col: str,
    ignore=(),
    dominant: str | None = None,
    dominant_share: float = 0.5,
    out_label: str = "mode_label",
    out_count: str = "mode_count",
    out_total: str = "n_considered",
) -> DataFrame:
    """One row per group: the winning label, its count, and the number of
    non-ignored rows. Groups whose every row is ignored produce no output
    row (they have no votes). The dominant override compares
    dominant_count / total (float64 division of exact counts, identical
    across engines) against dominant_share."""
    by_l = [by] if isinstance(by, str) else list(by)
    # null labels never vote: with a non-empty ignore list SQL NOT-IN
    # three-valued logic would silently drop them anyway, and without one
    # Spark's NULLS-FIRST asc tie-break would crown NULL the mode while
    # the NULLS-LAST oracle disagrees — excluding them everywhere is the
    # only consistent reading
    d = df.where(F.col(label_col).isNotNull())
    if ignore:
        d = d.where(~F.col(label_col).isin(*ignore))
    counts = d.groupBy(*by_l, label_col).agg(F.count(F.lit(1)).alias("cnt"))
    wg = Window.partitionBy(*by_l)
    counts = counts.withColumn("total", F.sum("cnt").over(wg))
    wr = Window.partitionBy(*by_l).orderBy(F.desc("cnt"), F.asc(label_col))
    counts = counts.withColumn("rn", F.row_number().over(wr))
    if dominant is not None:
        dom = F.sum(
            F.when(F.col(label_col) == dominant, F.col("cnt")).otherwise(F.lit(0))
        ).over(wg)
        counts = counts.withColumn("dom_cnt", dom)
        override = (
            F.col("dom_cnt").cast("double") / F.col("total").cast("double")
            >= F.lit(float(dominant_share))
        )
        label_expr = F.when(override, F.lit(dominant)).otherwise(F.col(label_col))
        count_expr = F.when(override, F.col("dom_cnt")).otherwise(F.col("cnt"))
    else:
        label_expr = F.col(label_col)
        count_expr = F.col("cnt")
    return counts.where(F.col("rn") == 1).select(
        *by_l,
        label_expr.alias(out_label),
        count_expr.cast("long").alias(out_count),
        F.col("total").cast("long").alias(out_total),
    )
