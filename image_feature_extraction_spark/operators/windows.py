"""Window-based operators: lag/lead derivatives, backfill, sessionization.

Relational re-expressions of the reference's stencil/boundary semantics
(SURVEY.md §2.3, §2.6):

- lag/lead central differences = DerivativeImageFilter order 1/2 on the
  entity-time axis (Hessian3DImageFilter.hxx:19-51 configures the same
  operators on the spatial axes).
- backfill = the causal reading of normalized convolution's
  "interpolate across missing values" (NormalizedGaussianConvolutionImageFilter.h:6-9):
  last observed value at or before t — leakage-free by construction
  (frame ends at CURRENT ROW, never looks ahead).
- sessionize = the ROI-boundary rule (RegionOfInterestGenerator.hxx:43-56):
  an event belongs to the current session only while within `gap` of the
  previous event; a larger gap opens a new session.

All are single-shuffle (one hash partition by entity + sort within
partition); Spark's window operator spills, so a hot entity degrades to
disk rather than OOM. Skewed entities in the window path are mitigated by
AQE; the as-of module provides the salted/bucketed alternative when one
entity's history exceeds a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(by, order):
    return Window.partitionBy(*_as_list(by)).orderBy(*_as_list(order))


def _as_list(x):
    return [x] if isinstance(x, str) else list(x)


def lag_lead(
    df: DataFrame,
    by,
    order,
    value: str,
    prefix: str | None = None,
) -> DataFrame:
    """Append lag/lead and the central-difference first/second derivatives
    of `value` along the per-entity time axis (nulls at partition edges)."""
    p = prefix or value
    w = _w(by, order)
    lag = F.lag(value).over(w)
    lead = F.lead(value).over(w)
    return (
        df.withColumn(f"{p}_lag", lag)
        .withColumn(f"{p}_lead", lead)
        .withColumn(f"{p}_d1", (lead - lag) / 2.0)
        .withColumn(f"{p}_d2", lead - 2.0 * F.col(value) + lag)
    )


def backfill(df: DataFrame, by, order, cols, out_suffix: str = "_filled") -> DataFrame:
    """Causal forward-fill: for each column, the last non-null value at or
    before the current row within the entity. Zero temporal leakage (frame
    is unboundedPreceding..currentRow)."""
    w = _w(by, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df
    for c in _as_list(cols):
        out = out.withColumn(c + out_suffix, F.last(c, ignorenulls=True).over(w))
    return out


def sessionize(
    df: DataFrame,
    by,
    ts: str,
    gap,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign session ids per entity: a new session starts when the gap to
    the previous event exceeds `gap` (same units as ts; pass an interval
    expression-compatible value for timestamps, e.g. F.expr("INTERVAL 30
    MINUTES") equivalent seconds).

    session_id is a per-entity 1-based dense counter (cumulative sum of
    boundary flags), deterministic for a fixed (by, ts) ordering.
    """
    from pyspark.sql.types import TimestampNTZType

    w = _w(by, ts)
    prev = F.lag(ts).over(w)
    if isinstance(gap, (int, float)):
        cur = F.col(ts)
        if isinstance(df.schema[ts].dataType, TimestampNTZType):
            cur = cur.cast("timestamp")
            prev = prev.cast("timestamp")
        delta = cur.cast("double") - prev.cast("double")
        is_new = F.when(prev.isNull() | (delta > float(gap)), 1).otherwise(0)
    else:  # timestamp + interval string like "30 minutes"
        is_new = F.when(
            prev.isNull() | (F.col(ts) > prev + F.expr(f"INTERVAL {gap}")), 1
        ).otherwise(0)
    cum = F.sum(is_new).over(
        _w(by, ts).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, cum)


def nearest_event_distance(
    df: DataFrame,
    by,
    ts: str,
    marker,
    out_col: str = "dist_to_marker",
) -> DataFrame:
    """Distance (in ts units) from each row to the nearest row satisfying
    `marker` (a boolean Column) within the entity — the relational form of
    the signed distance map (SignedMaurerDistanceMapImageFilter usage at
    /root/reference/include/ife/Statistics/ExpectedDistanceFromCenterToInterestPoint.h:16-19):
    backward + forward as-of against marker rows, then least().

    Null when the entity has no marker rows. One shuffle, two sorts
    (same partitioning, opposite frame directions).
    """
    from pyspark.sql.types import TimestampNTZType

    tcol = F.col(ts)
    if isinstance(df.schema[ts].dataType, TimestampNTZType):
        tcol = tcol.cast("timestamp")
    td = tcol.cast("double")
    mts = F.when(marker, td)
    wb = _w(by, [ts]).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = _w(by, [ts]).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    prev = F.last(mts, ignorenulls=True).over(wb)
    nxt = F.first(mts, ignorenulls=True).over(wf)
    dist = F.least(
        F.coalesce(td - prev, F.lit(float("inf"))),
        F.coalesce(nxt - td, F.lit(float("inf"))),
    )
    return df.withColumn(
        out_col, F.when(prev.isNotNull() | nxt.isNotNull(), dist)
    )


def moving_aggregate(
    df: DataFrame,
    by,
    ts: str,
    value: str,
    width: float,
    out_prefix: str = "mov",
) -> DataFrame:
    """Trailing time-range moving aggregates (RANGE frame on the epoch
    axis): count / sum / mean of `value` over (t - width, t] per entity —
    the relational analog of Gaussian smoothing along the time axis
    (SmoothingRecursiveGaussian usage, SURVEY.md §2.3 N3), causal so
    leakage-free. Sum is computed on DECIMAL for cross-engine exactness."""
    from pyspark.sql.types import TimestampNTZType

    tcol = F.col(ts)
    if isinstance(df.schema[ts].dataType, TimestampNTZType):
        tcol = tcol.cast("timestamp")
    d = df.withColumn("_epoch", tcol.cast("double"))
    # Python's Window.rangeBetween only accepts int boundaries; a fractional
    # width over a double ordering needs the SQL frame syntax.
    by_sql = ", ".join(_as_list(by))
    frame = (
        f"PARTITION BY {by_sql} ORDER BY _epoch "
        f"RANGE BETWEEN {float(width)!r} PRECEDING AND CURRENT ROW"
    )
    dec = f"CAST({value} AS DECIMAL(18,2))"
    return (
        d.withColumn(f"{out_prefix}_n", F.expr(f"COUNT(1) OVER ({frame})"))
        .withColumn(
            f"{out_prefix}_sum",
            F.expr(f"CAST(SUM({dec}) OVER ({frame}) AS DECIMAL(38,2))"),
        )
        .withColumn(
            f"{out_prefix}_mean",
            F.expr(
                f"CAST(SUM({dec}) OVER ({frame}) AS DOUBLE)"
                f" / CAST(COUNT(1) OVER ({frame}) AS DOUBLE)"
            ),
        )
        .drop("_epoch")
    )


def session_stats(
    df: DataFrame,
    by,
    ts: str,
    gap,
    agg_cols: dict | None = None,
) -> DataFrame:
    """Sessionize then aggregate one row per (entity, session): event count,
    start/end, duration. `agg_cols` maps output name -> Column for extras."""
    from pyspark.sql.types import TimestampNTZType

    by_l = _as_list(by)
    s = sessionize(df, by, ts, gap)
    tcol = F.col(ts)
    if isinstance(df.schema[ts].dataType, TimestampNTZType):
        tcol = tcol.cast("timestamp")
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(tcol.cast("double")) - F.min(tcol.cast("double"))).alias(
            "duration_sec"
        ),
    ]
    for name, col in (agg_cols or {}).items():
        aggs.append(col.alias(name))
    return s.groupBy(*by_l, "session_id").agg(*aggs)
