"""Leakage-free feature encoders: expanding z-score and time-aware
target encoding.

These extend the window family (SURVEY.md §2.3/§2.6 — the reference's
normalization story is per-image intensity rescaling,
tools/MakeBag.cxx:429-447 normalizes bag frequencies by total count; the
training-pipeline analog is normalizing each feature against its OWN
PAST only, so a model trained on the output never sees information from the
future of the row it is scoring) with the two encoders every
point-in-time feature pipeline needs:

- ``expanding_zscore`` — z = (x - mean(past)) / std(past) where "past"
  means rows of the same entity with timestamp STRICTLY before the
  current row's. Same-timestamp peers are excluded (they are not known
  "before" t), so duplicate timestamps cannot leak into each other.
- ``target_encode`` — smoothed mean of a label per category computed
  from strictly-previous time buckets:
  enc = (sum_prev + m*prior) / (n_prev + m).

Cross-engine exactness (the DuckDB oracle hashes bit-for-bit): all sums
run on DECIMAL(18,2)/(38,2|4) (associative, order-independent), and the
float post-processing is a single structurally-identical expression tree
of IEEE double ops (+ - * / sqrt are all correctly rounded, so identical
inputs give identical bits in both engines).

Scale notes (100 TB):

- expanding_zscore is ONE exchange + ONE sort (all three cumulative
  quantities come from RANGE frames over the same (entity, time) window
  spec; Catalyst fuses them into a single Window operator). The
  strictly-before sums are derived as cumulative-inclusive minus
  same-timestamp-peer-group totals — both plain frames — instead of a
  second windowed pass or a self-join. Hot entities degrade to window
  spill, same disposition as operators/windows.py.
- target_encode never shuffles the corpus on the category key (which is
  typically low-cardinality and would skew): raw rows are first reduced
  to per-(category, bucket) DECIMAL partials (map-side combine does most
  of the work), the cumulative window runs over that tiny partial table,
  and the result joins back on (category, bucket) — broadcastable
  whenever categories x buckets is small (AQE converts it; the partials
  for 4 event types x 1e6 hourly buckets are a few MB). With
  ``time_bucket`` at day/hour granularity the partial table stays
  bounded no matter how many raw rows feed it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import _as_list

# Bayesian smoothing defaults for target_encode, shared with the oracle
# SQL generators so the two sides cannot drift.
TE_SMOOTHING_M = 10.0
TE_PRIOR = 50.0


def _epoch(df: DataFrame, ts: str):
    """Timestamp column as epoch-seconds double (TimestampNTZ normalized)."""
    from pyspark.sql.types import TimestampNTZType

    tcol = F.col(ts)
    if isinstance(df.schema[ts].dataType, TimestampNTZType):
        tcol = tcol.cast("timestamp")
    return tcol.cast("double")


def expanding_zscore(
    df: DataFrame,
    by,
    ts: str,
    value: str,
    out_prefix: str = "z",
) -> DataFrame:
    """Per-entity expanding z-score against strictly-preceding history.

    Adds ``{p}_n_prev`` (rows strictly before this row's timestamp),
    ``{p}_mean_prev``, ``{p}_var_prev`` (population variance of the
    past), and ``{p}_score`` = (value - mean_prev) / sqrt(var_prev).
    Score/variance are NULL until at least 2 strictly-prior rows exist
    or when the past is constant (var <= 0); mean is NULL until 1.

    Leakage contract: rows sharing the entity's timestamp see the SAME
    history and never each other. Implemented as cumulative-inclusive
    RANGE frame minus the RANGE CURRENT ROW..CURRENT ROW peer-group
    frame (peers = equal order value), so exclusion costs no extra
    shuffle, join, or sort — DECIMAL subtraction keeps it exact.
    """
    by_l = _as_list(by)
    p = out_prefix
    d = df.withColumn("_epoch", _epoch(df, ts))
    by_sql = ", ".join(by_l)
    incl = (
        f"PARTITION BY {by_sql} ORDER BY _epoch "
        f"RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    peer = (
        f"PARTITION BY {by_sql} ORDER BY _epoch "
        f"RANGE BETWEEN CURRENT ROW AND CURRENT ROW"
    )
    dec = f"CAST({value} AS DECIMAL(18,2))"
    # DECIMAL(18,2)^2 -> exact 4-decimal squares; SUM widens to (38,4).
    sq = f"CAST({dec} * {dec} AS DECIMAL(38,4))"
    d = (
        d.withColumn(
            f"{p}_n_prev",
            F.expr(f"COUNT({value}) OVER ({incl}) - COUNT({value}) OVER ({peer})"),
        )
        .withColumn(
            "_sum_prev",
            F.expr(
                f"CAST(COALESCE(SUM({dec}) OVER ({incl}), 0) AS DECIMAL(38,2))"
                f" - CAST(COALESCE(SUM({dec}) OVER ({peer}), 0) AS DECIMAL(38,2))"
            ),
        )
        .withColumn(
            "_sumsq_prev",
            F.expr(
                f"CAST(COALESCE(SUM({sq}) OVER ({incl}), 0) AS DECIMAL(38,4))"
                f" - CAST(COALESCE(SUM({sq}) OVER ({peer}), 0) AS DECIMAL(38,4))"
            ),
        )
    )
    n = F.col(f"{p}_n_prev").cast("double")
    mean = F.col("_sum_prev").cast("double") / n
    var = F.col("_sumsq_prev").cast("double") / n - mean * mean
    d = d.withColumn(
        f"{p}_mean_prev", F.when(F.col(f"{p}_n_prev") >= 1, mean)
    ).withColumn(
        f"{p}_var_prev", F.when(F.col(f"{p}_n_prev") >= 2, var)
    )
    score = (F.col(value).cast("double") - F.col(f"{p}_mean_prev")) / F.sqrt(
        F.col(f"{p}_var_prev")
    )
    d = d.withColumn(
        f"{p}_score", F.when(F.col(f"{p}_var_prev") > 0, score)
    )
    return d.drop("_epoch", "_sum_prev", "_sumsq_prev")


def expanding_robust_stats(
    df: DataFrame,
    by,
    ts: str,
    value: str,
    id_col: str,
    k: float = 1.5,
    min_history: int = 4,
    out_prefix: str = "rb",
) -> DataFrame:
    """Expanding median/IQR of the entity's history + Tukey-fence outlier
    flag: outlier iff value < Q1 - k*IQR or value > Q3 + k*IQR, with the
    quartiles computed over PRIOR rows only (NULL until `min_history`).

    History frame: ROWS UNBOUNDED PRECEDING..1 PRECEDING ordered by
    (ts, id_col) — quantiles are not additive, so the RANGE-minus-peer
    trick expanding_zscore uses cannot exclude same-timestamp peers
    here; the unique id tie-break keeps the frame deterministic, and
    rows sharing a timestamp see the peers ordered before them
    (documented relaxation; with event-time at microsecond grain ties
    are measure-zero — use expanding_zscore when strict same-ts
    exclusion matters). One exchange + one sort; the three quantiles
    share one window spec, so they evaluate in a single Window operator.

    Cross-engine exactness: Spark's `percentile` and DuckDB's
    `quantile_cont` both interpolate lo + (hi - lo) * frac at index
    p*(n-1) with IEEE doubles — measured bit-identical on the events
    table (maxdiff 0.0); the fences reuse that plus one multiply/add.
    """
    by_l = _as_list(by)
    p = out_prefix
    d = df.withColumn("_epoch", _epoch(df, ts))
    frame = (
        f"PARTITION BY {', '.join(by_l)} ORDER BY _epoch, {id_col} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    )
    d = (
        d.withColumn(f"{p}_n_prev", F.expr(f"COUNT({value}) OVER ({frame})"))
        .withColumn("_q1", F.expr(f"percentile({value}, 0.25) OVER ({frame})"))
        .withColumn("_med", F.expr(f"percentile({value}, 0.5) OVER ({frame})"))
        .withColumn("_q3", F.expr(f"percentile({value}, 0.75) OVER ({frame})"))
    )
    ok = F.col(f"{p}_n_prev") >= int(min_history)
    iqr = F.col("_q3") - F.col("_q1")
    lo = F.col("_q1") - F.lit(float(k)) * iqr
    hi = F.col("_q3") + F.lit(float(k)) * iqr
    v = F.col(value).cast("double")
    return (
        d.withColumn(f"{p}_median_prev", F.when(ok, F.col("_med")))
        .withColumn(f"{p}_iqr_prev", F.when(ok, iqr))
        .withColumn(f"{p}_is_outlier", F.when(ok, (v < lo) | (v > hi)))
        .drop("_epoch", "_q1", "_med", "_q3")
    )


def target_encode(
    df: DataFrame,
    by,
    ts: str,
    label: str,
    time_bucket: float | None = None,
    m: float = TE_SMOOTHING_M,
    prior: float = TE_PRIOR,
    out_prefix: str = "te",
) -> DataFrame:
    """Time-aware target encoding: per-category smoothed mean of `label`
    over strictly-previous time buckets.

    ``time_bucket`` (seconds) freezes the encoding at bucket granularity
    — a row sees labels from EARLIER buckets only, never its own bucket
    (the standard guard against within-batch leakage); None uses the raw
    timestamp as its own bucket (strictly-earlier timestamps only).

    Adds ``{p}_bucket``, ``{p}_n_prev``, ``{p}_mean_prev`` (raw past
    mean, NULL when no history), and ``{p}_enc`` — the Bayesian-smoothed
    encoding (sum_prev + m*prior) / (n_prev + m), which degrades to
    `prior` for unseen (category, first-bucket) rows instead of NULL.

    Shape: partials per (category, bucket) -> cumulative window over the
    partial table -> equi-join back. The corpus is never hash-partitioned
    by the (low-cardinality, skewed) category alone.
    """
    by_l = _as_list(by)
    p = out_prefix
    d = df.withColumn("_epoch", _epoch(df, ts))
    if time_bucket is not None:
        d = d.withColumn(
            f"{p}_bucket", F.floor(F.col("_epoch") / float(time_bucket)).cast("long")
        )
    else:
        d = d.withColumn(f"{p}_bucket", F.col("_epoch"))
    dec = f"CAST({label} AS DECIMAL(18,2))"
    partials = d.groupBy(*by_l, f"{p}_bucket").agg(
        F.expr(f"COUNT({label})").alias("_n_g"),
        F.expr(f"CAST(COALESCE(SUM({dec}), 0) AS DECIMAL(38,2))").alias("_sum_g"),
    )
    by_sql = ", ".join(by_l)
    prev = (
        f"PARTITION BY {by_sql} ORDER BY {p}_bucket "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    )
    cum = partials.withColumn(
        "_n_prev", F.expr(f"COALESCE(SUM(_n_g) OVER ({prev}), 0)")
    ).withColumn(
        "_sum_prev",
        F.expr(f"CAST(COALESCE(SUM(_sum_g) OVER ({prev}), 0) AS DECIMAL(38,2))"),
    )
    enc = cum.select(
        *by_l,
        f"{p}_bucket",
        F.col("_n_prev").alias(f"{p}_n_prev"),
        F.when(
            F.col("_n_prev") >= 1,
            F.col("_sum_prev").cast("double") / F.col("_n_prev").cast("double"),
        ).alias(f"{p}_mean_prev"),
        (
            (F.col("_sum_prev").cast("double") + F.lit(float(m) * float(prior)))
            / (F.col("_n_prev").cast("double") + F.lit(float(m)))
        ).alias(f"{p}_enc"),
    )
    return d.drop("_epoch").join(enc, on=[*by_l, f"{p}_bucket"], how="left")


def target_encode_oracle_sql(
    table: str,
    by: str,
    ts: str,
    label: str,
    time_bucket: float,
    select_cols: str,
    m: float = TE_SMOOTHING_M,
    prior: float = TE_PRIOR,
) -> str:
    """DuckDB oracle for target_encode, generated from the SAME constants
    the operator uses (m, prior, bucket width) so the sides cannot drift.
    Expression tree mirrors the Spark side op-for-op (decimal partials,
    double division, + m*prior folded to one literal)."""
    mp = float(m) * float(prior)
    return f"""
    WITH d AS (
      SELECT *, CAST(FLOOR(epoch({ts}) / {float(time_bucket)!r}) AS BIGINT) AS te_bucket
      FROM {table}
    ),
    partials AS (
      SELECT {by}, te_bucket, COUNT({label}) AS n_g,
             CAST(COALESCE(SUM(CAST({label} AS DECIMAL(18,2))), 0) AS DECIMAL(38,2)) AS sum_g
      FROM d GROUP BY {by}, te_bucket
    ),
    cum AS (
      SELECT {by}, te_bucket,
             CAST(COALESCE(SUM(n_g) OVER w, 0) AS BIGINT) AS te_n_prev,
             CAST(COALESCE(SUM(sum_g) OVER w, 0) AS DECIMAL(38,2)) AS sum_prev
      FROM partials
      WINDOW w AS (PARTITION BY {by} ORDER BY te_bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT {select_cols},
           cum.te_n_prev,
           CASE WHEN cum.te_n_prev >= 1
                THEN CAST(cum.sum_prev AS DOUBLE) / CAST(cum.te_n_prev AS DOUBLE)
           END AS te_mean_prev,
           (CAST(cum.sum_prev AS DOUBLE) + {mp!r})
             / (CAST(cum.te_n_prev AS DOUBLE) + {float(m)!r}) AS te_enc
    FROM d JOIN cum ON d.{by} = cum.{by} AND d.te_bucket = cum.te_bucket
    """
