"""Feature-monitoring operators for production feature pipelines:
distribution-drift detection between time windows and rolling-origin
backtest folds (the K-fold generalization of ``curation.temporal_holdout``).

Why these live in the engine: a feature store that serves point-in-time
features (operators/asof.py, operators/encode.py) needs (a) an alarm when
the serving distribution walks away from the training distribution, and
(b) leakage-free expanding-window evaluation splits to validate models
against. The reference's analogue is its corpus-histogram machinery
(cited for parity: /root/reference/tools/MakeBag.cxx:300-360 — fixed-bin
frequency vectors compared across image populations); ``feature_drift``
is exactly that comparison expressed relationally.

Cross-engine determinism contract (same as the rest of the package):

- every count is integer; every proportion is an exact division of two
  integers (correctly-rounded IEEE, identical on both engines);
- drift statistics avoid data-dependent float ACCUMULATION ORDER by
  pivoting the fixed bins into columns and summing in a FIXED
  left-to-right expression order — the same trick as the fixed-bin
  histogram family (plans/queries.py q_histogram_fixed);
- the arithmetic is emitted ONCE as SQL text (``_drift_exprs``) and
  parsed by both engines, so the expression trees cannot drift.

Scale notes (10^12 rows):
- feature_drift: one exchange keyed by the group column with map-side
  partial aggregation; the state per group is 2*n_bins+2 counters, so
  the shuffle is |groups| * ~200 bytes regardless of input size. Skewed
  group sizes are absorbed by the partials (counters, not rows, move).
- backtest_folds: the fold table is K rows -> broadcast; the per-row
  fold/role labeling is a narrow projection, and the summary is one
  exchange keyed (fold, role, group). The COUNT(DISTINCT user) uses
  Spark's two-phase distinct aggregation (partial distinct per
  partition, then keyed exchange) — never a driver collect.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .encode import cents_sql

# ---------------------------------------------------------------------------
# Distribution drift between a reference and a current time window
# ---------------------------------------------------------------------------


def _bin_expr(value_col: str, bin_width: float, n_bins: int) -> str:
    """Fixed-width value bin, clamped into [0, n_bins-1]; NULL value ->
    NULL bin. The IS NULL guard is load-bearing: LEAST/GREATEST *skip*
    NULLs on both engines, so without it FLOOR(NULL/w) -> NULL would be
    silently clamped into the TOP bin — a NULL regression upstream would
    masquerade as a value explosion. NULL-binned rows are surfaced as
    the explicit null_ref/null_cur slice instead. Shared SQL text:
    FLOOR of a correctly-rounded division, identical on both engines."""
    return (
        f"CASE WHEN {value_col} IS NULL THEN NULL ELSE "
        f"CAST(GREATEST(LEAST(FLOOR(CAST({value_col} AS DOUBLE) / {bin_width!r}), "
        f"{n_bins - 1}), 0) AS INT) END"
    )


def _drift_exprs(n_bins: int) -> dict[str, str]:
    """Post-aggregation drift statistics over pivoted per-bin counts
    r0..r{n-1} (reference window) and c0..c{n-1} (current window), with
    totals n_ref / n_cur. All in ONE fixed expression order.

    - ``tv_distance``: total-variation distance, 0.5 * sum_i |p_cur_i -
      p_ref_i| with the sum written as a left-associated chain;
    - ``max_bin_shift`` / ``worst_bin``: largest single-bin proportion
      shift and the smallest bin index attaining it (first-match CASE).
    NULL when either window is empty (guarded identically both sides).
    """
    diffs = [
        f"(CAST(c{i} AS DOUBLE) / CAST(n_cur AS DOUBLE) - "
        f"CAST(r{i} AS DOUBLE) / CAST(n_ref AS DOUBLE))"
        for i in range(n_bins)
    ]
    abs_diffs = [f"ABS({d})" for d in diffs]
    guard = "n_ref = 0 OR n_cur = 0"
    tv = " + ".join(abs_diffs)
    mx = f"GREATEST({', '.join(abs_diffs)})"
    worst = " ".join(
        f"WHEN {a} = _mx THEN {i}" for i, a in enumerate(abs_diffs)
    )
    return {
        "tv_distance": f"CASE WHEN {guard} THEN NULL ELSE 0.5 * ({tv}) END",
        "max_bin_shift": f"CASE WHEN {guard} THEN NULL ELSE {mx} END",
        # _mx is the max_bin_shift value; bound by the caller via a CTE /
        # intermediate projection so both engines compare the SAME double.
        "worst_bin": f"CASE WHEN {guard} THEN NULL ELSE CASE {worst} END END",
    }


def feature_drift(
    df: DataFrame,
    by: str,
    ts: str,
    value_col: str,
    cut_ts: str,
    bin_width: float,
    n_bins: int,
    bin_sql: str | None = None,
) -> DataFrame:
    """Per-group distribution drift of ``value_col`` between the reference
    window (ts < cut_ts) and the current window (ts >= cut_ts).

    Output per group: binned-row totals, the NULL-value slice
    (null_ref/null_cur — rows in the window whose value/category is
    NULL, counted separately so TV stays a true distribution distance
    over observed values AND a null-rate regression is visible), per-bin
    counts for both windows (the auditable histogram itself),
    total-variation distance, the largest per-bin proportion shift, and
    the bin where it happens. Rows with a NULL timestamp are excluded
    from both windows (documented, applied identically in the oracle).

    ``bin_sql`` overrides the fixed-width numeric binning with an
    arbitrary Spark-SQL expression yielding an INT in [0, n_bins) —
    the CATEGORICAL drift path (hash-bucketed category, no category
    dictionary needed; see q_categorical_drift). md5-derived hashes
    need dialect-specific text, so the oracle takes its own override.
    """
    b = F.expr(bin_sql if bin_sql else _bin_expr(value_col, bin_width, n_bins))
    cur = F.col(ts).isNotNull() & (F.col(ts) >= F.expr(f"TIMESTAMP '{cut_ts}'"))
    ref = F.col(ts).isNotNull() & (F.col(ts) < F.expr(f"TIMESTAMP '{cut_ts}'"))
    d = df.select(F.col(by), b.alias("_b"), cur.alias("_cur"), ref.alias("_ref"))
    binned = F.col("_b").isNotNull()
    aggs = [
        F.sum(F.when(F.col("_ref") & binned, 1).otherwise(0))
        .cast("long").alias("n_ref"),
        F.sum(F.when(F.col("_cur") & binned, 1).otherwise(0))
        .cast("long").alias("n_cur"),
        F.sum(F.when(F.col("_ref") & ~binned, 1).otherwise(0))
        .cast("long").alias("null_ref"),
        F.sum(F.when(F.col("_cur") & ~binned, 1).otherwise(0))
        .cast("long").alias("null_cur"),
    ]
    for i in range(n_bins):
        aggs.append(
            F.sum(F.when(F.col("_ref") & (F.col("_b") == i), 1).otherwise(0))
            .cast("long")
            .alias(f"r{i}")
        )
        aggs.append(
            F.sum(F.when(F.col("_cur") & (F.col("_b") == i), 1).otherwise(0))
            .cast("long")
            .alias(f"c{i}")
        )
    g = d.groupBy(by).agg(*aggs)
    ex = _drift_exprs(n_bins)
    g = g.withColumn("tv_distance", F.expr(ex["tv_distance"])).withColumn(
        "_mx", F.expr(ex["max_bin_shift"])
    )
    g = g.withColumn("max_bin_shift", F.col("_mx")).withColumn(
        "worst_bin", F.expr(ex["worst_bin"]).cast("int")
    )
    keep = (
        [by, "n_ref", "n_cur", "null_ref", "null_cur"]
        + [f"r{i}" for i in range(n_bins)]
        + [f"c{i}" for i in range(n_bins)]
        + ["tv_distance", "max_bin_shift", "worst_bin"]
    )
    return g.select(*keep)


def reference_histogram(
    df: DataFrame,
    by: str,
    value_col: str,
    bin_width: float,
    n_bins: int,
) -> DataFrame:
    """Per-group fixed-bin histogram of the TRAINING window — the static
    side a serving-time drift monitor compares against
    (streaming.streams.streaming_drift joins it broadcast into the live
    stream). Columns: by, n_ref (binned rows), null_ref (NULL-value
    rows, kept out of the proportions), r0..r{n-1} — the layout
    ``_drift_exprs`` consumes."""
    b = F.expr(_bin_expr(value_col, bin_width, n_bins))
    d = df.select(F.col(by), b.alias("_b"))
    aggs = [
        F.sum(F.when(F.col("_b").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_ref"),
        F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0))
        .cast("long").alias("null_ref"),
    ] + [
        F.sum(F.when(F.col("_b") == i, 1).otherwise(0))
        .cast("long")
        .alias(f"r{i}")
        for i in range(n_bins)
    ]
    return d.groupBy(by).agg(*aggs)


def drift_against_reference(
    df: DataFrame,
    reference: DataFrame,
    by: str,
    ts: str,
    value_col: str,
    bin_width: float,
    n_bins: int,
    window: str | None = None,
) -> DataFrame:
    """Drift of ``df`` (the current/serving window) against a static
    ``reference_histogram``. Works IDENTICALLY on a batch frame and on a
    readStream frame (streams.streaming_drift adds the watermark): the
    broadcast join runs BEFORE the aggregation — row-wise and stateless,
    the shape Structured Streaming permits (joins after a streaming
    aggregation are unsupported) — and the reference counters ride
    through the aggregation as MIN (constant per group, so MIN is
    deterministic and order-independent).

    With ``window`` (e.g. "1 day"), drift is computed per (event-time
    window, group) — the serving-monitor cadence; without it, one row
    per group over the whole input (matches feature_drift's current
    window when df IS the post-cut slice).

    The reference join is LEFT so a group ABSENT from the training
    window still emits a row (n_ref=0 -> NULL stats but live counts) —
    a brand-new category in serving traffic is exactly what a drift
    monitor must flag, not silently drop.
    """
    b = F.expr(_bin_expr(value_col, bin_width, n_bins))
    d = df.filter(F.col(ts).isNotNull()).select(
        F.col(by), F.col(ts), b.alias("_b")
    )
    d = d.join(F.broadcast(reference), on=by, how="left")
    keys = ([F.window(F.col(ts), window).alias("win")] if window else []) + [
        F.col(by)
    ]
    binned = F.col("_b").isNotNull()
    aggs = (
        [
            F.sum(F.when(binned, 1).otherwise(0)).cast("long").alias("n_cur"),
            F.sum(F.when(~binned, 1).otherwise(0)).cast("long").alias("null_cur"),
        ]
        + [
            F.sum(F.when(F.col("_b") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"c{i}")
            for i in range(n_bins)
        ]
        + [
            F.coalesce(F.min("n_ref"), F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce(F.min("null_ref"), F.lit(0)).cast("long").alias("null_ref"),
        ]
        + [
            F.coalesce(F.min(f"r{i}"), F.lit(0)).cast("long").alias(f"r{i}")
            for i in range(n_bins)
        ]
    )
    g = d.groupBy(*keys).agg(*aggs)
    ex = _drift_exprs(n_bins)
    g = g.withColumn("tv_distance", F.expr(ex["tv_distance"])).withColumn(
        "_mx", F.expr(ex["max_bin_shift"])
    )
    g = g.withColumn("max_bin_shift", F.col("_mx")).withColumn(
        "worst_bin", F.expr(ex["worst_bin"]).cast("int")
    )
    head = (
        [F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end")]
        if window
        else []
    )
    return g.select(
        *head,
        by,
        "n_ref",
        "n_cur",
        "null_ref",
        "null_cur",
        "tv_distance",
        "max_bin_shift",
        "worst_bin",
    )


def drift_oracle_sql(
    table: str,
    by: str,
    ts: str,
    value_col: str,
    cut_ts: str,
    bin_width: float,
    n_bins: int,
    bin_sql: str | None = None,
) -> str:
    """DuckDB oracle generated from the SAME fragment builders as the
    Spark operator (``_bin_expr`` / ``_drift_exprs``), so the expression
    trees are identical by construction. ``bin_sql``: DuckDB-dialect bin
    override for the categorical path (md5 bucketing spells differently
    per dialect; the VALUES are bit-equal by the package's md5_long
    parity contract)."""
    binned = (
        f"SELECT {by}, {bin_sql if bin_sql else _bin_expr(value_col, bin_width, n_bins)} AS _b, "
        f"({ts} IS NOT NULL AND {ts} >= TIMESTAMP '{cut_ts}') AS _cur, "
        f"({ts} IS NOT NULL AND {ts} < TIMESTAMP '{cut_ts}') AS _ref "
        f"FROM {table}"
    )
    cnt_cols = [
        "CAST(SUM(CASE WHEN _ref AND _b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ref",
        "CAST(SUM(CASE WHEN _cur AND _b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cur",
        "CAST(SUM(CASE WHEN _ref AND _b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ref",
        "CAST(SUM(CASE WHEN _cur AND _b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cur",
    ]
    for i in range(n_bins):
        cnt_cols.append(
            f"CAST(SUM(CASE WHEN _ref AND _b = {i} THEN 1 ELSE 0 END) AS BIGINT) AS r{i}"
        )
        cnt_cols.append(
            f"CAST(SUM(CASE WHEN _cur AND _b = {i} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        )
    ex = _drift_exprs(n_bins)
    keep = (
        [by, "n_ref", "n_cur", "null_ref", "null_cur"]
        + [f"r{i}" for i in range(n_bins)]
        + [f"c{i}" for i in range(n_bins)]
    )
    return f"""
    WITH binned AS ({binned}),
    counts AS (SELECT {by}, {", ".join(cnt_cols)} FROM binned GROUP BY {by}),
    stats AS (SELECT *, {ex["tv_distance"]} AS tv_distance,
                     {ex["max_bin_shift"]} AS _mx FROM counts)
    SELECT {", ".join(keep)}, tv_distance, _mx AS max_bin_shift,
           CAST({ex["worst_bin"]} AS INT) AS worst_bin
    FROM stats
    """


def windowed_drift_oracle_sql(
    table: str,
    by: str,
    ts: str,
    value_col: str,
    cut_ts: str,
    bin_width: float,
    n_bins: int,
    window_sec: int,
) -> str:
    """DuckDB oracle for drift_against_reference(window=...): reference
    from ts < cut, current per epoch-aligned tumbling window from
    ts >= cut, same fragment builders, windows as epoch BIGINTs (Spark
    side casts win.start to long — identical epoch alignment)."""
    bexpr = _bin_expr(value_col, bin_width, n_bins)
    r_cols = ", ".join(
        ["CAST(SUM(CASE WHEN _b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ref",
         "CAST(SUM(CASE WHEN _b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ref"]
        + [
            f"CAST(SUM(CASE WHEN _b = {i} THEN 1 ELSE 0 END) AS BIGINT) AS r{i}"
            for i in range(n_bins)
        ]
    )
    c_cols = ", ".join(
        ["CAST(SUM(CASE WHEN _b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cur",
         "CAST(SUM(CASE WHEN _b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cur"]
        + [
            f"CAST(SUM(CASE WHEN _b = {i} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
            for i in range(n_bins)
        ]
    )
    ex = _drift_exprs(n_bins)
    return f"""
    WITH ref AS (
      SELECT {by}, {r_cols}
      FROM (SELECT {by}, {bexpr} AS _b FROM {table}
            WHERE {ts} < TIMESTAMP '{cut_ts}')
      GROUP BY {by}
    ),
    cur AS (
      SELECT win_start_epoch, {by}, {c_cols}
      FROM (SELECT CAST(FLOOR(epoch({ts}) / {window_sec}) * {window_sec} AS BIGINT)
                     AS win_start_epoch,
                   {by}, {bexpr} AS _b
            FROM {table} WHERE {ts} >= TIMESTAMP '{cut_ts}')
      GROUP BY win_start_epoch, {by}
    ),
    stats AS (
      SELECT cur.*,
             COALESCE(ref.n_ref, 0) AS n_ref,
             COALESCE(ref.null_ref, 0) AS null_ref,
             {", ".join(f"COALESCE(ref.r{i}, 0) AS r{i}" for i in range(n_bins))},
             {ex["tv_distance"]} AS tv_distance,
             {ex["max_bin_shift"]} AS _mx
      FROM cur LEFT JOIN ref USING ({by})
    )
    SELECT win_start_epoch, {by}, n_ref, n_cur, null_ref, null_cur,
           tv_distance, _mx AS max_bin_shift,
           CAST({ex["worst_bin"]} AS INT) AS worst_bin
    FROM stats
    """


# ---------------------------------------------------------------------------
# Rolling-origin backtest folds (expanding-window K-fold)
# ---------------------------------------------------------------------------


def fold_bounds(
    origin: str, step_days: int, n_folds: int
) -> list[tuple[int, datetime, datetime]]:
    """(fold, train_end, valid_end) per fold: fold k trains on
    [−inf, origin + k*step) and validates on the next step — the
    rolling-origin evaluation scheme (train always strictly precedes
    valid, so leakage is impossible by construction)."""
    o = datetime.fromisoformat(origin)
    out = []
    for k in range(1, n_folds + 1):
        t_end = o + timedelta(days=step_days * k)
        out.append((k, t_end, t_end + timedelta(days=step_days)))
    return out


def backtest_folds(
    df: DataFrame,
    ts: str,
    by: str,
    value_col: str,
    user_col: str,
    origin: str,
    step_days: int,
    n_folds: int,
) -> DataFrame:
    """Rolling-origin backtest summary: every event is labeled
    (fold, role) for each of the K expanding-window folds, then
    summarized per (fold, role, group): row count, distinct users,
    exact value cents (DECIMAL sum — order-independent), and the
    role's time extent (audit columns: per fold,
    max train ts < min valid ts proves zero temporal leakage).

    The fold table is K rows — broadcast; rows later than fold K's
    valid window are dropped for that fold (role IS NULL)."""
    spark = df.sparkSession
    folds = spark.createDataFrame(
        fold_bounds(origin, step_days, n_folds),
        "fold long, train_end timestamp, valid_end timestamp",
    )
    lab = df.select(
        F.col(ts).alias("_ts"),
        F.col(by),
        F.col(user_col).alias("_user"),
        F.expr(cents_sql(value_col)).alias("_cents"),
    ).crossJoin(F.broadcast(folds))
    lab = lab.withColumn(
        "role",
        F.expr(
            "CASE WHEN _ts < train_end THEN 'train' "
            "WHEN _ts < valid_end THEN 'valid' END"
        ),
    ).filter(F.col("role").isNotNull() & F.col("_ts").isNotNull())
    return lab.groupBy("fold", "role", by).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("_user").alias("n_users"),
        F.sum("_cents").alias("sum_cents"),
        F.min("_ts").alias("min_ts"),
        F.max("_ts").alias("max_ts"),
    )


def backtest_oracle_sql(
    table: str,
    ts: str,
    by: str,
    value_col: str,
    user_col: str,
    origin: str,
    step_days: int,
    n_folds: int,
) -> str:
    """DuckDB oracle: the fold table rendered as VALUES literals from the
    SAME ``fold_bounds`` the Spark operator broadcasts."""
    rows = ", ".join(
        f"({k}, TIMESTAMP '{t:%Y-%m-%d %H:%M:%S}', TIMESTAMP '{v:%Y-%m-%d %H:%M:%S}')"
        for k, t, v in fold_bounds(origin, step_days, n_folds)
    )
    return f"""
    WITH folds(fold, train_end, valid_end) AS (VALUES {rows}),
    lab AS (
      SELECT e.{ts} AS _ts, e.{by}, e.{user_col} AS _user,
             {cents_sql(f"e.{value_col}")} AS _cents,
             f.fold,
             CASE WHEN e.{ts} < f.train_end THEN 'train'
                  WHEN e.{ts} < f.valid_end THEN 'valid' END AS role
      FROM {table} e CROSS JOIN folds f
      WHERE e.{ts} IS NOT NULL
    )
    SELECT CAST(fold AS BIGINT) AS fold, role, {by},
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT _user) AS BIGINT) AS n_users,
           CAST(SUM(_cents) AS BIGINT) AS sum_cents,
           MIN(_ts) AS min_ts, MAX(_ts) AS max_ts
    FROM lab WHERE role IS NOT NULL
    GROUP BY fold, role, {by}
    """
