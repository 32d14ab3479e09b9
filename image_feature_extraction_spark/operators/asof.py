"""Point-in-time (as-of) join — the engine's core custom operator.

Re-expresses the reference's coordinate-based resampling
(/root/reference/tools/Resample.cxx:83-99, ExtractWindow.cxx:143-150 — for
each target coordinate take the nearest/preceding source sample) as a
distributed as-of join: for each left row (entity, t) attach the right row
with the greatest right.ts <= t (backward; forward/nearest variants mirror).
Zero temporal leakage: a matched right timestamp NEVER exceeds the left
timestamp in backward mode.

Two physical strategies:

1. ``asof_join`` — salted/range-bucketed sort-merge (the 100 TB path).
   Both sides are bucketed on (entity, floor(ts/W)). Per (entity, bucket)
   the latest right row is computed with one small aggregation, and a
   bucket-level window (rows = #buckets, not #events) carries the latest
   earlier right row into each left bucket ("boundary replication").
   Left and augmented-right are then cogrouped per (entity, bucket) and
   merged with a vectorized sorted merge (pandas.merge_asof) inside an
   Arrow-batched applyInPandas. Task size is bounded by the bucket width —
   a hot entity's year of history splits into many independent tasks, so
   no single task sees the whole entity (the skew story AQE alone cannot
   give a window operator).

2. ``asof_join_window`` — union + last(ignorenulls) window. One shuffle,
   no Python, fully whole-stage-codegen — optimal when no entity's history
   overwhelms one task. Used as a cross-check in tests.

DuckDB's native ASOF JOIN is the correctness oracle for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _as_list(x):
    return [x] if isinstance(x, str) else list(x)


def _ts_double(df: DataFrame, on: str):
    """Any orderable time column -> double (epoch seconds for timestamps).
    TIMESTAMP_NTZ has no direct double cast in Spark 4; route via timestamp
    (session timezone is pinned to UTC in session.py, so this is stable)."""
    from pyspark.sql.types import TimestampNTZType

    c = F.col(on)
    if isinstance(df.schema[on].dataType, TimestampNTZType):
        c = c.cast("timestamp")
    return c.cast("double")


def _prep(df: DataFrame, on: str, width: float):
    d = df.withColumn("_ts_d", _ts_double(df, on))
    return d.withColumn("_b", F.floor(F.col("_ts_d") / F.lit(float(width))).cast("long"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by="entity_id",
    right_cols=None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_right",
    bucket_width: float = 86400.0,
    include_right_on: bool = False,
) -> DataFrame:
    """Bucketed sort-merge as-of join. See module docstring.

    bucket_width is in the units of ``cast(on AS double)`` (seconds for
    timestamps). Choose it so one entity-bucket of events fits a task
    comfortably; at 10^12 rows with hourly hot-entity bursts, one day is a
    sane default.
    """
    assert direction in ("backward", "forward", "nearest")
    by_l = _as_list(by)
    rcols = _as_list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in set(by_l) | {on}
    ]
    out_rnames = [c + suffix if c in left.columns else c for c in rcols]
    right_on_out = f"{on}{suffix}" if include_right_on else None

    # Rename every right-side column to a fresh name BEFORE the cogroup.
    # When left and right share lineage (e.g. two filters of one scan), their
    # plans carry identical attribute ids; the cogroup plan dedups those and
    # silently drops the right side's duplicates. A renaming Alias mints new
    # attribute ids that the optimizer cannot strip.
    P = "_ra_"
    r_by = [P + c for c in by_l]
    r_on = P + on
    r_rcols = [P + c for c in rcols]
    right2 = right.select(
        *[F.col(c).alias(P + c) for c in [*by_l, on, *rcols]]
    )

    lf = _prep(left, on, bucket_width)
    rf = _prep(right2, r_on, bucket_width)

    # ---- boundary replication at bucket granularity ----
    payload = F.struct(
        F.col("_ts_d").alias("_p_ts"),
        F.col(r_on).alias("_p_on"),
        *[F.col(c).alias(c) for c in r_rcols],
    )
    rlast = rf.groupBy(*r_by, "_b").agg(F.max(payload).alias("_p"))
    rfirst = rf.groupBy(*r_by, "_b").agg(F.min(payload).alias("_p"))
    lmark = lf.select(
        *[F.col(c).alias(rb) for c, rb in zip(by_l, r_by)], "_b"
    ).distinct()

    def _carries(agg_df, forward: bool):
        # Marker ordering controls strictness at the bucket boundary: for
        # backward carries the marker sorts BEFORE same-bucket right rows
        # (carry = latest right row in buckets < b); for forward carries it
        # sorts AFTER them (carry = earliest right row in buckets > b).
        # Same-bucket right rows are already in the cogroup.
        marker_tag = 2 if forward else 0
        u = agg_df.select(*r_by, "_b", F.lit(1).alias("_tag"), "_p").unionByName(
            lmark.select(*r_by, "_b", F.lit(marker_tag).alias("_tag"), F.lit(None).cast(
                agg_df.schema["_p"].dataType
            ).alias("_p"))
        )
        w = Window.partitionBy(*r_by).orderBy("_b", "_tag")
        if forward:
            wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            carry = F.first("_p", ignorenulls=True).over(wf)
        else:
            wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            carry = F.last("_p", ignorenulls=True).over(wb)
        c = (
            u.withColumn("_c", carry)
            .where((F.col("_tag") == marker_tag) & F.col("_c").isNotNull())
            .select(
                *r_by,
                "_b",
                F.col("_c._p_ts").alias("_ts_d"),
                F.col("_c._p_on").alias(r_on),
                *[F.col(f"_c.{c2}").alias(c2) for c2 in r_rcols],
            )
        )
        return c

    aug = rf.select(*r_by, "_b", "_ts_d", F.col(r_on), *r_rcols)
    if direction in ("backward", "nearest"):
        aug = aug.unionByName(_carries(rlast, forward=False))
    if direction in ("forward", "nearest"):
        aug = aug.unionByName(_carries(rfirst, forward=True))

    # ---- cogrouped vectorized sorted merge ----
    out_fields = list(left.schema.fields)
    rschema = {f.name: f for f in right.schema.fields}
    for c, oc in zip(rcols, out_rnames):
        out_fields.append(StructField(oc, rschema[c].dataType, True))
    if right_on_out:
        out_fields.append(StructField(right_on_out, rschema[on].dataType, True))
    out_schema = StructType(out_fields)
    left_cols = [f.name for f in left.schema.fields]
    want_right_ts = right_on_out is not None

    import pandas as pd

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values("_ts_d", kind="stable")
        if rpdf.empty:
            out = lpdf[left_cols].copy()
            for oc in out_rnames:
                out[oc] = None
            if want_right_ts:
                out[right_on_out] = pd.NaT if "datetime" in str(lpdf[on].dtype) else None
            return out
        rp = rpdf.sort_values(["_ts_d"] + r_rcols, kind="stable").drop_duplicates()
        rsel = rp[["_ts_d", r_on] + r_rcols].rename(
            columns=dict(zip([r_on] + r_rcols, ["_r_on"] + out_rnames))
        )
        merged = pd.merge_asof(
            lpdf,
            rsel,
            on="_ts_d",
            direction=direction,
            tolerance=tolerance,
            allow_exact_matches=True,
        )
        out = merged[left_cols + out_rnames].copy()
        if want_right_ts:
            out[right_on_out] = merged["_r_on"]
        return out

    joined = (
        lf.groupBy(*by_l, "_b")
        .cogroup(aug.groupBy(*r_by, "_b"))
        .applyInPandas(lambda l, r: merge(l, r), out_schema)
    )
    return joined


def asof_join_window(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by="entity_id",
    right_cols=None,
    tolerance: float | None = None,
    suffix: str = "_right",
    include_right_on: bool = False,
) -> DataFrame:
    """Backward as-of join via union + last(ignorenulls) window — one
    shuffle, no Python. At equal timestamps the right row sorts first, so
    matches are inclusive (right.ts <= left.ts), identical to DuckDB
    ASOF JOIN semantics."""
    by_l = _as_list(by)
    rcols = _as_list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in set(by_l) | {on}
    ]
    out_rnames = [c + suffix if c in left.columns else c for c in rcols]
    right_on_out = f"{on}{suffix}" if include_right_on else None

    lkeep = [c for c in left.columns if c not in set(by_l) | {on}]
    l2 = left.select(
        *by_l,
        F.col(on),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in lkeep],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
        F.lit(None).cast(right.schema[on].dataType).alias("_r_on"),
    )
    r2 = right.select(
        *by_l,
        F.col(on),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lkeep],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
        F.col(on).alias("_r_on"),
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(*by_l)
        .orderBy(on, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *by_l,
        F.col(on),
        "_tag",
        *lkeep,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in rcols
        ],
        F.last("_r_on", ignorenulls=True).over(w).alias("_f_on"),
    ).where(F.col("_tag") == 1)

    if tolerance is not None:
        from pyspark.sql.types import TimestampNTZType

        lc, rc = F.col(on), F.col("_f_on")
        if isinstance(left.schema[on].dataType, TimestampNTZType):
            lc = lc.cast("timestamp")
        if isinstance(right.schema[on].dataType, TimestampNTZType):
            rc = rc.cast("timestamp")
        within = (lc.cast("double") - rc.cast("double")) <= F.lit(float(tolerance))
        filled = filled.select(
            *by_l,
            F.col(on),
            *lkeep,
            *[
                F.when(within, F.col(f"_f_{c}")).alias(f"_f_{c}")
                for c in rcols
            ],
            F.when(within, F.col("_f_on")).alias("_f_on"),
        )

    sel = [F.col(c) for c in left.columns] + [
        F.col(f"_f_{c}").alias(oc) for c, oc in zip(rcols, out_rnames)
    ]
    if right_on_out:
        sel.append(F.col("_f_on").alias(right_on_out))
    return filled.select(*sel)
