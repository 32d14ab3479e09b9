"""Physical-plan regression pins for EVERY Window-building operator.

Round 4's audit found the same latent defect in five operators: chained
``withColumn`` interleaves Projects that defeat CollapseWindow, silently
multiplying Window operators — each extra Window is a full extra buffer
pass per partition (measured 3-4x where the docs claimed one). The
encoder family got a plan pin that round; this extends it to every
operator that builds a Window, so the trap cannot be re-introduced
anywhere (VERDICT r4 next-round #3).

Counts pinned here are the AUDITED structural minima, not whatever the
code happened to produce: 1 Window for independent window expressions
over one spec; 2 for genuinely nested dependencies (sessionize's
cumulative sum consumes lag's output — two passes over ONE exchange+sort
is the floor; mode_label's rank consumes the count aggregate). Exchange
counts are pinned exactly as audited (PLANS.md documents each shape).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from image_feature_extraction_spark.operators import asof as AS
from image_feature_extraction_spark.operators import encode as EN
from image_feature_extraction_spark.operators import labels as LB
from image_feature_extraction_spark.operators import sequences as SQ
from image_feature_extraction_spark.operators import windows as W
from image_feature_extraction_spark.operators.curation import (
    temporal_holdout as _temporal_holdout,
)
from image_feature_extraction_spark.operators.quantiles import (
    exact_quantile_values,
)
from image_feature_extraction_spark.plans.audit import plan_counts


def _counts(out) -> tuple[int, int]:
    # shared regexes with scripts/plan_audit.py (plans/audit.py) so the
    # pins and the committed artifact can never count different operator
    # sets. BroadcastExchange deliberately NOT counted here: broadcasts
    # are the cheap path; this pin is about shuffles and window passes.
    c = plan_counts(out)
    return (c["win"], c["exch"])


def _events(spark):
    rows = [
        (i, i % 3, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=30 * i),
         float(i % 7))
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "id long, ent long, ts timestamp, value double"
    )


# name -> (builder(spark), expected Window count, expected Exchange count,
#          why that count is the floor)
CASES = {
    "lag_lead": (
        lambda s: W.lag_lead(_events(s), by="ent", order="ts", value="value"),
        1, 1, "4 expressions, one spec",
    ),
    "backfill_multi_col": (
        lambda s: W.backfill(
            _events(s), by="ent", order="ts", cols=["value", "id"]
        ),
        1, 1, "per-column last() shares one spec",
    ),
    "sessionize": (
        lambda s: W.sessionize(_events(s), by="ent", ts="ts", gap=60.0),
        2, 1, "cumsum consumes lag output: nested, 2 passes / 1 exchange",
    ),
    "session_stats": (
        lambda s: W.session_stats(_events(s), by="ent", ts="ts", gap=60.0),
        2, 1, "sessionize plans + partial-agg before its exchange",
    ),
    "nearest_event_distance": (
        lambda s: W.nearest_event_distance(
            _events(s), by="ent", ts="ts", marker=F.col("value") > 5
        ),
        1, 1, "backward+forward frames collapse into one operator",
    ),
    "moving_aggregate": (
        lambda s: W.moving_aggregate(
            _events(s), by="ent", ts="ts", value="value", width=60.0
        ),
        1, 1, "count+sum share one RANGE frame; mean reuses columns",
    ),
    "expanding_zscore": (
        lambda s: EN.expanding_zscore(
            _events(s), by="ent", ts="ts", value="value"
        ),
        1, 1, "incl/peer frames in one projection",
    ),
    "expanding_robust_stats": (
        lambda s: EN.expanding_robust_stats(
            _events(s), by="ent", ts="ts", value="value", id_col="id"
        ),
        1, 1, "3 percentiles + count share one frame",
    ),
    "bucketed_robust_stats": (
        lambda s: EN.bucketed_robust_stats(
            _events(s), by="ent", ts="ts", value="value", bucket_seconds=10.0
        ),
        1, 1, "bucket-frozen RANGE frame",
    ),
    "frequency_encode": (
        lambda s: EN.frequency_encode(_events(s), by="ent", ts="ts"),
        1, 1, "one strict-precedence count",
    ),
    "target_encode": (
        lambda s: EN.target_encode(
            _events(s).withColumnRenamed("id", "event_id"),
            by="ent", ts="ts", label="value",
        ),
        1, 4, "bucket partials agg + window over buckets + join back "
              "(exchanges carry per-bucket partials, never the corpus)",
    ),
    "decayed_features": (
        lambda s: EN.decayed_features(
            _events(s), by="ent", ts="ts", value="value", bucket_seconds=10.0
        ),
        1, 5, "within-bucket window + bucket-aggregate carry join",
    ),
    "winsorize": (
        lambda s: EN.winsorize(_events(s), by="ent", value="value"),
        0, 1, "groupBy percentile + broadcast join back: NO window",
    ),
    "pack_sequences": (
        lambda s: SQ.pack_sequences(
            s.createDataFrame(
                [(i, f"s{i % 2}", 10 + i) for i in range(20)],
                "doc_id long, source string, n_tok long",
            ),
            capacity=64,
        ),
        1, 1, "one running-sum exchange on the group key",
    ),
    "asof_join_window": (
        lambda s: AS.asof_join_window(
            _events(s),
            _events(s).withColumnRenamed("value", "rv").drop("id"),
            on="ts", by="ent",
        ),
        1, 1, "union + last(ignorenulls): one shuffle, one window",
    ),
    "mode_label": (
        lambda s: LB.mode_label(
            s.createDataFrame(
                [(i % 5, f"L{i % 3}") for i in range(30)],
                "grp long, label string",
            ),
            by="grp", label_col="label",
        ),
        2, 2, "rank consumes the count aggregate: nested by definition",
    ),
    "exact_quantile_values": (
        lambda s: exact_quantile_values(_events(s), "value", "ent", 4),
        1, 1, "row_number + full-frame count share one operator",
    ),
    "asof_join_bucketed": (
        lambda s: AS.asof_join(
            _events(s),
            _events(s).withColumnRenamed("value", "rv").drop("id"),
            on="ts", by="ent", bucket_width=120.0,
        ),
        2, 4, "main merge window + bucket-granularity carry window; "
              "2 row-scale exchanges + 2 bucket-aggregate partials "
              "(PLANS.md bucketed-as-of section)",
    ),
    "gaussian_time_smooth": (
        lambda s: W.gaussian_time_smooth(
            _events(s), by="ent", ts="ts", value="value", sigma=30.0
        ),
        0, 3, "banded self-join + aggregation: NO window (explode + "
              "equi-join + groupBy)",
    ),
    "temporal_holdout": (
        lambda s: _temporal_holdout(
            _events(s), by="ent", ts="ts", id_col="id"
        ),
        1, 1, "ROW_NUMBER + COUNT share the ordered spec "
              "(full-partition ROWS frame trick)",
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_windowed_operator_plan_pinned(spark, name):
    build, want_win, want_ex, why = CASES[name]
    got_win, got_ex = _counts(build(spark))
    assert got_win == want_win, (
        f"{name}: {got_win} Window operators, audited floor is {want_win} "
        f"({why}) — a chained-withColumn Project between Windows defeats "
        f"CollapseWindow and multiplies buffer passes"
    )
    assert got_ex == want_ex, (
        f"{name}: {got_ex} Exchanges, audited shape has {want_ex} ({why})"
    )
