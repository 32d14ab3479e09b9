"""Degenerate-input battery: empty frames, single rows, empty right sides,
docs with fewer words than the shingle width."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from image_feature_extraction_spark import synth
from image_feature_extraction_spark.functions import kernels as K
from image_feature_extraction_spark.operators import dedup as D
from image_feature_extraction_spark.operators import text as T
from image_feature_extraction_spark.operators.asof import (
    asof_join,
    asof_join_broadcast,
    asof_join_window,
)
from image_feature_extraction_spark.operators.features import extract_features
from image_feature_extraction_spark.operators.windows import sessionize


def test_features_empty_and_single(spark):
    empty = synth.token_table(spark, 0)
    assert extract_features(empty, scales=(1.0,)).count() == 0
    one = extract_features(synth.token_table(spark, 1), scales=(1.0,)).collect()
    assert len(one) == 1 and len(one[0]["features"]) == K.NUM_FEATURES * 5


def test_asof_empty_right_all_strategies(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"entity_id": [1, 2], "ts": [10, 20], "lv": [1.0, 2.0]})
    )
    right = spark.createDataFrame(
        [], "entity_id long, ts long, rv double"
    )
    for fn, kw in (
        (asof_join, {"bucket_width": 100.0}),
        (asof_join_window, {}),
        (asof_join_broadcast, {}),
    ):
        out = fn(left, right, on="ts", by="entity_id", **kw).toPandas()
        assert len(out) == 2
        assert out["rv"].isna().all()


def test_asof_single_rows(spark):
    left = spark.createDataFrame(pd.DataFrame({"entity_id": [1], "ts": [10], "lv": [1.0]}))
    right = spark.createDataFrame(pd.DataFrame({"entity_id": [1], "ts": [10], "rv": [9.0]}))
    for fn, kw in (
        (asof_join, {"bucket_width": 100.0}),
        (asof_join_window, {}),
        (asof_join_broadcast, {}),
    ):
        out = fn(left, right, on="ts", by="entity_id", **kw).toPandas()
        assert out["rv"].tolist() == [9.0]  # inclusive equal-ts match


def test_shingles_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "a"), (3, ""), (4, "x y z")],
        "doc_id long, text string",
    )
    sh = D.shingles(docs, n=3).toPandas()
    assert set(sh["doc_id"]) == {4}  # only the 3-word doc has a trigram
    sig = D.minhash_signatures(docs, n=3).toPandas()
    assert set(sig["doc_id"]) == {4}


def test_text_ops_on_empty_text(spark):
    docs = spark.createDataFrame([(1, ""), (2, "  ")], "doc_id long, text string")
    ts = T.token_stats(docs).toPandas()
    # whitespace-split of "" yields one empty token in both engines; the
    # contract is no crash and consistent counts
    assert len(ts) == 2
    lid = T.langid(docs).toPandas()
    assert (lid["predicted_lang"] == "und").all()


def test_sessionize_single_event(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["u"], "t": [5.0]}))
    out = sessionize(df, by="k", ts="t", gap=10).toPandas()
    assert out["session_id"].tolist() == [1]


def test_kernel_min_tokens():
    v = K.doc_feature_vector(np.array([7], dtype=np.int32), scales=(1.0,))
    assert len(v) == K.NUM_FEATURES * 5
    assert np.isfinite(v).all()


def test_asof_round2_strategies_empty_and_single(spark):
    from image_feature_extraction_spark.operators.asof import (
        asof_join_auto,
        asof_join_cogroup,
    )

    left = spark.createDataFrame(
        pd.DataFrame({"entity_id": [1, 2], "ts": [10, 20], "lv": [1.0, 2.0]})
    )
    empty_right = spark.createDataFrame([], "entity_id long, ts long, rv double")
    for kw in ({}, {"strategy": "cogroup"}):
        out = asof_join_auto(
            left, empty_right, on="ts", by="entity_id", **kw
        ).toPandas()
        assert len(out) == 2 and out["rv"].isna().all()
    # interpolate with a single right row: exact hit returns the sample,
    # everything else is outside the hull
    one = spark.createDataFrame(
        pd.DataFrame({"entity_id": [1], "ts": [10], "rv": [7.5]})
    )
    for fn, kw in (
        (asof_join, {"bucket_width": 100.0}),
        (asof_join_broadcast, {}),
        (asof_join_cogroup, {}),
    ):
        got = {
            (r.entity_id, r.ts): r.rv
            for r in fn(
                left, one, on="ts", by="entity_id", direction="interpolate", **kw
            ).collect()
        }
        assert got[(1, 10)] == 7.5
        assert got[(2, 20)] is None or pd.isna(got[(2, 20)])
    # empty LEFT side comes back empty, schema intact
    empty_left = spark.createDataFrame([], "entity_id long, ts long, lv double")
    out = asof_join_cogroup(empty_left, one, on="ts", by="entity_id")
    assert out.count() == 0 and set(out.columns) == {"entity_id", "ts", "lv", "rv"}


def test_mode_label_empty_and_all_ignored(spark):
    from image_feature_extraction_spark.operators.labels import mode_label

    empty = spark.createDataFrame([], "g string, label string")
    assert mode_label(empty, by="g", label_col="label").count() == 0
    only_ign = spark.createDataFrame(
        [("g1", "bad"), ("g1", "bad")], "g string, label string"
    )
    assert mode_label(only_ign, by="g", label_col="label", ignore=("bad",)).count() == 0


def test_embedding_bucketed_tiny_inputs(spark):
    e0 = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert D.embedding_neardup_pairs_bucketed(e0, dim=4).count() == 0
    e1 = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert D.embedding_neardup_pairs_bucketed(e1, dim=4).count() == 0
    # two identical vectors -> one pair at cosine 1.0
    e2 = spark.createDataFrame(
        [(1, [1.0, 2.0, 0.0, 0.0]), (2, [1.0, 2.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = D.embedding_neardup_pairs_bucketed(e2, threshold=0.9, dim=4).collect()
    assert len(rows) == 1 and rows[0].id_a == 1 and rows[0].cosine == 1.0
