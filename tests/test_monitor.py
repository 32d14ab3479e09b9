"""Tests for feature monitoring (operators/monitor.py: drift, backtest
folds) and corpus relevance scoring (operators/relevance.py: BM25)."""

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from image_feature_extraction_spark.operators import monitor as MO
from image_feature_extraction_spark.operators import relevance as RV

CUT = "2024-06-15 00:00:00"


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def drift_events(spark):
    # group g: ref window values 0,3,15 -> bin counts [2,1,0,0]; cur
    # values 15,25 -> [0,1,1,0]. p_ref=(2/3,1/3,0,0), p_cur=(0,1/2,1/2,0).
    rows = [
        ("g", ts("2024-06-01 00:00:00"), 0.0),
        ("g", ts("2024-06-02 00:00:00"), 3.0),
        ("g", ts("2024-06-03 00:00:00"), 15.0),
        ("g", ts("2024-06-20 00:00:00"), 15.0),
        ("g", ts("2024-06-21 00:00:00"), 25.0),
        ("g", None, 999.0),                      # null ts: excluded
        # group h: everything before the cut -> cur window empty -> NULLs
        ("h", ts("2024-06-01 00:00:00"), 5.0),
        # group c: clamping, value below 0 and above the last bin edge
        ("c", ts("2024-06-01 00:00:00"), -7.0),
        ("c", ts("2024-06-20 00:00:00"), 500.0),
    ]
    return spark.createDataFrame(rows, "g string, ts timestamp, value double")


def test_drift_hand_values(spark, drift_events):
    out = (
        MO.feature_drift(
            drift_events, by="g", ts="ts", value_col="value",
            cut_ts=CUT, bin_width=10.0, n_bins=4,
        )
        .toPandas()
        .set_index("g")
    )
    g = out.loc["g"]
    assert g["n_ref"] == 3 and g["n_cur"] == 2
    assert [g[f"r{i}"] for i in range(4)] == [2, 1, 0, 0]
    assert [g[f"c{i}"] for i in range(4)] == [0, 1, 1, 0]
    # TV = 0.5*(|0-2/3| + |1/2-0| + |1/2-1/3| + 0) = 2/3
    assert g["tv_distance"] == pytest.approx(2 / 3)
    assert g["max_bin_shift"] == pytest.approx(2 / 3)
    assert g["worst_bin"] == 0
    # empty current window -> stats NULL, counts still real
    h = out.loc["h"]
    assert h["n_ref"] == 1 and h["n_cur"] == 0
    assert h[["tv_distance", "max_bin_shift", "worst_bin"]].isna().all()
    # clamped into the end bins
    c = out.loc["c"]
    assert c["r0"] == 1 and c["c3"] == 1
    assert c["tv_distance"] == pytest.approx(1.0)


def test_drift_worst_bin_tie_breaks_low(spark):
    # two bins shift by the same magnitude -> smallest bin index reported
    rows = [
        ("g", ts("2024-06-01 00:00:00"), 0.0),
        ("g", ts("2024-06-20 00:00:00"), 15.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = MO.feature_drift(
        df, by="g", ts="ts", value_col="value",
        cut_ts=CUT, bin_width=10.0, n_bins=4,
    ).collect()[0]
    assert out["max_bin_shift"] == pytest.approx(1.0)
    assert out["worst_bin"] == 0  # |d0| == |d1| == 1; bin 0 wins


# -- backtest folds ----------------------------------------------------------


@pytest.fixture(scope="module")
def bt_events(spark):
    rows = [
        (1, ts("2024-01-02 00:00:00"), "t", 10, 1.00),   # fold1 train
        (2, ts("2024-01-08 00:00:00"), "t", 11, 2.50),   # f1 valid / f2 train
        (3, ts("2024-01-14 00:00:00"), "t", 10, 4.00),   # f2 valid
        (4, ts("2024-01-20 00:00:00"), "t", 12, 8.00),   # beyond both folds
        (5, None, "t", 13, 16.00),                        # null ts dropped
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, et string, user long, value double"
    )


def test_backtest_hand_values(spark, bt_events):
    out = MO.backtest_folds(
        bt_events, ts="ts", by="et", value_col="value", user_col="user",
        origin="2024-01-01 00:00:00", step_days=6, n_folds=2,
    ).toPandas().set_index(["fold", "role"])
    f1t, f1v = out.loc[(1, "train")], out.loc[(1, "valid")]
    f2t, f2v = out.loc[(2, "train")], out.loc[(2, "valid")]
    assert f1t["n_rows"] == 1 and f1t["sum_cents"] == 100
    assert f1v["n_rows"] == 1 and f1v["sum_cents"] == 250
    assert f2t["n_rows"] == 2 and f2t["sum_cents"] == 350 and f2t["n_users"] == 2
    assert f2v["n_rows"] == 1 and f2v["sum_cents"] == 400
    assert len(out) == 4  # event 4 beyond fold 2's valid end; 5 null ts


def test_backtest_no_leakage_invariant(spark, bt_events):
    out = MO.backtest_folds(
        bt_events, ts="ts", by="et", value_col="value", user_col="user",
        origin="2024-01-01 00:00:00", step_days=6, n_folds=2,
    ).toPandas()
    for k in out["fold"].unique():
        tr = out[(out["fold"] == k) & (out["role"] == "train")]["max_ts"].max()
        va = out[(out["fold"] == k) & (out["role"] == "valid")]["min_ts"].min()
        assert tr < va, f"fold {k}: train extends past valid start"


def test_fold_bounds_expanding(spark):
    b = MO.fold_bounds("2024-01-01 00:00:00", 6, 3)
    assert [k for k, _, _ in b] == [1, 2, 3]
    for (_, t1, v1), (_, t2, v2) in zip(b, b[1:]):
        assert t2 == v1 and v2 > v1  # valid windows tile, train expands


# -- BM25 --------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", "apple banana apple"),
        ("d2", "banana cherry"),
        ("d3", "cherry cherry cherry date"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def bm25_ref(tf, df_count, dl, avgdl, n):
    idf = math.log((n - df_count + 0.5) / (df_count + 0.5) + 1.0)
    k1, b = 1.2, 0.75
    return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_values(spark, corpus):
    out = RV.bm25_topk(corpus, k=10, idf="lut").toPandas()
    n, avgdl = 3, (3 + 2 + 4) / 3
    row = out[(out.doc_id == "d1") & (out.term == "apple")].iloc[0]
    assert row["tf"] == 2 and row["df_count"] == 1 and row["dl"] == 3
    assert row["score"] == pytest.approx(bm25_ref(2, 1, 3, avgdl, n))
    # rank 1 within each doc is the highest score; ties break on term asc
    top = out[out["rank"] == 1].set_index("doc_id")
    assert top.loc["d1", "term"] == "apple"     # tf=2, rarest
    # idf dominates: date (df=1, idf~0.98) beats cherry (tf=3, df=2,
    # idf~0.47) — 0.86 vs 0.69; verified against bm25_ref
    assert top.loc["d3", "term"] == "date"
    d3 = out[out.doc_id == "d3"].set_index("term")
    assert d3.loc["date", "score"] == pytest.approx(bm25_ref(1, 1, 4, avgdl, n))
    assert d3.loc["cherry", "score"] == pytest.approx(bm25_ref(3, 2, 4, avgdl, n))


def test_bm25_native_matches_lut_within_ulp(spark, corpus):
    lut = RV.bm25_topk(corpus, k=10, idf="lut").toPandas()
    nat = RV.bm25_topk(corpus, k=10, idf="native").toPandas()
    m = lut.merge(nat, on=["doc_id", "term"], suffixes=("_l", "_n"))
    assert len(m) == len(lut) == len(nat)
    assert (abs(m.score_l - m.score_n) <= 4 * abs(m.score_l) * 2**-52).all()


def test_bm25_topk_limits_and_order(spark, corpus):
    out = RV.bm25_topk(corpus, k=2, idf="lut").toPandas()
    assert (out.groupby("doc_id")["rank"].max() <= 2).all()
    for _, grp in out.groupby("doc_id"):
        s = grp.sort_values("rank")["score"].tolist()
        assert s == sorted(s, reverse=True)


def test_bm25_lut_guard(spark, corpus):
    with pytest.raises(ValueError, match="max_lut_rows"):
        RV.bm25_topk(corpus, idf="lut", max_lut_rows=2)
    with pytest.raises(ValueError, match="unknown idf mode"):
        RV.bm25_topk(corpus, idf="bogus")


def test_bm25_idf_value_matches_duckdb_ln(spark):
    # the cross-engine contract the LUT path rests on: math.log (the LUT
    # builder) is bit-identical to DuckDB's ln for every reachable arg
    import duckdb
    import struct

    n = 64
    args = [(n - d + 0.5) / (d + 0.5) + 1 for d in range(1, n + 1)]
    du = [
        r[0]
        for r in duckdb.sql(
            "select ln(x) from (select unnest(?) as x)", params=[args]
        ).fetchall()
    ]
    py = [RV.idf_value(n, d) for d in range(1, n + 1)]
    assert all(
        struct.pack("<d", a) == struct.pack("<d", b) for a, b in zip(py, du)
    )


def test_categorical_drift_hash_buckets(spark):
    """Categorical path: bin = md5(category) % n; a category swap between
    windows shows up as two shifted buckets with TV = the swapped mass."""
    import hashlib

    def bucket(cat, n=8):
        return int(hashlib.md5(cat.encode()).hexdigest()[:8], 16) % n

    a, b = "alpha", "beta"
    assert bucket(a) != bucket(b)  # fixture sanity: distinct buckets
    rows = [
        ("g", ts("2024-06-01 00:00:00"), a),
        ("g", ts("2024-06-02 00:00:00"), a),
        ("g", ts("2024-06-20 00:00:00"), b),
        ("g", ts("2024-06-21 00:00:00"), b),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, cat string")
    out = MO.feature_drift(
        df, by="g", ts="ts", value_col="cat", cut_ts=CUT,
        bin_width=1.0, n_bins=8,
        bin_sql="CAST(CAST(CONV(SUBSTRING(MD5(cat), 1, 8), 16, 10) AS BIGINT) % 8 AS INT)",
    ).collect()[0]
    # all mass moved from bucket(a) to bucket(b): TV = 1, shift = 1
    assert out["tv_distance"] == pytest.approx(1.0)
    assert out["max_bin_shift"] == pytest.approx(1.0)
    assert out[f"r{bucket(a)}"] == 2 and out[f"c{bucket(b)}"] == 2
    assert out["worst_bin"] == min(bucket(a), bucket(b))


def test_drift_null_value_slice(spark):
    """NULL values must NOT be clamped into the top bin (LEAST/GREATEST
    skip NULLs); they ride the explicit null_ref/null_cur slice and stay
    out of the binned proportions."""
    rows = [
        ("g", ts("2024-06-01 00:00:00"), None),   # ref window, NULL value
        ("g", ts("2024-06-02 00:00:00"), 5.0),
        ("g", ts("2024-06-20 00:00:00"), 5.0),
        ("g", ts("2024-06-21 00:00:00"), None),   # cur window, NULL value
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = MO.feature_drift(
        df, by="g", ts="ts", value_col="value",
        cut_ts=CUT, bin_width=10.0, n_bins=4,
    ).collect()[0]
    assert out["n_ref"] == 1 and out["n_cur"] == 1
    assert out["null_ref"] == 1 and out["null_cur"] == 1
    assert out["r3"] == 0 and out["c3"] == 0  # NOT silently top-binned
    assert out["tv_distance"] == 0.0          # observed values identical


def test_drift_against_reference_new_group_visible(spark):
    """A group absent from the training reference must still emit a row
    (n_ref=0, NULL stats) — the novel-category alarm a serving monitor
    exists for — instead of being dropped by an inner join."""
    ref_rows = [("seen", ts("2024-06-01 00:00:00"), 5.0)]
    cur_rows = [
        ("seen", ts("2024-06-20 00:00:00"), 15.0),
        ("novel", ts("2024-06-20 00:00:00"), 25.0),
    ]
    sch = "g string, ts timestamp, value double"
    ref = MO.reference_histogram(
        spark.createDataFrame(ref_rows, sch), by="g", value_col="value",
        bin_width=10.0, n_bins=4,
    )
    out = (
        MO.drift_against_reference(
            spark.createDataFrame(cur_rows, sch), ref, by="g", ts="ts",
            value_col="value", bin_width=10.0, n_bins=4,
        )
        .toPandas()
        .set_index("g")
    )
    assert set(out.index) == {"seen", "novel"}
    import pandas as pd

    nov = out.loc["novel"]
    assert nov["n_ref"] == 0 and nov["n_cur"] == 1
    assert pd.isna(nov["tv_distance"])  # guarded, not fabricated
    assert out.loc["seen", "tv_distance"] == 1.0


@pytest.mark.parametrize("seed", [11, 977])
def test_bm25_native_vs_lut_property_random_corpora(spark, seed):
    """Property test of the relevance.py native-vs-LUT claim: random
    zipf-ish corpora with heavy df variation, every posting compared
    (VERDICT r4 #6). Java's Math.log and CPython's math.log are each
    correctly-rounded-or-1-ulp on the bit-identical argument, so idf
    differs by <= 1 ulp — and the score (idf * saturation factor) by
    <= 2 ulp: the 1-ulp relative idf error survives the product, whose
    own final rounding can add up to one more. This test originally
    asserted 1 ulp and FAILED (seed 977: max exactly 2.0 ulp on 6
    postings, all df=42 where the two logs disagree) — the 2-ulp bound
    is the measured truth, and relevance.py's docstring was corrected
    to match."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(60)])
    # zipf weights -> some terms in ~every doc (df ~ n), some in one
    wts = 1.0 / np.arange(1, len(vocab) + 1.0)
    wts /= wts.sum()
    docs = []
    for d in range(150):
        L = int(rng.integers(3, 40))
        docs.append((f"d{d:04d}", " ".join(rng.choice(vocab, L, p=wts))))
    corpus = spark.createDataFrame(docs, "doc_id string, text string")

    k_all = 10_000  # no rank cutoff: every posting on both sides
    lut = RV.bm25_topk(corpus, k=k_all, idf="lut").toPandas()
    nat = RV.bm25_topk(corpus, k=k_all, idf="native").toPandas()
    m = lut.merge(nat, on=["doc_id", "term"], suffixes=("_l", "_n"))
    assert len(m) == len(lut) == len(nat) > 500
    # tf/df/dl are integer-exact on both paths
    for c in ("tf", "df_count", "dl"):
        assert (m[f"{c}_l"] == m[f"{c}_n"]).all()
    # scores within 2 ulp (1 ulp idf + up to 1 ulp product rounding)
    tol = 2 * np.spacing(np.abs(m.score_l.to_numpy()))
    assert (np.abs(m.score_l.to_numpy() - m.score_n.to_numpy()) <= tol).all()
