"""Bigram-LM scoring: model parity with a Counter replay, kernel scoring
parity, empty-doc NULLs, LUT size guard."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from image_feature_extraction_spark.operators import lm as LM

DOCS = [
    ("d0", [1, 2, 3, 1, 2, 1, 1]),
    ("d1", [2, 3, 2, 3, 2]),
    ("d2", [3]),
    ("d3", []),
    ("d4", [1, 2]),
]
ALPHA = 4


def _df(spark):
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "tokens"])
    return spark.createDataFrame(pdf, schema="doc_id string, tokens array<int>")


def _replay_model():
    pc, fc = Counter(), Counter()
    for _, a in DOCS:
        pc.update(zip(a, a[1:]))
        fc.update(a[:-1])
    return {k: c / fc[k[0]] for k, c in pc.items()}


def test_bigram_model_matches_replay(spark):
    got = {
        (r["t1"], r["t2"]): (r["cnt"], r["p"])
        for r in LM.bigram_model(_df(spark)).collect()
    }
    pc = Counter()
    for _, a in DOCS:
        pc.update(zip(a, a[1:]))
    probs = _replay_model()
    assert set(got) == set(pc)
    for k in pc:
        assert got[k] == (pc[k], probs[k])  # exact: integer ratio division


def test_score_docs_matches_replay(spark):
    df = _df(spark)
    out = (
        LM.score_docs(
            df, LM.bigram_model(df), alphabet=ALPHA, rare_threshold=0.3
        )
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    probs = _replay_model()
    for doc_id, a in DOCS:
        got = out.loc[doc_id]
        if len(a) < 2:
            assert got.n_bigrams == 0 and got.lm_n_rare == 0
            assert pd.isna(got.lm_mean_prob) and pd.isna(got.lm_min_prob)
            continue
        p = np.asarray([probs[(x, y)] for x, y in zip(a, a[1:])])
        assert got.n_bigrams == p.size
        assert got.lm_mean_prob == np.sum(p) / p.size  # bit-exact contract
        assert got.lm_min_prob == p.min()
        assert got.lm_n_rare == int((p < 0.3).sum())


def test_score_docs_lut_guard(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="max_model_rows"):
        LM.score_docs(
            df,
            LM.bigram_model(df),
            alphabet=1 << 12,
            rare_threshold=0.1,
            max_model_rows=1 << 10,
        )


def test_score_docs_out_of_range_tokens(spark):
    """Negative ids must not wrap to a wrong LUT slot; ids >= alphabet
    must not crash the Arrow task: both score as probability 0 (rare)."""
    from image_feature_extraction_spark.operators import lm as LM

    alphabet = 4
    model = spark.createDataFrame(
        [(0, 1, 0.5), (1, 2, 0.25)], "t1 long, t2 long, p double"
    )
    docs = spark.createDataFrame(
        [
            ("ok", [0, 1, 2]),          # in-range: p = [0.5, 0.25]
            ("neg", [0, -1, 1, 2]),     # two transitions touch -1 -> p 0
            ("big", [0, 1, 99]),        # 99 >= alphabet -> p 0
        ],
        "doc_id string, tokens array<long>",
    )
    out = (
        LM.score_docs(docs, model, alphabet=alphabet, rare_threshold=0.1)
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc["ok", "lm_mean_prob"] == (0.5 + 0.25) / 2
    assert out.loc["ok", "lm_n_rare"] == 0
    assert out.loc["neg", "lm_min_prob"] == 0.0
    assert out.loc["neg", "lm_n_rare"] == 2  # (0,-1) and (-1,1)
    assert out.loc["big", "lm_min_prob"] == 0.0
    assert out.loc["big", "lm_mean_prob"] == 0.5 / 2  # (0,1)=0.5, (1,99)=0
