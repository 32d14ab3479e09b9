"""BPE merge training: kernel semantics, Spark-vs-replay parity, cache
hygiene."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from image_feature_extraction_spark.operators import bpe as BP


def _py_merge(a, t1, t2, new):
    """Independent sequential-scan greedy left-to-right merge."""
    out, i = [], 0
    while i < len(a):
        if i + 1 < len(a) and a[i] == t1 and a[i + 1] == t2:
            out.append(new)
            i += 2
        else:
            out.append(a[i])
            i += 1
    return out


def test_merge_one_greedy_overlap():
    cases = [
        ([7, 7, 7], (7, 7)),          # overlapping run: merge LTR non-overlap
        ([7, 7, 7, 7], (7, 7)),
        ([1, 2, 1, 2, 3], (1, 2)),
        ([1, 2, 2, 3], (2, 2)),
        ([5], (5, 5)),
        ([], (1, 2)),
        ([3, 1, 2, 1, 2, 1], (2, 1)),
    ]
    for arr, (t1, t2) in cases:
        got = BP._merge_one(np.asarray(arr, np.int32), t1, t2, 99).tolist()
        assert got == _py_merge(arr, t1, t2, 99), (arr, t1, t2)


@pytest.mark.parametrize("seed", [0, 1])
def test_merge_one_randomized(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    for _ in range(200):
        a = rng.integers(0, 4, rng.integers(0, 30)).astype(np.int32)
        t1, t2 = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        assert BP._merge_one(a, t1, t2, 9).tolist() == _py_merge(
            a.tolist(), t1, t2, 9
        )


def test_apply_merges_chained(spark):
    # merge 2 consumes merge 1's new token — order matters.
    docs = [[1, 2, 3, 1, 2, 3, 3], [2, 3, 1, 2], [1], []]
    merges = [(1, 2, 64), (64, 3, 65)]
    pdf = pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(docs))], "tokens": docs})
    out = (
        BP.apply_merges(
            spark.createDataFrame(pdf, schema="doc_id string, tokens array<int>"),
            merges,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    expect = docs
    for t1, t2, new in merges:
        expect = [_py_merge(a, t1, t2, new) for a in expect]
    assert [list(t) for t in out.tokens] == expect


def test_bpe_train_matches_replay_and_releases_caches(spark):
    from image_feature_extraction_spark import synth
    from pyspark.sql import functions as F

    n_docs, alpha, n_merges = 32, 16, 3
    corpus = synth.token_table(spark, n_docs, partitions=4).select(
        "doc_id", F.transform("tokens", lambda x: x % alpha).alias("tokens")
    )
    sc = spark.sparkContext
    before = len(sc._jsc.getPersistentRDDs())
    rows, final = BP.bpe_train(
        corpus, num_merges=n_merges, vocab_size=alpha, track_sizes=True
    )
    assert len(sc._jsc.getPersistentRDDs()) == before  # no cache leak

    # Independent replay.
    docs = [
        [int(t) % alpha for t in synth.doc_row(i)["tokens"]] for i in range(n_docs)
    ]
    from collections import Counter

    expect = []
    for it in range(n_merges):
        c = Counter()
        for a in docs:
            c.update(zip(a, a[1:]))
        (t1, t2), cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        new = alpha + it
        docs = [_py_merge(a, t1, t2, new) for a in docs]
        expect.append((it, t1, t2, new, cnt, sum(len(a) for a in docs)))
    assert rows == expect
    # The returned corpus equals the replayed corpus.
    got = {r["doc_id"]: list(r["tokens"]) for r in final.collect()}
    assert got == {synth.doc_id_of(i): docs[i] for i in range(n_docs)}
