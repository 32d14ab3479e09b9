"""Sequence assembly: tape packing + chunking invariants."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from image_feature_extraction_spark import synth
from image_feature_extraction_spark.operators.sequences import (
    chunk_text,
    chunk_token_arrays,
    pack_sequences,
    pack_stats,
)


def _docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(8),
                "source": ["a", "a", "a", "b", "b", "a", "b", "a"],
                "n_tok": [100, 200, 30, 250, 10, 90, 300, 5],
            }
        )
    )


def test_pack_sequences_hand_values(spark):
    out = (
        pack_sequences(_docs(spark), capacity=256, by="source", len_col="n_tok")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # source a tape order: 0(100) 1(200) 2(30) 5(90) 7(5)
    assert out.loc[0, ["tape_start", "pack_id", "pack_offset"]].tolist() == [0, 0, 0]
    assert out.loc[1, "tape_start"] == 100 and out.loc[1, "pack_id"] == 0
    # doc 1 overflows pack 0 (100+200 > 256) but STARTS in it — tape rule
    assert out.loc[2, "tape_start"] == 300 and out.loc[2, "pack_id"] == 1
    assert out.loc[5, ["tape_start", "pack_offset"]].tolist() == [330, 330 - 256]
    # source b: 3(250) 4(10) 6(300)
    assert out.loc[3, "pack_id"] == 0
    assert out.loc[4, ["tape_start", "pack_id"]].tolist() == [250, 0]
    assert out.loc[6, ["tape_start", "pack_id"]].tolist() == [260, 1]


def test_pack_sequences_partition_invariant_and_stats(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "source": [f"s{i % 3}" for i in range(200)],
            "n_tok": (np.arange(200) * 37) % 500 + 1,
        }
    )
    a = pack_sequences(
        spark.createDataFrame(pdf).repartition(1), capacity=1000, by="source",
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(
        spark.createDataFrame(pdf).repartition(13), capacity=1000, by="source",
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # per-group invariants: tape starts are the exclusive prefix sums
    for src, grp in a.sort_values("doc_id").groupby("source"):
        want = np.concatenate([[0], np.cumsum(grp["n_tok"].to_numpy())[:-1]])
        assert (grp["tape_start"].to_numpy() == want).all()
        assert (grp["pack_id"] == grp["tape_start"] // 1000).all()
    st = pack_stats(
        pack_sequences(spark.createDataFrame(pdf), capacity=1000, by="source"),
        capacity=1000, by="source",
    ).toPandas()
    # every doc accounted for exactly once
    assert st["n_docs"].sum() == 200
    assert st["pack_tokens"].sum() == pdf["n_tok"].sum()
    # utilization ~1 for all but each group's last pack (tape rule)
    last = st.sort_values("pack_id").groupby("source").tail(1)
    inner = st.drop(last.index)
    assert (inner["utilization"] >= 0.5).all()


def test_pack_sequences_validation(spark):
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(_docs(spark), capacity=0)


def test_chunk_token_arrays_reassembly(spark):
    """stride == chunk_len: concatenating a doc's chunks reproduces its
    token array exactly (the per-row token invariant survives chunking)."""
    df = synth.token_table(spark, 24)
    out = chunk_token_arrays(df, chunk_len=128).orderBy("doc_id", "chunk_idx")
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).extend(r["chunk_tokens"])
    want = synth.token_table_pandas(24)
    assert set(got) == set(want["doc_id"])
    for row in want.itertuples():
        np.testing.assert_array_equal(np.array(got[row.doc_id]), row.tokens)


def test_chunk_token_arrays_overlap_and_edges(spark):
    df = spark.createDataFrame(
        [(1, list(range(10))), (2, []), (3, [7])],
        "doc_id long, tokens array<int>",
    )
    out = chunk_token_arrays(df, chunk_len=4, stride=3).toPandas()
    one = out[out["doc_id"] == 1].sort_values("chunk_idx")
    # starts 0,3,6,9; slices clamp at the end
    assert one["chunk_start"].tolist() == [0, 3, 6, 9]
    assert [list(c) for c in one["chunk_tokens"]] == [
        [0, 1, 2, 3], [3, 4, 5, 6], [6, 7, 8, 9], [9],
    ]
    assert (out["doc_id"] == 2).sum() == 0       # empty doc -> no chunks
    assert [list(c) for c in out[out["doc_id"] == 3]["chunk_tokens"]] == [[7]]
    with pytest.raises(ValueError, match="stride"):
        chunk_token_arrays(df, chunk_len=4, stride=0)


def test_chunk_text_digest_matches_manual(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "  ")], "doc_id long, text string"
    )
    out = chunk_text(df, chunk_words=3, stride_words=2).toPandas()
    one = out[out["doc_id"] == 1].sort_values("chunk_idx")
    assert one["chunk_start"].tolist() == [0, 2, 4, 6]
    assert one["chunk_n_words"].tolist() == [3, 3, 3, 1]
    import hashlib

    want0 = hashlib.md5(b"a b c").hexdigest()
    assert one["chunk_digest"].iloc[0] == want0
    # whitespace-only text -> single empty word -> one chunk (documented
    # engine-shared wart of the words_of contract)
    assert (out["doc_id"] == 2).sum() == 1


def test_pack_sequences_tie_validation(spark):
    """Review r3: a tied order key makes tape offsets partition-order-
    dependent; validate_unique=True must fail fast on ties and pass on
    unique keys."""
    tied = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 1, 2], "source": ["a", "a", "a"], "n_tok": [5, 6, 7]}
        )
    )
    with pytest.raises(ValueError, match="not unique"):
        pack_sequences(tied, capacity=10, validate_unique=True)
    ok = pack_sequences(_docs(spark), capacity=256, validate_unique=True)
    assert ok.count() == 8
