"""Tests for the corpus-curation operators (operators/curation.py):
repetition signals, decontamination, hash split, temperature sampling,
PII scrubbing, token n-gram novelty."""

import hashlib

import pytest
from pyspark.sql import functions as F

from image_feature_extraction_spark.operators import curation as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b a b a b", "s1"),           # heavy bigram repetition
        (2, "w x y z q r", "s1"),           # all bigrams unique
        (3, "one", "s2"),                   # fewer words than n -> no grams
        (4, "m m m m", "s2"),               # single repeated bigram
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# -- repetition_stats --------------------------------------------------------

def test_repetition_hand_values(spark, docs):
    out = C.repetition_stats(docs, n=2).toPandas().set_index("doc_id")
    # doc 1: grams = [a b, b a, a b, b a, a b] -> total 5, distinct 2
    r1 = out.loc[1]
    assert r1["n_grams_total"] == 5 and r1["n_grams_distinct"] == 2
    assert r1["dup_gram_frac"] == pytest.approx(1 - 2 / 5)
    # top gram: "a b" x3 (beats "b a" x2); chars = 3*3 / len("a b a b a b")=11
    assert r1["top_gram"] == "a b" and r1["top_gram_count"] == 3
    assert r1["top_gram_char_frac"] == pytest.approx(round(9 / 11, 6))
    # doc 2: all distinct -> dup fraction 0, tie on count -> lexicographically
    # smallest gram wins
    r2 = out.loc[2]
    assert r2["dup_gram_frac"] == 0.0 and r2["top_gram"] == "q r"
    # doc 3: no grams, still present with zero counts and NULL top gram
    r3 = out.loc[3]
    assert r3["n_grams_total"] == 0 and r3["top_gram"] is None
    # doc 4: one distinct gram repeated 3x
    r4 = out.loc[4]
    assert r4["n_grams_total"] == 3 and r4["n_grams_distinct"] == 1
    assert r4["dup_gram_frac"] == pytest.approx(round(1 - 1 / 3, 6))


# -- decontaminate -----------------------------------------------------------

def test_decontaminate_flags_overlap(spark):
    # Force membership: find ids whose md5(id||':eval') % 2 differs so we
    # get at least one eval and one train doc with/without overlap.
    base = "alpha beta gamma delta epsilon zeta"
    rows, eval_ids, train_ids = [], [], []
    for i in range(1, 30):
        (eval_ids if md5_32(f"{i}:eval") % 2 == 0 else train_ids).append(i)
    assert eval_ids and train_ids
    contaminated, clean = train_ids[0], train_ids[1]
    for i in eval_ids:
        rows.append((i, base))
    rows.append((contaminated, base + " extra tail words here"))
    rows.append((clean, "totally different content with no shared five gram runs"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        C.decontaminate(df, n=5, eval_mod=2).toPandas().set_index("doc_id")
    )
    # eval docs are excluded from the output
    assert set(out.index) == {contaminated, clean}
    assert bool(out.loc[contaminated, "is_contaminated"])
    assert out.loc[contaminated, "n_contaminated"] > 0
    assert not bool(out.loc[clean, "is_contaminated"])
    assert out.loc[clean, "n_contaminated"] == 0


# -- hash_split --------------------------------------------------------------

def test_hash_split_deterministic_and_complete(spark, docs):
    out = C.hash_split(docs).toPandas()
    assert set(out["split"]).issubset({"train", "val", "test"})
    # matches the reference hash computation exactly
    for _, row in out.iterrows():
        b = md5_32(f"{row['doc_id']}:split") % C.HASH_SPLIT_BUCKETS
        assert row["split_bucket"] == b
        expect = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert row["split"] == expect
    # stable across runs/partitionings
    again = C.hash_split(docs.repartition(3)).toPandas()
    merged = out.merge(again, on="doc_id", suffixes=("", "_2"))
    assert (merged["split"] == merged["split_2"]).all()


# -- source_temperature_sample ----------------------------------------------

def test_temperature_sample_probabilities(spark):
    rows = [(i, "s_big" if i < 90 else "s_small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = C.source_temperature_sample(df).toPandas()
    big = out[out["source"] == "s_big"]
    small = out[out["source"] == "s_small"]
    # smallest source keeps everything (keep_prob == 1.0)
    assert (small["keep_prob"] == 1.0).all() and small["kept"].all()
    # head source downsampled to sqrt(10/90)
    import math

    assert big["keep_prob"].iloc[0] == pytest.approx(
        round(math.sqrt(10 / 90), 6)
    )
    # kept flag reproduces the hash coin exactly
    for _, row in big.iterrows():
        frac = (md5_32(f"{row['doc_id']}:tsample") % 1000000) / 1000000.0
        assert bool(row["kept"]) == (frac < math.sqrt(10.0 / 90.0))


# -- scrub_pii ---------------------------------------------------------------

def test_scrub_pii_counts_and_replacement(spark):
    rows = [
        (1, "mail me at bob.smith+x@sub.example.org or 192.168.0.1 call 555-1234"),
        (2, "no pii here at all"),
        (3, "two mails a@b.io c@d.co one ip 8.8.8.8 and 555-0000 555-9999"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = C.scrub_pii(df).toPandas().set_index("doc_id")
    assert out.loc[1, "n_emails"] == 1 and out.loc[1, "n_ipv4"] == 1
    assert out.loc[1, "n_phones"] == 1
    assert out.loc[1, "clean_text"] == (
        "mail me at <EMAIL> or <IP> call <PHONE>"
    )
    assert out.loc[2, "n_emails"] == 0 and out.loc[2, "clean_text"] == rows[1][1]
    assert (
        out.loc[3, "n_emails"],
        out.loc[3, "n_ipv4"],
        out.loc[3, "n_phones"],
    ) == (2, 1, 2)


# -- token_ngram_novelty -----------------------------------------------------

def test_token_novelty_hand_values(spark):
    rows = [
        (1, [1, 2, 3, 4, 5]),      # grams: 1234, 2345 — both first-owned by 1
        (2, [1, 2, 3, 4, 9]),      # grams: 1234 (owned by 1), 2349 (novel)
        (3, [7, 8]),               # too short -> no grams
        (4, [1, 2, 3, 4, 5]),      # exact dup of 1 -> nothing novel
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = C.token_ngram_novelty(df, n=4).toPandas().set_index("doc_id")
    assert out.loc[1, "n_grams"] == 2 and out.loc[1, "n_novel"] == 2
    assert out.loc[1, "novelty_frac"] == 1.0
    assert out.loc[2, "n_grams"] == 2 and out.loc[2, "n_novel"] == 1
    assert out.loc[2, "novelty_frac"] == 0.5
    assert out.loc[3, "n_grams"] == 0 and out.loc[3, "n_novel"] == 0
    assert out.loc[4, "n_novel"] == 0 and out.loc[4, "novelty_frac"] == 0.0


def test_token_novelty_partition_invariant(spark):
    rows = [(i, [int(x) for x in range(i, i + 8)]) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    a = C.token_ngram_novelty(df, n=4).toPandas().sort_values("doc_id")
    b = (
        C.token_ngram_novelty(df.repartition(7), n=4)
        .toPandas()
        .sort_values("doc_id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


# -- property tests ----------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def word_texts(draw):
    words = draw(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12)
    )
    return " ".join(words)


@settings(max_examples=20, deadline=None)
@given(st.lists(word_texts(), min_size=1, max_size=8))
def test_repetition_invariants(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = C.repetition_stats(df, n=2).toPandas().set_index("doc_id")
    import numpy as np

    for i, t in enumerate(texts):
        r = out.loc[i]
        # words_of counts a whitespace-only text as one empty token
        n_words = len(t.split()) if t.split() else 1
        expect_total = max(0, n_words - 1)
        assert r["n_grams_total"] == expect_total
        assert 0 <= r["n_grams_distinct"] <= r["n_grams_total"] or (
            r["n_grams_total"] == 0 and r["n_grams_distinct"] == 0
        )
        if r["n_grams_total"] > 0:
            assert 0.0 <= r["dup_gram_frac"] <= 1.0
            assert r["top_gram_count"] >= 1
        else:
            assert r["top_gram"] is None and np.isnan(r["dup_gram_frac"])


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_token_novelty_invariants(spark, token_lists):
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(token_lists)],
        "doc_id long, tokens array<int>",
    )
    out = C.token_ngram_novelty(df, n=4).toPandas().set_index("doc_id")
    assert len(out) == len(token_lists)
    # every gram has exactly one owner, so summed novel counts equal the
    # number of globally distinct grams
    all_grams = set()
    for toks in token_lists:
        for j in range(max(0, len(toks) - 3)):
            all_grams.add(tuple(toks[j : j + 4]))
    assert out["n_novel"].sum() == len(all_grams)
    assert (out["n_novel"] <= out["n_grams"]).all()


# -- quality_filter ----------------------------------------------------------

def test_quality_filter_bits(spark):
    rows = [
        # 0: passes everything: >=10 words, normal lengths, has stopwords,
        #    no repetition
        (0, "the quick brown fox jumps over a lazy dog while it rains"),
        # 1: too short (bit 1), no stopwords (bit 4), and its single top
        #    bigram "alpha beta" covers 10/16 chars > 0.3 (bit 16)
        (1, "alpha beta gamma"),
        # 2: heavy repetition: dup fraction 10/11 > 0.5 (bit 8) and top
        #    bigram covers most chars (bit 16); words repeat so stopword
        #    bit also fires (bit 4), length ok
        (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        # 3: mean word length too long (bit 2), no stopwords (bit 4),
        #    enough words
        (3, " ".join(["superlongwordhere"] * 12)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = C.quality_filter(df).toPandas().set_index("doc_id")
    assert out.loc[0, "fail_mask"] == 0 and bool(out.loc[0, "kept"])
    assert out.loc[1, "fail_mask"] == 1 + 4 + 16 and not bool(out.loc[1, "kept"])
    m2 = out.loc[2, "fail_mask"]
    assert m2 & 8 and m2 & 16 and m2 & 4 and not (m2 & 1) and not (m2 & 2)
    m3 = out.loc[3, "fail_mask"]
    assert m3 & 2 and m3 & 4 and not (m3 & 1)
    # doc 3 repeats one word -> repetition bits fire too; kept must be False
    assert not bool(out.loc[3, "kept"])


# -- corpus_mix_report -------------------------------------------------------

def test_corpus_mix_consistency(spark):
    rows = [
        (i, "the quick brown fox jumps over a lazy dog near the river bank "
            f"unique{i} tail", "s_big" if i % 4 else "s_small")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("n_chars", F.length("text"))
    mix = C.corpus_mix_report(df).toPandas()
    assert mix["n_docs"].sum() == 40
    assert (mix["n_kept"] <= mix["n_docs"]).all()
    assert (mix["kept_chars"] >= 0).all()
    # kept char mass never exceeds the group's total char mass
    assert mix["kept_chars"].sum() <= sum(len(r[1]) for r in rows)
    # grouping keys are the full split x source cross-section present
    assert set(mix["source"]) == {"s_big", "s_small"}


# -- token_vocab_stats -------------------------------------------------------

def test_token_vocab_stats_hand_values(spark):
    rows = [
        (1, [5, 5, 7], "a"),
        (2, [5, 9], "a"),
        (3, [1, 1, 2, 2], "b"),   # tie on count: top token = smallest id
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, source string"
    )
    out = C.token_vocab_stats(df, vocab_size=10).toPandas().set_index("source")
    a = out.loc["a"]
    assert a["n_docs"] == 2 and a["n_tokens"] == 5 and a["n_distinct_tokens"] == 3
    assert a["top_token"] == 5 and a["top_token_count"] == 3
    assert a["vocab_coverage"] == pytest.approx(0.3)
    b = out.loc["b"]
    assert b["top_token"] == 1 and b["top_token_count"] == 2


def test_token_vocab_stats_empty_source(spark):
    rows = [
        (1, [3, 3], "a"),
        (2, [], "empty"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, source string"
    )
    out = C.token_vocab_stats(df, vocab_size=10).toPandas().set_index("source")
    e = out.loc["empty"]
    assert e["n_docs"] == 1 and e["n_tokens"] == 0
    assert e["n_distinct_tokens"] == 0 and e["vocab_coverage"] == 0.0
    import pandas as pd

    assert pd.isna(e["top_token"]) and e["top_token_count"] == 0


# -- temporal_holdout --------------------------------------------------------

def test_temporal_holdout_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    ts = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        # entity a: 5 events, frac 0.4 -> last 2 are valid
        (0, "a", ts(0)), (1, "a", ts(10)), (2, "a", ts(20)),
        (3, "a", ts(30)), (4, "a", ts(40)),
        # entity b: duplicate timestamps — id tie-break decides order
        (5, "b", ts(0)), (6, "b", ts(5)), (7, "b", ts(5)),
        # entity c: 1 event, floor(0.4*1)=0 -> all train
        (8, "c", ts(0)),
    ]
    df = spark.createDataFrame(rows, "id long, ent string, ts timestamp")
    out = (
        C.temporal_holdout(df, by="ent", ts="ts", id_col="id", valid_frac=0.4)
        .orderBy("id")
        .toPandas()
        .set_index("id")
    )
    assert list(out.loc[[0, 1, 2], "split"]) == ["train"] * 3
    assert list(out.loc[[3, 4], "split"]) == ["valid"] * 2
    # b: floor(0.4*3)=1 -> only the LAST (ts=5, larger id) is valid
    assert list(out.loc[[5, 6, 7], "split"]) == ["train", "train", "valid"]
    assert out.loc[8, "split"] == "train"
    # every valid event is strictly later-or-tied-by-id than every train
    # event of the same entity
    for ent in ("a", "b"):
        sub = out[out.ent == ent]
        assert sub[sub.split == "valid"].holdout_rn.min() > \
            sub[sub.split == "train"].holdout_rn.max()
