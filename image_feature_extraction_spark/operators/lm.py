"""Corpus bigram language-model scoring for document quality filtering.

A perplexity-proxy quality signal computed entirely from the corpus
itself (the reference's MakeBag.cxx builds its features from corpus-wide
histogram statistics in the same spirit): learn bigram conditional
probabilities p(t2 | t1) from corpus-wide counts, then score every
document by how typical its token transitions are. Low mean/min
transition probability or many rare transitions flags boilerplate,
shuffled, or machine-generated text.

Two stages, each with an explicit scale disposition:

1. ``bigram_model`` — pure Catalyst: adjacent-pair counts (reusing
   bpe.pair_counts — explode + combine-compressed count exchange) joined
   to first-token totals. At most |alphabet|^2 model rows regardless of
   corpus size.
2. ``score_docs`` — the model is collected driver-side (BOUNDED: raises
   above ``max_model_rows``; 64^2 = 4 k rows here, a 32 KB dense LUT)
   and closure-captured into a mapInArrow kernel that gathers
   p[t1 * alpha + t2] for every adjacent pair with one vectorized numpy
   index — zero shuffle, the corpus is scored in a single narrow pass.
   This is the broadcast-small-model-into-vectorized-kernel pattern; for
   alphabets too large for a LUT (e.g. 50257^2), score with a broadcast
   equi-join of exploded pairs against the model table and an
   order-independent aggregate instead (the integer rare-transition
   count and min-probability below are both order-independent; the mean
   is not, which is exactly why the kernel path computes it with a
   DETERMINISTIC per-document np.sum).

Determinism contract for the oracle: per-document scores are pure
functions of the document's token array and the exact-rational model
LUT (count/count divisions are correctly-rounded IEEE doubles), with
np.float64 pairwise summation in document order — the independent
replay reproduces them bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import pair_counts


def bigram_model(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Bigram conditional probabilities: (t1, t2, cnt, p) with
    p = cnt(t1,t2) / sum_t2 cnt(t1,t2) — an exact integer division."""
    pc = pair_counts(df, tokens_col)
    tot = pc.groupBy("t1").agg(F.sum("cnt").alias("tot"))
    return pc.join(tot, "t1").select(
        "t1",
        "t2",
        "cnt",
        (F.col("cnt").cast("double") / F.col("tot").cast("double")).alias("p"),
    )


def _score_batches(batches, lut, alpha, rare_threshold):
    import pyarrow as pa

    for rb in batches:
        names = rb.schema.names
        toks = rb.column(names.index("tokens"))
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.asarray(toks.value_lengths(), dtype=np.int64)
        off = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        n_bi = np.empty(len(toks), np.int64)
        mean_p = np.full(len(toks), np.nan)
        min_p = np.full(len(toks), np.nan)
        n_rare = np.zeros(len(toks), np.int64)
        for i in range(len(toks)):
            a = flat[off[i] : off[i + 1]]
            if a.size < 2:
                n_bi[i] = 0
                continue
            # Out-of-range token ids (negative, or >= alphabet) must not
            # silently wrap to the wrong LUT slot or crash the Arrow
            # task: an unseen-vocabulary transition scores probability 0
            # (maximally rare), same as a bigram absent from the model.
            t1, t2 = a[:-1], a[1:]
            bad = (t1 < 0) | (t1 >= alpha) | (t2 < 0) | (t2 >= alpha)
            idx = np.where(bad, 0, t1 * alpha + t2)
            p = np.where(bad, 0.0, lut[idx])
            n_bi[i] = p.size
            mean_p[i] = np.sum(p) / p.size
            min_p[i] = p.min()
            n_rare[i] = int((p < rare_threshold).sum())
        empty = n_bi == 0  # <2 tokens: scores are NULL (not NaN on the wire)
        cols = {
            "doc_id": rb.column(names.index("doc_id")),
            "n_bigrams": pa.array(n_bi),
            "lm_mean_prob": pa.array(mean_p, mask=empty),
            "lm_min_prob": pa.array(min_p, mask=empty),
            "lm_n_rare": pa.array(n_rare),
        }
        yield pa.record_batch(list(cols.values()), names=list(cols.keys()))


SCORE_SCHEMA = (
    "doc_id string, n_bigrams long, lm_mean_prob double, "
    "lm_min_prob double, lm_n_rare long"
)


def score_docs(
    df: DataFrame,
    model: DataFrame,
    alphabet: int,
    rare_threshold: float,
    tokens_col: str = "tokens",
    max_model_rows: int = 1 << 22,
) -> DataFrame:
    """Score each doc against a learned bigram model: mean/min transition
    probability (NaN -> NULL when < 2 tokens) and the count of rare
    transitions (p < rare_threshold). One narrow Arrow pass; see module
    docstring for the large-alphabet join alternative."""
    alpha = int(alphabet)
    if alpha * alpha > max_model_rows:
        raise ValueError(
            f"alphabet^2 = {alpha * alpha} exceeds max_model_rows="
            f"{max_model_rows}; use a broadcast-join scorer for large vocabularies"
        )
    rows = model.select("t1", "t2", "p").collect()  # bounded: <= alpha^2
    lut = np.zeros(alpha * alpha, dtype=np.float64)
    for r in rows:
        lut[int(r["t1"]) * alpha + int(r["t2"])] = float(r["p"])
    thr = float(rare_threshold)
    if tokens_col != "tokens":
        df = df.withColumnRenamed(tokens_col, "tokens")
    return df.select("doc_id", "tokens").mapInArrow(
        lambda it: _score_batches(it, lut, alpha, thr), schema=SCORE_SCHEMA
    )
