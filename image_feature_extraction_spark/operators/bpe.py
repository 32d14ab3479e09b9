"""Distributed BPE merge training over pre-tokenized sequences.

The "tokens" counterpart of the reference's train-a-model-from-statistics
flow (tools/MakeBag.cxx builds its histogram vocabulary from corpus-wide
statistics the same way): learn byte-pair-encoding merges from corpus-wide
adjacent-pair counts, then re-tokenize with the learned merge table.

Per iteration:

1. ``pair_counts`` — adjacent (t1, t2) counts, pure Catalyst: slice the
   token array twice (offset by one), zip, explode, hash-aggregate. The
   explode is a narrow op; the only exchange is the (t1, t2) count
   aggregation, which map-side partial aggregation compresses to at most
   |alphabet|^2 rows per task before the shuffle.
2. The single most-frequent pair (ties broken by smallest (t1, t2)) is a
   BOUNDED driver collect: ``limit(1)`` after the aggregate — one row.
3. ``apply_merge`` — rewrite every sequence, replacing non-overlapping
   left-to-right occurrences of the pair with the new token id. Arrow-
   batched numpy kernel (mapInArrow): vectorized match search per doc,
   a short Python loop only over the (sparse) match positions, never per
   token. Zero shuffle — narrow map over whatever partitioning the
   corpus already has.

Scale notes (10^12 sequences): each merge iteration costs one narrow
corpus pass + one combine-compressed count exchange — the same shape as
one flagship feature pass, so N merges = N passes. Production BPE
trainers run the count phase on a corpus SAMPLE (a `.sample()` upstream
composes for free) and materialize the rewritten corpus every few
iterations (checkpoint.write_with_lineage) to keep lineage bounded; at
test scale the 4-iteration lineage is fine unmaterialized.

``apply_merges`` replays a learned merge table (in priority order) in ONE
corpus pass — the inference path: the merge list is tiny (driver-side
list, closure-captured), the rewrite stays a narrow mapInArrow.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_counts(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Adjacent-pair counts over all sequences: (t1, t2, cnt)."""
    t = F.col(tokens_col)
    n = F.size(t)
    pairs = F.arrays_zip(
        F.slice(t, F.lit(1), n - 1).alias("t1"),
        F.slice(t, F.lit(2), n - 1).alias("t2"),
    )
    return (
        df.where(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.t1").cast("int").alias("t1"),
            F.col("p.t2").cast("int").alias("t2"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_one(a: np.ndarray, t1: int, t2: int, new_id: int) -> np.ndarray:
    """Greedy left-to-right non-overlapping merge of (t1, t2) -> new_id."""
    if a.size < 2:
        return a
    idx = np.nonzero((a[:-1] == t1) & (a[1:] == t2))[0]
    if idx.size == 0:
        return a
    keep = []
    last = -2
    for i in idx:  # loop over sparse matches, not tokens
        if i > last + 1:
            keep.append(i)
            last = i
    keep = np.asarray(keep, dtype=np.int64)
    out = a.copy()
    out[keep] = new_id
    mask = np.ones(a.size, dtype=bool)
    mask[keep + 1] = False
    return out[mask]


def _rewrite_batches(batches, merges):
    """mapInArrow generator: applies `merges` (list of (t1, t2, new_id),
    in order) to the `tokens` column, passing other columns through."""
    import pyarrow as pa

    for rb in batches:
        names = rb.schema.names
        ti = names.index("tokens")
        toks = rb.column(ti)
        flat_in = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
        lens_in = np.asarray(toks.value_lengths(), dtype=np.int64)
        off_in = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum(lens_in, out=off_in[1:])
        arrs = [flat_in[off_in[i] : off_in[i + 1]] for i in range(len(toks))]
        for t1, t2, new_id in merges:
            arrs = [_merge_one(a, t1, t2, new_id) for a in arrs]
        lens = np.fromiter((a.size for a in arrs), np.int64, len(arrs))
        offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat = (
            np.concatenate(arrs).astype(np.int32)
            if arrs
            else np.empty(0, np.int32)
        )
        cols = list(rb.columns)
        cols[ti] = pa.LargeListArray.from_arrays(
            pa.array(offsets), pa.array(flat)
        ).cast(pa.list_(pa.int32()))
        yield pa.record_batch(cols, names=names)


def apply_merges(
    df: DataFrame, merges, tokens_col: str = "tokens"
) -> DataFrame:
    """One-pass rewrite applying `merges` = [(t1, t2, new_id), ...] in
    order (training priority). Narrow — no shuffle."""
    if tokens_col != "tokens":
        df = df.withColumnRenamed(tokens_col, "tokens")
    merges = [(int(a), int(b), int(c)) for a, b, c in merges]
    out = df.mapInArrow(
        lambda it: _rewrite_batches(it, merges), schema=df.schema
    )
    if tokens_col != "tokens":
        out = out.withColumnRenamed("tokens", tokens_col)
    return out


def bpe_train(
    df: DataFrame,
    num_merges: int,
    vocab_size: int,
    tokens_col: str = "tokens",
    track_sizes: bool = False,
    materialize: bool = True,
):
    """Learn `num_merges` BPE merges; new ids are vocab_size, +1, ...

    Returns (merge_rows, corpus): merge_rows is a driver-side list of
    (iteration, t1, t2, new_token, pair_count) — one bounded limit(1)
    collect per iteration — and corpus is the rewritten DataFrame after
    all merges (lazily chained narrow passes). With ``track_sizes`` each
    row gains tokens_after (corpus token total AFTER that merge — one
    extra scalar aggregate per iteration, so the merge kernel's output
    is itself evidenced, not just the pair statistics).

    ``materialize`` persists each iteration's rewritten corpus and drops
    the previous one, so iteration i reads iteration i-1's cache instead
    of replaying the whole merge chain from the source — the in-memory
    analog of the checkpoint-every-few-merges production pattern. All
    caches this function created are released before returning (the
    returned corpus is valid, just uncached — callers persist it
    themselves if they keep using it)."""
    merge_rows = []
    cur = df
    owned = []  # caches created here, released before returning
    for it in range(int(num_merges)):
        top = (
            pair_counts(cur, tokens_col)
            .orderBy(F.desc("cnt"), "t1", "t2")
            .limit(1)
            .collect()
        )
        # The collect above materialized `cur`'s cache, so any OLDER
        # iteration caches are now safe to drop (dropping them earlier
        # would force the next action to replay the whole merge chain).
        while len(owned) > 1:
            owned.pop(0).unpersist()
        if not top or top[0]["cnt"] < 2:
            break  # nothing left worth merging
        t1, t2, cnt = int(top[0]["t1"]), int(top[0]["t2"]), int(top[0]["cnt"])
        new_id = int(vocab_size) + it
        cur = apply_merges(cur, [(t1, t2, new_id)], tokens_col)
        if materialize:
            cur = cur.persist()
            owned.append(cur)
        row = (it, t1, t2, new_id, cnt)
        if track_sizes:
            total = cur.agg(
                F.sum(F.size(tokens_col)).cast("long").alias("n")
            ).collect()[0]["n"]
            row = (*row, int(total))
        merge_rows.append(row)
    for d in owned:
        d.unpersist()
    return merge_rows, cur
