"""Skew mitigation: salted two-stage aggregation and salted joins.

The token table's `source` axis is Zipf-skewed by construction
(synth.py: 40% of docs in src0) — the honest model of web-crawl corpora,
where one domain/source dominates. A single-stage groupBy(source) makes
one reducer own 40% of 10^12 rows. Two mitigations compose here:

- ``salted_agg``: stage 1 aggregates on (key, salt) — hot keys split
  into `salt_buckets` parallel partials — stage 2 merges the partials on
  key alone. The stage-2 shuffle carries `salt_buckets` rows per key,
  not the data. Works for any algebraic aggregate (sum/count/min/max);
  means are derived from sum+count after the merge.

- ``salted_broadcast_left``: replicate the SMALL side `salt_buckets`
  times instead of salting the big side's key — for joins where AQE's
  skew-join splitting cannot apply (e.g. the build side is too big to
  broadcast but the probe key is hot). Not needed when AQE handles it
  (spark.sql.adaptive.skewJoin.enabled is on in session.py).

Salt = deterministic hash of a high-cardinality column (doc_id) mod
buckets — NOT rand(): resumable re-runs must route a row to the same
bucket (checkpoint idempotency), and determinism costs nothing here.

Reference lineage: no distributed analog exists (single-process tools);
this is the partitioning story the north rule requires for the
entity-skewed as-of/feature workloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: str, buckets: int, out_col: str = "_salt") -> DataFrame:
    """Deterministic salt bucket from a high-cardinality column."""
    return df.withColumn(
        out_col, F.pmod(F.xxhash64(F.col(salt_from), F.lit(1)), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys,
    aggs: dict[str, tuple[str, Column]],
    salt_from: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    aggs maps output name -> (merge_fn_name, stage1 Column), where
    merge_fn_name in {"sum", "min", "max"} merges stage-1 partials.
    Example:
        salted_agg(docs, "source",
                   {"n_docs": ("sum", F.count(F.lit(1))),
                    "tok_sum": ("sum", F.sum("n_tok")),
                    "tok_max": ("max", F.max("n_tok"))},
                   salt_from="doc_id")
    """
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    salted = with_salt(df, salt_from, salt_buckets)
    stage1 = salted.groupBy(*keys_l, "_salt").agg(
        *[c.alias(name) for name, (_m, c) in aggs.items()]
    )
    mergers = {"sum": F.sum, "min": F.min, "max": F.max}
    stage2 = stage1.groupBy(*keys_l).agg(
        *[mergers[m](name).alias(name) for name, (m, _c) in aggs.items()]
    )
    return stage2


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join a skew-keyed big side with a small side by salting the
    big side and replicating the small side across salt buckets, so a hot
    key's rows spread over `salt_buckets` tasks."""
    b = with_salt(big, salt_from, salt_buckets)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    # explicit broadcast: the replicated small side can exceed
    # autoBroadcastJoinThreshold (size x salt_buckets), and falling back
    # to a sort-merge join would shuffle the big side — the exact cost
    # this helper exists to avoid
    return b.join(F.broadcast(s), [on, "_salt"]).drop("_salt")
