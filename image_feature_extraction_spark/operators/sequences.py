"""Sequence-assembly operators for token-payload training pipelines:
packing documents into fixed-capacity training sequences and chunking
long documents into overlapping windows.

These are the assembly steps between a deduplicated corpus and a training
run: a 100 TB token table is consumed as fixed-length sequences, so the
engine must (a) assign docs to packs deterministically without splitting
docs, and (b) split over-long docs into stride-overlapped chunks. Both
are Spark-first:

- ``pack_sequences`` is ONE window over (group, order) — the same shuffle
  shape as sessionization; no iteration, no UDF. The packing rule is
  "tape packing": docs are laid end to end on a virtual token tape per
  group, the tape is cut every ``capacity`` tokens, and a doc belongs to
  the pack where it STARTS. Unlike greedy first-fit bin packing (which
  needs a sequential scan with carried state), tape packing is a pure
  prefix-sum — exactly expressible in SQL (the DuckDB oracle mirrors it),
  deterministic under any partitioning, and its waste is bounded: a pack
  can overflow by at most one doc's tail, so expected utilization is
  capacity/(capacity + mean_len/2) (~97% for 8k capacity, 500-token
  docs). Over-long docs should be chunked FIRST (chunk_token_arrays).
- ``chunk_token_arrays`` / ``chunk_text`` are pure Catalyst projections
  (sequence + transform + slice + explode): narrow, zero-shuffle, fully
  whole-stage-codegen.

Reference lineage: ExtractWindow's fixed-size window extraction around a
coordinate (/root/reference/tools/ExtractWindow.cxx:143-166) is the
per-sample analogue of chunking; packing is an engine addition required
by the token-table deployment (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int,
    by: str = "source",
    len_col: str = "n_tok",
    order_col="doc_id",
    validate_unique: bool = False,
) -> DataFrame:
    """Assign each doc to a training pack of ``capacity`` tokens by tape
    packing within each ``by`` group, ordered by ``order_col``.

    Appends:
    - ``tape_start``: the doc's first-token offset on the group tape;
    - ``pack_id``: tape_start div capacity (the pack the doc starts in);
    - ``pack_offset``: tape_start mod capacity.

    Integer arithmetic throughout (`div`/`%`, no float division) so the
    assignment is exact for any int64 tape length. One window shuffle on
    ``by``; skew note: a group = one window partition, so feed this
    per-source shards (or add a time-bucket to ``by``) when one group
    holds a whole corpus — the same discipline as sessionize.

    DETERMINISM REQUIRES ``order_col`` (a column name or list of them) to
    be unique within each ``by`` group: a running sum over a tied
    ordering accumulates the tied rows in shuffle-delivery order, making
    tape offsets partition-order-dependent. Pass
    ``validate_unique=True`` to fail fast on ties (one extra aggregation
    pass — off by default; doc_id-keyed tables are unique by
    construction).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    order_l = [order_col] if isinstance(order_col, str) else list(order_col)
    if validate_unique:
        dup = (
            df.groupBy(by, *order_l)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            r = dup[0]
            raise ValueError(
                "pack_sequences: order key is not unique within group "
                f"({by}={r[by]!r}, {order_l}={[r[c] for c in order_l]!r}) — "
                "tape offsets would be partition-order-dependent"
            )
    w = (
        Window.partitionBy(by)
        .orderBy(*order_l)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(len_col)).over(w) - F.col(len_col)).cast("long")
    return (
        df.withColumn("tape_start", start)
        .withColumn(
            "pack_id", F.expr(f"tape_start div {int(capacity)}").cast("long")
        )
        .withColumn("pack_offset", (F.col("tape_start") % int(capacity)).cast("long"))
    )


def pack_stats(
    packed: DataFrame,
    capacity: int,
    by: str = "source",
    len_col: str = "n_tok",
    order_col: str = "doc_id",
) -> DataFrame:
    """Per-(group, pack) assembly stats: docs, tokens starting in the
    pack, utilization (tokens/capacity as exact int division to double —
    can exceed 1.0 when the last doc's tail overflows into the next pack;
    that overflow is the documented tape-packing waste bound)."""
    return (
        packed.groupBy(by, "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(len_col).cast("long").alias("pack_tokens"),
            F.min(order_col).alias("first_doc"),
            F.max(order_col).alias("last_doc"),
        )
        .withColumn(
            "utilization",
            F.col("pack_tokens").cast("double") / F.lit(float(capacity)),
        )
    )


def _chunk_starts(n_col, stride: int):
    """0-based chunk start offsets: 0, stride, 2*stride, ... < n (one
    empty-input guard — Spark's sequence() would otherwise count DOWN
    for n == 0)."""
    return F.when(
        n_col > 0,
        F.sequence(F.lit(0), n_col - 1, F.lit(int(stride))),
    ).otherwise(F.array().cast("array<int>"))


def chunk_token_arrays(
    df: DataFrame,
    chunk_len: int,
    stride: int | None = None,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Split each doc's token array into chunks of ``chunk_len`` starting
    every ``stride`` tokens (stride < chunk_len = overlapping windows; the
    final chunk is the remainder, possibly short). Pure Catalyst — no
    Python, no shuffle. Appends (chunk_idx, chunk_start, chunk_tokens).

    Reassembly invariant (tested): with stride == chunk_len the
    concatenation of a doc's chunks equals its token array exactly.
    """
    if chunk_len <= 0:
        raise ValueError(f"chunk_len must be positive, got {chunk_len}")
    stride = chunk_len if stride is None else int(stride)
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    n = F.size(F.col(tokens_col))
    starts = _chunk_starts(n, stride)
    ex = F.posexplode(starts)
    return df.select(
        "*", ex.alias("chunk_idx", "chunk_start")
    ).withColumn(
        "chunk_tokens",
        F.slice(F.col(tokens_col), F.col("chunk_start") + 1, chunk_len),
    )


def chunk_text(
    df: DataFrame,
    chunk_words: int,
    stride_words: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Word-window chunking for text documents: whitespace words (shared
    words_of contract), windows of ``chunk_words`` every ``stride_words``,
    re-joined with single spaces, with an md5 digest per chunk (integer/
    string md5 — no float formatting, so the digest is engine-portable).
    Appends (chunk_idx, chunk_start, chunk_n_words, chunk_digest)."""
    from .dedup import words_of

    if chunk_words <= 0:
        raise ValueError(f"chunk_words must be positive, got {chunk_words}")
    stride_words = chunk_words if stride_words is None else int(stride_words)
    if stride_words <= 0:
        raise ValueError(f"stride_words must be positive, got {stride_words}")
    # materialize the split ONCE: Catalyst does not CSE expressions across
    # operators, so referencing words_of(...) in the explode, the slice,
    # and the size would re-split every row three times (verified in the
    # physical plan)
    with_w = df.withColumn("_w", words_of(F.col(text_col)))
    starts = _chunk_starts(F.size(F.col("_w")), stride_words)
    ex = F.posexplode(starts)
    chunk = F.slice(F.col("_w"), F.col("chunk_start") + 1, chunk_words)
    return (
        with_w.select("*", ex.alias("chunk_idx", "chunk_start"))
        .withColumn("_chunk", chunk)
        .withColumn("chunk_n_words", F.size("_chunk").cast("long"))
        .withColumn("chunk_digest", F.md5(F.concat_ws(" ", "_chunk")))
        .drop("_chunk", "_w")
    )
