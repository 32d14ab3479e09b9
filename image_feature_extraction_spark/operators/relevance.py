"""Corpus relevance scoring: BM25 / TF-IDF over the documents table.

The ranking function a retrieval-augmented training pipeline uses to
select or weight documents against a query mix — and the one deduped
corpora are re-scored with after near-dup removal. The reference's
analogue is its bag-of-features weighting (cited for parity:
/root/reference/tools/MakeBag.cxx:380-420 — per-sample histogram counts
normalized by corpus-wide frequencies); BM25 is the text-retrieval form
of the same tf x inverse-corpus-frequency shape.

Determinism contract — the one transcendental in the package:

- idf(df) = ln((N - df + 0.5) / (df + 0.5) + 1) needs a natural log.
  Spark's JVM ``Math.log`` is NOT bit-identical to DuckDB's libm ``ln``
  (measured: 40/504 values differ by 1 ulp on this host), so the
  hash-exact contract CANNOT use F.log in the query path. Python's
  ``math.log`` IS bit-identical to DuckDB's ``ln`` (same C libm;
  measured: 0/5600 mismatches), so the oracle-parity path joins a
  driver-built (df -> idf) lookup table computed with math.log, while
  the oracle computes ln(...) natively in SQL from the SAME expression
  structure. Everything else (tf saturation, length normalization,
  avgdl) is exact-rational double arithmetic emitted once as shared SQL
  text (``_bm25_score_expr``).
- ``idf="native"`` is the PRODUCTION path (in-engine F.log, no LUT):
  idf within 1 ulp of the LUT value (Math.log vs math.log, each
  correctly-rounded-or-1-ulp on the SAME exact argument), and SCORES
  within 2 ulp — the idf's 1-ulp relative error rides through the
  saturation product and its final rounding can add up to one more
  (property-tested across random corpora: measured max exactly 2.0
  ulp, 6 of ~1900 postings past 1 ulp). No driver-side work, any
  corpus size.

Scale notes (10^12 docs):
- the term explode + (doc_id, term) count is the standard inverted-index
  shuffle; the df window re-keys by term (hot terms are counters after
  partial aggregation, not row floods, because COUNT over the window is
  implemented here as a groupBy + broadcast-join-free window over
  already-aggregated (doc,term) rows — one row per posting);
- the LUT path collects |distinct df| <= N rows and is therefore gated
  by ``max_lut_rows`` exactly like lm.score_docs's model LUT; production
  uses ``idf="native"`` which keeps the whole plan in codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import words_of

BM25_K1 = "1.2"
BM25_B = "0.75"

# idf argument, shared text: both the SQL oracle and the Python LUT
# builder compute (N - df + 0.5) / (df + 0.5) + 1 with this exact
# operation order (integer subtract exact in double, +0.5 exact,
# one correctly-rounded division, one correctly-rounded add).
IDF_ARG_SQL = (
    "((CAST(n_docs - df_count AS DOUBLE) + 0.5) / "
    "(CAST(df_count AS DOUBLE) + 0.5) + 1)"
)


def idf_value(n_docs: int, df_count: int) -> float:
    """Python twin of ``LN(IDF_ARG_SQL)`` — bit-identical to DuckDB's ln
    on glibc hosts (module docstring has the measurement)."""
    return math.log((float(n_docs - df_count) + 0.5) / (float(df_count) + 0.5) + 1.0)


def _bm25_score_expr(idf_col: str) -> str:
    """BM25 score as shared SQL text over columns tf (BIGINT), dl
    (BIGINT), avgdl (DOUBLE) and a bound idf column. k1/b are literal
    doubles, identical in both parsers."""
    return (
        f"{idf_col} * (CAST(tf AS DOUBLE) * ({BM25_K1} + 1)) / "
        f"(CAST(tf AS DOUBLE) + {BM25_K1} * "
        f"(1 - {BM25_B} + {BM25_B} * CAST(dl AS DOUBLE) / avgdl))"
    )


def bm25_topk(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    idf: str = "lut",
    max_lut_rows: int = 1 << 20,
) -> DataFrame:
    """Top-k BM25 terms per document (score DESC, term ASC tie-break).

    Output: doc_id, term, tf, df_count, dl, score, rank. Whitespace
    tokenization with multiplicities (dedup.words_of — the documented
    [''] wart for empty docs applies identically in the oracle).

    idf="lut": hash-exact oracle-parity path (driver-built idf table,
    broadcast). idf="native": production path (F.log in-engine).
    """
    from ..session import widen_small_scan

    spark = docs.sparkSession
    docs = widen_small_scan(docs)  # pre-exchange tokenization must not
    # serialize on a sub-split file scan; wide inputs pass through
    terms = docs.select(
        "doc_id", F.explode(words_of(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # one row per posting; window ORDER matters for the plan: df (term
    # exchange) FIRST, then dl (doc exchange) — the final rank window is
    # also doc-keyed, so dl and rank share one exchange (verified: 3
    # posting-table exchanges total, vs 4 with dl-then-df)
    tf = tf.withColumn(
        "df_count", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
    )
    # avgdl/n_docs from a NARROW pass over docs (size of the split array
    # == SUM(tf) per doc, same [''] wart) — not from tf, whose lineage
    # would duplicate the whole (doc,term) shuffle subtree
    totals = docs.select(
        F.size(words_of(F.col(text_col))).cast("long").alias("dl")
    ).agg(F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs"))
    if idf == "lut":
        # ONE bounded collect (1 row) feeds avgdl/n_docs back as literals
        # — re-using the `totals` plan in a crossJoin would re-execute
        # the docs scan+aggregate a second time at action time. Python
        # float division of the same two integers is the same correctly-
        # rounded IEEE double the SQL division produces.
        trow = totals.collect()[0]
        n_docs = int(trow["n_docs"])
        avgdl = (
            float(trow["sum_dl"]) / float(n_docs) if n_docs else None
        )
        tf = tf.withColumn(
            "avgdl", F.lit(avgdl).cast("double")
        ).withColumn("n_docs", F.lit(n_docs).cast("long"))
        if n_docs > max_lut_rows:
            raise ValueError(
                f"n_docs={n_docs} exceeds max_lut_rows={max_lut_rows}; "
                'use idf="native" for large corpora'
            )
        lut = spark.createDataFrame(
            [(d, idf_value(n_docs, d)) for d in range(1, n_docs + 1)],
            "df_count long, idf double",
        )
        tf = tf.join(F.broadcast(lut), "df_count")
    elif idf == "native":
        # no driver action on this path: totals stays a broadcast subplan
        tf = tf.crossJoin(
            F.broadcast(
                totals.select(
                    (
                        F.col("sum_dl").cast("double")
                        / F.col("n_docs").cast("double")
                    ).alias("avgdl"),
                    "n_docs",
                )
            )
        )
        tf = tf.withColumn("idf", F.expr(f"LN{IDF_ARG_SQL}"))
    else:
        raise ValueError(f"unknown idf mode: {idf!r}")
    scored = tf.withColumn("score", F.expr(_bm25_score_expr("idf")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df_count", "dl", "score", "rank")
    )


def bm25_oracle_sql(table: str, text_col: str = "text", k: int = 3) -> str:
    """DuckDB oracle: native ln over the shared IDF_ARG_SQL text plus the
    shared score expression — bit-identical to the LUT path because
    DuckDB's ln and Python's math.log share libm."""
    return f"""
    WITH terms AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim({text_col}), '\\s+')) AS term
      FROM {table}
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
    posting AS (
      SELECT *,
             COUNT(*) OVER (PARTITION BY term) AS df_count,
             SUM(tf) OVER (PARTITION BY doc_id) AS dl
      FROM tf
    ),
    totals AS (
      -- mirrors the Spark totals branch: doc length from the split
      -- array directly (== SUM(tf) per doc), one narrow pass
      SELECT CAST(SUM(len(regexp_split_to_array(trim({text_col}), '\\s+'))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             COUNT(*) AS n_docs
      FROM {table}
    ),
    scored AS (
      SELECT p.doc_id, p.term,
             CAST(p.tf AS BIGINT) AS tf,
             CAST(p.df_count AS BIGINT) AS df_count,
             CAST(p.dl AS BIGINT) AS dl,
             {_bm25_score_expr(f"LN{IDF_ARG_SQL}")} AS score
      FROM posting p CROSS JOIN totals
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc_id, term, tf, df_count, dl, score, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """
