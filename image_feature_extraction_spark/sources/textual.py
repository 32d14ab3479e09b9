"""Text-format sources: ROI box files and pair-list manifests.

From-scratch Spark re-expressions of the reference's text readers:

- ROI files (``[x,y,z][sx,sy,sz]`` per line, optional header) —
  /root/reference/include/ife/IO/ROIReader.hxx:24-48. Parsed with
  ``spark.read.text`` + one regexp; malformed lines surface in an
  ``_invalid`` column instead of silently vanishing (the reference throws
  on first bad line; a distributed reader reports them all).

- Pair-list manifests (``image<sep>mask`` CSV) —
  /root/reference/src/IO/IO.cxx:20-41 (trims whitespace, errors on
  unsplittable lines). Here: csv read + trim + validation columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROI_PATTERN = (
    r"^\s*\[\s*(-?\d+)\s*,\s*(-?\d+)\s*,\s*(-?\d+)\s*\]"
    r"\s*\[\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\]\s*$"
)


def read_roi_file(spark: SparkSession, path: str, header: bool = False) -> DataFrame:
    """ROI boxes -> (x, y, z, sx, sy, sz, _invalid). Lines that do not
    match the format keep their text in _invalid (callers decide to fail
    or filter); header line skipped when header=True."""
    lines = spark.read.text(path)
    if header:
        lines = (
            lines.withColumn("_rn", F.monotonically_increasing_id())
            .where(F.col("_rn") > 0)
            .drop("_rn")
        )
    cols = [
        F.regexp_extract("value", ROI_PATTERN, i + 1).alias(c)
        for i, c in enumerate(["x", "y", "z", "sx", "sy", "sz"])
    ]
    parsed = lines.select(F.col("value"), *cols)
    ok = F.col("x") != ""
    out = parsed.select(
        *[
            F.when(ok, F.col(c).cast("int")).alias(c)
            for c in ["x", "y", "z", "sx", "sy", "sz"]
        ],
        F.when(~ok & (F.trim("value") != ""), F.col("value")).alias("_invalid"),
    )
    return out.where(F.col("_invalid").isNotNull() | F.col("x").isNotNull())


def read_pair_list(
    spark: SparkSession, path: str, sep: str = ","
) -> DataFrame:
    """Manifest of (image, mask) paths with reference semantics: trim both
    fields; rows that cannot be split into exactly two non-empty fields
    carry _invalid."""
    lines = spark.read.text(path)
    parts = F.split("value", sep)
    out = lines.select(
        F.when(F.size(parts) == 2, F.trim(parts[0])).alias("image"),
        F.when(F.size(parts) == 2, F.trim(parts[1])).alias("mask"),
        F.when(
            (F.size(parts) != 2) & (F.trim("value") != ""), F.col("value")
        ).alias("_invalid"),
    )
    return out.where(
        F.col("_invalid").isNotNull()
        | (F.col("image").isNotNull() & (F.col("image") != ""))
    )


def read_text_matrix(
    spark: SparkSession,
    path: str,
    col_sep: str = ",",
) -> DataFrame:
    """Dense numeric CSV matrix with the reference's rectangularity
    contract (readTextMatrix, /root/reference/include/ife/IO/IO.h:77-107:
    the first row fixes the column count, later rows must match — the
    reference asserts; a distributed reader surfaces offenders).

    Returns (row_idx, values array<double>, n_cols, _invalid): _invalid
    carries the raw line for rows whose width differs from the first
    row's or that fail numeric parse. Row order is the file order
    (zipWithIndex over a single-file text scan).
    """
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    lines = spark.read.text(path)
    rdd = lines.rdd.zipWithIndex().map(lambda t: (t[1], t[0]["value"]))
    schema = StructType(
        [
            StructField("row_idx", LongType()),
            StructField("values", ArrayType(DoubleType())),
            StructField("n_cols", IntegerType()),
            StructField("_invalid", StringType()),
        ]
    )
    parsed = spark.createDataFrame(
        rdd.map(lambda t: _parse_matrix_row(t[0], t[1], col_sep)), schema
    )
    first = parsed.where(
        (F.col("row_idx") == 0) & F.col("_invalid").isNull()
    ).select(F.col("n_cols").alias("_want"))
    out = parsed.crossJoin(F.broadcast(first))
    return out.select(
        "row_idx",
        F.when(F.col("n_cols") == F.col("_want"), F.col("values")).alias("values"),
        "n_cols",
        F.coalesce(
            F.col("_invalid"),
            F.when(
                F.col("n_cols") != F.col("_want"),
                F.concat(F.lit("width mismatch: "), F.col("n_cols").cast("string")),
            ),
        ).alias("_invalid"),
    )


def _parse_matrix_row(idx: int, line: str, sep: str):
    s = line.strip()
    if not s:
        return (idx, None, None, "empty line")
    try:
        vals = [float(x) for x in s.split(sep)]
    except ValueError:
        return (idx, None, None, line)
    return (idx, vals, len(vals), None)
