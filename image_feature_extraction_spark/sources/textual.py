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
        # skip the first line of EACH file (a glob reads several ROI
        # files, each with its own header; a global id==0 test would skip
        # one arbitrary line and keep every other header). Within-file
        # order note: ROI files are single-split sized; for a file large
        # enough to split, first-line identification would need offsets.
        from pyspark.sql import Window

        w = Window.partitionBy(F.input_file_name()).orderBy(
            F.monotonically_increasing_id()
        )
        lines = (
            lines.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") > 1)
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
    fields; rows that cannot be split into exactly two NON-EMPTY fields
    carry _invalid (the reference errors on unsplittable lines — an empty
    field is just as unusable as a missing separator). `sep` is a literal
    separator (\\Q-quoted; F.split takes a regex)."""
    lines = spark.read.text(path)
    parts = F.split("value", "\\Q" + sep + "\\E")
    # F.get, not [i]: ANSI mode throws on out-of-bounds array indexing,
    # and the condition is evaluated for every row incl. 1-field lines
    p0, p1 = F.get(parts, 0), F.get(parts, 1)
    well_formed = (
        (F.size(parts) == 2) & (F.trim(p0) != "") & (F.trim(p1) != "")
    )
    out = lines.select(
        F.when(well_formed, F.trim(p0)).alias("image"),
        F.when(well_formed, F.trim(p1)).alias("mask"),
        F.when(
            ~well_formed & (F.trim("value") != ""), F.col("value")
        ).alias("_invalid"),
    )
    return out.where(F.col("_invalid").isNotNull() | F.col("image").isNotNull())


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
    (row_number over monotonically_increasing_id — manifest-sized inputs;
    the single-partition window is the documented cost of a total order).

    If row 0 itself is invalid (empty or unparseable) there is no width
    reference: EVERY row comes back with _invalid set ("no width
    reference...") rather than silently vanishing — the distributed
    reading of the reference's assert-on-first-line behavior.
    Pure DataFrame plan — no RDD API.
    """
    from pyspark.sql import Window

    lines = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    idx = lines.select(
        (F.row_number().over(w) - 1).cast("long").alias("row_idx"), "value"
    )
    # \Q...\E: col_sep is a LITERAL separator (F.split takes a regex; an
    # unquoted '|' or '.' would split between every character)
    toks = F.split(F.trim("value"), "\\Q" + col_sep + "\\E")
    vals = F.transform(toks, lambda x: F.trim(x).try_cast("double"))
    parsed = idx.select(
        "row_idx",
        F.when(F.trim("value") == "", F.lit("empty line"))
        .when(F.exists(vals, lambda v: v.isNull()), F.col("value"))
        .alias("_bad"),
        vals.alias("_vals"),
        F.size(vals).alias("_n"),
    ).select(
        "row_idx",
        F.when(F.col("_bad").isNull(), F.col("_vals")).alias("values"),
        F.when(F.col("_bad").isNull(), F.col("_n")).alias("n_cols"),
        F.col("_bad"),
    )
    first = parsed.where(
        (F.col("row_idx") == 0) & F.col("_bad").isNull()
    ).select(F.col("n_cols").alias("_want"))
    # LEFT join (not cross): when row 0 is invalid `first` is empty and
    # every row must still come out, flagged
    out = parsed.join(F.broadcast(first), F.lit(True), "left")
    invalid = F.coalesce(
        F.col("_bad"),
        F.when(F.col("_want").isNull(), F.lit("no width reference: row 0 invalid")),
        F.when(
            F.col("n_cols") != F.col("_want"),
            F.concat(F.lit("width mismatch: "), F.col("n_cols").cast("string")),
        ),
    )
    return out.select(
        "row_idx",
        F.when(invalid.isNull(), F.col("values")).alias("values"),
        "n_cols",
        invalid.alias("_invalid"),
    )


def read_octave_header(spark: SparkSession, path: str) -> dict:
    """Parse the 5-line Octave ASCII header
    (/root/reference/include/ife/IO/OctaveReader.hxx:20-68 semantics,
    re-derived): '# <creator>', '# name: v', '# type: matrix',
    '# ndims: N', then N space-separated sizes. Raises ValueError on the
    same malformations the reference throws on."""
    head = [r.value for r in spark.read.text(path).limit(5).collect()]
    if len(head) < 5:
        raise ValueError("Error reading header")

    def _kv(line: str, key: str) -> str:
        parts = line.split(":", 1)
        if len(parts) != 2 or parts[0].strip("# ").strip() != key:
            raise ValueError(f"Expected '# {key}: <value>'")
        return parts[1].strip()

    creator = head[0].strip("# ").strip()
    name = _kv(head[1], "name")
    mtype = _kv(head[2], "type")
    ndims = int(_kv(head[3], "ndims"))
    sizes = [int(s) for s in head[4].split()]
    if len(sizes) != ndims:
        raise ValueError("ndims and number of size fields do not match")
    return {
        "creator": creator,
        "name": name,
        "type": mtype,
        "ndims": ndims,
        "size": sizes,
    }


def read_octave_volume(spark: SparkSession, path: str) -> tuple[dict, DataFrame]:
    """Octave ASCII 3-D volume (SURVEY §2 S4) -> (header, DataFrame of
    (x, y, z, value)) with the reference's layout: values stream in slice
    order (z outer), each slice column-major with y FASTEST, then x
    (OctaveReader.hxx:118-141: ``for z / for x / for y: is >> p``), i.e.
    token k maps to y = k % sy, x = (k // sy) % sx, z = k // (sy*sx).

    Spark-first: the token stream is exploded with per-line cumulative
    offsets (window over the line order), so the coordinate math is pure
    Catalyst; only the 5 header lines touch the driver. Raises ValueError
    when the token count does not equal sx*sy*sz (the reference's
    'Not enough values in file'), counting extra values as an error too —
    a distributed reader cannot silently stop early."""
    from pyspark.sql import Window

    header = read_octave_header(spark, path)
    if header["ndims"] != 3:
        raise ValueError("Dimension must be 3")
    sx, sy, sz = header["size"]

    lines = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    idx = lines.select(
        (F.row_number().over(w) - 1).cast("long").alias("row_idx"), "value"
    ).where(F.col("row_idx") >= 5)
    toks = F.filter(F.split(F.trim("value"), r"\s+"), lambda t: t != "")
    counted = idx.select("row_idx", toks.alias("_toks"), F.size(toks).alias("_n"))
    wo = Window.orderBy("row_idx").rowsBetween(Window.unboundedPreceding, -1)
    offs = counted.withColumn(
        "_off", F.coalesce(F.sum("_n").over(wo), F.lit(0)).cast("long")
    )
    ex = offs.select("_off", F.posexplode("_toks").alias("_pos", "_tok"))
    lin = (F.col("_off") + F.col("_pos")).alias("_k")
    vol = ex.select(
        lin,
        F.col("_tok").try_cast("double").alias("value"),
    ).select(
        ((F.col("_k") / F.lit(sy)).cast("long") % F.lit(sx)).cast("int").alias("x"),
        (F.col("_k") % F.lit(sy)).cast("int").alias("y"),
        (F.col("_k") / F.lit(sy * sx)).cast("long").cast("int").alias("z"),
        "value",
        "_k",
    )
    # cache before the eager validation: the count below and the caller's
    # first action would otherwise both execute the (serial, single-
    # partition-window) parse plan. The cache is registered on the RETURNED
    # plan (post-drop — Dataset.unpersist matches plans exactly, so caching
    # the pre-drop frame would make the caller's unpersist a no-op): the
    # returned DataFrame is cached and CALLER-OWNED; unpersist it after the
    # first materialization. The validation-error paths unpersist before
    # raising so a rejected file never leaks a cache entry.
    vol = vol.drop("_k").cache()
    try:
        counts = vol.agg(
            F.count(F.lit(1)).alias("n_tok"), F.count("value").alias("n_parsed")
        ).first()
        n_tok, n_parsed = counts["n_tok"], counts["n_parsed"]
        if n_tok != sx * sy * sz:
            raise ValueError(
                f"Not enough values in file: got {n_tok}, want {sx * sy * sz}"
                if n_tok < sx * sy * sz
                else f"Too many values in file: got {n_tok}, want {sx * sy * sz}"
            )
        if n_parsed != n_tok:
            # try_cast nulls garbled tokens; loading them as null voxels
            # would silently corrupt the volume — raise like the reference
            raise ValueError(f"{n_tok - n_parsed} unparseable values in file")
    except BaseException:
        vol.unpersist()
        raise
    return header, vol


def write_text_matrix(
    df: DataFrame,
    path: str,
    col_sep: str = ",",
    order_col: str = "row_idx",
    values_col: str = "values",
    fmt: str = "%.17g",
) -> None:
    """Write a (row_idx, values array<double>) frame as a dense text
    matrix in row order — the reference's writeSequenceAsText /
    writeTextMatrix output side (include/ife/IO/IO.h:24-41, re-derived).

    %.17g round-trips float64 exactly through read_text_matrix (tested).
    The single ordered text file is inherently a one-reducer sink —
    matrices written this way are small interchange artifacts (bag CSVs,
    edge tables), not datasets; big outputs belong in parquet.
    """
    rows = (
        df.orderBy(order_col)
        .select(
            F.concat_ws(
                col_sep,
                F.transform(values_col, lambda x: F.format_string(fmt, x)),
            ).alias("value")
        )
        .coalesce(1)
    )
    rows.write.mode("overwrite").text(path)
