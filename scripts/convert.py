"""Format-conversion CLI (SURVEY §2 S9): any supported source -> parquet.

The reference ships per-format conversion executables
(/root/reference/tools/Convert*.cxx pattern — read one format, write
another); the Spark-first equivalent is one job per conversion: a
parallel source read piped to a parquet write, so the conversion
inherits the engine's scan parallelism and restartability instead of
being a single-process file walk.

Usage:
    python scripts/convert.py --format seq1    --path 'dir'  --out out_dir
    python scripts/convert.py --format roi     --path f.roi  --out out_dir
    python scripts/convert.py --format pairs   --path f.csv  --out out_dir
    python scripts/convert.py --format matrix  --path f.csv  --out out_dir
    python scripts/convert.py --format octave  --path f.mat  --out out_dir

Formats with an `_invalid` column fail the conversion when offenders are
present unless --keep-invalid is given (then they are written too, so
the offending lines stay auditable in the output).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--format", required=True,
                    choices=["seq1", "roi", "pairs", "matrix", "octave"])
    ap.add_argument("--path", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--keep-invalid", action="store_true")
    ap.add_argument("--mode", default="errorifexists",
                    choices=["errorifexists", "overwrite"])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from image_feature_extraction_spark.session import get_spark
    from image_feature_extraction_spark.sources import binary as B
    from image_feature_extraction_spark.sources import textual as T

    spark = get_spark(app_name=f"convert-{args.format}")
    if args.format == "seq1":
        df = B.read_seq_files(spark, args.path)
    elif args.format == "roi":
        df = T.read_roi_file(spark, args.path)
    elif args.format == "pairs":
        df = T.read_pair_list(spark, args.path)
    elif args.format == "matrix":
        df = T.read_text_matrix(spark, args.path)
    else:  # octave
        header, df = T.read_octave_volume(spark, args.path)
        print(f"octave header: {header}")

    if "_invalid" in df.columns and not args.keep_invalid:
        bad = df.where(F.col("_invalid").isNotNull())
        n_bad = bad.count()
        if n_bad:
            for r in bad.limit(10).collect():
                print(f"INVALID: {r['_invalid']}", file=sys.stderr)
            raise SystemExit(
                f"{n_bad} invalid rows; rerun with --keep-invalid to write anyway"
            )
        df = df.drop("_invalid")

    df.write.mode(args.mode).parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} rows -> {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
