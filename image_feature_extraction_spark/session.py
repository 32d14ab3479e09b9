"""SparkSession builder tuned for the feature-engineering engine.

Local defaults mirror what a 1000-executor cluster deployment would set:
Arrow-batched Python UDF transfer, AQE with skew-join handling, explicit
shuffle partition count. On a real cluster the same builder is used with
``master`` unset (taken from spark-submit) and shuffle partitions sized to
2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# Token docs are heavy rows (~4 KiB avg); keep Arrow batches moderate so a
# batch of hot 8192-token docs stays well under executor memory.
ARROW_BATCH_ROWS = 512


def get_spark(
    app_name: str = "image-feature-extraction-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Make this package importable by Python workers regardless of the
    # caller's cwd. On a real cluster the same is achieved with
    # `spark-submit --py-files image_feature_extraction_spark.zip`; in local
    # mode workers inherit the driver env, so PYTHONPATH must be set BEFORE
    # the JVM starts.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Under spark-submit (detected via the pre-launched JVM gateway env)
    # the master comes from --master — setting one here would silently
    # override a cluster master with local[N]. Only default to local[N]
    # for plain-python launches, which have no other source of a master.
    under_spark_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    master = master or os.environ.get("SPARK_MASTER") or (
        None if under_spark_submit else f"local[{cpus}]"
    )
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        # keep per-task numpy single-threaded; parallelism comes from tasks
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Make this package importable by Python workers of an EXISTING session
    (e.g. the driver's own SparkSession, created before our PYTHONPATH
    export). Ships the package as a zip via addPyFile — the local-mode
    equivalent of `spark-submit --py-files`."""
    import tempfile
    import zipfile

    if getattr(spark, "_ife_pyfiles_added", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), f"{pkg_name}_pyfiles.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark._ife_pyfiles_added = True


def sf_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load driver testdata parquet tables as DataFrames."""
    out = [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]
    return out[0] if len(out) == 1 else out


def widen_small_scan(df, target: int | None = None):
    """Repartition a SMALL file scan up to the session's default
    parallelism before compute-heavy per-row work.

    A file smaller than one split scans as ONE task, serializing every
    downstream narrow operator (measured 10x on shingling at sf0.1: one
    580 KB parquet file -> 32 tasks, 7.9s -> 0.7s). The exchange moves
    only the small input. Inputs that already scan wide — the 100 TB
    case, where an extra exchange would be catastrophic — pass through
    untouched. The wide/narrow decision asks Spark for the ACTUAL planned
    scan partition count (openCostInBytes bin-packing makes any
    driver-side model of it approximate, in both directions): an O(1)
    check, so a 400k-file production scan pays no per-file work here. An
    under-parallel scan is then widened only when its total bytes fit
    inside one split (statted with an early exit at that bound) — a big
    but under-split input keeps its plan, since repartitioning it would
    move more data than the widening saves. Unstattable paths (object
    stores without local access) and non-file sources (synth mapInArrow
    tables) also pass through untouched."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    if df.rdd.getNumPartitions() >= target:
        return df  # already scans wide — the common big-input case
    max_split = int(
        _parse_bytes(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
    )
    total = 0
    for p in files:
        try:
            total += os.path.getsize(
                p[len("file:"):] if p.startswith("file:") else p
            )
        except OSError:
            return df  # can't stat (remote store): keep Spark's plan
        if total > max_split:
            return df  # big input: widening would outweigh the gain
    return df.repartition(target)


def _parse_bytes(v) -> float:
    """'128m' / '128mb' / '1g' / plain-number byte-size conf values."""
    s = str(v).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in "kmg":
        mult = {"k": 2**10, "m": 2**20, "g": 2**30}[s[-1]]
        s = s[:-1]
    return float(s) * mult
