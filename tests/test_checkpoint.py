"""Checkpoint/resume: idempotent re-run, crash-mid-job resume, lineage
metrics, and output equality with a single-shot run."""

import os

import pytest
from pyspark.sql import functions as F

from image_feature_extraction_spark import synth
from image_feature_extraction_spark.operators.features import extract_features
from image_feature_extraction_spark.plans import checkpoint as C

UNITS = ["src0", "src1", "src2"]


def _job(spark, unit):
    docs = synth.token_table(spark, 64).where(F.col("source") == unit)
    return extract_features(docs, scales=(1.0,)).select(
        "doc_id", "n_tok", "source", "features"
    )


def test_checkpoint_run_resume_identical(spark, tmp_path):
    out = str(tmp_path / "ckpt")
    r1 = C.run_checkpointed(spark, out, UNITS, _job)
    assert sorted(r1["ran"]) == sorted(UNITS) and not r1["skipped"]

    # second run: everything skipped, nothing recomputed
    r2 = C.run_checkpointed(spark, out, UNITS, _job)
    assert not r2["ran"] and sorted(r2["skipped"]) == sorted(UNITS)

    got = C.read_output(spark, out).select("doc_id", "source").toPandas()
    want = (
        synth.token_table(spark, 64)
        .where(F.col("source").isin(UNITS))
        .select("doc_id", "source")
        .toPandas()
    )
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])

    led = C.read_ledger(spark, out).toPandas()
    assert len(led) == len(UNITS)
    assert (led["status"] == "done").all()
    assert (led["rows_out"] > 0).all()
    assert (led["wall_sec"] > 0).all()


def test_checkpoint_crash_resume(spark, tmp_path):
    out = str(tmp_path / "ckpt2")

    calls = []

    def flaky(spark_, unit):
        calls.append(unit)
        if unit == "src1" and calls.count("src1") == 1:
            raise RuntimeError("simulated crash")
        return _job(spark_, unit)

    with pytest.raises(RuntimeError):
        C.run_checkpointed(spark, out, UNITS, flaky)
    done_before = C.completed_units(spark, out)
    assert "src0" in done_before and "src1" not in done_before

    # resume: only the crashed + not-reached units run
    r = C.run_checkpointed(spark, out, UNITS, flaky)
    assert sorted(r["ran"]) == ["src1", "src2"]
    assert r["skipped"] == ["src0"]
    assert C.completed_units(spark, out) == set(UNITS)


def test_partial_data_without_ledger_is_overwritten(spark, tmp_path):
    out = str(tmp_path / "ckpt3")
    # simulate a crash AFTER data write but BEFORE the ledger row
    udir = os.path.join(out, "data", "part=src0")
    os.makedirs(udir, exist_ok=True)
    with open(os.path.join(udir, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    r = C.run_checkpointed(spark, out, ["src0"], _job)
    assert r["ran"] == ["src0"]
    # the garbage file is gone; output is readable and correct
    df = C.read_output(spark, out)
    assert df.count() == df.where(F.col("source") == "src0").count()


def test_read_output_hides_uncommitted_partial_unit(spark, tmp_path):
    """A crash between a unit's data write and its ledger publish must be
    invisible to READERS: read_output returns only ledger-complete units."""
    out = str(tmp_path / "ckpt")
    C.run_checkpointed(spark, out, ["src0"], _job)
    # simulate the crash: src1's data exists, its ledger row does not
    _job(spark, "src1").write.mode("overwrite").parquet(
        os.path.join(out, "data", "part=src1")
    )
    got = C.read_output(spark, out).select("source").distinct().toPandas()
    assert got["source"].tolist() == ["src0"]
    # after the resume completes src1, it becomes visible
    C.run_checkpointed(spark, out, ["src0", "src1"], _job)
    got2 = set(C.read_output(spark, out).select("source").distinct().toPandas()["source"])
    assert got2 == {"src0", "src1"}
