"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats non-text payloads as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` kernels — the
same narrow, zero-shuffle shape as the token feature extractor. The
actual codec work (JPEG decode, audio resample, video frame extraction)
requires libraries not present in this container, so the codec boundary
is explicit:

- ``decode_fn='fake'``  — a deterministic md5-seeded decoder producing a
  fixed-dim feature vector from the payload bytes; real Spark plumbing
  (schema, batching, partitioning) with a fake codec. Used by tests.
- ``decode_fn='real'``  — gated behind import; raises NotImplementedError
  with the dependency name when the library is missing, except audio,
  which falls back to a stdlib `wave` PCM decode (runs in-container,
  tested end-to-end). The call site, batch shape, and output schema are
  identical to the fake path, so swapping in the real codec changes no
  plan.

Multimodal rows are heavy (payloads measured in MB); Arrow batch size is
already bounded by session.py's maxRecordsPerBatch, and the decode stage
is a narrow map — partitioning is inherited from the file scan, which at
scale means one task per input-split of the (Iceberg/parquet) table
holding the payload column.

Reference lineage: the reference's readers hand opaque buffers to typed
decoders (HR2Reader inflates a zlib payload then reinterprets bytes,
/root/reference/src/IO/HR2Reader.cxx:52-239) — the same opaque-bytes ->
typed-array boundary, here at Arrow-batch granularity.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MULTIMODAL_SCHEMA = (
    "doc_id string, modality string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 16


def synth_multimodal(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Deterministic fake multimodal table: payload bytes and metadata are
    pure functions of the row index (md5-seeded)."""
    rng_df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                seed = hashlib.md5(f"mm:{i}".encode()).digest()
                modality = ("image", "audio", "video")[seed[0] % 3]
                size = 256 + seed[1] * 7
                rng = np.random.Generator(np.random.PCG64(int.from_bytes(seed[:8], "little")))
                payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
                meta = {
                    "width": 32 + seed[2] % 64 if modality != "audio" else None,
                    "height": 32 + seed[3] % 64 if modality != "audio" else None,
                    "sample_rate": 16000 if modality == "audio" else None,
                    "n_frames": 1 + seed[4] % 30 if modality == "video" else None,
                }
                rows.append(
                    {"doc_id": f"mm{i:09d}", "modality": modality,
                     "payload": payload, "meta": meta}
                )
            yield pd.DataFrame(rows)

    return rng_df.mapInPandas(gen, MULTIMODAL_SCHEMA)


def _fake_decode(payload: bytes, modality: str) -> np.ndarray:
    """Deterministic stand-in for a codec: FEATURE_DIM floats derived from
    the payload digest — stable across partitionings and engines."""
    d = hashlib.md5(payload).digest()
    base = np.frombuffer(d, dtype=np.uint8).astype(np.float64)
    reps = int(np.ceil(FEATURE_DIM / len(base)))
    v = np.tile(base, reps)[:FEATURE_DIM]
    return v / 255.0


def _image_features_from_array(gray: np.ndarray) -> np.ndarray:
    """FEATURE_DIM floats from a 2-D grayscale array in [0, 1]: a 4x4
    block-mean thumbnail — deterministic, resolution-independent, and the
    same vector the per-frame video path averages."""
    h, w = gray.shape
    side = 4
    ys = np.linspace(0, h, side + 1).astype(int)
    xs = np.linspace(0, w, side + 1).astype(int)
    out = np.empty(FEATURE_DIM, dtype=np.float64)
    for i in range(side):
        for j in range(side):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1), xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[i * side + j] = float(block.mean())
    return out


def _wav_pcm_decode(payload: bytes) -> np.ndarray:
    """Stdlib-only WAV decode (the `wave` module ships with CPython, so
    this real-codec path EXECUTES in this container, unlike the
    soundfile/PIL/PyAV bodies): integer PCM frames -> mono float64 in
    [-1, 1], matching soundfile's normalization for the same container
    (int16/int32 scale 2^(bits-1); u8 is offset binary)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:  # WAV 8-bit is UNSIGNED, midpoint 128
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(
            f"stdlib WAV fallback handles 8/16/32-bit integer PCM, got "
            f"sample width {width}; install soundfile for other encodings"
        )
    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)
    return data


def _rms_envelope(data: np.ndarray) -> np.ndarray:
    """FEATURE_DIM-segment RMS envelope of a mono signal."""
    if data.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    edges = np.linspace(0, data.size, FEATURE_DIM + 1).astype(int)
    out = np.empty(FEATURE_DIM, dtype=np.float64)
    for i in range(FEATURE_DIM):
        seg = data[edges[i]:max(edges[i + 1], edges[i] + 1)]
        out[i] = float(np.sqrt(np.mean(seg * seg)))
    return out


def _real_decode(payload: bytes, modality: str) -> np.ndarray:
    """The real-codec boundary, import-guarded: a missing library raises
    NotImplementedError naming the dependency — EXCEPT audio, which falls
    back to a stdlib `wave` integer-PCM decode, so the real audio path
    executes and is parity-tested in any CPython environment including
    this container. With the libraries present the payload is decoded —
    image: PIL open -> grayscale -> 4x4 block-mean thumbnail; audio:
    soundfile read (preferred; FLAC/OGG/float-PCM) or stdlib WAV -> mono
    -> 16-segment RMS envelope; video: PyAV frame iteration (up to 16
    frames) -> per-frame thumbnail average. All three return FEATURE_DIM
    floats, the same schema as the fake path, so swapping codecs changes
    no plan."""
    import io

    if modality == "image":
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "real image decode requires Pillow (not in this container); "
                "use decode_fn='fake' for plumbing tests"
            ) from e
        img = Image.open(io.BytesIO(payload)).convert("L")
        gray = np.asarray(img, dtype=np.float64) / 255.0
        return _image_features_from_array(gray)
    if modality == "audio":
        try:
            import soundfile
        except ImportError:
            # stdlib fallback: WAV integer-PCM decodes with CPython's
            # `wave` module — the one real codec that runs ANYWHERE,
            # including this container. soundfile stays preferred when
            # present (FLAC/OGG/float-PCM coverage). Non-WAV / corrupt
            # payloads keep the module's dependency-naming contract
            # instead of surfacing an opaque wave.Error from the
            # executor.
            try:
                data = _wav_pcm_decode(payload)
            except NotImplementedError:
                raise
            except Exception as e:
                raise NotImplementedError(
                    "real audio decode without soundfile handles WAV "
                    "integer PCM only (stdlib `wave`); this payload did "
                    f"not decode ({type(e).__name__}: {e}) — install "
                    "soundfile for FLAC/OGG/float-PCM"
                ) from e
            # envelope OUTSIDE the try: its failures are bugs, not
            # payload-format problems, and must not be mislabeled
            return _rms_envelope(data)
        data, _sr = soundfile.read(io.BytesIO(payload), dtype="float64")
        if data.ndim > 1:
            data = data.mean(axis=1)  # downmix to mono
        return _rms_envelope(data)
    if modality == "video":
        try:
            import av
        except ImportError as e:
            raise NotImplementedError(
                "real video decode requires PyAV (not in this container)"
            ) from e
        acc = np.zeros(FEATURE_DIM, dtype=np.float64)
        n = 0
        with av.open(io.BytesIO(payload)) as container:
            for frame in container.decode(video=0):
                gray = frame.to_ndarray(format="gray").astype(np.float64) / 255.0
                acc += _image_features_from_array(gray)
                n += 1
                if n >= FEATURE_DIM:
                    break  # bounded frame sample
        return acc / n if n else acc
    raise ValueError(f"unknown modality {modality!r}")


def extract_multimodal_features(
    df: DataFrame,
    decode_fn: str = "fake",
    output_col: str = "mm_features",
) -> DataFrame:
    """Append a FEATURE_DIM-float feature vector per row from the binary
    payload. Narrow (zero-shuffle) Arrow-batched map; payload passes
    through unchanged."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    decode = _fake_decode if decode_fn == "fake" else _real_decode
    out_schema = StructType(
        df.schema.fields + [StructField(output_col, ArrayType(DoubleType()), True)]
    )

    def fn(batches):
        for pdf in batches:
            out = pdf.copy()
            # null payload (failed fetch) -> null features; one bad row
            # must not kill the whole extraction job
            out[output_col] = [
                None if p is None else decode(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield out

    return df.mapInPandas(fn, out_schema)


def frame_sample(
    df: DataFrame,
    locations=(0.0, 0.5, 1.0),
    out_col: str = "frame_idx",
) -> DataFrame:
    """Fractional frame selection for video rows (ExtractSlices semantics,
    /root/reference/tools/ExtractSlices.cxx:166-204): round(loc*(n-1)),
    dedup, one output row per selected frame. Pure column ops — no UDF."""
    n = F.col("meta.n_frames")
    idxs = F.array_distinct(
        F.array(
            *[
                F.round(F.lit(loc) * (n - 1)).cast("int")
                for loc in locations
            ]
        )
    )
    return (
        df.where(F.col("modality") == "video")
        .withColumn(out_col, F.explode(idxs))
    )


def resize_meta(df: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-level resize (the codec-side pixel work is behind the
    decode boundary): rewrite target dimensions for image/video rows."""
    new_meta = F.struct(
        F.lit(int(width)).alias("width"),
        F.lit(int(height)).alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    return df.withColumn(
        "meta",
        F.when(F.col("modality").isin("image", "video"), new_meta).otherwise(
            F.col("meta")
        ),
    )
