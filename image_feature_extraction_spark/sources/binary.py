"""Binary-format source: tagged, zlib-compressed sequence files.

A from-scratch re-expression of the reference's HR2 reader pattern
(/root/reference/src/IO/HR2Reader.cxx:52-239: parse header tags, inflate
the payload, reinterpret bytes as a typed array) as a Spark source:
``spark.read.format("binaryFile")`` scans the files in parallel (one task
per file / split), and an Arrow-batched ``mapInPandas`` decodes each blob
to typed rows. The format itself is this engine's own (SEQ1): a minimal
tagged container sufficient to round-trip token sequences.

SEQ1 layout (little-endian):
    magic   4s  = b"SEQ1"
    id_len  u32, doc_id utf-8 bytes
    n_tok   u32
    comp    u8  (0 = raw, 1 = zlib)
    data_len u32, payload = (zlib-compressed) int32[n_tok]

At 100 TB this shape is how cold archives (crawl dumps, vendor drops)
enter the engine before conversion to parquet/Iceberg; binaryFile scans
parallelize per file, so ingest throughput is bounded by file count and
size distribution, not by a single reader.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"SEQ1"

DECODED_SCHEMA = "doc_id string, tokens array<int>, n_tok int, path string"


def write_seq_file(path: str, doc_id: str, tokens: np.ndarray, compress: bool = True) -> None:
    """Writer (driver-side helper for tests/ingest fixtures)."""
    tokens = np.asarray(tokens, dtype=np.int32)
    raw = tokens.tobytes()
    payload = zlib.compress(raw) if compress else raw
    with open(path, "wb") as f:
        f.write(MAGIC)
        did = doc_id.encode()
        f.write(struct.pack("<I", len(did)))
        f.write(did)
        f.write(struct.pack("<I", len(tokens)))
        f.write(struct.pack("<B", 1 if compress else 0))
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)


def decode_seq_bytes(blob: bytes) -> tuple[str, np.ndarray]:
    if blob[:4] != MAGIC:
        raise ValueError(f"bad magic {blob[:4]!r}")
    off = 4
    (id_len,) = struct.unpack_from("<I", blob, off)
    off += 4
    doc_id = blob[off : off + id_len].decode()
    off += id_len
    (n_tok,) = struct.unpack_from("<I", blob, off)
    off += 4
    (comp,) = struct.unpack_from("<B", blob, off)
    off += 1
    (data_len,) = struct.unpack_from("<I", blob, off)
    off += 4
    payload = blob[off : off + data_len]
    raw = zlib.decompress(payload) if comp else payload
    tokens = np.frombuffer(raw, dtype=np.int32)
    if len(tokens) != n_tok:
        raise ValueError(f"{doc_id}: expected {n_tok} tokens, got {len(tokens)}")
    return doc_id, tokens


def read_seq_files(spark: SparkSession, path: str, glob: str = "*.seq") -> DataFrame:
    """Distributed read: binaryFile scan + mapInPandas decode."""
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def fn(batches):
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                doc_id, tokens = decode_seq_bytes(bytes(blob))
                rows.append(
                    {"doc_id": doc_id, "tokens": tokens, "n_tok": len(tokens),
                     "path": os.path.basename(str(p))}
                )
            yield pd.DataFrame(rows)

    return scan.mapInPandas(fn, DECODED_SCHEMA)
