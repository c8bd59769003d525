"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The real decode step (PIL / ffmpeg / soundfile) is NOT in this container,
so the codec boundary is STUBBED — ``_decode_bytes`` raises
NotImplementedError for real codecs and provides a deterministic fake for
the 'raw' codec used by tests. Everything AROUND the stub is real Spark
plumbing and is what matters at 100 TB:

- blobs travel as a ``binary`` column with a typed metadata struct
  (never exploded into the row — column pruning keeps metadata-only
  queries from reading bytes);
- per-batch work goes through ``mapInPandas`` (Arrow batches of bytes,
  not row-at-a-time pickling);
- feature extraction emits fixed-width ``array<float>`` ready for the
  similarity operators (functions/similarity.py).

This mirrors how the reference treats its 4096×2051 pixel arrays: read,
correct, reduce to per-source rows, drop the pixels
(wfc3_cte_monitor/run_image_extraction.py:93-143 apply_pam; :139-141
explicit del of arrays).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOB_SCHEMA = (
    "blob_id bigint, kind string, codec string, content binary,"
    " meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURE_DIM = 16


def make_blob_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a blob table from the documents corpus: utf-8 bytes as
    'raw'-codec image stand-ins with deterministic metadata."""
    from ..sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("blob_id"),
        F.lit("image").alias("kind"),
        F.lit("raw").alias("codec"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (F.length("text") % 512 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 512 + 16).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_bytes(content: bytes, codec: str, width: int, height: int) -> np.ndarray:
    """Codec boundary. Real codecs are stubbed (libs not in container)."""
    if codec == "raw":
        # deterministic fake: bytes tiled into a (height, width) uint8 grid
        arr = np.frombuffer(content, dtype=np.uint8)
        need = width * height
        tiled = np.resize(arr, need) if arr.size else np.zeros(need, dtype=np.uint8)
        return tiled.reshape(height, width)
    raise NotImplementedError(
        f"codec {codec!r}: real decoders (PIL/ffmpeg/soundfile) are not in "
        "this container — plug them in here; the Spark plumbing is codec-agnostic"
    )


def decode_images(blobs: DataFrame, batch_hint: int = 64) -> DataFrame:
    """binary → per-blob decoded stats via mapInPandas (Arrow batches).
    Output drops the pixels — only reduced stats leave the partition."""
    out_schema = "blob_id bigint, width int, height int, mean_px double, std_px double"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = _decode_bytes(bytes(r["content"]), r["codec"], r["meta"]["width"], r["meta"]["height"])
                rows.append({
                    "blob_id": r["blob_id"],
                    "width": img.shape[1],
                    "height": img.shape[0],
                    "mean_px": float(img.mean()),
                    "std_px": float(img.std()),
                })
            yield pd.DataFrame(rows, columns=["blob_id", "width", "height", "mean_px", "std_px"])

    cols = blobs.select("blob_id", "codec", "content", "meta")
    return cols.mapInPandas(decode, schema=out_schema)


def extract_features(blobs: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """binary → fixed-width float feature vector (deterministic content
    digest standing in for a model embedding); ready for similarity ops."""
    out_schema = f"blob_id bigint, features array<float>"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for _, r in pdf.iterrows():
                digest = hashlib.sha256(bytes(r["content"])).digest()
                v = np.frombuffer(digest[: dim * 2], dtype=np.uint16).astype(np.float32)
                norm = np.linalg.norm(v)
                vecs.append((v / norm if norm else v).tolist())
                ids.append(r["blob_id"])
            yield pd.DataFrame({"blob_id": ids, "features": vecs})

    return blobs.select("blob_id", "content").mapInPandas(feats, schema=out_schema)


def sample_frames(blobs: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling plumbing: fan a blob out to (blob_id, frame_idx)
    rows for frames 0, n, 2n... — pure built-ins (sequence + explode); the
    per-frame decode then rides decode_images."""
    n = F.col("meta.n_frames")
    idxs = F.sequence(F.lit(0), n - 1, F.lit(every_n))
    return blobs.select("blob_id", F.explode(idxs).alias("frame_idx"))
