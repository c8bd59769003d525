"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Two REAL pure-numpy codecs are implemented — binary PPM (P6) images and
PCM16 WAV audio (header parse + sample extraction, no external libs);
compressed codecs (PIL / ffmpeg / soundfile are not in this container)
raise NotImplementedError at the same boundary, and a 'raw' deterministic
fake remains for plumbing tests. Everything around the codec boundary is
real Spark plumbing and is what matters at 100 TB:

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
    from ..sources.catalog import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
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


# --- real pure-numpy codecs (PPM P6 images, PCM16 WAV audio) ---------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Real header parse: magic,
    whitespace-separated dims, maxval, then the raster."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval 255 PPM supported")
    pos += 1  # single whitespace after maxval
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono int16 samples → canonical 44-byte-header PCM WAV."""
    import struct

    assert samples.dtype == np.int16
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM16 mono WAV → (int16 samples, sample_rate). Real RIFF parse with
    magic/format validation."""
    import struct

    riff, _, wave = struct.unpack("<4sI4s", data[:12])
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt_id, fmt_size, audio_fmt, channels, rate, _, _, bits = struct.unpack(
        "<4sIHHIIHH", data[12:36]
    )
    if fmt_id != b"fmt " or audio_fmt != 1 or channels != 1 or bits != 16:
        raise NotImplementedError("only PCM16 mono WAV supported")
    data_id, data_size = struct.unpack("<4sI", data[36 + fmt_size - 16 : 44 + fmt_size - 16])
    if data_id != b"data":
        raise ValueError("missing data chunk")
    off = 44 + fmt_size - 16
    return np.frombuffer(data, dtype="<i2", count=data_size // 2, offset=off), rate


def _decode_bytes(content: bytes, codec: str, width: int, height: int) -> np.ndarray:
    """IMAGE codec boundary (callers treat the result as 2-D+): 'ppm' is a
    real decoder; 'wav' is audio and must go through decode_media_stats,
    not the image path; compressed codecs are stubbed (libs not in
    container)."""
    if codec == "raw":
        # deterministic fake: bytes tiled into a (height, width) uint8 grid
        arr = np.frombuffer(content, dtype=np.uint8)
        need = width * height
        tiled = np.resize(arr, need) if arr.size else np.zeros(need, dtype=np.uint8)
        return tiled.reshape(height, width)
    if codec == "ppm":
        return decode_ppm(content)
    if codec == "wav":
        raise ValueError("codec 'wav' is audio — decode via decode_media_stats/decode_wav")
    raise NotImplementedError(
        f"codec {codec!r}: real decoders (PIL/ffmpeg/soundfile) are not in "
        "this container — plug them in here; the Spark plumbing is codec-agnostic"
    )


def synthesize_media_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL media files from the documents corpus: even
    doc_ids become P6 PPM images, odd doc_ids PCM16 WAV clips, with sizes
    and pixel/sample patterns that are closed-form functions of doc_id
    (pixel k = (doc_id + k) mod 256; sample k = (pixel k - 128) * 256) —
    so decoded statistics are independently computable by the oracle."""
    from ..sources.catalog import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id"), "doc_id")
    out_schema = (
        "blob_id bigint, kind string, codec string, content binary,"
        " meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    w, h = d % 13 + 4, d % 11 + 3
                    px = ((d + np.arange(w * h * 3)) % 256).astype(np.uint8)
                    rows.append({
                        "blob_id": d, "kind": "image", "codec": "ppm",
                        "content": encode_ppm(px.reshape(h, w, 3)),
                        "meta": {"width": w, "height": h, "n_frames": 1, "sample_rate": 0},
                    })
                else:
                    n, rate = d % 500 + 50, 8000 + (d % 3) * 4000
                    samp = ((((d + np.arange(n)) % 256) - 128) * 256).astype(np.int16)
                    rows.append({
                        "blob_id": d, "kind": "audio", "codec": "wav",
                        "content": encode_wav(samp, rate),
                        "meta": {"width": 0, "height": 0, "n_frames": n, "sample_rate": rate},
                    })
            yield pd.DataFrame(rows)

    return docs.mapInPandas(build, schema=out_schema)



# Fixed thumbnail geometry / audio decimation hop for the feature-extract
# transforms; the m01 oracle restates both in closed form.
RESIZE_OUT_W = 8
RESIZE_OUT_H = 6
FRAME_HOP = 4
# ViT-style patch grid: PATCH×PATCH pixel tiles (edge tiles are the
# remainder), reduced per image to (n_patches, Σ floor-mean) — the
# integer-exact stand-in for per-patch embedding extraction, restated in
# closed form by the oracle.
PATCH = 4


def patch_grid_stats(img: np.ndarray, patch: int = PATCH) -> tuple[int, int]:
    """(H, W, C) raster → (n_patches, Σ over patches of channel-sum //
    channel-count): the patch-grid tokenization a vision-transformer
    pipeline runs per image, reduced to integer-exact scalars (floor
    mean per patch, summed). Pure bincount — no loops."""
    h, w = img.shape[0], img.shape[1]
    pw = (w + patch - 1) // patch
    ph = (h + patch - 1) // patch
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pidx = (ys // patch) * pw + (xs // patch)
    s2 = img.astype(np.int64).sum(axis=2)
    npatch = pw * ph
    psum = np.bincount(pidx.ravel(), weights=s2.ravel(), minlength=npatch).astype(np.int64)
    pcnt = np.bincount(pidx.ravel(), minlength=npatch).astype(np.int64) * img.shape[2]
    return int(npatch), int((psum // pcnt).sum())


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) raster: destination cell
    (r, c) takes source pixel (r*H//out_h, c*W//out_w) — the floor index
    map, integer-exact so an oracle can restate it. Up- and downscaling
    both work; pure numpy fancy-indexing, no loops."""
    h, w = img.shape[0], img.shape[1]
    rr = (np.arange(out_h) * h) // out_h
    cc = (np.arange(out_w) * w) // out_w
    return img[rr][:, cc]


def decimate_samples(samples: np.ndarray, hop: int) -> np.ndarray:
    """Sample-level decimation: every ``hop``-th decoded sample (the
    audio analog of thumbnailing; the frame-INDEX fan-out for video
    lives in :func:`sample_frames`)."""
    return samples[::hop]


def decode_media_stats(blobs: DataFrame, with_raster: bool = False) -> DataFrame:
    """binary → per-blob reduced statistics via the REAL codec parsers.
    Dimensions/sample_rate come from the FILE HEADERS (not the metadata
    struct), so the query validates the full encode→decode round trip;
    pixels/samples never leave the partition.

    ``with_raster=True`` additionally emits the flat image raster as an
    array<bigint> column (empty for audio) from the SAME decode pass —
    the hand-off to the JVM array operators (operators/image_ops.py) for
    PAM/DQ work without a second decode or a join."""
    out_schema = (
        "blob_id bigint, kind string, width int, height int,"
        " n_samples int, sample_rate int, mean_val double, checksum bigint,"
        " ap_flux bigint, ap_npix int,"
        " rs_checksum bigint, rs_npix int, fs_checksum bigint, fs_n int,"
        " pg_npatch int, pg_checksum bigint"
    )
    if with_raster:
        out_schema += ", pixels array<bigint>"

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                if r["codec"] == "ppm":
                    img = decode_ppm(content)
                    h, w = img.shape[0], img.shape[1]
                    # N3 aperture photometry on the decoded pixels: sum of
                    # channel values within min(w,h)/3 of the image center
                    # (run_image_extraction.py:448-579's apphot reduced to
                    # the circular-mask sum; pixels stay in the partition)
                    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                    xc, yc = (w - 1) / 2.0, (h - 1) / 2.0
                    rad = min(w, h) / 3.0
                    mask = (xs - xc) * (xs - xc) + (ys - yc) * (ys - yc) <= rad * rad
                    # feature-extract: fixed-geometry nearest thumbnail,
                    # reduced in-partition like every other pixel pass
                    thumb = resize_nearest(img, RESIZE_OUT_H, RESIZE_OUT_W)
                    pg_n, pg_ck = patch_grid_stats(img)
                    row = {
                        "blob_id": r["blob_id"], "kind": "image",
                        "width": w, "height": h,
                        "n_samples": 0, "sample_rate": 0,
                        "mean_val": float(img.astype(np.float64).mean()),
                        "checksum": int(img.astype(np.int64).sum()),
                        "ap_flux": int(img[mask].astype(np.int64).sum()),
                        "ap_npix": int(mask.sum()),
                        "rs_checksum": int(thumb.astype(np.int64).sum()),
                        "rs_npix": RESIZE_OUT_H * RESIZE_OUT_W,
                        "fs_checksum": 0, "fs_n": 0,
                        "pg_npatch": pg_n, "pg_checksum": pg_ck,
                    }
                    if with_raster:
                        row["pixels"] = img.astype(np.int64).ravel().tolist()
                    rows.append(row)
                elif r["codec"] == "wav":
                    samp, rate = decode_wav(content)
                    frames = decimate_samples(samp, FRAME_HOP)
                    row = {
                        "blob_id": r["blob_id"], "kind": "audio",
                        "width": 0, "height": 0,
                        "n_samples": len(samp), "sample_rate": rate,
                        "mean_val": float(samp.astype(np.float64).mean()),
                        "checksum": int(samp.astype(np.int64).sum()),
                        "ap_flux": 0, "ap_npix": 0,
                        "rs_checksum": 0, "rs_npix": 0,
                        "fs_checksum": int(frames.astype(np.int64).sum()),
                        "fs_n": int(len(frames)),
                        "pg_npatch": 0, "pg_checksum": 0,
                    }
                    if with_raster:
                        row["pixels"] = []
                    rows.append(row)
                else:
                    raise NotImplementedError(f"stats for codec {r['codec']!r}")
            cols = ["blob_id", "kind", "width", "height", "n_samples",
                    "sample_rate", "mean_val", "checksum", "ap_flux", "ap_npix",
                    "rs_checksum", "rs_npix", "fs_checksum", "fs_n",
                    "pg_npatch", "pg_checksum"]
            if with_raster:
                cols.append("pixels")
            yield pd.DataFrame(rows, columns=cols)

    return blobs.select("blob_id", "codec", "content").mapInPandas(stats, schema=out_schema)


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
