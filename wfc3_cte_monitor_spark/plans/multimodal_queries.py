"""Multimodal decode query: REAL codec round-trip under the oracle gate.

``m01`` synthesizes real media files (binary PPM P6 images / PCM16 WAV
audio — headers and all) whose pixel/sample patterns are closed-form
functions of doc_id, decodes them back with the pure-numpy parsers in
``multimodal/blobs.py`` via mapInPandas, and reduces to per-blob stats.
The DuckDB oracle never sees the bytes: it recomputes the expected
dimensions, sample rates, means and checksums directly from the
closed-form pattern (byte k = (doc_id + k) mod 256), so any header-parse
or sample-extraction defect breaks the match.

The image arm additionally rides the decoded raster through the JVM
array operators (operators/image_ops.py):

- S2 PAM correction (``apply_pam``, run_image_extraction.py:93-143) with
  a closed-form pixel-area map stated as integer PERCENTS
  (pam_pct[i] = 100 + (i mod 7) - 3) so per-pixel products and their
  sums are exact integers in both engines — divide by 100 at the end to
  recover the fractional map;
- N5 DQ masking (``mask_bad_pixels``, :773-840) with a closed-form DQ
  array mixing good flags {0, 32} and bad flags {4, 8}, so the
  two-good-flag membership test is what decides each pixel.

Scale shape: encode and decode are Arrow-batched mapInPandas over the
documents partitioning; the PAM/mask per-pixel passes are zip_with /
aggregate column expressions (whole-stage codegen, pixels never leave
the executor); only fixed-width stats rows cross stages — the 100 TB
posture for opaque media columns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.blobs import FRAME_HOP, PATCH, RESIZE_OUT_H, RESIZE_OUT_W
from .registry import register

# Sum of 0..255 (one full byte cycle) = 32640; the partial-cycle sum of
# r consecutive residues starting at a is a two-branch arithmetic series.
_M01_ORACLE = f"""
WITH p AS (
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           (doc_id % 13 + 4) AS w,
           (doc_id % 11 + 3) AS h,
           (doc_id % 500 + 50) AS ns,
           (8000 + (doc_id % 3) * 4000) AS rate,
           doc_id % 256 AS a,
           CASE WHEN doc_id % 2 = 0
                THEN (doc_id % 13 + 4) * (doc_id % 11 + 3) * 3
                ELSE doc_id % 500 + 50 END AS n
    FROM documents
),
s AS (SELECT *, n // 256 AS q, n % 256 AS r FROM p),
t AS (
    SELECT *,
           q * 32640 +
           CASE WHEN a + r <= 256
                THEN r * a + r * (r - 1) // 2
                ELSE (256 - a) * a + (256 - a) * (255 - a) // 2
                     + (r - (256 - a)) * (r - (256 - a) - 1) // 2
           END AS sum_b
    FROM s
),
-- N3 aperture: simulate the pixel grid per image (pixel value at flat
-- byte index i is (a + i) mod 256) and sum channel values within
-- min(w,h)/3 of the image center — the oracle for the decoded-array
-- circular-mask photometry.
px AS (
    SELECT doc_id, a, w, h, unnest(range(0, w * h)) AS pq
    FROM p WHERE kind = 'image'
),
ap AS (
    SELECT doc_id,
           SUM(((a + pq * 3) % 256) + ((a + pq * 3 + 1) % 256)
               + ((a + pq * 3 + 2) % 256)) AS ap_flux,
           COUNT(*) AS ap_npix
    FROM px
    WHERE (pq % w - (w - 1) / 2.0) * (pq % w - (w - 1) / 2.0)
          + (pq // w - (h - 1) / 2.0) * (pq // w - (h - 1) / 2.0)
          <= (least(w, h) / 3.0) * (least(w, h) / 3.0)
    GROUP BY doc_id
),
-- S2/N5: per flat byte index i over the whole raster, pixel value
-- v = (a + i) mod 256, PAM percent pam = 100 + (i mod 7) - 3, DQ flag
-- from the first-match cascade 4 / 32 / 8 / 0 — good flags are {0, 32}.
fb AS (
    SELECT doc_id, a,
           unnest(range(0, n)) AS i
    FROM p WHERE kind = 'image'
),
fq AS (
    SELECT doc_id,
           ((a + i) % 256) AS v,
           (100 + (i % 7) - 3) AS pam,
           CASE WHEN (doc_id + i) % 5 = 0 THEN 4
                WHEN (doc_id + i) % 7 = 0 THEN 32
                WHEN (doc_id + i) % 11 = 0 THEN 8
                ELSE 0 END AS dq
    FROM fb
),
corr AS (
    SELECT doc_id,
           SUM(v * pam) AS pam_flux,
           SUM(CASE WHEN dq IN (0, 32) THEN v * pam ELSE 0 END) AS masked_flux,
           SUM(CASE WHEN dq IN (0, 32) THEN 1 ELSE 0 END) AS n_good
    FROM fq GROUP BY doc_id
),
-- feature-extract: nearest-neighbor {RESIZE_OUT_W}x{RESIZE_OUT_H} thumbnail —
-- destination cell o maps to source pixel (r*h//{RESIZE_OUT_H}, c*w//{RESIZE_OUT_W})
-- with the floor index map the engine's resize_nearest uses
rsi AS (
    SELECT doc_id, a,
           ((o // {RESIZE_OUT_W}) * h // {RESIZE_OUT_H}) * w
               + ((o % {RESIZE_OUT_W}) * w // {RESIZE_OUT_W}) AS pq
    FROM (SELECT doc_id, a, w, h,
                 unnest(range(0, {RESIZE_OUT_H * RESIZE_OUT_W})) AS o
          FROM p WHERE kind = 'image')
),
rs AS (
    SELECT doc_id,
           SUM(((a + pq * 3) % 256) + ((a + pq * 3 + 1) % 256)
               + ((a + pq * 3 + 2) % 256)) AS rs_checksum,
           COUNT(*) AS rs_npix
    FROM rsi GROUP BY doc_id
),
-- frame sampling: every {FRAME_HOP}-th decoded sample
fs AS (
    SELECT doc_id,
           SUM(((a + i) % 256 - 128) * 256) AS fs_checksum,
           COUNT(*) AS fs_n
    FROM (SELECT doc_id, a, unnest(range(0, ns, {FRAME_HOP})) AS i
          FROM p WHERE kind = 'audio')
    GROUP BY doc_id
),
-- ViT-style patch grid: {PATCH}x{PATCH} pixel tiles (edge tiles = the
-- remainder); per patch the channel-value sum floor-divided by the
-- channel-value count, summed per image — integer-exact both engines
pg AS (
    SELECT doc_id,
           SUM(psum // pcnt) AS pg_checksum,
           COUNT(*) AS pg_npatch
    FROM (
        SELECT doc_id,
               SUM(((a + pq * 3) % 256) + ((a + pq * 3 + 1) % 256)
                   + ((a + pq * 3 + 2) % 256)) AS psum,
               COUNT(*) * 3 AS pcnt
        FROM px
        GROUP BY doc_id,
                 ((pq // w) // {PATCH}) * ((w + {PATCH} - 1) // {PATCH})
                     + (pq % w) // {PATCH}
    ) GROUP BY doc_id
)
SELECT t.doc_id AS blob_id, kind,
       (CASE WHEN kind = 'image' THEN w ELSE 0 END)::INT AS width,
       (CASE WHEN kind = 'image' THEN h ELSE 0 END)::INT AS height,
       (CASE WHEN kind = 'audio' THEN ns ELSE 0 END)::INT AS n_samples,
       (CASE WHEN kind = 'audio' THEN rate ELSE 0 END)::INT AS sample_rate,
       CASE WHEN kind = 'image' THEN CAST(sum_b AS DOUBLE) / n
            ELSE CAST((sum_b - 128 * n) * 256 AS DOUBLE) / n END AS mean_val,
       (CASE WHEN kind = 'image' THEN sum_b
             ELSE (sum_b - 128 * n) * 256 END)::BIGINT AS checksum,
       coalesce(ap.ap_flux, 0)::BIGINT AS ap_flux,
       coalesce(ap.ap_npix, 0)::INT AS ap_npix,
       coalesce(corr.pam_flux, 0)::BIGINT AS pam_flux,
       coalesce(corr.masked_flux, 0)::BIGINT AS masked_flux,
       coalesce(corr.n_good, 0)::INT AS n_good,
       coalesce(rs.rs_checksum, 0)::BIGINT AS rs_checksum,
       coalesce(rs.rs_npix, 0)::INT AS rs_npix,
       coalesce(fs.fs_checksum, 0)::BIGINT AS fs_checksum,
       coalesce(fs.fs_n, 0)::INT AS fs_n,
       coalesce(pg.pg_npatch, 0)::INT AS pg_npatch,
       coalesce(pg.pg_checksum, 0)::BIGINT AS pg_checksum
FROM t
LEFT JOIN ap ON t.doc_id = ap.doc_id
LEFT JOIN corr ON t.doc_id = corr.doc_id
LEFT JOIN rs ON t.doc_id = rs.doc_id
LEFT JOIN fs ON t.doc_id = fs.doc_id
LEFT JOIN pg ON t.doc_id = pg.doc_id
"""


def _pam_masked_cols() -> list:
    """PAM-corrected and DQ-masked sums over a ``pixels`` array column
    via the JVM array operators (audio rows carry an empty array → all
    three reduce to 0, matching the oracle's coalesce). The PAM and DQ
    arrays are closed-form functions of the flat index (and blob_id),
    generated with sequence/transform so the whole per-pixel pass stays
    in codegen — no second decode, no join."""
    from ..operators.image_ops import apply_pam, mask_bad_pixels

    # guard the empty (audio) case: sequence(0, -1) would DESCEND to a
    # 2-element array, zip_with would then outer-pad the empty pixels
    # side with nulls and poison the unguarded sum
    idx = F.when(
        F.size("pixels") > 0, F.sequence(F.lit(0), F.size("pixels") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pam = F.transform(idx, lambda i: (F.lit(100) + (i % 7) - 3).cast("bigint"))
    blob = F.col("blob_id")
    dq = F.transform(
        idx,
        lambda i: F.when((blob + i) % 5 == 0, 4)
        .when((blob + i) % 7 == 0, 32)
        .when((blob + i) % 11 == 0, 8)
        .otherwise(0),
    )
    corrected = apply_pam(F.col("pixels"), pam)
    masked = mask_bad_pixels(corrected, dq)
    zero = F.lit(0).cast("bigint")
    return [
        F.aggregate(corrected, zero, lambda acc, x: acc + x).alias("pam_flux"),
        F.aggregate(masked, zero, lambda acc, x: acc + F.coalesce(x, zero)).alias("masked_flux"),
        F.size(F.filter(masked, lambda x: x.isNotNull())).cast("int").alias("n_good"),
    ]


@register(
    "m01_multimodal_decode",
    oracle=_M01_ORACLE,
    tags=("multimodal", "codec", "mapInPandas", "S2", "N5"),
)
def m01_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→decode round trip through real PPM/WAV parsers: per-blob
    header dims, sample rate, pixel/sample mean and checksum, the
    PAM-corrected / DQ-masked pixel sums (S2 + N5 through the decoded
    raster), and the feature-extract transforms — nearest-neighbor
    thumbnail resize (rs_checksum/rs_npix), every-4th frame sampling
    (fs_checksum/fs_n), and the ViT-style 4x4 patch-grid reduction
    (pg_npatch/pg_checksum: per-patch floor-mean summed — the
    tokenization step a vision-training pipeline runs per image) — all
    verified against the closed-form oracle.
    One synthesis, one decode pass; resize/frame-sample run on the
    decoded arrays inside the same mapInPandas batch, and the per-pixel
    PAM/DQ work is JVM column expressions over the emitted raster, which
    is dropped before anything crosses stages."""
    from ..multimodal.blobs import decode_media_stats, synthesize_media_blobs

    stats = decode_media_stats(synthesize_media_blobs(spark, sf_dir), with_raster=True)
    # column order mirrors the oracle's select list
    return stats.select(
        "blob_id", "kind", "width", "height", "n_samples", "sample_rate",
        "mean_val", "checksum", "ap_flux", "ap_npix",
        *_pam_masked_cols(),
        "rs_checksum", "rs_npix", "fs_checksum", "fs_n",
        "pg_npatch", "pg_checksum",
    )
