"""Multimodal decode query: REAL codec round-trip under the oracle gate.

``m01`` synthesizes real media files (binary PPM P6 images / PCM16 WAV
audio — headers and all) whose pixel/sample patterns are closed-form
functions of doc_id, decodes them back with the pure-numpy parsers in
``multimodal/blobs.py`` via mapInPandas, and reduces to per-blob stats.
The DuckDB oracle never sees the bytes: it recomputes the expected
dimensions, sample rates, means and checksums directly from the
closed-form pattern (byte k = (doc_id + k) mod 256), so any header-parse
or sample-extraction defect breaks the match.

Scale shape: encode and decode are Arrow-batched mapInPandas over the
documents partitioning; only fixed-width stats rows leave the partition —
the 100 TB posture for opaque media columns (SURVEY-adjacent multimodal
requirement)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register

# Sum of 0..255 (one full byte cycle) = 32640; the partial-cycle sum of
# r consecutive residues starting at a is a two-branch arithmetic series.
_M01_ORACLE = """
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
       coalesce(ap.ap_npix, 0)::INT AS ap_npix
FROM t LEFT JOIN ap ON t.doc_id = ap.doc_id
"""


@register(
    "m01_multimodal_decode",
    oracle=_M01_ORACLE,
    tags=("multimodal", "codec", "mapInPandas"),
)
def m01_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→decode round trip through real PPM/WAV parsers: per-blob
    header dims, sample rate, pixel/sample mean and checksum, verified
    against the closed-form oracle."""
    from ..multimodal.blobs import decode_media_stats, synthesize_media_blobs

    return decode_media_stats(synthesize_media_blobs(spark, sf_dir))
