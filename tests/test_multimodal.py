"""Multimodal binary-column plumbing: schema, batch shape, stubbed codec
boundary, feature vectors feeding the similarity operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wfc3_cte_monitor_spark.functions.similarity import cosine
from wfc3_cte_monitor_spark.multimodal.blobs import (
    FEATURE_DIM,
    decode_images,
    extract_features,
    make_blob_table,
    sample_frames,
)


@pytest.fixture(scope="module")
def blobs(spark, sf_smoke):
    return make_blob_table(spark, sf_smoke).cache()


def test_blob_table_schema(blobs):
    assert dict(blobs.dtypes)["content"] == "binary"
    assert dict(blobs.dtypes)["meta"].startswith("struct<width:int")
    assert blobs.count() > 0


def test_decode_plumbing(blobs):
    out = decode_images(blobs.limit(20))
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.width >= 16 and r.height >= 16
        assert 0.0 <= r.mean_px <= 255.0


def test_decode_unknown_codec_raises(spark, blobs):
    bad = blobs.limit(1).withColumn("codec", F.lit("jpeg"))
    with pytest.raises(Exception, match="codec 'jpeg'"):
        decode_images(bad).collect()


def test_features_deterministic_and_normalized(blobs):
    f1 = {r.blob_id: r.features for r in extract_features(blobs.limit(10)).collect()}
    f2 = {r.blob_id: r.features for r in extract_features(blobs.limit(10)).collect()}
    assert f1 == f2
    assert all(len(v) == FEATURE_DIM for v in f1.values())
    norms = [sum(x * x for x in v) for v in f1.values()]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)


def test_features_feed_similarity(spark, blobs):
    feats = extract_features(blobs.limit(30))
    a = feats.select(F.col("blob_id").alias("ida"), F.col("features").cast("array<double>").alias("va"))
    b = feats.select(F.col("blob_id").alias("idb"), F.col("features").cast("array<double>").alias("vb"))
    sims = a.join(b, F.col("ida") < F.col("idb")).select(
        "ida", "idb", cosine(F.col("va"), F.col("vb")).alias("sim")
    )
    rows = sims.collect()
    assert rows and all(-1.0001 <= r.sim <= 1.0001 for r in rows)


def test_frame_sampling(spark, blobs):
    video = blobs.limit(5).withColumn(
        "meta",
        F.struct(
            F.col("meta.width"), F.col("meta.height"),
            F.lit(10).cast("int").alias("n_frames"), F.col("meta.sample_rate"),
        ),
    )
    out = sample_frames(video, every_n=3).collect()
    per = {}
    for r in out:
        per.setdefault(r.blob_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 3, 6, 9] for v in per.values())
