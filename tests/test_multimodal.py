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


def test_ppm_roundtrip_and_header_parse():
    import numpy as np

    from wfc3_cte_monitor_spark.multimodal.blobs import decode_ppm, encode_ppm

    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3)
    data = encode_ppm(px)
    assert data.startswith(b"P6\n5 4\n255\n")
    out = decode_ppm(data)
    assert out.shape == (4, 5, 3) and (out == px).all()
    # comment lines in the header are skipped per the PPM spec
    commented = b"P6\n# a comment\n5 4\n255\n" + px.tobytes()
    assert (decode_ppm(commented) == px).all()
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")


def test_wav_roundtrip_and_header_parse():
    import numpy as np

    from wfc3_cte_monitor_spark.multimodal.blobs import decode_wav, encode_wav

    samp = (np.arange(-300, 300, 7)).astype(np.int16)
    data = encode_wav(samp, 12000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    out, rate = decode_wav(data)
    assert rate == 12000 and (out == samp).all()
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + data[4:])


def test_decode_media_stats_matches_numpy(spark, sf_smoke):
    import numpy as np

    from wfc3_cte_monitor_spark.multimodal.blobs import (
        decode_media_stats,
        synthesize_media_blobs,
    )

    blobs = synthesize_media_blobs(spark, sf_smoke)
    stats = {r.blob_id: r for r in decode_media_stats(blobs).collect()}
    assert stats
    for d in list(stats)[:20]:
        r = stats[d]
        if d % 2 == 0:
            w, h = d % 13 + 4, d % 11 + 3
            px = (d + np.arange(w * h * 3)) % 256
            assert (r.width, r.height) == (w, h)
            assert r.checksum == px.sum()
            assert abs(r.mean_val - px.mean()) < 1e-12
            # thumbnail: independent index-map rederivation
            img = px.reshape(h, w, 3)
            rr = (np.arange(6) * h) // 6
            cc = (np.arange(8) * w) // 8
            assert r.rs_checksum == img[rr][:, cc].sum()
            assert r.rs_npix == 48
            assert (r.fs_checksum, r.fs_n) == (0, 0)
        else:
            n = d % 500 + 50
            samp = (((d + np.arange(n)) % 256) - 128) * 256
            assert r.n_samples == n
            assert r.sample_rate == 8000 + (d % 3) * 4000
            assert r.checksum == samp.sum()
            assert r.fs_checksum == samp[::4].sum()
            assert r.fs_n == len(samp[::4])
            assert (r.rs_checksum, r.rs_npix) == (0, 0)


def test_resize_nearest_and_decimate_samples():
    import numpy as np

    from wfc3_cte_monitor_spark.multimodal.blobs import (
        decimate_samples,
        resize_nearest,
    )

    img = np.arange(5 * 7 * 3).reshape(5, 7, 3)
    # identity when dims match
    assert (resize_nearest(img, 5, 7) == img).all()
    # downscale: cell (r, c) takes source (r*5//2, c*7//3)
    down = resize_nearest(img, 2, 3)
    for r in range(2):
        for c in range(3):
            assert (down[r, c] == img[r * 5 // 2, c * 7 // 3]).all()
    # upscale replicates nearest pixels and preserves the corner
    up = resize_nearest(img, 10, 14)
    assert up.shape == (10, 14, 3)
    assert (up[0, 0] == img[0, 0]).all() and (up[-1, -1] == img[-1, -1]).all()

    samp = np.arange(13)
    assert (decimate_samples(samp, 4) == np.array([0, 4, 8, 12])).all()
    assert decimate_samples(samp, 1).tolist() == samp.tolist()
