"""Multimodal plumbing: schema, dedup-before-decode, Arrow feature
extraction with the deterministic fake decoder."""

import numpy as np
import pytest

from sparkglm_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(documents):
    return MM.synth_media_from_documents(documents).persist()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    meta_fields = [f.name for f in media.schema["meta"].dataType.fields]
    assert meta_fields == ["width", "height", "duration_ms", "codec"]


def test_content_dedup(media, spark):
    n = media.count()
    deduped = MM.media_content_dedup(media)
    assert deduped.count() == n  # corpus has no payload dups
    # inject a duplicate payload → removed, min id wins
    one = media.limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(999999, one["kind"], one["payload"], one["meta"])], media.schema
    )
    with_dup = media.unionByName(dup)
    after = MM.media_content_dedup(with_dup)
    assert after.count() == n
    assert after.where("media_id = 999999").count() == 0


def test_extract_features_matches_local(media, documents):
    feats = {r["media_id"]: r["features"] for r in MM.extract_features(media).collect()}
    for r in documents.limit(20).collect():
        local = MM.fake_decode_features(r["text"].encode("utf-8"))
        np.testing.assert_allclose(np.array(feats[r["doc_id"]]), local, rtol=1e-12)


def test_decode_real_codec_roundtrip():
    """decode_image is a REAL pure-python codec now (BMP 24/32-bit + PPM
    P6); JPEG magic bytes raise ValueError (codec libs absent)."""
    import numpy as np

    gray = (np.arange(5 * 7, dtype=np.int64) * 13 % 256).astype(np.uint8).reshape(5, 7)
    rgb = MM.decode_image(MM.encode_bmp_gray(gray))
    assert rgb.shape == (5, 7, 3)
    assert np.array_equal(rgb[:, :, 1], gray)
    ppm = b"P6\n7 5\n255\n" + bytes(range(105))
    assert MM.decode_image(ppm).shape == (5, 7, 3)
    with pytest.raises(ValueError):
        MM.decode_image(b"\xff\xd8\xff")


def test_frame_sample_plan(documents):
    media = MM.synth_media_from_documents(documents, kind="video")
    plan = MM.frame_sample_plan(media, every_ms=1000)
    rows = plan.limit(50).collect()
    assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in rows)
    one = media.limit(1).collect()[0]
    expect_frames = max(one["meta"]["duration_ms"] // 1000, 1)
    got = plan.where(f"media_id = {one['media_id']}").count()
    assert got == expect_frames


def test_resize_images_contract(spark, documents):
    from pyspark.sql import functions as F
    from sparkglm_spark.operators.multimodal import (
        resize_images,
        synth_media_from_documents,
    )

    media = synth_media_from_documents(documents, kind="image")
    out = resize_images(media, width=8, height=4)
    rows = out.limit(20).collect()
    assert len(rows) > 0
    for r in rows:
        assert len(r["payload"]) == 8 * 4
        assert (r["width"], r["height"]) == (8, 4)
    # non-image rows are filtered JVM-side
    vid = synth_media_from_documents(documents, kind="video")
    assert resize_images(vid, 8, 4).count() == 0


def test_wav_roundtrip_and_features():
    import numpy as np

    from sparkglm_spark.operators.multimodal import decode_audio, encode_wav_pcm16

    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=501, dtype=np.int16)
    payload = encode_wav_pcm16(samples, 16000)
    out, rate, channels = decode_audio(payload)
    assert rate == 16000 and channels == 1
    assert out.shape == (501, 1)
    assert np.array_equal(out[:, 0], samples)


def test_decode_audio_rejects_non_wav():
    import pytest as _pytest

    from sparkglm_spark.operators.multimodal import decode_audio

    with _pytest.raises(ValueError):
        decode_audio(b"ID3\x04this is an mp3, not pcm")


def test_audio_features_match_closed_form(spark, documents):
    import numpy as np

    from sparkglm_spark.operators.multimodal import (
        audio_features,
        synth_wav_media_from_documents,
    )

    rows = audio_features(synth_wav_media_from_documents(documents.limit(50))).collect()
    assert len(rows) == 50
    docs = {r.doc_id: r.n_chars for r in documents.limit(50).collect()}
    for r in rows:
        a = (r.media_id * 11) % 256
        n = docs[r.media_id] % 256 + 16
        t = np.arange(n, dtype=np.int64)
        samples = ((a + t) % 256 - 128) * 16
        assert r.n_samples == n and r.sample_rate == 8000 and r.channels == 1
        assert r.s0 == samples[0]
        assert abs(r.mean_sample - samples.sum() / n) < 1e-12
