"""Multimodal plumbing: schema, dedup-before-decode, Arrow feature
extraction through the real pure-python codecs (BMP/PPM, WAV, RVID)."""

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


def test_extract_features_default_is_real_decode(documents):
    """extract_features' default decoder sniffs the container and computes
    stats of DECODED content — spot-check against local decode on BMPs."""
    bmp = MM.synth_bmp_media_from_documents(documents.limit(20))
    feats = {r["media_id"]: r["features"] for r in MM.extract_features(bmp).collect()}
    local_payloads = {
        r["media_id"]: bytes(r["payload"]) for r in bmp.collect()
    }
    assert len(feats) == 20
    for mid, payload in local_payloads.items():
        np.testing.assert_allclose(
            np.array(feats[mid]), MM.decode_features(payload), rtol=1e-12
        )


def test_extract_features_opaque_payloads_opt_in(media):
    """Opaque (non-container) payloads: the default decoder raises; the
    byte-stats fallback is explicit."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception):
        MM.extract_features(media.limit(2)).collect()
    out = MM.extract_features(media.limit(5), batch_decoder=MM.payload_byte_stats)
    rows = out.collect()
    assert len(rows) == 5 and all(len(r["features"]) == 8 for r in rows)


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


def test_resize_images_real_nn_kernel(spark, documents):
    """Default resize is the REAL decode→NN-resample→re-encode path: output
    payloads are valid BMPs of the target dims whose pixels equal numpy
    fancy-indexing of the decoded source."""
    from sparkglm_spark.operators.multimodal import (
        decode_image,
        resize_images,
        synth_bmp_media_from_documents,
        synth_media_from_documents,
    )

    media = synth_bmp_media_from_documents(documents.limit(10))
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    out = resize_images(media, width=8, height=4)
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        assert (r["width"], r["height"]) == (8, 4)
        got = decode_image(bytes(r["payload"]))
        assert got.shape == (4, 8, 3)
        rgb = decode_image(src[r["media_id"]])
        h, w = rgb.shape[:2]
        ys = (np.arange(4) * h) // 4
        xs = (np.arange(8) * w) // 8
        assert np.array_equal(got, rgb[ys][:, xs])
    # non-image rows are filtered JVM-side
    vid = synth_media_from_documents(documents, kind="video")
    assert resize_images(vid, 8, 4).count() == 0


def test_rawvideo_roundtrip():
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(4, 6, 9), dtype=np.uint8)
    out, fps = MM.decode_video(MM.encode_rawvideo(frames, fps=2))
    assert fps == 2
    assert np.array_equal(out, frames)
    with pytest.raises(ValueError):
        MM.decode_video(b"\x00\x00\x01\xba mpeg-ps, not raw")


def test_video_features_match_closed_form(documents):
    vids = MM.synth_video_media_from_documents(documents.limit(30))
    rows = {r["media_id"]: r for r in MM.video_features(vids).collect()}
    docs = {r.doc_id: r.n_chars for r in documents.limit(30).collect()}
    assert len(rows) == 30
    for mid, nc in docs.items():
        r = rows[mid]
        w, h, nf = nc % 12 + 4, nc % 8 + 4, nc % 6 + 2
        a = (mid * 13) % 256
        f = np.arange(nf)[:, None]
        t = np.arange(h * w)[None, :]
        frames = (a + 17 * f + t) % 256
        assert (r["v_width"], r["v_height"], r["v_frames"]) == (w, h, nf)
        assert r["v_px000"] == a
        assert abs(r["v_mean_pixel"] - frames.sum() / frames.size) < 1e-12


def test_sample_frames_decodes_sampled_grid(documents):
    """sample_frames at 2000 ms over fps-1 RVID: sampled frame indices are
    0, 2, …; per-frame means match the closed form."""
    vids = MM.synth_video_media_from_documents(documents.limit(20))
    got = {}
    for r in MM.sample_frames(vids, every_ms=2000).collect():
        got.setdefault(r["media_id"], []).append(r)
    docs = {r.doc_id: r.n_chars for r in documents.limit(20).collect()}
    for mid, nc in docs.items():
        w, h, nf = nc % 12 + 4, nc % 8 + 4, nc % 6 + 2
        a = (mid * 13) % 256
        k = max(nf // 2, 1)
        rows = sorted(got[mid], key=lambda r: r["ts_ms"])
        assert len(rows) == k
        for s, r in enumerate(rows):
            fi = min(2 * s, nf - 1)
            assert r["frame_idx"] == fi and r["ts_ms"] == s * 2000
            t = np.arange(h * w)
            frame = (a + 17 * fi + t) % 256
            assert r["fpx00"] == frame[0]
            assert abs(r["frame_mean"] - frame.sum() / frame.size) < 1e-12


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


def test_zero_frame_video_is_handled(spark):
    """A valid zero-frame RVID payload: video_features emits null pixel
    stats, sample_frames emits no rows, decode_features returns zeros —
    no IndexError/ZeroDivisionError inside the Arrow UDFs."""
    payload = MM.encode_rawvideo(np.zeros((0, 4, 4), dtype=np.uint8), fps=1)
    frames, fps = MM.decode_video(payload)
    assert frames.shape == (0, 4, 4) and fps == 1
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload))],
        "media_id bigint, kind string, payload binary",
    )
    row = MM.video_features(media).collect()[0]
    assert row["v_frames"] == 0
    assert row["v_mean_pixel"] is None and row["v_px000"] is None
    assert MM.sample_frames(media).count() == 0


def test_truncated_rvid_raises_valueerror():
    """Truncated payloads starting with the magic must raise the documented
    ValueError (not struct.error) so fallback-on-ValueError callers work."""
    for bad in (b"RVID", b"RVID\x04\x00\x02"):
        with pytest.raises(ValueError):
            MM.decode_video(bad)


def test_bmp_roundtrip_randomized_shapes():
    """Seeded sweep of odd widths (stride padding kicks in at w % 4 != 0),
    1-pixel edges, and random pixel data: encode_bmp_rgb → decode_image
    must be the identity."""
    import numpy as np

    from sparkglm_spark.operators.multimodal import decode_image, encode_bmp_rgb

    rng = np.random.default_rng(23)
    for h, w in [(1, 1), (1, 7), (5, 3), (8, 2), (3, 33), (17, 31)]:
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_image(encode_bmp_rgb(rgb))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, rgb), (h, w)


def test_wav_roundtrip_randomized_lengths():
    """Odd sample counts and sample rates survive the (mono) PCM-16
    round-trip exactly — including the 1-sample edge."""
    import numpy as np

    from sparkglm_spark.operators.multimodal import decode_audio, encode_wav_pcm16

    rng = np.random.default_rng(29)
    for n, sr in [(1, 8000), (3, 44100), (160, 16000), (441, 22050)]:
        pcm = rng.integers(-32768, 32767, size=n, dtype=np.int16)
        samples, got_sr, got_ch = decode_audio(encode_wav_pcm16(pcm, sr))
        assert got_sr == sr and got_ch == 1
        assert np.array_equal(np.asarray(samples)[:, 0], pcm), (n, sr)


def test_media_dedup_null_payloads_group(spark):
    """NULL payloads (decode failures) must dedup as ONE group — r5 review
    caught raw sha2(NULL) dropping out of the drop-list join so every
    NULL-payload duplicate survived."""
    rows = [
        (1, "image", b"x"),
        (2, "image", None),
        (3, "image", None),
        (4, "image", b"x"),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    kept = sorted(r["media_id"] for r in MM.media_content_dedup(df).collect())
    assert kept == [1, 2]
