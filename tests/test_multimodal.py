"""Multimodal binary-column plumbing (SURVEY.md §2 Part B "Multimodal").

The decode step is stubbed (no codec libs in this container) but the
Spark-side plumbing — typed metadata struct, Arrow batching, row-expanding
frame sampling — is real and asserted here.
"""

import hashlib

import pytest

from _spark_multi_format_data_lake_pipeline_spark.llm.multimodal import (
    attach_fake_media,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            (1, "short"),
            (2, "x" * 1000),
            (3, ""),  # zero-byte payload
        ],
        "doc_id bigint, text string",
    )
    return attach_fake_media(docs)


def test_metadata_struct_typed_and_deterministic(media):
    row = media.filter("doc_id = 1").select("meta.*").head()
    again = media.filter("doc_id = 1").select("meta.*").head()
    assert row == again
    assert 64 <= row["width"] < 64 + 1857
    assert 64 <= row["height"] < 64 + 1017
    assert 1000 <= row["duration_ms"] < 601_000
    assert 8000 <= row["sample_rate"] < 48_000


def test_extract_features_hashes_payload(media):
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert feats[2]["n_bytes"] == 1000
    assert feats[1]["payload_sha256"] == hashlib.sha256(b"short").hexdigest()


def test_resize_preserves_aspect_and_bounds(media):
    out = {r["doc_id"]: r for r in resize_media(media, max_dim=128).collect()}
    for r in out.values():
        assert 1 <= r["out_width"] <= max(r["width"], 128)
        assert 1 <= r["out_height"] <= max(r["height"], 128)
        assert max(r["out_width"], r["out_height"]) <= max(
            r["width"], r["height"]
        )
        # aspect ratio within integer-floor tolerance
        if min(r["width"], r["height"]) > 128:
            in_ratio = r["width"] / r["height"]
            out_ratio = r["out_width"] / r["out_height"]
            assert abs(in_ratio - out_ratio) / in_ratio < 0.05
        assert len(r["thumbnail"]) == min(r["out_bytes"], len(r["thumbnail"]))


def test_resize_never_upscales(media):
    out = resize_media(media, max_dim=10_000).collect()
    for r in out:
        assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])


def test_sample_frames_row_expansion_and_reassembly(media):
    frames = sample_frames(media, frame_bytes=100, every=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2: 1000 bytes -> 10 frames, every 2nd -> indices 0,2,4,6,8
    idxs = sorted(r["frame_idx"] for r in by_doc[2])
    assert idxs == [0, 2, 4, 6, 8]
    assert all(r["frame_len"] == 100 for r in by_doc[2])
    # sampled frames are the exact payload slices
    payload = b"x" * 1000
    for r in by_doc[2]:
        start = r["frame_idx"] * 100
        assert bytes(r["frame"]) == payload[start : start + 100]
    # zero-byte payload yields no frames
    assert 3 not in by_doc


def test_sample_frames_ragged_tail(spark):
    docs = spark.createDataFrame([(7, "a" * 250)], "doc_id bigint, text string")
    frames = sample_frames(attach_fake_media(docs), frame_bytes=100, every=1).collect()
    assert [(r["frame_idx"], r["frame_len"]) for r in sorted(frames, key=lambda r: r["frame_idx"])] == [
        (0, 100),
        (1, 100),
        (2, 50),
    ]


def test_decode_stub_raises(media):
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")


def test_decode_media_with_injected_codec():
    calls = []

    def codec(payload, media_type):
        calls.append((bytes(payload), media_type))
        return "decoded!"

    assert decode_media(b"abc", "image/png", codec=codec) == "decoded!"
    assert calls == [(b"abc", "image/png")]


def test_decode_media_autodetected_codec(monkeypatch):
    """With a codec 'installed' (monkeypatched — Pillow is absent in this
    container), the same decode_media call goes live instead of raising."""
    from _spark_multi_format_data_lake_pipeline_spark.llm import multimodal as mm

    monkeypatch.setattr(mm, "_CODEC", lambda p, t: ("ok", t))
    assert mm.decode_media(b"x", "image/fake") == ("ok", "image/fake")


class TestBuiltinCodec:
    """Stdlib BMP/PPM codec (the in-sandbox real-decode path for q139)."""

    def test_bmp_round_trip_with_row_padding(self):
        from _spark_multi_format_data_lake_pipeline_spark.llm.multimodal import decode_bmp, encode_bmp

        # width 5 -> 15-byte rows pad to 16: decoder must see padded array
        pix = bytes(range(5 * 3 * 3))
        img = decode_bmp(encode_bmp(5, 3, pix))
        assert (img.width, img.height, img.mode) == (5, 3, "BGR")
        assert len(img.pixels) == 16 * 3
        # first row survives intact ahead of the pad byte
        assert img.pixels[:15] == pix[:15]

    def test_ppm_round_trip_and_comments(self):
        from _spark_multi_format_data_lake_pipeline_spark.llm.multimodal import decode_ppm, encode_ppm

        pix = bytes(range(4 * 2 * 3))
        img = decode_ppm(encode_ppm(4, 2, pix))
        assert (img.width, img.height, img.mode) == (4, 2, "RGB")
        assert img.pixels == pix
        commented = b"P6\n# generator note\n4 2\n255\n" + pix
        img2 = decode_ppm(commented)
        assert (img2.width, img2.height) == (4, 2)

    def test_decode_media_sniffs_magic_bytes(self):
        from _spark_multi_format_data_lake_pipeline_spark.llm.multimodal import (
            _CODEC,
            decode_media,
            encode_bmp,
            encode_ppm,
        )

        if _CODEC is not None:  # PIL present: autodetect path takes over
            import pytest

            pytest.skip("PIL installed; builtin sniffing not reachable")
        assert decode_media(encode_bmp(6, 4, b""), "image/bmp").width == 6
        assert decode_media(encode_ppm(6, 4, b""), "image/x-ppm").height == 4

    def test_unknown_format_still_raises(self):
        import pytest

        from _spark_multi_format_data_lake_pipeline_spark.llm.multimodal import decode_media

        with pytest.raises((NotImplementedError, Exception)):
            decode_media(b"\x89PNG....", "image/png")

    def test_generated_bmp_decodes_to_sha_derived_dims(self, spark, sf_dir):
        """End-to-end: the generated payload is a real BMP whose header
        decodes to the sha-predicted dims (the q139 contract)."""
        import hashlib

        from _spark_multi_format_data_lake_pipeline_spark.llm.multimodal import (
            attach_generated_bmp,
            decode_image_dims,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
        out = decode_image_dims(attach_generated_bmp(docs)).collect()
        assert len(out) == 20
        for r in out:
            hx = hashlib.sha256(str(r.doc_id).encode()).hexdigest()
            assert r.width == 4 + int(hx[0:8], 16) % 61
            assert r.height == 4 + int(hx[8:16], 16) % 45
            assert r.n_pixel_bytes == ((3 * r.width + 3) // 4) * 4 * r.height


def test_decode_pixel_stats_strips_bmp_padding(spark):
    """width=3 forces 3 pad bytes per BMP row; the channel-byte count must
    be exactly 3*w*h (padding stripped) and the sum must equal the sum of
    the ORIGINAL pixel bytes, independent of padding zeros."""
    from _spark_multi_format_data_lake_pipeline_spark.llm.multimodal import (
        decode_pixel_stats,
        encode_bmp,
        encode_ppm,
    )

    w, h = 3, 2
    pix = bytes(range(10, 10 + w * 3 * h))  # 18 distinct bytes
    rows = [
        (1, "image/bmp", encode_bmp(w, h, pix)),
        (2, "image/ppm", encode_ppm(w, h, pix)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, payload binary"
    )
    out = {r.doc_id: r for r in decode_pixel_stats(df).collect()}
    for d in (1, 2):
        r = out[d]
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert r.n_channel_bytes == w * 3 * h  # padding stripped (BMP)
        assert r.pixel_byte_sum == sum(pix)
