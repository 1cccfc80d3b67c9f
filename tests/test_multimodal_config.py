"""Multimodal plumbing + config validation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.config import EngineConfig, load_config
from spark_streaming_postgres_lab2_spark.functions.multimodal import (
    decode_features,
    decode_real,
    frame_sample,
    synthesize_media,
)
from spark_streaming_postgres_lab2_spark.sources.tables import load_tables


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ["documents"])["documents"].limit(50)
    return synthesize_media(docs)


def test_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    assert media.filter(F.col("meta.n_bytes") != F.octet_length("content")).count() == 0


def test_decode_features_deterministic(media):
    a = {r["media_id"]: r["checksum"] for r in decode_features(media).collect()}
    b = {r["media_id"]: r["checksum"] for r in decode_features(media).collect()}
    assert a == b and len(a) == 50


def test_decode_features_match_payload(spark, media):
    feats = decode_features(media)
    joined = feats.join(media, "media_id")
    assert joined.filter(F.col("n_bytes") != F.octet_length("content")).count() == 0


def test_frame_sample_shapes(media):
    row = frame_sample(media, every_n_bytes=16).first()
    assert isinstance(row["frames"], list) and len(row["frames"]) >= 1


def test_bmp_roundtrip_pure_python():
    from spark_streaming_postgres_lab2_spark.functions.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    b = encode_bmp24(5, 3, lambda x, y, c: (x * 7 + y * 17 + c) % 256)
    w, h, bpp, mean = decode_bmp24(b)
    assert (w, h, bpp) == (5, 3, 24)
    expect = sum((x * 7 + y * 17 + c) % 256 for x in range(5) for y in range(3) for c in range(3)) / 45
    assert abs(mean - expect) < 1e-12
    # width 5 -> 15 data bytes/row, stride padded to 16: padding must not leak
    assert len(b) == 54 + 16 * 3
    assert decode_bmp24(b"not a bmp") is None
    assert decode_bmp24(None) is None


def test_decode_real_bmp_on_spark(spark, sf_dir):
    from spark_streaming_postgres_lab2_spark.functions.multimodal import (
        synthesize_bmp_media,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"].select("doc_id").limit(20)
    decoded = decode_real(synthesize_bmp_media(docs), codec="bmp").collect()
    assert len(decoded) == 20
    for r in decoded:
        i = r["media_id"]
        assert r["format"] == "bmp24" and r["bpp"] == 24
        assert r["width"] == 4 + i % 5 and r["height"] == 3 + i % 4
        assert 0.0 <= r["mean_pixel"] <= 255.0


def test_decode_real_unknown_codec(media):
    with pytest.raises(ValueError, match="unknown codec"):
        decode_real(media, codec="h264")


def test_config_defaults_valid():
    cfg = load_config()
    assert cfg.validate() == []
    d = cfg.to_dict()
    assert "password" not in d["database"]  # secret-free serialization


def test_config_validation_catches_bad_values():
    cfg = EngineConfig()
    cfg.quality.min_validity_rate = 2.0
    cfg.retry.backoff_factor = 0.5
    problems = cfg.validate()
    assert len(problems) == 2


def test_jdbc_url_shape():
    cfg = EngineConfig()
    assert cfg.database.jdbc_url.startswith("jdbc:postgresql://")
    assert cfg.database.jdbc_properties()["batchsize"] == "5000"


def test_resize_stub_shapes(spark, media):
    from spark_streaming_postgres_lab2_spark.functions.multimodal import resize_stub

    out = resize_stub(media, target_bytes=128).collect()
    assert len(out) == 50
    assert all(len(r["content"]) == 128 and r["n_bytes"] == 128 for r in out)
    # deterministic
    again = resize_stub(media, target_bytes=128).collect()
    assert {r["media_id"]: bytes(r["content"]) for r in out} == {
        r["media_id"]: bytes(r["content"]) for r in again
    }


def test_wav_codec_round_trip_and_rejects_malformed():
    """Encode->decode round-trips exactly; truncated / wrong-magic /
    stereo-tagged byte strings return None instead of raising."""
    from spark_streaming_postgres_lab2_spark.functions.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = [0, 1, -1, 32767, -32768, 123, -456]
    b = encode_wav_pcm16(44100, samples)
    rate, n, bits, mean_abs = decode_wav_pcm16(b)
    assert (rate, n, bits) == (44100, 7, 16)
    assert mean_abs == sum(abs(s) for s in samples) / 7
    assert decode_wav_pcm16(None) is None
    assert decode_wav_pcm16(b[:20]) is None          # truncated header
    assert decode_wav_pcm16(b"XXXX" + b[4:]) is None  # bad magic
    assert decode_wav_pcm16(b[:-3]) is None           # truncated data
    stereo = bytearray(b)
    stereo[22] = 2  # channels=2: unsupported, must refuse not garble
    assert decode_wav_pcm16(bytes(stereo)) is None


def test_audio_frame_energy_hand_computed(spark):
    """4-sample/2-hop windows over a crafted clip: frame count and
    integer energy match a hand replay, including the truncated tail
    window and double-counted overlap samples."""
    from pyspark.sql import Row

    from spark_streaming_postgres_lab2_spark.functions.multimodal import (
        audio_frame_energy,
        encode_wav_pcm16,
    )

    samples = [1, 2, 3, 4, 5]  # windows: [1,2,3,4], [3,4,5], [5]
    payload = encode_wav_pcm16(8000, samples)
    media = spark.createDataFrame(
        [Row(media_id=1, payload=bytearray(payload))],
        "media_id long, payload binary",
    )
    got = audio_frame_energy(media, frame=4, hop=2).collect()[0]
    assert got.n_frames == 3
    want = (1 + 4 + 9 + 16) + (9 + 16 + 25) + 25
    assert got.total_energy == want


def test_png_roundtrip_and_filters():
    """Encode->decode is the identity on pixels; the encoder's rotating
    None/Sub/Up filters are genuinely defiltered (any filter bug would
    corrupt rows 1+); Average and Paeth defiltering are exercised via
    hand-built scanlines."""
    import struct
    import zlib

    from spark_streaming_postgres_lab2_spark.functions.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png_gray8,
        encode_png_gray8,
    )

    w, h = 7, 5
    pix = lambda x, y: (x * 11 + y * 19 + 3) % 256  # noqa: E731
    b = encode_png_gray8(w, h, pix)
    got = decode_png_gray8(b)
    assert got is not None
    gw, gh, raw = got
    assert (gw, gh) == (w, h)
    assert raw == bytes(pix(x, y) for y in range(h) for x in range(w))

    # hand-build rows with Average (3) and Paeth (4) filters
    rows = [bytes([10, 20, 30]), bytes([40, 50, 60])]
    enc0 = bytes([0]) + rows[0]
    # Average: enc[i] = raw[i] - (left + up)//2
    r1 = rows[1]
    avg = bytes([3]) + bytes(
        (r1[i] - (((r1[i - 1] if i else 0) + rows[0][i]) // 2)) & 0xFF
        for i in range(3)
    )
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(enc0 + avg))
           + _png_chunk(b"IEND", b""))
    assert decode_png_gray8(png)[2] == rows[0] + rows[1]
    # Paeth with a nonzero upper-left: predictor picks min-delta of l/u/ul
    pae = bytes([4]) + bytes(
        (r1[i] - (r1[i - 1] if i else 0)) & 0xFF if i else (r1[0] - rows[0][0]) & 0xFF
        for i in range(3)
    )
    # for i=0: a=0,c=0 -> pred=u; i>0: p chooses; just check roundtrip via decode
    png2 = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(enc0 + pae))
            + _png_chunk(b"IEND", b""))
    out2 = decode_png_gray8(png2)
    assert out2 is not None and out2[2][:3] == rows[0]


def test_png_rejects_corruption():
    """A flipped payload byte breaks the chunk CRC -> None (never a
    crash, never silently wrong pixels); truncation -> None."""
    from spark_streaming_postgres_lab2_spark.functions.multimodal import (
        decode_png_gray8,
        encode_png_gray8,
    )

    b = bytearray(encode_png_gray8(4, 3, lambda x, y: x + y))
    b[40] ^= 0xFF  # somewhere inside IDAT payload
    assert decode_png_gray8(bytes(b)) is None
    good = encode_png_gray8(4, 3, lambda x, y: x + y)
    assert decode_png_gray8(good[: len(good) - 15]) is None
    assert decode_png_gray8(b"not a png") is None
    # CRC-valid but spec-short IHDR payload: None, never struct.error
    # (review finding: unpack_from would otherwise crash the executor)
    import struct as _s

    from spark_streaming_postgres_lab2_spark.functions.multimodal import (
        _png_chunk,
        _PNG_SIG,
    )

    short = _PNG_SIG + _png_chunk(b"IHDR", _s.pack(">II", 4, 3)) + _png_chunk(b"IEND", b"")
    assert decode_png_gray8(short) is None


def test_video_container_roundtrip_and_truncation():
    from spark_streaming_postgres_lab2_spark.functions.multimodal import (
        decode_video,
        encode_bmp24,
        encode_video,
    )

    frames = [
        encode_bmp24(3, 2, lambda x, y, c, f=f: (f * 7 + x + y + c) % 256)
        for f in range(4)
    ]
    payload = encode_video(frames)
    assert decode_video(payload) == frames
    assert decode_video(payload[:-3]) is None      # truncated body
    assert decode_video(payload[:7]) is None        # truncated index
    assert decode_video(b"XXXX" + payload[4:]) is None  # bad magic
    assert decode_video(encode_video([])) == []
