"""PNG/WAV codecs (functions/codecs.py) — stdlib-only real decode."""

import numpy as np
import pytest

from batch_import_spark.functions.codecs import (
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)


def _pattern(h, w, ch, seed=0):
    y, x, c = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(ch), indexing="ij"
    )
    return ((x * 7 + y * 3 + c * 11 + seed) % 256).astype(np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_round_trip_all_filters(ch):
    """Encoder cycles filters 0-4 per row; >=5 rows exercises every
    unfilter branch; exact pixel recovery required."""
    px = _pattern(9, 13, ch, seed=5)
    data = png_encode(px)
    out = png_decode(data)
    assert out.shape == (9, 13, ch)
    assert np.array_equal(out, px.reshape(9, 13, ch))


def test_png_rejects_non_png():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"garbage bytes")


def test_png_decode_zero_filter_only():
    px = _pattern(4, 4, 3)
    assert np.array_equal(png_decode(png_encode(px, cycle_filters=False)), px)


def test_wav_round_trip_mono_and_stereo():
    mono = (np.arange(500) * 37 % 65536 - 32768).astype(np.int16)
    data = wav_encode(mono, 8000)
    arr, rate = wav_decode(data)
    assert rate == 8000 and arr.shape == (500, 1)
    assert np.array_equal(arr[:, 0], mono)

    stereo = np.stack([mono, -1 - mono], axis=1).astype(np.int16)
    arr2, _ = wav_decode(wav_encode(stereo, 44100))
    assert arr2.shape == (500, 2)
    assert np.array_equal(arr2, stereo)


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError, match="not a WAV"):
        wav_decode(b"RIFFxxxxJUNK" + b"\x00" * 32)


def test_decode_media_sniffs_real_formats():
    """decode_media routes PNG/WAV payloads through the REAL decoders
    (magic-byte sniff), keeping the fake only for unknown formats."""
    from batch_import_spark.functions.multimodal import decode_media

    px = _pattern(5, 6, 3)
    out = decode_media(png_encode(px), "image", strict=True)
    assert out.shape == (30, 3)
    assert np.array_equal(out.astype(np.uint8).reshape(5, 6, 3), px)

    mono = (np.arange(100) * 7 % 65536 - 32768).astype(np.int16)
    a = decode_media(wav_encode(mono, 8000), "audio", strict=True)
    assert a.shape == (100, 1)
    assert np.allclose(a[:, 0], mono / 32768.0)

    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff jpeg-ish", "image", strict=True)


def test_resize_media_real_png_path(spark):
    """resize_media does a true nearest-neighbor pixel resize for PNG
    payloads: a 2×2-blocked 8×8 image downsampled to 4×4 recovers the
    block colors exactly."""
    from batch_import_spark.functions.multimodal import resize_media

    blocks = (np.arange(16).reshape(4, 4) * 16).astype(np.uint8)
    px = np.repeat(np.repeat(blocks, 2, axis=0), 2, axis=1)
    px3 = np.stack([px, px, px], axis=2)
    df = spark.createDataFrame(
        [(1, "image", bytearray(png_encode(px3)))],
        "media_id long, kind string, payload binary",
    )
    row = resize_media(df, out_w=4, out_h=4).collect()[0]
    got = np.frombuffer(bytes(row["resized"]), np.uint8).reshape(4, 4, 3)
    assert np.array_equal(got[:, :, 0], blocks)
