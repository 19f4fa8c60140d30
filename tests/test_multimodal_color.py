"""Widened multimodal codec matrix (VERDICT r5 next-round #4):
RGB/RGBA PNG (multi-byte filter offsets) and stereo WAV round-trip
bit-exactly; everything outside the matrix still fails LOUDLY."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from otel_worker_spark.ops import multimodal as mm


@pytest.mark.parametrize(
    "shape",
    [(5, 7), (6, 4, 3), (3, 9, 4), (13, 16, 3), (1, 1, 4), (11, 2, 3)],
)
def test_png_round_trip_all_channels(shape):
    rng = np.random.default_rng(sum(shape))
    pix = rng.integers(0, 256, size=shape)
    w, h, out = mm.decode_png(mm.encode_png(pix))
    assert (w, h) == (shape[1], shape[0])
    assert np.array_equal(out.reshape(pix.shape), pix)


def test_png_filter_matrix_covered():
    # ≥5 rows ⇒ the y%5 cycle hits every filter type, with bpp=4 the
    # left/upper-left offsets are multi-byte
    pix = (np.arange(8 * 6 * 4).reshape(8, 6, 4) * 37) % 256
    _, _, out = mm.decode_png(mm.encode_png(pix))
    assert np.array_equal(out, pix)


def test_png_rejects_unsupported_color_type():
    data = bytearray(mm.encode_png(np.zeros((4, 4), dtype=np.int64)))
    # IHDR body starts at offset 16 (sig 8 + len 4 + type 4); color
    # type is byte 9 of the body — patch to 4 (gray+alpha, unsupported)
    # and fix the CRC so the failure is the variant check, not the CRC
    body = bytearray(data[16:29])
    body[9] = 4
    data[16:29] = body
    crc = zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF
    data[29:33] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        mm.decode_png(bytes(data))


def test_wav_stereo_round_trip_and_mono_contract():
    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, size=(23, 2))
    rate, ch, frames = mm.decode_wav_multi(mm.encode_wav(s, 44100))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(frames, s)
    # the mono-view API stays loud on stereo input
    with pytest.raises(ValueError, match="mono"):
        mm.decode_wav(mm.encode_wav(s))
    # 3-channel is outside the matrix entirely
    with pytest.raises(ValueError, match="unsupported WAV variant"):
        mm.decode_wav_multi(mm.encode_wav(rng.integers(-5, 5, size=(4, 3))))


def test_synth_color_decode_round_trip(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    got = {r.doc_id: r for r in mm.decoded_color_features(docs).collect()}
    assert len(got) == 40
    kinds = {r.media_kind for r in got.values()}
    assert kinds == {"png-gray", "png-rgb", "png-rgba", "wav-stereo"}
    for d, r in got.items():
        if r.media_kind == "wav-stereo":
            assert r.channels == 2 and r.height == 1
            assert r.n_units == 2 * (8 + d % 50)
        else:
            ch = {"png-gray": 1, "png-rgb": 3, "png-rgba": 4}[r.media_kind]
            assert r.channels == ch
            assert r.n_units == (4 + d % 13) * (3 + d % 11) * ch
