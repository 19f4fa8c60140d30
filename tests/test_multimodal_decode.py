"""Real stdlib PNG/WAV codecs (closes the r4 multimodal-decode stub):
round-trip exactness across shapes and all five PNG filter types,
malformed-structure rejection, and the Spark encode→decode flow
against the closed-form oracle at the driver's gate scale (sf0.01)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from otel_worker_spark.ops import multimodal as mm

SF_DIR = "/root/testdata/sf0.01"


def test_png_round_trip_all_filters():
    rng = np.random.RandomState(3)
    for _ in range(40):
        h, w = rng.randint(1, 14), rng.randint(1, 17)
        pix = rng.randint(0, 256, size=(h, w))
        ww, hh, out = mm.decode_png(mm.encode_png(pix))
        assert (ww, hh) == (w, h) and (out == pix).all()
    # h >= 5 guarantees every filter type (y % 5) appears
    pix = rng.randint(0, 256, size=(8, 16))
    assert (mm.decode_png(mm.encode_png(pix))[2] == pix).all()


def test_png_malformed_rejected():
    pix = np.arange(12).reshape(3, 4) % 256
    good = mm.encode_png(pix)
    with pytest.raises(ValueError):
        mm.decode_png(b"not a png" + good)
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF  # flip an IHDR byte → CRC mismatch
    with pytest.raises(ValueError):
        mm.decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        mm.decode_png(good[:-8])  # truncated


def test_wav_round_trip_and_malformed():
    rng = np.random.RandomState(5)
    for n in (1, 8, 57, 1000):
        s = rng.randint(-32768, 32768, size=n)
        rate, out = mm.decode_wav(mm.encode_wav(s, 8000))
        assert rate == 8000 and (out == s).all()
    good = mm.encode_wav(np.array([1, -2, 3]), 8000)
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFX" + good[4:])
    with pytest.raises(ValueError):
        mm.decode_wav(good[:-2])  # RIFF size mismatch


def test_decoded_features_match_closed_form_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = mm.decoded_media_features(docs).toPandas()
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from '{SF_DIR}/documents.parquet'"
    )
    want = con.sql(mm.decoded_media_features_sql()).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = want[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(a) == docs.count()
    assert a.equals(b)
