"""M63 — real BMP synth/decode/resize (operators/multimodal.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from piholelongtermstats_spark.operators import multimodal as mm


def _docs(spark, ids):
    return spark.createDataFrame([(i, f"d{i}") for i in ids], "doc_id long, text string")


def _ref_sums(mid: int, scale: int = 1):
    """Pure-Python reference of the synthesized pixel channel sums."""
    w, h = mm._bmp_dims(mid)
    wd, hd = (w + scale - 1) // scale, (h + scale - 1) // scale
    sums = [0, 0, 0]
    for r in range(hd):
        for c in range(wd):
            for ch in range(3):
                sums[ch] += mm._bmp_pixel(mid, r * scale, c * scale, ch)
    return wd, hd, sums


def test_payloads_are_real_bmps_and_cover_every_padding_case(spark):
    ids = list(range(8))
    rows = mm.synth_bmp_corpus(_docs(spark, ids)).collect()
    assert len(rows) == 8
    pads = set()
    for r in rows:
        assert bytes(r["payload"][:2]) == b"BM"
        w, h = mm._bmp_dims(r["media_id"])
        assert (r["width"], r["height"]) == (w, h)
        stride = (3 * w + 3) // 4 * 4
        pads.add(stride - 3 * w)
        assert len(r["payload"]) == 54 + stride * h
    assert pads == {0, 1, 2, 3}  # every 4-byte alignment case


def test_decode_matches_pixel_formula(spark):
    ids = [0, 3, 7, 11]
    feats = {
        r["media_id"]: r
        for r in mm.decode_bmp_features(
            mm.synth_bmp_corpus(_docs(spark, ids))
        ).collect()
    }
    for mid in ids:
        w, h, (bs, gs, rs) = _ref_sums(mid)
        g = feats[mid]
        assert (g["width"], g["height"]) == (w, h)
        assert (g["b_sum"], g["g_sum"], g["r_sum"]) == (bs, gs, rs)
        assert g["checksum"] == bs + gs + rs
        assert g["mean_luma_milli"] == (299 * rs + 587 * gs + 114 * bs) // (w * h)
        assert g["is_valid"] == 1


def test_resize_roundtrip_matches_strided_formula(spark):
    ids = [1, 4, 6]
    media = mm.synth_bmp_corpus(_docs(spark, ids))
    feats = {
        r["media_id"]: r
        for r in mm.decode_bmp_features(
            mm.resize_bmp_nearest(media, factor=2)
        ).collect()
    }
    for mid in ids:
        wd, hd, (bs, gs, rs) = _ref_sums(mid, scale=2)
        g = feats[mid]
        assert (g["width"], g["height"]) == (wd, hd)
        assert (g["b_sum"], g["g_sum"], g["r_sum"]) == (bs, gs, rs)
        assert g["is_valid"] == 1


def test_corrupt_payload_quarantines(spark):
    media = spark.createDataFrame(
        [(0, bytearray(b"not a bmp"), "image/bmp", None, None),
         (1, None, "image/bmp", None, None)],
        mm.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in mm.decode_bmp_features(media).collect()}
    for mid in (0, 1):
        assert rows[mid]["is_valid"] == 0
        assert rows[mid]["checksum"] is None


def test_parse_rejects_non_24bpp():
    # valid magic but 32 bpp — must raise, not mis-decode
    import struct

    hdr = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 1, 1, 1, 32, 0, 4, 2835, 2835, 0, 0
    )
    with pytest.raises(ValueError):
        mm._bmp_parse(hdr + b"\x00" * 8)
