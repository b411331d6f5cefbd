"""M64 — real AVI synth/decode/frame-sampling (operators/multimodal.py)."""

from __future__ import annotations

import pytest

from piholelongtermstats_spark.operators import multimodal as mm


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"d{i}") for i in ids], "doc_id long, text string"
    )


def _ref(mid: int, every: int = 1):
    w, h = mm._bmp_dims(mid)
    n = mm._avi_n_frames(mid)
    possum = luma = cnt = 0
    for s, f in enumerate(range(0, n, every)):
        sums = [0, 0, 0]
        for r in range(h):
            for c in range(w):
                for ch in range(3):
                    sums[ch] += mm._avi_pixel(mid, f, r, c, ch)
        bs, gs, rs = sums
        possum += (s + 1) * (bs + gs + rs)
        luma += (299 * rs + 587 * gs + 114 * bs) // (w * h)
        cnt += 1
    return w, h, cnt, possum, luma


def test_payloads_are_spec_valid_riff_avi(spark):
    rows = mm.synth_avi_corpus(_docs(spark, range(4))).collect()
    import struct

    for r in rows:
        p = bytes(r["payload"])
        assert p[:4] == b"RIFF" and p[8:12] == b"AVI "
        (riff_size,) = struct.unpack("<I", p[4:8])
        assert len(p) == 8 + riff_size  # RIFF size field exact
        # the real parser accepts it and sees every frame
        w, h, usf, frames = mm._avi_parse(p)
        assert (w, h) == mm._bmp_dims(r["media_id"])
        assert usf == mm.AVI_US_PER_FRAME
        assert len(frames) == mm._avi_n_frames(r["media_id"])


def test_decode_matches_formula_and_is_order_sensitive(spark):
    ids = [0, 2, 5]
    feats = {
        r["media_id"]: r
        for r in mm.decode_avi_features(
            mm.synth_avi_corpus(_docs(spark, ids))
        ).collect()
    }
    for mid in ids:
        w, h, n, possum, luma = _ref(mid)
        g = feats[mid]
        assert (g["width"], g["height"], g["n_frames"]) == (w, h, n)
        assert g["checksum_possum"] == possum
        assert g["luma_milli_sum"] == luma
        assert g["is_valid"] == 1
    # positional weighting: swapping two distinct frames changes the
    # value (frame checksums differ because f enters the pixel formula)
    mid = 0
    _, _, _, possum, _ = _ref(mid)
    w, h = mm._bmp_dims(mid)

    def cks(f):
        return sum(
            mm._avi_pixel(mid, f, r, c, ch)
            for r in range(h) for c in range(w) for ch in range(3)
        )

    swapped = possum - 1 * cks(0) - 2 * cks(1) + 1 * cks(1) + 2 * cks(0)
    assert swapped != possum


def test_frame_sampling_matches_reference(spark):
    ids = [1, 3, 6]
    feats = {
        r["media_id"]: r
        for r in mm.sample_avi_frames(
            mm.synth_avi_corpus(_docs(spark, ids)), every=2
        ).collect()
    }
    for mid in ids:
        w, h, n, possum, luma = _ref(mid, every=2)
        g = feats[mid]
        assert (g["n_frames"], g["checksum_possum"]) == (n, possum)
        assert g["luma_milli_sum"] == luma
        assert g["us_per_frame"] == mm.AVI_US_PER_FRAME * 2


def test_corrupt_payload_quarantines(spark):
    media = spark.createDataFrame(
        [(0, bytearray(b"RIFFxxxxNOPE"), "video/avi", None, None),
         (1, None, "video/avi", None, None)],
        mm.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in mm.decode_avi_features(media).collect()}
    for mid in (0, 1):
        assert rows[mid]["is_valid"] == 0
        assert rows[mid]["checksum_possum"] is None


def test_parse_rejects_non_dib_stream():
    import struct

    strf = struct.pack("<IiiHHI", 40, 2, 2, 1, 32, 0) + b"\x00" * 20
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(strf)) + b"hdrl" \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    body = b"AVI " + hdrl
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        mm._avi_parse(payload)
