"""M67 — Motion-JPEG AVI (operators/jpegc.py tail): compressed video
= the M64 RIFF walk carrying M66 JPEG frames in '00dc' chunks."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from piholelongtermstats_spark.operators import jpegc as J


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"d{i}") for i in ids], "doc_id long, text string"
    )


def test_mjpeg_container_declares_mjpg_everywhere():
    pay = J._encode_mjpeg(9)
    assert pay[:4] == b"RIFF" and pay[8:12] == b"AVI "
    i = pay.index(b"strh") + 8
    assert pay[i : i + 4] == b"vids" and pay[i + 4 : i + 8] == b"MJPG"
    j = pay.index(b"strf") + 8
    comp = struct.unpack("<I", pay[j + 16 : j + 20])[0]
    assert comp == 0x47504A4D  # biCompression 'MJPG'
    assert b"00dc" in pay and b"00db" not in pay


def test_mjpeg_frames_are_standalone_jpegs():
    """Every '00dc' chunk must independently decode as a complete
    baseline JPEG matching its closed-form frame grid."""
    for mid in (0, 3, 11, 25):
        w, h = J._bmp_dims(mid)
        _, _, usf, frames = J._mjpeg_parse(J._encode_mjpeg(mid))
        assert len(frames) == J._mjpeg_n_frames(mid)
        assert usf == J.MJPEG_US_PER_FRAME
        for f, jpg in enumerate(frames):
            assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
            fw, fh, px = J.decode_jpeg_gray(jpg)
            src = J._mjpeg_luma(mid, f, h, w)
            assert (fw, fh) == (w, h)
            assert (
                np.abs(px.astype(int) - src.astype(int)).max() <= J.ERR_BOUND
            )


def test_mjpeg_parse_rejects_uncompressed_avi():
    """A DIB ('00db') AVI must NOT pass the MJPEG parser — the
    compression fourcc gate is part of the contract."""
    from piholelongtermstats_spark.operators import multimodal as mm

    # take a real uncompressed AVI payload from the M64 synth path
    pay = J._encode_mjpeg(4)
    dib = pay.replace(b"MJPG", b"DIB ").replace(b"00dc", b"00db")
    with pytest.raises(ValueError):
        J._mjpeg_parse(dib)
    assert mm  # imported to document the sibling tier


def test_mjpeg_frames_audit_query(spark):
    import __spark_entry__ as se

    rows = se.queries()["mjpeg_frames_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    by_media: dict = {}
    for r in rows:
        assert r.is_valid == 1 and r.within_bound == 1
        assert r.err_bound == J.ERR_BOUND
        assert r.frame_ts_ms == r.frame_idx * 100
        w, h = J._bmp_dims(r.media_id)
        assert (r.width, r.height) == (w, h)
        src = J._mjpeg_luma(r.media_id, r.frame_idx, h, w)
        assert r.src_sum == int(src.astype(int).sum())
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(J._mjpeg_n_frames(mid)))


def test_mjpeg_audit_quarantines_corrupt_payload(spark):
    from pyspark.sql import functions as F

    media = J.synth_mjpeg_corpus(_docs(spark, [1, 2, 3]))
    broken = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 2, F.lit(b"RIFFxxxx")).otherwise(
            F.col("payload")
        ),
    )
    rows = J.mjpeg_frames_audit(broken).collect()
    bad = [r for r in rows if r.media_id == 2]
    assert len(bad) == 1 and bad[0].is_valid == 0 and bad[0].frame_idx == -1
    good = [r for r in rows if r.media_id != 2]
    assert all(r.is_valid == 1 and r.within_bound == 1 for r in good)
