"""M68 — real FLAC codec (operators/flacc.py): lossless compressed
audio with full CRC-8/CRC-16/MD5 verification.

Decoder independence: hand-built streams whose expected samples come
from the FORMAT (constant subframe → flat signal; verbatim → the raw
values; rice escape partition), not from inverting our encoder."""

from __future__ import annotations

import struct

import pytest

from piholelongtermstats_spark.operators import flacc as FL
from piholelongtermstats_spark.operators.multimodal import _synth_samples


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"d{i}") for i in ids], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# primitives


def test_crc8_crc16_known_vectors():
    # CRC-8 poly 0x07 over "123456789" is the classic check value 0xF4
    assert FL._crc8(b"123456789") == 0xF4
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect) check = 0xFEE8
    assert FL._crc16(b"123456789") == 0xFEE8


def test_zigzag_fold_unfold_roundtrip():
    for r in list(range(-300, 301)) + [-(1 << 17), (1 << 17) - 1]:
        u = FL._zigzag_fold(r)
        assert u >= 0
        assert FL._zigzag_unfold(u) == r


def test_bit_io_roundtrip():
    w = FL._Bits()
    vals = [(5, 3), (0, 1), (1023, 10), (0xFFFF, 16), (1, 1)]
    for v, n in vals:
        w.put(v, n)
    w.put_unary(37)
    w.align()
    r = FL._BitsIn(bytes(w.out))
    for v, n in vals:
        assert r.get(n) == v
    assert r.get_unary() == 37


# ---------------------------------------------------------------------------
# lossless roundtrip + tamper detection


def test_roundtrip_is_bit_exact():
    for mid in list(range(60)) + [10**6, 10**9 + 7]:
        rate, samples = _synth_samples(mid)
        r2, s2 = FL.decode_flac(FL.encode_flac(samples, rate))
        assert r2 == rate and s2 == samples


def test_every_single_byte_corruption_is_caught():
    """CRC-8 over the frame header, CRC-16 over the frame, and the
    STREAMINFO MD5 over the decoded samples must jointly reject EVERY
    single-byte corruption — no silent wrong decode anywhere."""
    rate, samples = _synth_samples(7)
    pay = FL.encode_flac(samples, rate)
    for i in range(len(pay)):
        p2 = bytearray(pay)
        p2[i] ^= 0x41
        try:
            r2, s2 = FL.decode_flac(bytes(p2))
        except (ValueError, struct.error):
            continue
        assert r2 == rate and s2 == samples, f"silent wrong decode @ {i}"


# ---------------------------------------------------------------------------
# decoder-only: hand-built streams, expectations from the format


def _handframe(subframe_bits: "FL._Bits", bs: int, rate: int, md5: bytes):
    """Wrap hand-built subframe bits in a valid stream (STREAMINFO +
    frame header + CRCs) without calling the encoder's subframe path."""
    streaminfo = (
        struct.pack(">HH", bs, bs)
        + b"\x00\x00\x00" * 2
        + bytes(
            [
                (rate >> 12) & 0xFF,
                (rate >> 4) & 0xFF,
                ((rate & 0xF) << 4) | (15 >> 4),
            ]
        )
        + bytes([(15 & 0xF) << 4])
        + struct.pack(">I", bs)
        + md5
    )
    head = (
        b"fLaC"
        + bytes([0x80])
        + struct.pack(">I", len(streaminfo))[1:]
        + streaminfo
    )
    fh = bytearray(b"\xff\xf8")
    fh.append((0b0110 << 4) | 0b1101)
    fh.append((0b100 << 1))
    fh.append(0x00)
    fh.append(bs - 1)
    fh += struct.pack(">H", rate)
    fh.append(FL._crc8(bytes(fh)))
    subframe_bits.align()
    frame = bytes(fh) + bytes(subframe_bits.out)
    frame += struct.pack(">H", FL._crc16(frame))
    return head + frame


def test_constant_subframe_decodes_to_flat_signal():
    import hashlib

    bs, rate, v = 48, 8000, -1234
    md5 = hashlib.md5(struct.pack(f"<{bs}h", *([v] * bs))).digest()
    bits = FL._Bits()
    bits.put(0, 1)
    bits.put(0b000000, 6)  # constant
    bits.put(0, 1)
    bits.put(v & 0xFFFF, 16)
    rate2, samples = FL.decode_flac(_handframe(bits, bs, rate, md5))
    assert rate2 == rate and samples == [v] * bs


def test_verbatim_subframe_decodes_raw_values():
    import hashlib

    vals = [((i * 9973) % 65536) - 32768 for i in range(32)]
    md5 = hashlib.md5(struct.pack("<32h", *vals)).digest()
    bits = FL._Bits()
    bits.put(0, 1)
    bits.put(0b000001, 6)  # verbatim
    bits.put(0, 1)
    for v in vals:
        bits.put(v & 0xFFFF, 16)
    _, samples = FL.decode_flac(_handframe(bits, 32, 12000, md5))
    assert samples == vals


def test_rice_escape_partition_decodes():
    """A fixed-order-0 subframe whose single partition uses the
    0b1111 escape (raw 6-bit residuals) — the escape path the encoder
    never emits, exercised decoder-only."""
    import hashlib

    vals = [(i % 61) - 30 for i in range(40)]  # fit in 6 bits signed
    md5 = hashlib.md5(struct.pack("<40h", *vals)).digest()
    bits = FL._Bits()
    bits.put(0, 1)
    bits.put(0b001000, 6)  # fixed order 0 → residuals ARE the samples
    bits.put(0, 1)
    bits.put(0b00, 2)
    bits.put(0, 4)  # partition order 0
    bits.put(0b1111, 4)  # escape
    bits.put(6, 5)  # raw 6-bit residuals
    for v in vals:
        bits.put(v & 0x3F, 6)
    _, samples = FL.decode_flac(_handframe(bits, 40, 16000, md5))
    assert samples == vals


def test_md5_mismatch_is_rejected():
    bits = FL._Bits()
    bits.put(0, 1)
    bits.put(0b000000, 6)
    bits.put(0, 1)
    bits.put(0, 16)
    with pytest.raises(ValueError, match="MD5"):
        FL.decode_flac(_handframe(bits, 16, 8000, b"\x01" * 16))


# ---------------------------------------------------------------------------
# Spark surface


def test_flac_decode_panel_query(spark):
    import __spark_entry__ as se

    rows = se.queries()["flac_decode_panel"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.is_valid == 1
        rate, samples = _synth_samples(r.media_id)
        assert r.sample_rate == rate
        assert r.n_frames == len(samples)
        assert r.sample_sum == sum(samples)


def test_flac_panel_quarantines_corrupt_payload(spark):
    from pyspark.sql import functions as F

    media = FL.synth_flac_corpus(_docs(spark, [1, 2, 3]))
    broken = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 2, F.lit(b"fLaCxx")).otherwise(
            F.col("payload")
        ),
    )
    got = {
        r.media_id: r.is_valid
        for r in FL.decode_flac_features(broken).collect()
    }
    assert got == {1: 1, 2: 0, 3: 1}


# ---------------------------------------------------------------------------
# r12 optimization internals: the table-driven CRCs and the byte-scan
# unary reader must match the bit-by-bit spec recurrences they replaced


def test_crc_tables_match_spec_recurrence():
    import random

    def crc8_spec(data: bytes) -> int:
        crc = 0
        for b in data:
            crc ^= b
            for _ in range(8):
                crc = (
                    ((crc << 1) ^ 0x07) & 0xFF
                    if crc & 0x80
                    else (crc << 1) & 0xFF
                )
        return crc

    def crc16_spec(data: bytes) -> int:
        crc = 0
        for b in data:
            crc ^= b << 8
            for _ in range(8):
                crc = (
                    ((crc << 1) ^ 0x8005) & 0xFFFF
                    if crc & 0x8000
                    else (crc << 1) & 0xFFFF
                )
        return crc

    rng = random.Random(0x8005)
    cases = [b"", b"\x00", b"\xff" * 7, bytes(range(256))] + [
        bytes(rng.randrange(256) for _ in range(rng.randrange(1, 64)))
        for _ in range(50)
    ]
    for data in cases:
        assert FL._crc8(data) == crc8_spec(data)
        assert FL._crc16(data) == crc16_spec(data)


def test_get_unary_matches_bitwise_reference():
    # streams with long zero runs crossing byte boundaries, at every
    # starting bit offset; reference = the old get(1)-per-bit loop
    def unary_ref(r: "FL._BitsIn") -> int:
        q = 0
        while True:
            if r.get(1):
                return q
            q += 1

    w = FL._Bits()
    qs = [0, 1, 7, 8, 9, 31, 32, 33, 63, 2, 0, 15]
    for off in range(8):
        w2 = FL._Bits()
        if off:
            w2.put(0, off)  # consumed prefix
        for q in qs:
            w2.put_unary(q)
        w2.put(1, 1)  # trailing guard bit
        w2.align()
        data = bytes(w2.out)
        ra = FL._BitsIn(data, off)
        rb = FL._BitsIn(data, off)
        for q in qs:
            assert ra.get_unary() == unary_ref(rb) == q
            assert ra.bitpos == rb.bitpos
    # exhaustion: an all-zero tail must raise, as get(1) would
    import pytest as _pytest

    r = FL._BitsIn(b"\x00\x00", 3)
    with _pytest.raises(ValueError):
        r.get_unary()
