"""M68 — REAL FLAC codec (stdlib + integers): the COMPRESSED audio
tier, completing the compressed-format triple (PNG = lossless image,
JPEG/MJPEG = lossy image/video, FLAC = lossless audio).

Everything here is the actual FLAC stream format (RFC 9639): the
encoder writes "fLaC" + STREAMINFO (including the real MD5 of the
unencoded samples), then one fixed-blocking frame — sync code,
block-size/sample-rate codes, UTF-8-coded frame number, header CRC-8
(poly 0x07) — carrying a fixed-order-2 LPC subframe: two warmup
samples, then rice-coded residuals (zigzag fold, unary quotient,
4-bit parameter, partition order 0, escape code supported), closed
with the byte-aligned frame CRC-16 (poly 0x8005). The decoder parses
and VERIFIES all of it: magic, STREAMINFO, sync, both CRCs, the
subframe type (constant / verbatim / fixed 0–4), rice decode, the
order-2 reconstruction s[i] = r[i] + 2·s[i−1] − s[i−2], and the
STREAMINFO MD5 against the decoded samples.

FLAC is LOSSLESS, so unlike JPEG (operators/jpegc.py) the oracle is
pixel-exact, not a bound contract: the decode panel reuses the WAV
tier's closed-form sample arithmetic ((id·131 + i·7919) % 65536 −
32768, operators/multimodal._synth_samples) and adds the exact
integer ``sample_sum`` tie-in — one wrong sample anywhere in the
rice/predictor/CRC chain flips the hash.

The signal is deliberately white-noise-like (the WAV formula), which
makes the rice tier work for its living: residual magnitudes push the
parameter to its 4-bit ceiling and exercise long unary quotients; the
escape path and the constant/verbatim subframe types are covered by
hand-built streams in tests/test_m68.py whose expected samples come
from the FORMAT, not from our encoder.

Scale: identical shape to every media tier — Arrow-batched
mapInPandas over the _spread id relation, per-row-bounded CPU, no
shuffle, no final sort.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from piholelongtermstats_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _spread,
    _synth_samples,
)

# ---------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005,
# both MSB-first, init 0 — RFC 9639 §9.2/§9.3)


def _build_crc_tables() -> "tuple[list, list]":
    """256-entry lookup tables generated FROM the bit-by-bit spec
    recurrences (so the table form is correct by construction). The
    per-byte loops below fold 8 spec steps into one table lookup —
    the decode profile's top cost was the bitwise _crc16 over every
    frame byte (r12 guide §1.2 per-task work)."""
    t8, t16 = [], []
    for b in range(256):
        c8 = b
        c16 = b << 8
        for _ in range(8):
            c8 = ((c8 << 1) ^ 0x07) & 0xFF if c8 & 0x80 else (c8 << 1) & 0xFF
            c16 = (
                ((c16 << 1) ^ 0x8005) & 0xFFFF
                if c16 & 0x8000
                else (c16 << 1) & 0xFFFF
            )
        t8.append(c8)
        t16.append(c16)
    return t8, t16


_CRC8_T, _CRC16_T = _build_crc_tables()


def _crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_T
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    t = _CRC16_T
    for b in data:
        crc = t[(crc >> 8) ^ b] ^ ((crc & 0xFF) << 8)
    return crc


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, no stuffing — FLAC is not a marker format)


class _Bits:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zero bits then a one bit

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)


class _BitsIn:
    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.bitpos = bitpos

    def get(self, nbits: int) -> int:
        v = 0
        bp = self.bitpos
        data = self.data
        end = bp + nbits
        if (end + 7) >> 3 > len(data):
            raise ValueError("FLAC bitstream exhausted")
        while nbits:
            byte = data[bp >> 3]
            avail = 8 - (bp & 7)
            take = avail if avail < nbits else nbits
            v = (v << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            bp += take
            nbits -= take
        self.bitpos = bp
        return v

    def get_unary(self) -> int:
        # Byte-scan for the terminating 1 bit instead of get(1) per
        # zero bit (the rice-decode profile cost): mask off the
        # already-consumed high bits of the current byte, then walk
        # whole bytes; bit_length() locates the first set bit. Same
        # exhaustion error as get() on overrun.
        data = self.data
        bp = self.bitpos
        i = bp >> 3
        if i >= len(data):
            raise ValueError("FLAC bitstream exhausted")
        byte = data[i] & (0xFF >> (bp & 7))
        while byte == 0:
            i += 1
            if i >= len(data):
                raise ValueError("FLAC bitstream exhausted")
            byte = data[i]
        bitidx = i * 8 + (8 - byte.bit_length())
        self.bitpos = bitidx + 1
        return bitidx - bp

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _zigzag_fold(r: int) -> int:
    return (r << 1) if r >= 0 else ((-r) << 1) - 1


def _zigzag_unfold(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


# ---------------------------------------------------------------------------
# Encoder

_BPS = 16
_ORDER = 2  # fixed predictor s[i] ≈ 2·s[i−1] − s[i−2]


def encode_flac(samples: list, rate: int) -> bytes:
    """REAL FLAC encoder: 16-bit mono, one fixed-blocking frame, a
    fixed-order-2 subframe with rice-coded residuals (partition order
    0, parameter chosen to minimize the partition size, 4-bit ceiling
    14 — the escape would only win on pathological inputs and the
    decoder supports it anyway)."""
    n = len(samples)
    if not 16 <= n <= 255:
        raise ValueError("encoder supports 16..255-sample frames")
    md5 = hashlib.md5(struct.pack(f"<{n}h", *samples)).digest()
    streaminfo = (
        struct.pack(">HH", n, n)
        + b"\x00\x00\x00" * 2  # min/max frame size unknown
        + bytes(
            [
                (rate >> 12) & 0xFF,
                (rate >> 4) & 0xFF,
                ((rate & 0xF) << 4)  # low rate nibble
                | (0 << 1)  # channels − 1 = 0 (mono)
                | ((_BPS - 1) >> 4),  # bps−1 high bit
            ]
        )
        + bytes([((_BPS - 1) & 0xF) << 4 | 0])  # bps−1 low nibble, ts hi
        + struct.pack(">I", n)  # total samples (36-bit, low 32 here)
        + md5
    )
    header = (
        b"fLaC"
        + bytes([0x80])
        + struct.pack(">I", len(streaminfo))[1:]
        + streaminfo
    )

    # frame header: sync+fixed, bs code 0110 (8-bit bs−1 follows),
    # sr code 1101 (16-bit Hz follows), mono, 16 bps, frame number 0
    fh = bytearray(b"\xff\xf8")
    fh.append((0b0110 << 4) | 0b1101)
    fh.append((0b0000 << 4) | (0b100 << 1) | 0)
    fh.append(0x00)  # UTF-8 frame number 0
    fh.append(n - 1)
    fh += struct.pack(">H", rate)
    fh.append(_crc8(bytes(fh)))

    bits = _Bits()
    # subframe header: 0 + type(6) + wasted(1); fixed order 2 = 001010
    bits.put(0, 1)
    bits.put(0b001000 | _ORDER, 6)
    bits.put(0, 1)
    for s in samples[:_ORDER]:  # warmup, signed bps bits
        bits.put(s & 0xFFFF, _BPS)
    resid = [
        samples[i] - 2 * samples[i - 1] + samples[i - 2]
        for i in range(_ORDER, n)
    ]
    folded = [_zigzag_fold(r) for r in resid]
    # cost(k) = Σ(u >> k) + n·(1+k); the shifted sums for all 15 k
    # come from one numpy array instead of 15 generator passes (same
    # integer arithmetic, same first-minimum tie-break)
    uarr = np.asarray(folded, dtype=np.int64)
    nfold = len(folded)
    best_k, best_cost = 0, None
    for k in range(15):
        cost = int((uarr >> k).sum()) + nfold * (1 + k)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    bits.put(0b00, 2)  # rice method, 4-bit params
    bits.put(0, 4)  # partition order 0
    bits.put(best_k, 4)
    for u in folded:
        bits.put_unary(u >> best_k)
        bits.put(u & ((1 << best_k) - 1), best_k)
    bits.align()
    frame = bytes(fh) + bytes(bits.out)
    frame += struct.pack(">H", _crc16(frame))
    return header + frame


# ---------------------------------------------------------------------------
# Decoder


def decode_flac(payload: bytes) -> "tuple[int, list]":
    """REAL FLAC decoder with full verification: magic, STREAMINFO
    (rate/channels/bps/total/MD5), frame sync + codes, header CRC-8,
    subframe decode (constant / verbatim / fixed 0–4; rice with 4-bit
    params incl. the 0b1111 escape), fixed-predictor reconstruction,
    byte-aligned frame CRC-16, and the decoded-sample MD5 against
    STREAMINFO. Returns (sample_rate, samples)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = total = None
    md5_expect = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            nch = ((body[12] >> 1) & 0x7) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            if nch != 1 or bps != _BPS:
                raise ValueError("only 16-bit mono supported")
            total = struct.unpack(">I", body[14:18])[0] | (
                (body[13] & 0xF) << 32
            )
            md5_expect = body[18:34]
        pos += 4 + blen
        if last:
            break
    if rate is None or total is None:
        raise ValueError("missing STREAMINFO")

    fstart = pos
    if payload[pos] != 0xFF or (payload[pos + 1] & 0xFE) != 0xF8:
        raise ValueError("bad frame sync")
    bs_code = payload[pos + 2] >> 4
    sr_code = payload[pos + 2] & 0xF
    chan = payload[pos + 3] >> 4
    size_code = (payload[pos + 3] >> 1) & 0x7
    if chan != 0 or size_code != 0b100:
        raise ValueError("unsupported frame layout")
    p = pos + 4
    fn = payload[p]  # UTF-8 coded frame number (single byte only here)
    if fn & 0x80:
        raise ValueError("multi-byte frame numbers not supported")
    p += 1
    if bs_code == 0b0110:
        bs = payload[p] + 1
        p += 1
    elif bs_code == 0b0111:
        bs = struct.unpack(">H", payload[p : p + 2])[0] + 1
        p += 2
    else:
        raise ValueError("unsupported block size code")
    if sr_code == 0b1101:
        frate = struct.unpack(">H", payload[p : p + 2])[0]
        p += 2
    else:
        raise ValueError("unsupported sample rate code")
    if frate != rate:
        raise ValueError("frame/STREAMINFO rate mismatch")
    if _crc8(payload[fstart:p]) != payload[p]:
        raise ValueError("bad frame header CRC-8")
    p += 1

    bits = _BitsIn(payload, p * 8)
    if bits.get(1):
        raise ValueError("bad subframe padding bit")
    stype = bits.get(6)
    if bits.get(1):
        raise ValueError("wasted bits not supported")
    if stype == 0b000000:  # constant
        v = bits.get(_BPS)
        if v >= 1 << (_BPS - 1):
            v -= 1 << _BPS
        samples = [v] * bs
    elif stype == 0b000001:  # verbatim
        samples = []
        for _ in range(bs):
            v = bits.get(_BPS)
            if v >= 1 << (_BPS - 1):
                v -= 1 << _BPS
            samples.append(v)
    elif 0b001000 <= stype <= 0b001100:  # fixed order 0..4
        order = stype & 0x7
        samples = []
        for _ in range(order):
            v = bits.get(_BPS)
            if v >= 1 << (_BPS - 1):
                v -= 1 << _BPS
            samples.append(v)
        if bits.get(2) != 0b00:
            raise ValueError("only 4-bit rice parameters supported")
        porder = bits.get(4)
        nres = bs - order
        resid: list = []
        for part in range(1 << porder):
            cnt = bs // (1 << porder) - (order if part == 0 else 0)
            k = bits.get(4)
            if k == 0b1111:  # escape: raw nbits residuals
                raw = bits.get(5)
                for _ in range(cnt):
                    v = bits.get(raw)
                    if raw and v >= 1 << (raw - 1):
                        v -= 1 << raw
                    resid.append(v)
            else:
                for _ in range(cnt):
                    q = bits.get_unary()
                    u = (q << k) | bits.get(k)
                    resid.append(_zigzag_unfold(u))
        if len(resid) != nres:
            raise ValueError("residual count mismatch")
        # fixed-predictor reconstruction (orders 0–4 per the spec's
        # difference cascade; order 2 is what our encoder emits)
        coefs = {
            0: [],
            1: [1],
            2: [2, -1],
            3: [3, -3, 1],
            4: [4, -6, 4, -1],
        }[order]
        if order == 2:
            # local-variable form of the same 2·s₁ − s₂ cascade (what
            # our encoder emits); the generic genexpr below stays as
            # the spec-complete path for orders 0/1/3/4
            s1, s2 = samples[-1], samples[-2]
            append = samples.append
            for r in resid:
                v = r + 2 * s1 - s2
                append(v)
                s2, s1 = s1, v
        else:
            for r in resid:
                pred = sum(
                    c * samples[len(samples) - i - 1]
                    for i, c in enumerate(coefs)
                )
                samples.append(r + pred)
    else:
        raise ValueError("unsupported subframe type")
    bits.align()
    fend = bits.bitpos // 8
    crc = struct.unpack(">H", payload[fend : fend + 2])[0]
    if _crc16(payload[fstart:fend]) != crc:
        raise ValueError("bad frame CRC-16")
    if len(samples) != total:
        raise ValueError("sample count mismatch")
    if any(s < -(1 << 15) or s >= 1 << 15 for s in samples):
        raise ValueError("sample out of 16-bit range")
    md5_got = hashlib.md5(
        struct.pack(f"<{len(samples)}h", *samples)
    ).digest()
    if md5_expect != b"\x00" * 16 and md5_got != md5_expect:
        raise ValueError("decoded-sample MD5 mismatch")
    return rate, samples


# ---------------------------------------------------------------------------
# Spark operators

FLAC_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.LongType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("is_valid", T.IntegerType()),
    ]
)


def synth_flac_corpus(docs: DataFrame) -> DataFrame:
    """One REAL FLAC payload per document over the WAV tier's sample
    formula (operators/multimodal._synth_samples) — same signal, a
    completely different (compressed) container/codec, so both panels
    share one closed-form oracle family."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for media_id in pdf["doc_id"]:
                rate, samples = _synth_samples(int(media_id))
                payloads.append(encode_flac(samples, rate))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "audio/flac",
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                }
            )

    return _spread(docs.select("doc_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_flac_features(media: DataFrame) -> DataFrame:
    """Lossless decode panel: the WAV feature shape plus the exact
    integer ``sample_sum`` tie-in (FLAC decode is bit-exact, so the
    oracle replays every column in closed form — one wrong sample
    anywhere in the rice/predictor/CRC chain flips the hash).
    Unparseable or verification-failing payloads quarantine as
    is_valid = 0 rows."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in FLAC_FEATURE_SCHEMA.fields}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(media_id)
                try:
                    rate, samples = decode_flac(bytes(payload or b""))
                    n = len(samples)
                    ss = sum(s * s for s in samples)
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(1)
                    out["n_frames"].append(n)
                    out["duration_ms"].append(n * 1000 // rate)
                    out["rms"].append(
                        int(math.sqrt(ss / n)) if n else 0
                    )
                    out["sample_sum"].append(sum(samples))
                    out["is_valid"].append(1)
                except (ValueError, struct.error):
                    for k in (
                        "sample_rate",
                        "n_channels",
                        "n_frames",
                        "duration_ms",
                        "rms",
                        "sample_sum",
                    ):
                        out[k].append(None)
                    out["is_valid"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FLAC_FEATURE_SCHEMA)
