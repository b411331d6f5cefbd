"""Multimodal (binary) column plumbing (M7).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing here — schemas, Arrow-batched mapInPandas,
partition sizing — is real and tested. Decode comes in two tiers:
codec-FREE formats get GENUINE byte-level decoders covering all three
modalities (audio: WAV via stdlib ``wave``, M53; image: 24-bit BMP via
stdlib struct + numpy un-padding, M63, and 8-bit RGB PNG via stdlib
``zlib`` inflate + scanline un-filtering, M65; video: uncompressed
RIFF/AVI with DIB frames, M64 — each oracle-checked through
synthesis-replay; baseline JPEG — DCT + canonical Huffman, the lossy
tier — lives in operators/jpegc.py with an error-bound contract
audit, M66), while the remaining codec-DEPENDENT formats (h264,
vorbis…) stay STUBBED:
extract_features raises NotImplementedError unless ``fake=True``,
which substitutes a deterministic fake feature vector so the pipeline
shape is testable end-to-end in a container without media libraries.

Scale notes: binary payloads dominate partition size — repartition so
``rows × avg_payload ≤ spark.sql.files.maxPartitionBytes`` before the
UDF stage; mapInPandas streams Arrow batches so peak memory is
one batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text as a binary payload so the media
    pipeline has a driver-testdata input (no media files ship in the
    test set)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def _spread(ids: DataFrame) -> DataFrame:
    """Hash-repartition the (tiny) doc_id relation before a CPU-bound
    synth→resize→decode mapInPandas chain. The synthetic corpora
    inherit the input's FILE partitioning — one small parquet file =
    one partition — which serializes the whole Python codec chain no
    matter how many cores exist. Spreading the 8-byte ids across
    ``spark.sql.shuffle.partitions`` (the cluster-tuned knob, not a
    literal) costs one counts-sized shuffle and lets every downstream
    narrow stage run at full parallelism; real media payloads arrive
    already spread across many files, so this just mirrors the
    production layout for the synth path.

    The partition count is EXPLICIT (AQE coalesces an unnumbered
    repartition of a 40 KB id relation straight back to one partition
    — it sizes shuffles by bytes, which is exactly wrong for a
    downstream CPU-bound Python codec stage), and the shuffle is
    SKIPPED when the input already carries >= defaultParallelism
    partitions — at 100 TB the id relation arrives in thousands of
    file splits and re-hashing billions of ids would be pure waste;
    the spread only pays for itself when the scan under-parallelizes
    the codec stage."""
    sc = ids.sparkSession.sparkContext
    if ids.rdd.getNumPartitions() >= sc.defaultParallelism:
        return ids
    return ids.repartition(sc.defaultParallelism, F.col("doc_id"))


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: bucket byte sums.

    Replace with PIL/librosa/ffmpeg decode in a real deployment —
    signature and batch shape stay identical.
    """
    if not payload:
        return [0.0] * dim
    return [
        float(sum(payload[i::dim]) % 997) for i in range(dim)
    ]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The real decode path is NOT implemented (no media libs in this
    container); ``fake=True`` substitutes the deterministic fake so
    the distributed plumbing (schema, batching, nullability) is
    exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg; "
                    "run with fake=True for the deterministic stub"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_feature(p if p is not None else b"")
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def byte_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass (no UDF): payload sizes per mime type —
    the cheap first look any media pipeline runs before decoding."""
    return media.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(
            F.sum(F.length("payload")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_bytes"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Arrow-batched image resize (STUB decode: payload passes through,
    target dims computed from metadata with aspect preserved; a real
    deployment swaps the body for PIL thumbnail — batch shape, schema,
    and the metadata arithmetic are the real contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].fillna(max_side).astype("int64")
            h = pdf["height"].fillna(max_side).astype("int64")
            scale = (max_side / w.where(w >= h, h)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],  # stub: no real decode
                    "width": (w * scale).astype("int32"),
                    "height": (h * scale).astype("int32"),
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, duration_ms: int = 5000
) -> DataFrame:
    """Video frame sampling as a flatMap: each media row fans out to
    one row per sampled frame (frame_idx, frame_ts_ms). Decode is
    STUBBED — each frame's payload is a deterministic slice of the
    source payload — but the row-expansion shape (the part that
    matters for partition sizing: output rows = input × frames) is
    real. A production version bounds fan-out with maxRecordsPerBatch
    and repartitions by media_id first."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "payload": []}
            for _, r in pdf.iterrows():
                payload = r["payload"] or b""
                n = max(len(payload), 1)
                for i, ts in enumerate(range(0, duration_ms, every_ms)):
                    lo = (i * 16) % n
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(ts)
                    rows["payload"].append(bytes(payload[lo : lo + 16]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio decode (M53): the container ships no image/video codecs,
# but WAV/RIFF is parseable with the stdlib alone — so the AUDIO
# modality gets a genuine byte-level decoder (stdlib ``wave``), not a
# stub. Payloads are synthesized deterministically from doc_id (no
# media files ship in the test set), which makes the decode
# ORACLE-CHECKABLE: DuckDB replays the synthesis arithmetic in closed
# form and the outputs can only match if the RIFF round trip is
# byte-correct.
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.LongType()),
        T.StructField("is_valid", T.IntegerType()),
    ]
)


def _synth_samples(media_id: int) -> tuple[int, list[int]]:
    """Deterministic 16-bit mono test signal: rate ∈ {8, 12, 16} kHz,
    64–127 frames, sample_i = ((id·131 + i·7919) % 65536) − 32768.
    Pure integer closed form — the DuckDB oracle replays it exactly."""
    rate = 8000 + (media_id % 3) * 4000
    n = 64 + media_id % 64
    samples = [
        ((media_id * 131 + i * 7919) % 65536) - 32768 for i in range(n)
    ]
    return rate, samples


def synth_wav_corpus(docs: DataFrame) -> DataFrame:
    """One REAL RIFF/WAVE payload per document, written with the
    stdlib ``wave`` writer (PCM s16le mono). Arrow-batched; payload
    size is ≤ ~300 bytes per row, so no repartition is needed at any
    corpus size (the byte-stats sizing rule still applies to real
    audio)."""
    import io
    import struct
    import wave as _wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for media_id in pdf["doc_id"]:
                rate, samples = _synth_samples(int(media_id))
                buf = io.BytesIO()
                with _wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(
                        struct.pack(f"<{len(samples)}h", *samples)
                    )
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "audio/wav",
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                }
            )

    return _spread(docs.select("doc_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_wav_features(media: DataFrame) -> DataFrame:
    """REAL audio decode over binary WAV payloads: stdlib RIFF parse
    (``wave``) + PCM sample unpack + RMS — no fake path. Unparseable
    payloads become (is_valid = 0, NULL features) quarantine rows
    instead of failing the batch (the CSV/JSONL corrupt-row contract
    applied to a binary modality).

    rms replays audioop's formula, int(sqrt(Σs²/n)), with Σs² exact
    (integer-valued double < 2⁵³ at any WAV the format can express per
    batch row) so the value is engine-reproducible arithmetic, not a
    library artifact.

    Scale: mapInPandas streams Arrow batches; the decoder is
    per-row-bounded CPU with constant memory — the partition-sizing
    note at the module head is the only tuning knob.
    """
    import io
    import math
    import struct
    import wave as _wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "n_frames",
                "duration_ms", "rms", "is_valid",
            )}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(media_id)
                try:
                    with _wave.open(io.BytesIO(payload or b""), "rb") as w:
                        nch, width = w.getnchannels(), w.getsampwidth()
                        rate, n = w.getframerate(), w.getnframes()
                        if width != 2:
                            raise ValueError("only PCM s16 supported")
                        raw = w.readframes(n)
                    samples = struct.unpack(f"<{n * nch}h", raw)
                    ss = sum(s * s for s in samples)
                    cnt = len(samples)
                    rms = int(math.sqrt(ss / cnt)) if cnt else 0
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(nch)
                    out["n_frames"].append(n)
                    out["duration_ms"].append(n * 1000 // rate)
                    out["rms"].append(rms)
                    out["is_valid"].append(1)
                except Exception:  # noqa: BLE001 — quarantine, not crash
                    for k in ("sample_rate", "n_channels", "n_frames",
                              "duration_ms", "rms"):
                        out[k].append(None)
                    out["is_valid"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image decode (M63): BMP (Windows DIB, 24-bit uncompressed) is
# parseable with the stdlib alone — so the IMAGE modality gets a
# genuine byte-level decoder too (the M53 WAV playbook): payloads are
# REAL BMP files written by a stdlib struct encoder, the decoder
# parses the BITMAPFILEHEADER/BITMAPINFOHEADER for real, un-pads the
# 4-byte-aligned bottom-up rows with numpy, and every feature is
# exact integer arithmetic over the pixel bytes — so the decode is
# ORACLE-CHECKABLE: DuckDB replays the pixel-synthesis formula in
# closed form and the outputs can only match if the BMP round trip
# (header fields, row stride, padding, vertical flip, BGR order) is
# byte-correct. jpeg/png/real video stay behind the documented
# extract_features/resize_images stubs — THOSE need external codecs;
# this tier proves the byte-level plumbing on a codec-free format.
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("mean_luma_milli", T.LongType()),
        T.StructField("is_valid", T.IntegerType()),
    ]
)


def _bmp_dims(media_id: int) -> tuple[int, int]:
    """Deterministic per-image dimensions. Width varies mod 8 so the
    BMP row stride exercises every 4-byte padding case (3·w % 4 ∈
    {0,1,2,3}); height varies independently."""
    return 13 + media_id % 8, 9 + media_id % 5


def _bmp_pixel(media_id: int, r: int, c: int, ch: int) -> int:
    """Stored-order pixel byte (ch 0/1/2 = B/G/R, BMP's order):
    (id·31 + r·13 + c·17 + ch·7) % 256 — pure integer closed form,
    replayed exactly by the DuckDB oracle."""
    return (media_id * 31 + r * 13 + c * 17 + ch * 7) % 256


def _bmp_encode(media_id: int, px: "object") -> bytes:
    """REAL BMP writer (stdlib struct): 54-byte header + bottom-up
    4-byte-aligned BGR rows. ``px`` is an (h, w, 3) uint8 array in
    TOP-DOWN row order."""
    import struct

    import numpy as np

    h, w = px.shape[0], px.shape[1]
    stride = (3 * w + 3) // 4 * 4
    img_size = stride * h
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = px.reshape(h, 3 * w)
    body = rows[::-1].tobytes()  # bottom-up, as plain BMP stores rows
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + body


def synth_bmp_corpus(docs: DataFrame) -> DataFrame:
    """One REAL 24-bit BMP payload per document (stdlib encoder,
    deterministic pixels). Payloads are ≤ ~1 KB each — the byte-stats
    sizing rule applies unchanged to real images."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for media_id in pdf["doc_id"]:
                mid = int(media_id)
                w, h = _bmp_dims(mid)
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((mid * 31 + r * 13 + c * 17 + ch * 7) % 256).astype(
                    np.uint8
                )
                payloads.append(_bmp_encode(mid, px))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "image/bmp",
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                }
            )

    return _spread(docs.select("doc_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def _bmp_parse(payload: bytes) -> "tuple[int, int, object]":
    """REAL BMP parse: validate the file header, read the DIB header
    (24 bpp uncompressed only), un-pad the bottom-up rows, return
    (w, h, top-down (h, w·3) uint8 array of stored BGR bytes)."""
    import struct

    import numpy as np

    magic, _size, _r1, _r2, offset = struct.unpack("<2sIHHI", payload[:14])
    if magic != b"BM":
        raise ValueError("not a BMP")
    (hdr, w, h, _planes, bpp, comp, _imgsz, _xr, _yr, _nc, _ic) = struct.unpack(
        "<IiiHHIIiiII", payload[14:54]
    )
    if hdr != 40 or bpp != 24 or comp != 0 or w <= 0 or h <= 0:
        raise ValueError("unsupported BMP variant")
    stride = (3 * w + 3) // 4 * 4
    body = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = body.reshape(h, stride)[:, : 3 * w]
    return w, h, rows[::-1]  # back to top-down


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """REAL image decode over binary BMP payloads — header parse, row
    un-padding, vertical flip — with exact-integer features: total
    pixel-byte checksum, per-stored-channel (B/G/R) sums, and the
    integer mean luma in milli-units, (299·R + 587·G + 114·B) DIV
    (w·h) over channel SUMS (so one integer division per image).
    Unparseable payloads quarantine as (is_valid = 0, NULL features)
    — the WAV corrupt-row contract applied to images."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "n_bytes", "checksum",
                "b_sum", "g_sum", "r_sum", "mean_luma_milli", "is_valid",
            )}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(media_id)
                try:
                    w, h, rows = _bmp_parse(payload or b"")
                    # channel sums via strided uint8 slices (no int64
                    # copy of the pixel block; dtype widens in the
                    # reduction only)
                    bs = int(rows[:, 0::3].sum(dtype=np.int64))
                    gs = int(rows[:, 1::3].sum(dtype=np.int64))
                    rs = int(rows[:, 2::3].sum(dtype=np.int64))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_bytes"].append(len(payload))
                    out["checksum"].append(bs + gs + rs)
                    out["b_sum"].append(bs)
                    out["g_sum"].append(gs)
                    out["r_sum"].append(rs)
                    out["mean_luma_milli"].append(
                        (299 * rs + 587 * gs + 114 * bs) // (w * h)
                    )
                    out["is_valid"].append(1)
                except Exception:  # noqa: BLE001 — quarantine, not crash
                    for k in ("width", "height", "n_bytes", "checksum",
                              "b_sum", "g_sum", "r_sum", "mean_luma_milli"):
                        out[k].append(None)
                    out["is_valid"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def resize_bmp_nearest(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL image resize: decode the BMP, nearest-neighbor downsample
    by integer ``factor`` (dst(r, c) = src(factor·r, factor·c) —
    numpy striding, no interpolation fp), re-ENCODE as a valid BMP.
    Output dims are ceil(dim/factor). The round trip is proven by
    decoding the output again (bmp_resize_roundtrip in the registry):
    its features replay in the oracle only if decode → stride →
    re-encode are all byte-correct."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "width": [], "height": []}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rows = _bmp_parse(payload or b"")
                px = rows.reshape(h, w, 3)[::factor, ::factor]
                out["media_id"].append(media_id)
                out["payload"].append(_bmp_encode(int(media_id), px))
                out["width"].append(px.shape[1])
                out["height"].append(px.shape[0])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# REAL video decode (M64): uncompressed AVI is a RIFF container (the
# WAV sibling) carrying raw DIB frames (the BMP sibling) — parseable
# with the stdlib alone, so the VIDEO modality completes the
# real-decode tier: synth writes a spec-valid RIFF/AVI (hdrl with
# avih + strl/strh/strf, movi with one '00db' chunk per frame), the
# decoder walks the chunk tree for real (fourcc checks, list
# descent, word alignment, strf BITMAPINFOHEADER, bottom-up stride
# un-padding per frame), and the features are positional-weighted
# integer sums so a frame-ORDER error breaks the oracle hash, not
# just a pixel error. Codec'd video (h264 etc.) stays behind the
# documented sample_frames stub.
# ---------------------------------------------------------------------------

VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("us_per_frame", T.LongType()),
        T.StructField("checksum_possum", T.LongType()),
        T.StructField("luma_milli_sum", T.LongType()),
        T.StructField("is_valid", T.IntegerType()),
    ]
)

AVI_US_PER_FRAME = 100000  # 10 fps, pinned


def _avi_n_frames(media_id: int) -> int:
    return 3 + media_id % 4


def _avi_pixel(media_id: int, f: int, r: int, c: int, ch: int) -> int:
    """Stored-order frame pixel byte (ch 0/1/2 = B/G/R):
    (id·31 + f·101 + r·13 + c·17 + ch·7) % 256 — the _bmp_pixel
    formula extended with the frame index."""
    return (media_id * 31 + f * 101 + r * 13 + c * 17 + ch * 7) % 256


def _dib_rows(media_id: int, f: int, w: int, h: int) -> bytes:
    """One frame's DIB bits: bottom-up 4-byte-aligned BGR rows."""
    import numpy as np

    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    ch = np.arange(3)[None, None, :]
    px = ((media_id * 31 + f * 101 + r * 13 + c * 17 + ch * 7) % 256).astype(
        np.uint8
    )
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = px.reshape(h, 3 * w)
    return rows[::-1].tobytes()


def synth_avi_corpus(docs: DataFrame) -> DataFrame:
    """One REAL uncompressed RIFF/AVI payload per document (stdlib
    struct writer): 3–6 DIB frames at the per-id BMP dimensions,
    10 fps. Payloads are ≤ ~5 KB each."""
    import struct

    def _chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def _list(listtype: bytes, body: bytes) -> bytes:
        return _chunk(b"LIST", listtype + body)

    def _encode(media_id: int) -> bytes:
        w, h = _bmp_dims(media_id)
        n = _avi_n_frames(media_id)
        stride = (3 * w + 3) // 4 * 4
        frame_sz = stride * h
        avih = struct.pack(
            "<IIIIIIIIII4I",
            AVI_US_PER_FRAME, frame_sz * 10, 0, 0, n, 0, 1, frame_sz,
            w, h, 0, 0, 0, 0,
        )
        strh = struct.pack(
            "<4s4sIHHIIIIIIIi4H",
            b"vids", b"DIB ", 0, 0, 0, 0, 1, 10, 0, n, frame_sz, 0, 0,
            0, 0, w, h,
        )
        strf = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_sz, 2835, 2835, 0, 0
        )
        hdrl = _list(
            b"hdrl",
            _chunk(b"avih", avih)
            + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
        )
        movi = _list(
            b"movi",
            b"".join(
                _chunk(b"00db", _dib_rows(media_id, f, w, h))
                for f in range(n)
            ),
        )
        body = b"AVI " + hdrl + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for media_id in pdf["doc_id"]:
                mid = int(media_id)
                w, h = _bmp_dims(mid)
                payloads.append(_encode(mid))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "video/avi",
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                }
            )

    return _spread(docs.select("doc_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def _avi_parse(payload: bytes) -> "tuple[int, int, int, list]":
    """REAL RIFF/AVI walk: validate RIFF + 'AVI ', descend hdrl for
    avih (frame period) and strf (dims/bpp), collect the movi
    '00db' DIB frames in order (word-aligned chunk iteration).
    Returns (w, h, us_per_frame, [top-down (h, 3w) uint8 arrays])."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    w = h = usf = None
    frames: list = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, usf
        pos = lo
        while pos + 8 <= hi:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body_lo = pos + 8
            if fourcc == b"LIST":
                walk(body_lo + 4, body_lo + size)
            elif fourcc == b"avih":
                (usf,) = struct.unpack("<I", payload[body_lo : body_lo + 4])
            elif fourcc == b"strf":
                (hdr, bw, bh, _pl, bpp, comp) = struct.unpack(
                    "<IiiHHI", payload[body_lo : body_lo + 20]
                )
                if hdr != 40 or bpp != 24 or comp != 0:
                    raise ValueError("unsupported AVI stream format")
                w, h = bw, bh
            elif fourcc == b"00db":
                frames.append(payload[body_lo : body_lo + size])
            pos = body_lo + size + (size % 2)  # word alignment

    walk(12, 8 + struct.unpack("<I", payload[4:8])[0])
    if w is None or h is None or w <= 0 or h <= 0 or usf is None:
        raise ValueError("missing AVI headers")
    stride = (3 * w + 3) // 4 * 4
    out = []
    for raw in frames:
        body = np.frombuffer(raw, dtype=np.uint8, count=stride * h)
        out.append(body.reshape(h, stride)[:, : 3 * w][::-1])
    return w, h, usf, out


def decode_avi_features(media: DataFrame) -> DataFrame:
    """REAL video decode over binary AVI payloads. Per-media integer
    features: checksum_possum = Σ_f (f+1)·(pixel-byte sum of frame f)
    — POSITIONALLY weighted, so swapping two frames breaks the value
    — and luma_milli_sum = Σ_f (299·R_f + 587·G_f + 114·B_f) DIV
    (w·h). Unparseable payloads quarantine as is_valid = 0 (the
    WAV/BMP contract)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "n_frames", "width", "height", "us_per_frame",
                "checksum_possum", "luma_milli_sum", "is_valid",
            )}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(media_id)
                try:
                    w, h, usf, frames = _avi_parse(bytes(payload or b""))
                    possum = luma = 0
                    for f, rows in enumerate(frames):
                        bs = int(rows[:, 0::3].sum(dtype=np.int64))
                        gs = int(rows[:, 1::3].sum(dtype=np.int64))
                        rs = int(rows[:, 2::3].sum(dtype=np.int64))
                        possum += (f + 1) * (bs + gs + rs)
                        luma += (299 * rs + 587 * gs + 114 * bs) // (w * h)
                    out["n_frames"].append(len(frames))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["us_per_frame"].append(usf)
                    out["checksum_possum"].append(possum)
                    out["luma_milli_sum"].append(luma)
                    out["is_valid"].append(1)
                except Exception:  # noqa: BLE001 — quarantine, not crash
                    for k in ("n_frames", "width", "height", "us_per_frame",
                              "checksum_possum", "luma_milli_sum"):
                        out[k].append(None)
                    out["is_valid"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=VIDEO_FEATURE_SCHEMA)


def sample_avi_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """REAL frame sampling over decoded AVI payloads: keep frames
    f ≡ 0 (mod every), re-weight by SAMPLE position (s+1) so the
    sampled ORDER is certified, emit the same feature shape.
    n_frames reports the SAMPLED count; us_per_frame is scaled by
    ``every`` (the effective period of the sampled stream)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "n_frames", "width", "height", "us_per_frame",
                "checksum_possum", "luma_milli_sum", "is_valid",
            )}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(media_id)
                try:
                    w, h, usf, frames = _avi_parse(bytes(payload or b""))
                    possum = luma = n = 0
                    for s, f in enumerate(range(0, len(frames), every)):
                        rows = frames[f]
                        bs = int(rows[:, 0::3].sum(dtype=np.int64))
                        gs = int(rows[:, 1::3].sum(dtype=np.int64))
                        rs = int(rows[:, 2::3].sum(dtype=np.int64))
                        possum += (s + 1) * (bs + gs + rs)
                        luma += (299 * rs + 587 * gs + 114 * bs) // (w * h)
                        n += 1
                    out["n_frames"].append(n)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["us_per_frame"].append(usf * every)
                    out["checksum_possum"].append(possum)
                    out["luma_milli_sum"].append(luma)
                    out["is_valid"].append(1)
                except Exception:  # noqa: BLE001
                    for k in ("n_frames", "width", "height", "us_per_frame",
                              "checksum_possum", "luma_milli_sum"):
                        out[k].append(None)
                    out["is_valid"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=VIDEO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL PNG decode (M65): PNG is fully parseable with the stdlib —
# ``zlib`` inflates IDAT and CRC-checks every chunk; the scanline
# filters (None/Sub/Up/Average/Paeth, RFC 2083 §6) are pure integer
# arithmetic. The synth encoder CYCLES the filter type per row
# (type = row % 5), so a decoder that mis-inverts ANY of the five
# filters produces wrong pixel bytes and the synthesis-replay oracle
# hash fails — the un-filtering is certified, not just the chunk
# walk. This graduates png from the codec-DEPENDENT stub tier
# (module head) to the fourth REAL decode (WAV M53, BMP M63,
# AVI M64, PNG M65). jpeg/h264 stay stubbed (genuine codec math).
#
# Scale: same contract as the BMP tier — Arrow-batched mapInPandas,
# per-row-bounded CPU, payloads ≤ ~1 KB; no shuffle anywhere in the
# decode path.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    """One spec-valid PNG chunk: length + type + body + CRC32."""
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left.
    Reference form, pinned exhaustively by tests/test_m65.py; the
    decode hot loop in _png_parse inlines the same arithmetic (a
    per-pixel function call there was the profile's top cost)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_row(ftype: int, cur: "object", prev: "object") -> bytes:
    """Apply scanline filter ``ftype`` to row ``cur`` (uint8, len 3w)
    given the prior UNFILTERED row ``prev`` (zeros for row 0). bpp=3.
    All arithmetic is mod 256 (uint8 wraparound), per the spec."""
    import numpy as np

    n = len(cur)
    left = np.zeros(n, dtype=np.int64)
    left[3:] = cur[:-3]
    upleft = np.zeros(n, dtype=np.int64)
    upleft[3:] = prev[:-3]
    up = prev.astype(np.int64)
    c64 = cur.astype(np.int64)
    if ftype == 0:
        out = c64
    elif ftype == 1:
        out = c64 - left
    elif ftype == 2:
        out = c64 - up
    elif ftype == 3:
        out = c64 - (left + up) // 2
    else:  # Paeth — vectorized predictor selection
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        out = c64 - pred
    return (out % 256).astype(np.uint8).tobytes()


def _png_encode(px: "object") -> bytes:
    """REAL PNG writer (stdlib struct + zlib): 8-bit RGB (color type
    2), non-interlaced, filter type CYCLING row % 5 so every filter
    is exercised in every image (h >= 5 always holds for the synth
    dims). IDAT is split into two chunks when the deflate stream
    exceeds 64 bytes, so the decoder's multi-IDAT concatenation is
    exercised for real too. ``px`` is an (h, w, 3) uint8 array,
    top-down RGB."""
    import struct
    import zlib

    import numpy as np

    h, w = px.shape[0], px.shape[1]
    rows = px.reshape(h, 3 * w)
    filtered = bytearray()
    prev = np.zeros(3 * w, dtype=np.uint8)
    for r in range(h):
        ftype = r % 5
        filtered.append(ftype)
        filtered += _png_filter_row(ftype, rows[r], prev)
        prev = rows[r]
    raw = zlib.compress(bytes(filtered), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    mid = len(raw) // 2 if len(raw) > 64 else len(raw)
    idats = _png_chunk(b"IDAT", raw[:mid])
    if mid < len(raw):
        idats += _png_chunk(b"IDAT", raw[mid:])
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + idats
        + _png_chunk(b"IEND", b"")
    )


def _png_pixel(media_id: int, r: int, c: int, ch: int) -> int:
    """Stored-order pixel byte (ch 0/1/2 = R/G/B, PNG's order):
    (id·31 + r·13 + c·17 + ch·7) % 256 — the _bmp_pixel closed form
    with PNG's channel order, replayed exactly by the oracle."""
    return (media_id * 31 + r * 13 + c * 17 + ch * 7) % 256


def synth_png_corpus(docs: DataFrame) -> DataFrame:
    """One REAL 8-bit RGB PNG payload per document (stdlib zlib
    encoder, deterministic pixels, per-row filter cycling). Dims are
    the _bmp_dims grid, so one closed-form oracle family covers both
    image formats."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for media_id in pdf["doc_id"]:
                mid = int(media_id)
                w, h = _bmp_dims(mid)
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((mid * 31 + r * 13 + c * 17 + ch * 7) % 256).astype(
                    np.uint8
                )
                payloads.append(_png_encode(px))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "image/png",
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                }
            )

    return _spread(docs.select("doc_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def _png_parse(payload: bytes) -> "tuple[int, int, object, int]":
    """REAL PNG parse: signature check, chunk walk with CRC32
    verification on EVERY chunk, IHDR validation (8-bit RGB color
    type 2, non-interlaced only), multi-IDAT concatenation, zlib
    inflate, and scanline UN-filtering (all five filter types).
    Returns (w, h, top-down (h, 3w) uint8 RGB array, raw_len) where
    raw_len is the decompressed filtered-stream length h·(1+3w) —
    the closed-form size the oracle replays (the COMPRESSED length
    depends on the deflate implementation and is deliberately not a
    feature)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    w = h = None
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError("bad chunk CRC")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG variant")
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None or h is None or w <= 0 or h <= 0 or not idat:
        raise ValueError("missing PNG headers")
    raw = zlib.decompress(bytes(idat))
    rb = 3 * w
    if len(raw) != h * (1 + rb):
        raise ValueError("wrong scanline stream length")
    # Un-filtering is inherently row-sequential (filters 2-4 read the
    # just-RECONSTRUCTED prior row) and, for Sub/Average/Paeth, left-
    # sequential within the row — so it runs as plain-Python byte
    # loops on `bytes`/lists (int indexing, no numpy scalar boxing:
    # ~5x faster than per-pixel ndarray access at these row widths,
    # measured in the bench budget gate). The feature math downstream
    # stays vectorized on the assembled (h, 3w) array.
    rows = []
    prev = [0] * rb
    for r in range(h):
        base = r * (1 + rb)
        ftype = raw[base]
        line = raw[base + 1 : base + 1 + rb]
        if ftype == 0:
            cur = list(line)
        elif ftype == 2:
            cur = [(line[i] + prev[i]) & 255 for i in range(rb)]
        elif ftype == 1:
            cur = [0] * rb
            for i in range(rb):
                a = cur[i - 3] if i >= 3 else 0
                cur[i] = (line[i] + a) & 255
        elif ftype == 3:
            cur = [0] * rb
            for i in range(rb):
                a = cur[i - 3] if i >= 3 else 0
                cur[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif ftype == 4:
            cur = [0] * rb
            for i in range(rb):
                a = cur[i - 3] if i >= 3 else 0
                b = prev[i]
                cc = prev[i - 3] if i >= 3 else 0
                p = a + b - cc
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - cc if p >= cc else cc - p
                pred = (
                    a
                    if pa <= pb and pa <= pc
                    else (b if pb <= pc else cc)
                )
                cur[i] = (line[i] + pred) & 255
        else:
            raise ValueError("bad filter type")
        rows.append(cur)
        prev = cur
    out = np.array(rows, dtype=np.uint8).reshape(h, rb)
    return w, h, out, len(raw)


def decode_png_features(media: DataFrame) -> DataFrame:
    """REAL PNG decode over binary payloads — chunk walk, CRC check,
    inflate, un-filter — with the BMP tier's exact-integer feature
    shape (IMAGE_FEATURE_SCHEMA): per-channel sums, total checksum,
    integer mean luma. n_bytes is the DECOMPRESSED filtered-stream
    length h·(1+3w) (deterministic; the deflate size is not).
    Unparseable payloads quarantine as is_valid = 0."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "n_bytes", "checksum",
                "b_sum", "g_sum", "r_sum", "mean_luma_milli", "is_valid",
            )}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(media_id)
                try:
                    w, h, rows, raw_len = _png_parse(bytes(payload or b""))
                    rs = int(rows[:, 0::3].sum(dtype=np.int64))
                    gs = int(rows[:, 1::3].sum(dtype=np.int64))
                    bs = int(rows[:, 2::3].sum(dtype=np.int64))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_bytes"].append(raw_len)
                    out["checksum"].append(bs + gs + rs)
                    out["b_sum"].append(bs)
                    out["g_sum"].append(gs)
                    out["r_sum"].append(rs)
                    out["mean_luma_milli"].append(
                        (299 * rs + 587 * gs + 114 * bs) // (w * h)
                    )
                    out["is_valid"].append(1)
                except Exception:  # noqa: BLE001 — quarantine, not crash
                    for k in ("width", "height", "n_bytes", "checksum",
                              "b_sum", "g_sum", "r_sum", "mean_luma_milli"):
                        out[k].append(None)
                    out["is_valid"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def resize_png_nearest(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL PNG resize round trip: decode (inflate + un-filter),
    nearest-neighbor downsample by integer ``factor`` (numpy
    striding), RE-ENCODE as a valid PNG (re-filter + deflate). The
    registry decodes the output again, so the hash certifies encode
    AND decode of both filter pipelines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "width": [], "height": []}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rows, _raw = _png_parse(bytes(payload or b""))
                px = rows.reshape(h, w, 3)[::factor, ::factor]
                out["media_id"].append(media_id)
                out["payload"].append(_png_encode(px))
                out["width"].append(px.shape[1])
                out["height"].append(px.shape[0])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)
