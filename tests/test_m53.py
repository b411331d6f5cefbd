"""M53 — real WAV synth/decode round trip."""

from __future__ import annotations

import io
import math
import struct
import wave

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import multimodal


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_wav_round_trip_matches_closed_form(spark):
    ids = [0, 1, 2, 7, 63, 64, 129]
    media = multimodal.synth_wav_corpus(_docs(spark, ids))
    out = {r.media_id: r for r in
           multimodal.decode_wav_features(media).collect()}
    for mid in ids:
        rate, samples = multimodal._synth_samples(mid)
        r = out[mid]
        assert r.is_valid == 1
        assert r.sample_rate == rate and r.n_channels == 1
        assert r.n_frames == len(samples)
        assert r.duration_ms == len(samples) * 1000 // rate
        ss = sum(s * s for s in samples)
        assert r.rms == int(math.sqrt(ss / len(samples)))


def test_wav_decoder_is_a_real_parser(spark):
    """Feed a WAV written INDEPENDENTLY of the synth path (stereo,
    different rate) — a fake decoder keyed on doc_id arithmetic would
    get every field wrong."""
    buf = io.BytesIO()
    samples = [1000, -1000, 2000, -2000, 3000, -3000]  # 3 stereo frames
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(struct.pack("<6h", *samples))
    media = spark.createDataFrame(
        [(99, buf.getvalue(), "audio/wav", None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.decode_wav_features(media).collect()[0]
    assert (r.sample_rate, r.n_channels, r.n_frames) == (44100, 2, 3)
    assert r.duration_ms == 3 * 1000 // 44100
    ss = sum(s * s for s in samples)
    assert r.rms == int(math.sqrt(ss / 6))


def test_wav_decoder_quarantines_garbage(spark):
    media = spark.createDataFrame(
        [
            (1, b"definitely not RIFF", "audio/wav", None, None),
            (2, None, "audio/wav", None, None),
            (3, b"", "audio/wav", None, None),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in
            multimodal.decode_wav_features(media).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r.is_valid == 0 and r.rms is None and r.n_frames is None
