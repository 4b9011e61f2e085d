"""Audio modality: real RIFF/WAV PCM16 codec + feature kernels."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fs2_osm_spark.operators.audio import clip_features
from fs2_osm_spark.synth.audio import (
    N_SAMPLES,
    SR,
    clip_params,
    decode_wav,
    encode_wav,
    synth_samples,
)


def test_wav_round_trip_bit_exact():
    x = synth_samples(7)
    dec, sr = decode_wav(encode_wav(x))
    assert sr == SR and len(dec) == N_SAMPLES
    # PCM16 quantization is the only loss: within 1 LSB of the original
    assert np.max(np.abs(dec - np.clip(x, -0.999, 0.999))) <= 1.0 / 32767.0
    # and a decode->encode->decode cycle is bit-stable
    again, _ = decode_wav(encode_wav(dec))
    assert np.array_equal(np.round(again * 32767.0), np.round(dec * 32767.0))


def test_wav_chunk_walker_skips_foreign_chunks():
    """A foreign WAV may carry LIST/fact chunks before data — the decoder
    must walk the chunk list, not assume a fixed 44-byte header."""
    x = synth_samples(3)
    raw = encode_wav(x)
    fmt_chunk = raw[12:36]
    data_chunk = raw[36:]
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOa" + b"\x00"  # odd size -> pad
    body = fmt_chunk + junk + data_chunk
    crafted = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    dec, sr = decode_wav(crafted)
    ref, _ = decode_wav(raw)
    assert sr == SR and np.array_equal(dec, ref)


def test_wav_rejects_non_wav_and_stereo():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav at all")
    raw = bytearray(encode_wav(synth_samples(1)))
    raw[22] = 2  # n_channels = 2
    with pytest.raises(ValueError, match="PCM16 mono"):
        decode_wav(bytes(raw))


def test_dominant_frequency_recovers_synthesis_tone():
    """The rFFT dominant bin must land on the id-derived fundamental
    (within one bin = SR/N = 2 Hz) for every tone class."""
    for audio_id in range(20):
        f0, _, _ = clip_params(audio_id)
        _, _, dom, _, _ = clip_features(encode_wav(synth_samples(audio_id)))
        assert abs(dom - f0) <= SR / N_SAMPLES, (audio_id, f0, dom)


def test_audio_fixture_anti_drift():
    """Committed fixture features == live recomputation on a sample."""
    import pyarrow.parquet as pq

    from fs2_osm_spark.synth.staging import ensure_audio_fixture
    from fs2_osm_spark.synth.audio import generate_audio_batch

    tbl = pq.read_table(ensure_audio_fixture()).to_pandas()
    sample = tbl.iloc[::37]
    ids = [int(a.split("_")[1]) for a in sample["audio_id"]]
    live = generate_audio_batch(np.asarray(ids, np.int64))
    assert [bytes(b) for b in live["bytes"]] == [
        bytes(b) for b in sample["bytes"]
    ]
    from fs2_osm_spark.operators.audio import spectral_fingerprint
    from fs2_osm_spark.synth.audio import decode_wav

    for k, r in enumerate(sample.itertuples()):
        rms, zcr, dom, clip_ratio, dur = clip_features(r.bytes)
        assert (rms, zcr, dom, clip_ratio, dur) == (
            r.rms, r.zcr, r.dom_freq_hz, r.clip_ratio, r.duration_s
        ), r.audio_id
        assert spectral_fingerprint(*decode_wav(bytes(r.bytes))) == (
            r.fingerprint
        ), r.audio_id


def test_audio_features_distributed_matches_fixture(spark):
    """The distributed mapInPandas path reproduces the recorded features
    for the whole corpus (the same check the driver oracle runs)."""
    import pyarrow.parquet as pq

    from fs2_osm_spark.operators.audio import audio_features
    from fs2_osm_spark.synth.audio import audio_table
    from fs2_osm_spark.synth.staging import ensure_audio_fixture

    fx = (
        pq.read_table(
            ensure_audio_fixture(),
            columns=["audio_id", "rms", "dom_freq_hz"],
        )
        .to_pandas()
        .set_index("audio_id")
    )
    got = audio_features(audio_table(spark, 100)).collect()
    assert len(got) == 100
    for r in got:
        assert r.rms == fx.loc[r.audio_id, "rms"]
        assert r.dom_freq_hz == fx.loc[r.audio_id, "dom_freq_hz"]


def test_avi_container_structure_and_selective_decode():
    """The AVI writer emits a genuine RIFF/AVI chunk tree (hdrl with avih,
    movi with word-aligned 00dc chunks, idx1), and the index-seek decode
    reproduces the pre-encode pixels exactly for any frame."""
    import numpy as np

    from fs2_osm_spark.synth.video import (
        decode_avi_frame,
        make_video,
        read_avi_index,
    )

    raw = make_video(11, n_frames=9, w=10, h=7)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
    assert b"avih" in raw and b"00dc" in raw and b"idx1" in raw
    _, idx = read_avi_index(raw)
    assert len(idx) == 9
    for k in (0, 4, 8):
        off, size = idx[k]
        img = decode_avi_frame(raw, off, size)
        rng = np.random.default_rng(11 * 1000 + k)
        assert np.array_equal(
            img, rng.integers(0, 256, size=(7, 10, 3), dtype=np.uint8)
        )


def test_avi_sampler_rejects_foreign_codecs(spark):
    import pandas as pd
    import pytest as _pytest

    from fs2_osm_spark.operators.multimodal import sample_frames_indexed

    media = spark.createDataFrame(
        pd.DataFrame(
            [("x", b"RIFF\x00\x00\x00\x00AVI ", "h264")],
            columns=["media_id", "bytes", "fmt"],
        )
    )
    with _pytest.raises(Exception, match="h264"):
        sample_frames_indexed(media).collect()


def test_spectral_fingerprint_collides_within_tone_class():
    """Clips sharing tone structure must collide under different noise
    DRAWS (id 140: same params as id 0, different rng stream) and
    different noise AMPLITUDE (id 20: n_amp 0.08 vs 0.02 — within a tone
    class id%5, and hence the harmonic amplitude, is fixed because 5
    divides 20); clips with different fundamentals must not collide."""
    from fs2_osm_spark.operators.audio import spectral_fingerprint
    from fs2_osm_spark.synth.audio import SR, clip_params, synth_samples

    assert clip_params(0) == clip_params(140)          # only the rng differs
    assert clip_params(20)[2] != clip_params(0)[2]     # noise amp differs
    a = spectral_fingerprint(synth_samples(0), SR)
    assert a == spectral_fingerprint(synth_samples(140), SR)
    assert a == spectral_fingerprint(synth_samples(20), SR)
    # id 1 -> f0 = 250 Hz: ADJACENT tone class must already separate at
    # the 62.5 Hz band resolution; id 10 (700 Hz) is far away
    assert a != spectral_fingerprint(synth_samples(1), SR)
    assert a != spectral_fingerprint(synth_samples(10), SR)
