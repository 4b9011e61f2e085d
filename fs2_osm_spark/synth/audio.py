"""Deterministic synthetic audio corpus — real RIFF/WAV PCM16 bytes.

The multimodal brief treats audio as an opaque binary column with typed
metadata. Unlike image/video codecs, PCM WAV needs no external library:
the RIFF container and 16-bit samples are pure byte layout, so the whole
decode -> feature path runs for real in this sandbox (numpy only).

Every clip is a pure function of its id: a fundamental tone (id-dependent
frequency) + one harmonic + deterministic per-id noise, PCM16 mono at
SR Hz. The corpus is fixture-staged (synth/staging.py) the same way the
image corpus is, giving DuckDB oracles access to recorded ground truth.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

SR = 8_000
N_SAMPLES = 4_000  # 0.5 s


def clip_params(audio_id: int) -> tuple[float, float, float]:
    """(fundamental Hz, harmonic amplitude, noise amplitude) per id."""
    f0 = 200.0 + (audio_id % 20) * 50.0  # 200..1150 Hz, below Nyquist
    return f0, 0.25 + (audio_id % 5) * 0.05, 0.02 + (audio_id % 7) * 0.01


def synth_samples(audio_id: int) -> np.ndarray:
    """Deterministic float waveform in [-1, 1)."""
    f0, h_amp, n_amp = clip_params(audio_id)
    t = np.arange(N_SAMPLES, dtype=np.float64) / SR
    rng = np.random.default_rng(audio_id)
    wave = (
        0.6 * np.sin(2 * np.pi * f0 * t)
        + h_amp * np.sin(2 * np.pi * 2 * f0 * t)
        + n_amp * rng.standard_normal(N_SAMPLES)
    )
    return np.clip(wave, -0.999, 0.999)


def encode_wav(samples: np.ndarray, sr: int = SR) -> bytes:
    """Float [-1,1) -> standard RIFF/WAVE PCM16 mono bytes."""
    pcm = np.round(samples * 32767.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16
    )
    data = b"data" + struct.pack("<I", len(pcm))
    return hdr + fmt + data + pcm


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono bytes -> (float64 samples in [-1,1], sr).
    Walks the chunk list properly (a foreign file may carry LIST/fact
    chunks before data)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, n_ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or n_ch != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0, sr


def generate_audio_batch(ids: np.ndarray) -> pd.DataFrame:
    rows = []
    for i in np.asarray(ids, np.int64).tolist():
        wav = encode_wav(synth_samples(i))
        rows.append((f"aud_{i:08d}", wav, SR, N_SAMPLES))
    return pd.DataFrame(rows, columns=["audio_id", "bytes", "sr", "n_samples"])


def audio_table(spark, n_clips: int):
    """Distributed synthesis: one WAV per row, bytes stay in Arrow batches."""
    from collections.abc import Iterator

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("audio_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("sr", T.IntegerType(), False),
            T.StructField("n_samples", T.IntegerType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield generate_audio_batch(pdf["id"].to_numpy(np.int64))

    return spark.range(0, n_clips).mapInPandas(fn, schema)
