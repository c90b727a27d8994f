"""WAV audio: pure-stdlib encode/decode + Arrow-batched feature extraction.

The audio analog of the PNG path (multimodal/png.py): no external codec is
available in this runtime, but WAV/PCM is stdlib territory (`wave`), so the
audio decode is REAL — RIFF container parse, 16-bit mono PCM frames to an
int16 numpy vector — and the Spark-side plumbing (binary column in, typed
feature rows out of mapInPandas) is identical to what a compressed-codec
deployment would use; swapping in an mp3/ogg decoder changes one function.

Compressed formats raise NotImplementedError honestly (same policy as
non-PNG images, multimodal/ops.py:54-58).
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_ms double, "
    "rms double, peak int"
)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → WAV bytes (RIFF/PCM, stdlib wave writer)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 sample vector). 16-bit mono PCM only;
    anything else needs a codec this runtime doesn't ship."""
    with wave.open(io.BytesIO(content), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1 or w.getcomptype() != "NONE":
            raise NotImplementedError(
                "only 16-bit mono PCM WAV decodes in this runtime; "
                "inject a codec for compressed audio"
            )
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    return sr, np.frombuffer(raw, dtype="<i2")


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per clip: rate, length, duration, RMS, peak.

    RMS accumulates integer squares in float64 (exact until ~2^53), so the
    value is a correctly-rounded function of the samples — reproducible by
    any engine that can enumerate them (the basis of the SQL oracle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                sr, samples = decode_wav(bytes(content))
                s64 = samples.astype(np.float64)
                n = len(samples)
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": sr,
                        "n_samples": n,
                        "duration_ms": n / sr * 1000 if sr else 0.0,
                        "rms": float(np.sqrt(np.sum(s64 * s64) / n)) if n else 0.0,
                        "peak": int(np.abs(samples.astype(np.int32)).max()) if n else 0,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_samples",
                    "duration_ms",
                    "rms",
                    "peak",
                ],
            )

    return media.select("media_id", "content").mapInPandas(run, AUDIO_FEATURES_SCHEMA)
