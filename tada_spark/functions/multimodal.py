"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Decode status by modality: AUDIO is REAL for PCM WAV (wav_audio_decoder,
stdlib wave + numpy — no external libs); IMAGE decode is wired for PIL
(pil_image_decoder) but the container has no Pillow, so the default
stays the clearly-marked deterministic stub; compressed audio/video
need ffmpeg/torchaudio and stay stubbed. Everything Spark-side is real
and tested either way: schemas, Arrow batch shapes, mapInPandas
partition flow, metadata propagation. The decoder parameter is the ONLY
swap point, pinned by the swap-contract tests (schema + plan shape +
drop policy identical across decoders).

Design for 100 TB of media:
  * binary payloads stay columnar (parquet BINARY); metadata (width,
    codec, duration) travels as sibling typed columns so filters prune
    BEFORE any decode.
  * decode/feature-extract runs in mapInPandas — Arrow batches, one
    Python worker per core, no per-row pickling.
  * never collect payloads to the driver.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema for a decoded-image feature batch.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB — deterministic fake decoder.

    A real deployment replaces this with PIL/turbojpeg. The fake derives
    (width, height, mean_luma) from the payload bytes so tests are
    deterministic and the full distributed pipeline is exercised.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    w = 16 + payload[0] % 64
    h = 16 + (payload[-1] if len(payload) > 1 else payload[0]) % 64
    luma = (sum(payload[:64]) / min(len(payload), 64)) / 255.0
    return w, h, luma


def image_features(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload", decoder=None
) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    Input: df[id_col: long, payload_col: binary, ...]. Output:
    IMAGE_FEATURES_SCHEMA. Rows with undecodable payloads are dropped
    (null-skipping, matching the engine's null discipline).

    ``decoder(payload) -> (width, height, mean_luma)`` is the ONLY swap
    point between the container stub and a real PIL/turbojpeg decode —
    everything else (schema, Arrow batching, partitioning, error-drop
    policy) is the production pipeline; the contract test pins this.
    """
    decode = decoder or _decode_image_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_bytes": [], "mean_luma": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    n_bytes = len(payload)  # None payload ⇒ undecodable
                    w, h, luma = decode(payload)
                except Exception:
                    continue
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(n_bytes)
                out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, *, every_n: int = 30, id_col: str = "media_id") -> DataFrame:
    """Video frame-sampling *plan*: explode frame indices from metadata
    (n_frames column) without decoding — decode happens downstream on
    the sampled (media_id, frame_idx) pairs only. This is the pruning
    step that makes 100 TB video tractable."""
    # n_frames == 0 (corrupt/empty media) ⇒ no frames: sequence(0, -1, +30)
    # would raise 'Illegal sequence boundaries'; explode of NULL drops the row
    idxs = F.when(
        F.col("n_frames") >= 1,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    )
    return df.select(id_col, F.explode(idxs).alias("frame_idx"))


def _decode_audio_stub(payload: bytes) -> tuple[int, float, float]:
    """STUB — deterministic fake audio decoder (real: ffmpeg/torchaudio).

    Derives (sample_rate, duration_s, rms) from the payload bytes so the
    distributed pipeline is exercised end-to-end and test-checkable.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")

    # half-up rounding (SQL ROUND semantics; python round() is half-even)
    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    sample_rate = 8000 + (payload[0] % 3) * 4000
    duration_s = r6(len(payload) / sample_rate)
    head = payload[:64]
    rms = r6((sum((b / 255.0) ** 2 for b in head) / len(head)) ** 0.5)
    return sample_rate, duration_s, rms


def wav_audio_decoder(payload: bytes) -> tuple[int, float, float]:
    """REAL audio decoder for PCM WAV — stdlib ``wave`` + numpy, no
    external libraries. Pass as ``audio_features(..., decoder=
    wav_audio_decoder)`` when payloads are RIFF/WAV; compressed formats
    (mp3/ogg/flac) still need ffmpeg/torchaudio and keep the stub in
    this container. Returns (sample_rate, duration_s, rms) with the same
    half-up 6-dp rounding as the stub so either decoder satisfies the
    swap contract."""
    import io
    import wave

    import numpy as np

    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(n)
    if nch != 1:
        # interleaved multi-channel would silently blend channels into
        # one RMS; refuse (drop policy) like the unsupported-width path
        raise ValueError(f"unsupported channel count {nch} (mono PCM only)")
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned, offset-128
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if samples.size == 0 or sr <= 0:
        raise ValueError("no samples")

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    rms = float(np.sqrt(np.mean(samples**2)))
    return sr, r6(n / sr), r6(rms)


def pil_image_decoder(payload: bytes) -> tuple[int, int, float]:
    """REAL image decoder via PIL — raises ImportError in this container
    (no PIL; documented constraint). Wired so the moment the environment
    gains Pillow, ``image_features(..., decoder=pil_image_decoder)`` is
    the production path; the swap-contract test exercises it when the
    import succeeds and skips otherwise."""
    import io

    from PIL import Image  # noqa: F401 — the one non-baked dependency

    img = Image.open(io.BytesIO(bytes(payload)))
    w, h = img.size
    hist = img.convert("L").histogram()
    total = sum(hist)
    mean_luma = (sum(i * c for i, c in enumerate(hist)) / total / 255.0) if total else 0.0
    return w, h, mean_luma


def audio_features(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload", decoder=None
) -> DataFrame:
    """Decode + feature-extract audio via mapInPandas (Arrow batches).

    Input: df[id_col: long, payload_col: binary]. Output:
    AUDIO_FEATURES_SCHEMA. Undecodable payloads are dropped.

    ``decoder(payload) -> (sample_rate, duration_s, rms)`` is the only
    stub/real swap point (real: ffmpeg/torchaudio); the surrounding
    pipeline is production code.
    """
    decode = decoder or _decode_audio_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "duration_s": [], "rms": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, dur, rms = decode(payload)
                except Exception:
                    continue
                out["media_id"].append(mid)
                out["sample_rate"].append(sr)
                out["duration_s"].append(dur)
                out["rms"].append(rms)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
