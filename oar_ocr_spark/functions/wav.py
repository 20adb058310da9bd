"""Pure-python RIFF/WAVE PCM codec + audio feature extraction.

The multimodal seam (functions/multimodal.py, SURVEY §2.1) carries
audio as opaque binary + typed metadata; until now any audio payload
raised the declared NotImplementedError. WAV PCM needs no codec
library — the container is length-prefixed RIFF chunks and the samples
are raw little-endian integers (public format: RIFF spec / RFC 2361
WAVE taxonomy) — so the audio modality gets the same treatment PNG
gave images: a real, lossless, deterministic byte format.

Scope (declared): integer PCM (format tag 1) at 8/16/24/32 bits,
IEEE float (tag 3) at 32/64 bits, and WAVE_FORMAT_EXTENSIBLE (tag
0xFFFE — the >2-channel / >16-bit layout, SubFormat GUID resolved to
PCM or float), any channel count / sample rate. Decode output is
always int16 (wider samples keep their top 16 bits; floats scale by
32767 and clip — the standard downconversions). Compressed WAVE
formats (ADPCM, mu-law, MP3-in-WAV) raise NotImplementedError — the
codec-seam contract.

The deterministic audio fixture (`render_audio`) synthesizes each
ref's waveform as a closed-form function of its hash (sum of 3
sinusoids + linear fade-out, int16) — the audio analogue of
fixtures/render.render_page, same exact-integer determinism contract.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "encode_wav",
    "decode_wav",
    "render_audio",
    "wav_store_df",
    "audio_features_from_bytes_df",
    "WAV_MAGIC",
]

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(N,) or (N, channels) int16 → WAV bytes (PCM, lossless)."""
    if samples.dtype != np.int16:
        raise ValueError(f"encode_wav expects int16, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"encode_wav expects (N,) or (N,C), got {samples.shape}")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((N, channels) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE header)")
    pos = 12
    fmt = None
    fmt_body = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            raw = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _byterate, _align, bits = fmt
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag is in the
        # SubFormat GUID's first two bytes (fmt body: 16 base + cbSize
        # + validBits + channelMask + GUID)
        if fmt_body is None or len(fmt_body) < 40:
            raise ValueError("extensible WAV fmt chunk too short")
        tag = struct.unpack("<H", fmt_body[24:26])[0]
    if tag == 3:  # IEEE float → int16 (scale + clip, the standard map)
        if bits == 32:
            f = np.frombuffer(raw, dtype="<f4")
        elif bits == 64:
            f = np.frombuffer(raw, dtype="<f8")
        else:
            raise NotImplementedError(f"float WAV bit depth {bits} not supported")
        # NaN → 0 and clip BEFORE scaling: nan.astype(int16) is
        # C-undefined, and inf/huge-finite × 32767 would overflow with
        # per-batch RuntimeWarnings from every Spark worker. The lower
        # clip bound is -32768/32767 so full-scale negatives still land
        # exactly on -32768.
        lo = -32768.0 / 32767.0  # full-scale negatives land on -32768
        f = np.nan_to_num(f.astype(np.float64), nan=0.0, posinf=1.0, neginf=lo)
        f = np.clip(f, lo, 1.0)
        samples = np.round(f * 32767.0).astype(np.int16)
    elif tag != 1:
        raise NotImplementedError(
            f"compressed WAVE format tag {tag} not supported here (PCM/float only)"
        )
    elif bits == 16:
        samples = np.frombuffer(raw, dtype="<i2")
    elif bits == 8:  # 8-bit WAV is unsigned, rebased to signed 16
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8
    elif bits == 24:  # packed 3-byte little-endian → top 16 bits
        b = np.frombuffer(raw, dtype=np.uint8)
        if len(b) % 3:
            raise ValueError("24-bit WAV data length not a multiple of 3")
        b = b.reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)  # sign-extend
        samples = (v >> 8).astype(np.int16)
    elif bits == 32:  # int32 → top 16 bits
        samples = (np.frombuffer(raw, dtype="<i4") >> 16).astype(np.int16)
    else:
        raise NotImplementedError(f"WAV bit depth {bits} not supported here")
    return samples.reshape(-1, ch).astype(np.int16), int(rate)


# ---------------------------------------------------------------------------
# deterministic fixture
# ---------------------------------------------------------------------------

_RATE = 8000


def render_audio(ref: str) -> tuple[np.ndarray, int]:
    """Deterministic synthetic waveform for a media ref: 3 sinusoids
    with hash-derived frequencies/amplitudes, linear fade-out, int16
    mono at 8 kHz, 0.25–1.0 s. Closed-form function of the ref (the
    determinism contract of fixtures/render.render_page)."""
    h = hashlib.sha256(ref.encode()).digest()
    n = _RATE // 4 + (h[0] * _RATE * 3 // 4) // 255  # 0.25s .. 1.0s
    t = np.arange(n, dtype=np.float64) / _RATE
    wave = np.zeros(n, dtype=np.float64)
    for k in range(3):
        freq = 100.0 + 40.0 * h[1 + 2 * k] + h[2 + 2 * k]  # 100..10395 Hz
        amp = (h[7 + k] + 1) / 256.0 / 3.0
        wave += amp * np.sin(2.0 * np.pi * freq * t)
    wave *= 1.0 - t / t[-1] if n > 1 else 1.0  # fade out
    return np.round(wave * 20000.0).astype(np.int16), _RATE


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

_AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("duration_ms", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.IntegerType(), False),
        T.StructField("zero_crossings", T.IntegerType(), False),
    ]
)


def wav_store_df(
    refs: DataFrame, ref_col: str = "media_ref", parallelism: int | None = None
) -> DataFrame:
    """(media_ref) → (media_ref, payload) with REAL WAV bytes per ref
    (the audio analogue of multimodal.png_store_df, on the shared
    payload_store_df scaffold)."""
    from .multimodal import payload_store_df

    def row(ref: str) -> tuple:
        samples, rate = render_audio(ref)
        return (ref, encode_wav(samples, rate))

    return payload_store_df(refs, row, ref_col=ref_col, parallelism=parallelism)


def audio_features_from_bytes_df(
    store: DataFrame, ref_col: str = "media_ref", payload_col: str = "payload"
) -> DataFrame:
    """(media_ref, payload:WAV bytes) → per-clip features. All integer
    except rms, which is rounded to 6 dp (hash-stable across
    partitionings — int64 sum of squares then one float op)."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                mono = samples[:, 0].astype(np.int64)
                n = len(mono)
                rms = float(np.sqrt(np.sum(mono * mono) / n)) if n else 0.0
                sign = np.sign(mono)
                nz = sign != 0
                compact = sign[nz]
                zc = int(np.count_nonzero(np.diff(compact) != 0))
                rows.append(
                    (
                        ref,
                        n,
                        rate,
                        int(n * 1000 // rate),
                        round(rms, 6),
                        int(np.max(np.abs(mono))) if n else 0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _AUDIO_FEATURES_SCHEMA.fields]
            )

    return store.select(
        F.col(ref_col).alias("media_ref"), F.col(payload_col).alias("payload")
    ).mapInPandas(it, schema=_AUDIO_FEATURES_SCHEMA)
