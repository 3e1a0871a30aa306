"""WAV file I/O (stdlib `wave` only — no soundfile/scipy dependency).

The reference streams from a sound card; the TPU engine streams from storage
or network.  This module provides the float32 ⇄ PCM conversions (16/24/32-bit
and IEEE float) needed to feed real audio through the engine, with the same
±1.0 float convention as the sounddevice callback buffers.
"""
from __future__ import annotations

import struct
import wave
from typing import Tuple

import numpy as np

__all__ = ["read_wav", "write_wav"]


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file → (float32 array [channels, frames] in ±1.0, rate)."""
    with wave.open(path, "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        ints = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        x = ints.astype(np.float32) / float(1 << 23)
    elif width == 4:
        # could be PCM32 or IEEE float; wave exposes only PCM — assume PCM32.
        # convert via float64 (float32 mantissa can't hold 32-bit samples)
        x = (np.frombuffer(raw, dtype="<i4").astype(np.float64) / float(1 << 31)).astype(np.float32)
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return x.reshape(-1, n_ch).T.copy(), rate


def write_wav(path: str, x: np.ndarray, rate: int, width: int = 2) -> None:
    """Write float32 [channels, frames] (or [frames]) in ±1.0 as PCM WAV."""
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[None, :]
    n_ch, n = x.shape
    clipped = np.clip(x.T, -1.0, 1.0)  # interleave as [frames, channels]
    if width == 2:
        data = (clipped * 32767.0).astype("<i2").tobytes()
    elif width == 3:
        ints = (clipped * float((1 << 23) - 1)).astype(np.int32)
        b = np.empty((ints.size, 3), dtype=np.uint8)
        flat = ints.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        data = b.tobytes()
    elif width == 4:
        data = (clipped.astype(np.float64) * float((1 << 31) - 1)).astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported sample width {width}")
    with wave.open(path, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(data)
