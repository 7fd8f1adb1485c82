"""Pure-Python/numpy WAV (RIFF PCM) codec.

The audio modality's no-external-libs container: integer PCM (8/16/24/32
bit) and IEEE float32, mono or multi-channel, chunk-walking per the RIFF
spec (unknown chunks skipped, word-aligned). Turns the multimodal audio
stage from a declared stub into a real operator for PCM payloads; compressed
audio (MP3/AAC/OGG) still needs a codec lib and raises honestly.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioCodecError(ValueError):
    pass


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 samples in [-1, 1] shaped [n, channels], rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioCodecError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            payload = body
    if fmt is None or payload is None:
        raise AudioCodecError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _align, bits = fmt
    if channels < 1:
        raise AudioCodecError("WAV with zero channels")
    if audio_format == 3:  # IEEE float
        if bits != 32:
            raise AudioCodecError(f"only 32-bit float WAV supported (bits={bits})")
        x = np.frombuffer(payload, dtype="<f4").astype(np.float64)
    elif audio_format == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3).astype(np.int64)
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise AudioCodecError(f"unsupported PCM bit depth {bits}")
    else:
        raise AudioCodecError(
            f"unsupported WAV format tag {audio_format} (compressed audio "
            "needs a codec lib)"
        )
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """float samples in [-1, 1] ([n] or [n, channels]) → integer-PCM WAV."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    clipped = np.clip(s, -1.0, 1.0)
    if bits == 16:
        pcm = np.round(clipped * 32767.0).astype("<i2").tobytes()
    elif bits == 8:
        pcm = (np.round(clipped * 127.0) + 128).astype(np.uint8).tobytes()
    elif bits == 32:
        pcm = np.round(clipped * float((1 << 31) - 1)).astype("<i4").tobytes()
    else:
        raise AudioCodecError(f"unsupported encode bit depth {bits}")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def resample_linear(samples: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Linear-interpolation resample, [n, ch] → [m, ch] (deterministic)."""
    if rate_in == rate_out or samples.shape[0] < 2:
        return samples.copy()
    n = samples.shape[0]
    m = max(1, int(round(n * rate_out / rate_in)))
    xi = np.linspace(0.0, n - 1.0, m)
    lo = np.floor(xi).astype(np.int64)
    hi = np.minimum(lo + 1, n - 1)
    frac = (xi - lo)[:, None]
    return samples[lo] * (1.0 - frac) + samples[hi] * frac


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Deterministic clip summary: duration, RMS, peak, zero-crossing rate
    (mono mixdown) — the feature row the multimodal audio stage emits."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return {"duration_sec": 0.0, "rms": 0.0, "peak": 0.0, "zcr": 0.0}
    zc = int((np.signbit(mono[1:]) != np.signbit(mono[:-1])).sum()) if n > 1 else 0
    return {
        "duration_sec": round(n / float(rate), 6),
        "rms": round(float(np.sqrt((mono**2).mean())), 6),
        "peak": round(float(np.abs(mono).max()), 6),
        "zcr": round(zc / max(n - 1, 1), 6),
    }
