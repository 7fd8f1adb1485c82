"""Pure-Python/numpy WAV (RIFF PCM) codec.

The audio modality's no-external-libs container: integer PCM (8/16/24/32
bit), IEEE float32, G.711 µ-law/A-law companding and IMA/DVI ADPCM, mono or
multi-channel, chunk-walking per the RIFF spec (unknown chunks skipped,
word-aligned). Turns the multimodal audio stage from a declared stub into a
real operator for WAV payloads; perceptual codecs (MP3/AAC/OGG) still need a
codec lib and raise honestly.
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
    elif audio_format == 6:  # G.711 A-law
        x = alaw_decode(np.frombuffer(payload, np.uint8)).astype(np.float64) / 32768.0
    elif audio_format == 7:  # G.711 µ-law
        x = ulaw_decode(np.frombuffer(payload, np.uint8)).astype(np.float64) / 32768.0
    elif audio_format == 0x11:  # IMA/DVI ADPCM
        pcm = ima_adpcm_decode(payload, channels, _align)
        return pcm.astype(np.float64) / 32768.0, rate
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


# ------------------------------------------------------ G.711 companding (µ/A)

_ULAW_BIAS = 0x84
_SEG_ENDS = np.array(
    [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], dtype=np.int32
)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """G.711 µ-law bytes → int16 linear PCM (vectorized; CCITT/Sun tables)."""
    u = (~codes.astype(np.uint8)).astype(np.int32)
    t = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM → G.711 µ-law bytes (vectorized inverse)."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.where(x < 0, -x, x) + _ULAW_BIAS, 0x7FFF)
    seg = np.searchsorted(_SEG_ENDS, mag)
    mant = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant)).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → int16 linear PCM (vectorized)."""
    a = codes.astype(np.uint8) ^ np.uint8(0x55)
    a = a.astype(np.int32)
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    # sign bit SET means positive in A-law
    return np.where(a & 0x80, t, -t).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM → G.711 A-law bytes (vectorized inverse)."""
    x = pcm.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.where(x < 0, -x - 1, x), 0x7FFF)
    seg = np.searchsorted(_SEG_ENDS, mag)
    mant = np.where(seg < 1, (mag >> 4) & 0x0F, (mag >> (seg + 3)) & 0x0F)
    return ((sign | (seg << 4) | mant) ^ 0x55).astype(np.uint8)


# ------------------------------------------------------------- IMA/DVI ADPCM

_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEP_TABLE = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
     45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
     209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
     796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
     2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
     7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
     20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32,
)


def _ima_decode_nibbles(nibbles: np.ndarray, predictor: int, index: int) -> np.ndarray:
    """Decode one channel-block nibble stream (the step/predictor recursion
    is inherently sequential — bounded by the block size, never the clip)."""
    out = np.empty(len(nibbles), np.int16)
    pred, idx = int(predictor), int(index)
    step_table, index_table = _IMA_STEP_TABLE, _IMA_INDEX_TABLE
    for i, nib in enumerate(nibbles):
        step = int(step_table[idx])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            diff = -diff
        pred = min(max(pred + diff, -32768), 32767)
        idx = min(max(idx + int(index_table[nib & 7]), 0), 88)
        out[i] = pred
    return out


def _ima_decode_block(body: bytes, channels: int) -> np.ndarray:
    """One IMA ADPCM block → int16 [n, channels]. Block layout per RFC 2361 /
    MS WAVE: a 4-byte (predictor:int16, index:uint8, reserved) header per
    channel, then 4-byte data words interleaved channel-major."""
    import struct as _struct

    heads = []
    for c in range(channels):
        pred, idx, _r = _struct.unpack_from("<hBB", body, c * 4)
        heads.append((pred, min(max(idx, 0), 88)))
    data = np.frombuffer(body, np.uint8)[4 * channels :]
    nwords = len(data) // (4 * channels)
    data = data[: nwords * 4 * channels].reshape(nwords, channels, 4)
    chans = []
    for c in range(channels):
        stream = data[:, c, :].reshape(-1)
        nibs = np.empty(len(stream) * 2, np.uint8)
        nibs[0::2] = stream & 0x0F
        nibs[1::2] = stream >> 4
        chans.append(
            np.concatenate([[heads[c][0]], _ima_decode_nibbles(nibs, *heads[c])])
        )
    return np.stack(chans, axis=1).astype(np.int16)


def ima_adpcm_decode(payload: bytes, channels: int, block_align: int) -> np.ndarray:
    """IMA ADPCM data chunk → int16 [n, channels] across all blocks."""
    if block_align < 4 * channels:
        raise AudioCodecError("IMA ADPCM block_align smaller than its headers")
    blocks = []
    for pos in range(0, len(payload) - 4 * channels + 1, block_align):
        blocks.append(_ima_decode_block(payload[pos : pos + block_align], channels))
    if not blocks:
        return np.empty((0, channels), np.int16)
    return np.concatenate(blocks, axis=0)


def ima_adpcm_encode(pcm: np.ndarray, block_align: int = 1024) -> bytes:
    """int16 [n, channels] → IMA ADPCM data chunk (fixture writer; mirrors
    the decoder's block layout so round trips are exact up to quantization)."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    channels = pcm.shape[1]
    import struct as _struct

    samples_per_block = (block_align - 4 * channels) * 2 // channels + 1
    out = bytearray()
    # initial step index per channel: match the step size to the signal's
    # mean slew so the first block doesn't spend hundreds of samples slewing
    # up from step=7 (the standard encoder-side freedom — any index is
    # decodable, a good one just converges immediately)
    idx = []
    for c in range(channels):
        d = np.abs(np.diff(pcm[: samples_per_block, c].astype(np.int32)))
        mean_slew = float(d.mean()) if d.size else 0.0
        idx.append(int(np.searchsorted(_IMA_STEP_TABLE, mean_slew).clip(0, 88)))
    for start in range(0, pcm.shape[0], samples_per_block):
        chunk = pcm[start : start + samples_per_block]
        if chunk.shape[0] < samples_per_block:
            pad = np.zeros((samples_per_block - chunk.shape[0], channels), np.int16)
            chunk = np.concatenate([chunk, pad], axis=0)
        nib_streams = []
        for c in range(channels):
            pred = int(chunk[0, c])
            out += _struct.pack("<hBB", pred, idx[c], 0)
            nibs = []
            cur_idx = idx[c]
            for s in chunk[1:, c]:
                step = int(_IMA_STEP_TABLE[cur_idx])
                delta = int(s) - pred
                nib = 0
                if delta < 0:
                    nib = 8
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                # reconstruct exactly like the decoder
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                if nib & 8:
                    diff = -diff
                pred = min(max(pred + diff, -32768), 32767)
                cur_idx = min(max(cur_idx + int(_IMA_INDEX_TABLE[nib & 7]), 0), 88)
                nibs.append(nib)
            idx[c] = cur_idx
            nib_streams.append(nibs)
        # interleave channel nibble streams as 4-byte words
        nwords = len(nib_streams[0]) // 8
        for w in range(nwords):
            for c in range(channels):
                eight = nib_streams[c][w * 8 : (w + 1) * 8]
                for lo, hi in zip(eight[0::2], eight[1::2]):
                    out.append(lo | (hi << 4))
    return bytes(out)


def encode_wav_g711(samples: np.ndarray, rate: int, law: str = "mu") -> bytes:
    """float samples in [-1, 1] → G.711 companded WAV (format tag 7/6)."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    pcm16 = np.round(np.clip(s, -1.0, 1.0) * 32767.0).astype(np.int16).reshape(-1)
    if law == "mu":
        body, tag = ulaw_encode(pcm16).tobytes(), 7
    elif law == "a":
        body, tag = alaw_encode(pcm16).tobytes(), 6
    else:
        raise AudioCodecError(f"unknown companding law {law!r}")
    block = channels  # one byte per sample
    fmt = struct.pack("<HHIIHH", tag, channels, rate, rate * block, block, 8)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_ima_adpcm(samples: np.ndarray, rate: int, block_align: int = 256) -> bytes:
    """float samples in [-1, 1] → IMA ADPCM WAV (format tag 0x11), with the
    standard fmt extension (samples-per-block) and a fact chunk."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    pcm16 = np.round(np.clip(s, -1.0, 1.0) * 32767.0).astype(np.int16)
    body = ima_adpcm_encode(pcm16, block_align=block_align)
    spb = (block_align - 4 * channels) * 2 // channels + 1
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, rate,
        rate * block_align // spb, block_align, 4, 2, spb,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<II", 4, pcm16.shape[0])
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_fingerprint(samples: np.ndarray, rate: int) -> int:
    """64-bit energy-delta audio fingerprint (the dHash idea in the time
    domain): mono mixdown → deterministic linear resample to 4 kHz → 65
    equal frames → RMS energy ladder → sign bits of consecutive-frame energy
    differences, MSB-first. Robust to codec requantization (G.711/ADPCM
    perturb energies ~0.5%, flipping only near-tie comparisons); unrelated
    clips differ in ~half the bits."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples.astype(np.float64)
    if mono.shape[0] == 0:
        return 0
    mono = resample_linear(mono[:, None], rate, 4000)[:, 0]
    n = mono.shape[0]
    edges = np.linspace(0, n, 66).astype(np.int64)
    energies = np.empty(65, np.float64)
    for i in range(65):
        seg = mono[edges[i] : max(edges[i + 1], edges[i] + 1)]
        energies[i] = float(np.sqrt((seg**2).mean())) if seg.size else 0.0
    bits = energies[1:] > energies[:-1]
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out
