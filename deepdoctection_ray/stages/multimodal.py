"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference carries pixel arrays / pdf bytes inside each record and attaches
and drops them around heavy stages (``maybe_load_image`` /
``maybe_remove_image``, ``mapper/misc.py:110-141``). The Ray translation:

- media travel as a ``binary`` column plus a ``media_meta`` struct
  (mime/width/height/duration);
- decode / feature-extract / resize / frame-sample are ACTOR-POOL
  ``map_batches`` stages with small ``batch_size`` (payloads are wide);
- the binary column is projected away the moment the consuming stage is done.

Codec status: BMP, PNG, GIF, baseline JPEG, TIFF (uncompressed / LZW /
Deflate / PackBits), PPM/PGM images and WAV-PCM audio all decode NATIVELY
(pure numpy codecs under ``kernels/``, incl. progressive JPEG and
JPEG-in-TIFF);
compressed audio (MP3/AAC) and video are not decodable without external
libs and raise ``NotImplementedError`` unless ``fake=True`` (deterministic
synthetic decode for plumbing tests). The Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_META_TYPE = pa.struct(
    [
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def make_media_table(n: int, seed: int = 5, kind: str = "image") -> pa.Table:
    """Deterministic synthetic media rows for tests (binary payload + meta)."""
    rng = np.random.RandomState(seed)
    payloads, metas, ids = [], [], []
    for i in range(n):
        w, h = int(rng.randint(8, 64)), int(rng.randint(8, 64))
        payloads.append(rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes())
        metas.append({"mime": f"{kind}/x-raw", "width": w, "height": h, "duration_ms": 0})
        ids.append(i)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_meta": pa.array(metas, MEDIA_META_TYPE),
        }
    )


class ImageDecoder:
    """Actor-pool decode stage.

    REAL decode path for BMP / PNG / GIF / baseline-JPEG / TIFF / binary
    PPM / PGM payloads (pure-numpy codecs under ``kernels/`` — no external
    libraries). Codec-less formats (arithmetic-coded JPEG, video) raise
    ``NotImplementedError`` naming the format; ``fake=True`` keeps the
    deterministic synthetic decode (payload bytes reshaped via the meta
    struct) for plumbing tests.

    ``resize_to=(w, h)`` applies nearest-neighbor resize after decode —
    the ``ResizeTransform`` half of the reference's image pre-processing.
    """

    def __init__(self, fake: bool = False, resize_to: tuple[int, int] | None = None) -> None:
        self._fake = fake
        self._resize = resize_to

    def _decode(self, payload: bytes, meta: dict) -> np.ndarray:
        from ..kernels.imaging import (
            ImageCodecError,
            decode_image,
            resize_nearest,
            sniff_mime,
            to_grayscale,
        )

        if self._fake:
            w, h = meta["width"], meta["height"]
            arr = np.frombuffer(payload, dtype=np.uint8)
            img = arr[: w * h].reshape(h, w)
        elif sniff_mime(payload) is not None:
            img = to_grayscale(decode_image(payload))
        else:
            raise NotImplementedError(
                f"no codec for {meta.get('mime', 'unknown')!r} in this environment "
                "(BMP / PNG / binary PPM / PGM decode natively; JPEG/TIFF need "
                "an external library — plug one in here)"
            )
        if self._resize:
            img = resize_nearest(img, *self._resize)
        return img

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = (
            batch["media_meta"].to_pylist()
            if "media_meta" in batch.column_names
            else [{} for _ in range(len(batch))]
        )
        feats = []
        for payload, meta in zip(batch["payload"].to_pylist(), metas):
            img = self._decode(payload, meta)
            feats.append(
                {
                    "mean": round(float(img.mean()), 6),
                    "std": round(float(img.std()), 6),
                    "n_pixels": int(img.size),
                }
            )
        out = batch.drop_columns(["payload"])  # binary never crosses this stage
        return out.append_column(
            "features",
            pa.array(
                feats,
                pa.struct([("mean", pa.float64()), ("std", pa.float64()), ("n_pixels", pa.int64())]),
            ),
        )


class AudioFeatures:
    """Actor-pool audio feature stage: REAL decode for WAV payloads
    (``kernels/wav.py`` — integer PCM 8/16/24/32-bit, float32, G.711
    µ-law/A-law and IMA ADPCM, any channel count), optional linear resample,
    then a deterministic per-clip feature row (duration / RMS / peak /
    zero-crossing rate). Perceptual codecs (MP3/AAC/OGG) raise honestly;
    ``fake=True`` synthesizes samples from the payload bytes for plumbing
    tests. The binary column never crosses this stage."""

    def __init__(self, fake: bool = False, resample_to: int | None = None) -> None:
        self._fake = fake
        self._resample = resample_to

    def _decode(self, payload: bytes, meta: dict) -> tuple[np.ndarray, int]:
        from ..kernels.wav import AudioCodecError, decode_wav

        if self._fake:
            x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
            return x[:, None], 8000
        try:
            return decode_wav(payload)
        except AudioCodecError as exc:
            raise NotImplementedError(
                f"no audio codec for this payload in this environment ({exc}); "
                "WAV/PCM decodes natively — plug a codec lib in here for "
                "MP3/AAC/OGG"
            ) from exc

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.wav import audio_features, resample_linear

        feats = []
        metas = batch["media_meta"].to_pylist() if "media_meta" in batch.column_names else [
            {} for _ in range(len(batch))
        ]
        for payload, meta in zip(batch["payload"].to_pylist(), metas):
            samples, rate = self._decode(payload, meta)
            if self._resample and rate != self._resample:
                samples = resample_linear(samples, rate, self._resample)
                rate = self._resample
            f = audio_features(samples, rate)
            f["rate"] = rate
            f["channels"] = int(samples.shape[1]) if samples.ndim == 2 else 1
            feats.append(f)
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "audio_features",
            pa.array(
                feats,
                pa.struct(
                    [
                        ("duration_sec", pa.float64()),
                        ("rms", pa.float64()),
                        ("peak", pa.float64()),
                        ("zcr", pa.float64()),
                        ("rate", pa.int64()),
                        ("channels", pa.int64()),
                    ]
                ),
            ),
        )


class FrameSampler:
    """Actor-pool frame-sampling stage for video-like payloads.

    Deterministic stride sampling over the byte stream (codec STUBbed the same
    way); emits one row per sampled frame — the ``flat_map`` explode shape.
    """

    def __init__(self, num_frames: int = 4, fake: bool = False) -> None:
        self._n = num_frames
        self._fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._fake:
            raise NotImplementedError("STUB: video codec not available; use fake=True")
        ids, frame_nos, checksums = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            n = max(len(payload) // self._n, 1)
            for f in range(self._n):
                chunk = payload[f * n : (f + 1) * n]
                if not chunk:
                    break
                ids.append(mid)
                frame_nos.append(f)
                checksums.append(int(np.frombuffer(chunk, dtype=np.uint8).sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_nos, pa.int32()),
                "checksum": pa.array(checksums, pa.int64()),
            }
        )
