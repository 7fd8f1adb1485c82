"""Pure-numpy image codecs and transforms — no PIL/OpenCV in this
environment, so the multimodal decode stage implements the containers
directly. This module holds BMP + netpbm and the transform kernels;
``sniff_mime``/``decode_image`` also dispatch to the sibling codec modules:

- BMP: 24-bit uncompressed BITMAPINFOHEADER (here);
- PPM (P6) / PGM (P5): binary netpbm (here);
- PNG: all five scanline filters, grey/RGB/RGBA/palette (``png.py``);
- GIF: LSB-first LZW, interlace, palettes (``gif.py``);
- JPEG: baseline sequential SOF0 (``jpeg.py``);
- TIFF: uncompressed/LZW/Deflate/PackBits strips + predictor (``tiff.py``);
- nearest-neighbor/bilinear resize and ITU-R 601 luma grayscale (the
  resize / to-grayscale transforms the reference applies via its image
  deps, ``utils/transform.py:145-200`` semantics).

Encoders exist so fixtures are self-contained and round-trips are testable;
what no pure-Python path can cover (arithmetic-coded JPEG, video)
raises honestly.
"""

from __future__ import annotations

import struct

import numpy as np


class ImageCodecError(ValueError):
    pass


def sniff_mime(data: bytes) -> str | None:
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:2] in (b"P6", b"P5"):
        return "image/x-portable-pixmap"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "image/tiff"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    return None


# ----------------------------------------------------------------------- BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 [H, W, 3] (RGB) or [H, W] → 24-bit uncompressed BMP."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    image_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = img[y, :, ::-1].astype(np.uint8).tobytes()
        rows.append(bgr + b"\x00" * (row_size - w * 3))
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → uint8 [H, W, 3] RGB."""
    if data[:2] != b"BM":
        raise ImageCodecError("not a BMP (missing 'BM' magic)")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ImageCodecError(f"unsupported BMP header size {header_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ImageCodecError(
            f"only 24-bit uncompressed BMP supported (got bpp={bpp}, compression={compression})"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    row_size = (w * 3 + 3) & ~3
    buf = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=pixel_offset)
    rows = buf.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# ----------------------------------------------------------------- PPM / PGM


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 [H, W, 3] → binary P6; [H, W] → binary P5."""
    if img.ndim == 2:
        h, w = img.shape
        return f"P5 {w} {h} 255\n".encode() + img.astype(np.uint8).tobytes()
    h, w, _ = img.shape
    return f"P6 {w} {h} 255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ImageCodecError("not a binary PPM/PGM (P6/P5)")
    # header: magic, width, height, maxval — whitespace separated, optional
    # '#' comments
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ImageCodecError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    buf = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=pos)
    return buf.reshape((h, w, 3) if ch == 3 else (h, w)).copy()


def decode_image(data: bytes) -> np.ndarray:
    mime = sniff_mime(data)
    if mime == "image/bmp":
        return decode_bmp(data)
    if mime == "image/x-portable-pixmap":
        return decode_ppm(data)
    if mime == "image/png":
        # real PNG support (kernels/png.py — zlib + the same Sub/Up/Average/
        # Paeth predictor family the PDF xref-stream path decodes)
        from .png import decode_png

        return decode_png(data)
    if mime == "image/tiff":
        from .tiff import decode_tiff

        return decode_tiff(data)
    if mime == "image/gif":
        from .gif import decode_gif

        return decode_gif(data)
    if mime == "image/jpeg":
        # sequential or progressive JPEG (kernels/jpeg.py)
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    raise ImageCodecError(
        "unsupported image container (BMP / PNG / GIF / JPEG incl. "
        "progressive / TIFF incl. LZW+Deflate+PackBits+JPEG / binary "
        "PPM / PGM decode natively)"
    )


# ----------------------------------------------------------------- transforms


def resize_nearest(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resize (``ResizeTransform.apply_image`` semantics)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(new_h) * (h / new_h)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(new_w) * (w / new_w)).astype(np.int64), w - 1)
    return img[ys][:, xs]


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma; uint8 in, uint8 out."""
    if img.ndim == 2:
        return img
    f = img.astype(np.float64)
    return np.clip(
        0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2], 0, 255
    ).astype(np.uint8)


def resize_bilinear(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Pure-numpy bilinear resize with half-pixel centers (the PIL/cv2
    ``BILINEAR``/``INTER_LINEAR`` convention the reference's
    ``ResizeTransform`` maps to, ``transform.py:145-254``). uint8 in → uint8
    out (rounded); float passes through."""
    h, w = img.shape[:2]
    ys = np.clip((np.arange(new_h) + 0.5) * (h / new_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(new_w) + 0.5) * (w / new_w) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    if img.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    f = img.astype(np.float64)
    fy0, fy1 = f[y0], f[y1]  # one row-gather per edge, reused for both columns
    top = fy0[:, x0] * (1 - wx) + fy0[:, x1] * wx
    bot = fy1[:, x0] * (1 - wx) + fy1[:, x1] * wx
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(img.dtype, np.integer):
        return np.clip(np.rint(out), 0, 255).astype(img.dtype)
    return out.astype(img.dtype)


def resize_image(img: np.ndarray, new_w: int, new_h: int, interp: str = "BILINEAR") -> np.ndarray:
    """``ResizeTransform.apply_image`` dispatch: the reference folds all its
    interp aliases onto nearest/bilinear (``transform.py:176-185``)."""
    key = interp.upper()
    if key in ("NEAREST", "INTER_NEAREST"):
        return resize_nearest(img, new_w, new_h)
    if key in ("BILINEAR", "INTER_LINEAR", "BICUBIC", "INTER_AREA", "VIZ", "BOX"):
        return resize_bilinear(img, new_w, new_h)
    raise ValueError(f"unknown interp {interp!r}")


def inference_resize_dims(h: int, w: int, short_edge_length: int, max_size: int) -> tuple[int, int]:
    """``InferenceResize.get_transform`` sizing math (``transform.py:256-299``):
    scale the SHORT edge to ``short_edge_length``, then rescale down if the
    long edge would exceed ``max_size``; round half-up. Returns (new_h, new_w)."""
    scale = short_edge_length * 1.0 / min(h, w)
    if h < w:
        new_h, new_w = float(short_edge_length), scale * w
    else:
        new_h, new_w = scale * h, float(short_edge_length)
    if max(new_h, new_w) > max_size:
        scale = max_size * 1.0 / max(new_h, new_w)
        new_h *= scale
        new_w *= scale
    return int(new_h + 0.5), int(new_w + 0.5)


def normalize_image(img: np.ndarray, pixel_mean: np.ndarray, pixel_std: np.ndarray) -> np.ndarray:
    """``normalize_image`` (``transform.py:302-316``): ``(img - mean) / std``
    via the reference's reciprocal multiply."""
    return (img - pixel_mean) * (1.0 / pixel_std)


def pad_image(img: np.ndarray, top: int, right: int, bottom: int, left: int) -> np.ndarray:
    """White constant padding (``pad_image``, ``transform.py:319-334``); the
    inverse coordinate mapping is ``kernels.transforms.unpad_boxes``."""
    pad = ((top, bottom), (left, right)) + (((0, 0),) if img.ndim == 3 else ())
    return np.pad(img, pad, "constant", constant_values=255)


def rotate_image(img: np.ndarray, angle: int) -> np.ndarray:
    """Right-angle rotation (``RotationTransform.apply_image``,
    ``transform.py:431-485``), counter-clockwise — the same convention as
    ``kernels.transforms.rotate_boxes`` so image and coords stay aligned:
    pixel (x, y) lands at (y, W - x) for 90°."""
    if angle % 90 != 0:
        raise ValueError(f"only right angles supported, got {angle}")
    return np.rot90(img, k=(angle // 90) % 4)


def dhash(img: "np.ndarray", hash_size: int = 8) -> int:
    """Difference hash (dHash, Krawetz 2013 — the standard perceptual image
    fingerprint): grayscale → nearest-neighbor resize to (hash_size+1) ×
    hash_size → horizontal-gradient sign bits, row-major MSB-first. Robust
    to re-encoding and small noise; Hamming distance ≈ visual difference.
    Deterministic (integer mean grayscale + nearest resize — no float
    filtering), so the golden fixture recomputes it bit-exactly."""
    g = to_grayscale(img) if img.ndim == 3 else img
    small = resize_nearest(g, hash_size + 1, hash_size).astype(np.int32)
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
