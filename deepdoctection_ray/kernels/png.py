"""Pure-Python/numpy PNG codec (RFC 2083 / ISO 15948).

PNG is zlib + per-scanline byte predictors — both already proven in this
repo (the PDF xref-stream path decodes the identical Sub/Up/Average/Paeth
filter set, ``kernels/pdf.py``), so the codec-format gap the round-3 audit
listed (``mapper/misc.py:41-107`` decodes via cv2 in the reference) closes
for PNG with no external libraries. Supported: 8-bit greyscale (color type
0), RGB (2), palette (3, via PLTE), grey+alpha (4) and RGBA (6),
non-interlaced. 16-bit and Adam7 raise :class:`ImageCodecError` honestly.

The encoder emits a minimal valid stream (IHDR / optional PLTE / one IDAT /
IEND) and can write any of the five scanline filters, so decode-side
unfiltering is round-trip-tested against all of them.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class ImageCodecError(ValueError):
    pass


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters in place; ``raw`` is [h, 1+stride] rows
    (filter byte + filtered bytes)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        row = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub — sequential in x, vectorize per byte lane
            cur = row.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = int(out[y - 1, x - bpp]) if (x >= bpp and y) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ImageCodecError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array: [H, W] (grey), [H, W, 3] (RGB / palette) or
    [H, W, 2]/[H, W, 4] (with alpha)."""
    if data[:8] != _SIG:
        raise ImageCodecError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ImageCodecError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ImageCodecError(f"only 8-bit PNG supported (depth={depth})")
    if ctype not in _CHANNELS:
        raise ImageCodecError(f"unsupported PNG color type {ctype}")
    if comp != 0 or filt != 0:
        raise ImageCodecError("non-standard PNG compression/filter method")
    if interlace != 0:
        raise ImageCodecError("Adam7 interlaced PNG not supported")
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ImageCodecError("PNG scanline payload size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    flat = _unfilter(rows, h, stride, ch)
    img = flat.reshape(h, w, ch) if ch > 1 else flat.reshape(h, w)
    if ctype == 3:
        if plte is None:
            raise ImageCodecError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(img.max(initial=0)) >= len(pal):
            raise ImageCodecError("palette index out of range")
        return pal[img]
    return img


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 [H, W] / [H, W, 2] / [H, W, 3] / [H, W, 4] → PNG with every
    scanline carrying ``filter_type`` (0-4) — useful for exercising each
    unfilter path in round trips."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype, ch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        ch = img.shape[2]
        ctype = {2: 4, 3: 2, 4: 6}[ch]
        flat = img
    else:
        raise ImageCodecError(f"unsupported array shape {img.shape}")
    if not 0 <= filter_type <= 4:
        raise ImageCodecError(f"invalid filter type {filter_type}")
    h, w = img.shape[:2]
    stride = w * ch
    rows = flat.reshape(h, stride)
    zero = np.zeros(stride, dtype=np.uint8)
    out = bytearray()
    for y in range(h):
        cur = rows[y]
        prev = rows[y - 1] if y else zero
        left = np.concatenate([np.zeros(ch, np.uint8), cur[:-ch]]) if stride > ch else np.zeros(stride, np.uint8)
        upleft = (
            np.concatenate([np.zeros(ch, np.uint8), prev[:-ch]])
            if stride > ch
            else np.zeros(stride, np.uint8)
        )
        if y == 0 and filter_type in (2, 3, 4):
            prev = zero
            upleft = np.zeros(stride, dtype=np.uint8)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = (cur.astype(np.int32) - left) & 0xFF
        elif filter_type == 2:
            enc = (cur.astype(np.int32) - prev) & 0xFF
        elif filter_type == 3:
            enc = (cur.astype(np.int32) - ((left.astype(np.int32) + prev) >> 1)) & 0xFF
        else:
            enc = (cur.astype(np.int32) - _paeth(left, prev, upleft)) & 0xFF
        out.append(filter_type)
        out += enc.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )
