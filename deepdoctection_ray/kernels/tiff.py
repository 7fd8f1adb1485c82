"""Pure-Python/numpy baseline-TIFF codec (TIFF 6.0).

Closes another slice of the reference's cv2-backed decode surface
(``mapper/misc.py:41-107``) without external libraries: both byte orders,
8-bit greyscale and RGB, multi-strip files, and the common compression
schemes — LZW (Compression=5; the MSB-first EarlyChange dialect already
proven by the PDF ``LZWDecode`` kernel), Adobe/ZIP Deflate (8 / 32946) and
PackBits (32773), each per strip, plus the horizontal-differencing
Predictor (tag 317), and new-style JPEG-in-TIFF (Compression=7, with
JPEGTables splicing) via the repo's own baseline JPEG codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ImageCodecError(ValueError):
    pass


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: noop
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Literal-run-only PackBits (valid per spec; decoder round trips)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PREDICTOR = 317

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def _read_ifd_values(data: bytes, endian: str, pos: int) -> tuple[int, int, list[int]]:
    tag, typ, count = struct.unpack_from(endian + "HHI", data, pos)
    size = _TYPE_SIZE.get(typ)
    fmt = _TYPE_FMT.get(typ)
    if size is None or fmt is None:
        return tag, count, []
    total = size * count
    if total <= 4:
        raw = data[pos + 8 : pos + 8 + total]
    else:
        (off,) = struct.unpack_from(endian + "I", data, pos + 8)
        raw = data[off : off + total]
    vals = list(struct.unpack(endian + fmt * count, raw))
    return tag, count, vals


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF → uint8 [H, W] (grey) or [H, W, 3] (RGB); uncompressed,
    LZW, Deflate or PackBits strips, optional horizontal predictor."""
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ImageCodecError("not a TIFF (bad byte-order header)")
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    (n_entries,) = struct.unpack_from(endian + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        tag, _, vals = _read_ifd_values(data, endian, ifd_off + 2 + 12 * i)
        tags[tag] = vals
    w = tags.get(_TAG_WIDTH, [0])[0]
    h = tags.get(_TAG_HEIGHT, [0])[0]
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    samples = tags.get(_TAG_SAMPLES, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if not w or not h:
        raise ImageCodecError("TIFF missing ImageWidth/ImageLength")
    if any(b != 8 for b in bits):
        raise ImageCodecError(f"only 8-bit TIFF supported (BitsPerSample={bits})")
    if samples not in (1, 3):
        raise ImageCodecError(f"unsupported SamplesPerPixel={samples}")
    offsets = tags.get(_TAG_STRIP_OFFSETS, [])
    counts = tags.get(_TAG_STRIP_COUNTS, [])
    if not offsets:
        raise ImageCodecError("TIFF missing StripOffsets")
    if not counts:
        counts = [len(data) - offsets[0]] if comp != 1 else [w * h * samples]
    strips = [data[o : o + c] for o, c in zip(offsets, counts)]
    if comp == 1:
        decoded = strips
    elif comp == 5:
        # TIFF LZW is the MSB-first EarlyChange=1 dialect PDF LZWDecode uses
        from .pdf import _lzw_decode

        decoded = [_lzw_decode(s, early=1) for s in strips]
    elif comp in (8, 32946):
        decoded = [zlib.decompress(s) for s in strips]
    elif comp == 32773:
        decoded = [_packbits_decode(s) for s in strips]
    elif comp == 7:
        # new-style JPEG-in-TIFF (TTN2): each strip is a JPEG stream, with
        # shared DQT/DHT optionally factored into the JPEGTables tag (347) —
        # an abbreviated tables stream (SOI..EOI) spliced in after each
        # strip's SOI before handing to the repo's own baseline JPEG decoder
        from .jpeg import decode_jpeg

        tbl = _read_ifd_raw(data, endian, ifd_off, 347)
        parts = []
        for s in strips:
            if s[:2] != b"\xff\xd8":
                raise ImageCodecError("JPEG-in-TIFF strip without SOI")
            if tbl is not None and len(tbl) >= 4:
                s = b"\xff\xd8" + tbl[2:-2] + s[2:]
            parts.append(np.atleast_3d(decode_jpeg(s)))
        img = np.concatenate(parts, axis=0)
        if img.shape[0] < h or img.shape[1] < w:
            raise ImageCodecError("JPEG-in-TIFF strips smaller than the image")
        img = img[:h, :w]
        if samples == 1:
            return img.reshape(h, w)
        return img
    else:
        raise ImageCodecError(
            f"unsupported TIFF Compression={comp} (1/5/7/8/32946/32773 "
            "decode natively)"
        )
    buf = b"".join(decoded)
    need = w * h * samples
    if len(buf) < need:
        raise ImageCodecError("TIFF strip payload shorter than image")
    arr = np.frombuffer(buf, dtype=np.uint8, count=need)
    img = arr.reshape((h, w, samples)).copy()
    if predictor == 2:
        # horizontal differencing: undo with a per-row per-channel cumsum
        img = np.cumsum(img.astype(np.uint32), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise ImageCodecError(f"unsupported TIFF Predictor={predictor}")
    return img if samples == 3 else img.reshape(h, w)


_COMP_IDS = {"none": 1, "lzw": 5, "jpeg": 7, "deflate": 8, "packbits": 32773}


def _read_ifd_raw(data: bytes, endian: str, ifd_off: int, want_tag: int) -> "bytes | None":
    """Raw value bytes of an IFD tag (UNDEFINED/BYTE payloads like
    JPEGTables, which the integer-oriented reader cannot carry)."""
    (n_entries,) = struct.unpack_from(endian + "H", data, ifd_off)
    for i in range(n_entries):
        tag, typ, count = struct.unpack_from(endian + "HHI", data, ifd_off + 2 + 12 * i)
        if tag != want_tag:
            continue
        if count <= 4:
            pos = ifd_off + 2 + 12 * i + 8
        else:
            (pos,) = struct.unpack_from(endian + "I", data, ifd_off + 2 + 12 * i + 8)
        return data[pos : pos + count]
    return None


def encode_tiff(
    img: np.ndarray,
    big_endian: bool = False,
    compression: str = "none",
    predictor: bool = False,
) -> bytes:
    """uint8 [H, W] or [H, W, 3] → minimal single-strip TIFF; ``compression``
    in {none, lzw, deflate, packbits}, optional horizontal predictor."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        samples, photometric = 1, 1  # BlackIsZero
    elif img.ndim == 3 and img.shape[2] == 3:
        samples, photometric = 3, 2  # RGB
    else:
        raise ImageCodecError(f"unsupported array shape {img.shape}")
    endian = ">" if big_endian else "<"
    h, w = img.shape[:2]
    comp = _COMP_IDS.get(compression)
    if comp is None:
        raise ImageCodecError(f"unknown compression {compression!r}")
    payload = img.reshape(h, w, samples)
    if predictor:
        payload = np.diff(
            payload.astype(np.int16), axis=1, prepend=np.zeros((h, 1, samples), np.int16)
        ).astype(np.uint8)
    pixel_data = payload.tobytes()
    if comp == 7:
        from .jpeg import encode_jpeg

        pixel_data = encode_jpeg(img, quality=95)
    elif comp == 5:
        from .pdf import _lzw_encode

        pixel_data = _lzw_encode(pixel_data, early=1)
    elif comp == 8:
        pixel_data = zlib.compress(pixel_data, 6)
    elif comp == 32773:
        pixel_data = _packbits_encode(pixel_data)
    # layout: header (8) | pixel data | BitsPerSample array (if RGB) | IFD
    pix_off = 8
    bits_off = pix_off + len(pixel_data)
    entries = [
        (_TAG_WIDTH, 4, 1, w),
        (_TAG_HEIGHT, 4, 1, h),
        (_TAG_BITS, 3, samples, bits_off if samples == 3 else 8),
        (_TAG_COMPRESSION, 3, 1, comp),
        (_TAG_PHOTOMETRIC, 3, 1, photometric),
        (_TAG_STRIP_OFFSETS, 4, 1, pix_off),
        (_TAG_SAMPLES, 3, 1, samples),
        (_TAG_ROWS_PER_STRIP, 4, 1, h),
        (_TAG_STRIP_COUNTS, 4, 1, len(pixel_data)),
    ]
    if predictor:
        entries.append((_TAG_PREDICTOR, 3, 1, 2))
    bits_blob = struct.pack(endian + "HHH", 8, 8, 8) if samples == 3 else b""
    # pad the external bits array to a word boundary for tidiness
    if len(bits_blob) % 2:
        bits_blob += b"\x00"
    ifd_off = bits_off + len(bits_blob)
    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        endian + "I", ifd_off
    )
    out += pixel_data
    out += bits_blob
    out += struct.pack(endian + "H", len(entries))
    for tag, typ, count, value in sorted(entries):
        if typ == 3 and count == 1:
            val_bytes = struct.pack(endian + "HH", value, 0)
        else:
            val_bytes = struct.pack(endian + "I", value)
        out += struct.pack(endian + "HHI", tag, typ, count) + val_bytes
    out += struct.pack(endian + "I", 0)  # no next IFD
    return bytes(out)
