"""Pure-Python/numpy baseline-TIFF codec (TIFF 6.0, uncompressed).

Closes another slice of the reference's cv2-backed decode surface
(``mapper/misc.py:41-107``) without external libraries: both byte orders,
8-bit greyscale and RGB, multi-strip files. Compressed TIFF (LZW/JPEG/
Deflate variants) raises :class:`ImageCodecError` honestly — at 100 TB the
decode stage needs a real codec lib for those; the container parsing,
strip assembly and schema plumbing here are the part the engine owns.
"""

from __future__ import annotations

import struct

import numpy as np


class ImageCodecError(ValueError):
    pass


_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

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
    """Uncompressed baseline TIFF → uint8 [H, W] (grey) or [H, W, 3] (RGB)."""
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
    if not w or not h:
        raise ImageCodecError("TIFF missing ImageWidth/ImageLength")
    if comp != 1:
        raise ImageCodecError(
            f"only uncompressed TIFF supported (Compression={comp})"
        )
    if any(b != 8 for b in bits):
        raise ImageCodecError(f"only 8-bit TIFF supported (BitsPerSample={bits})")
    if samples not in (1, 3):
        raise ImageCodecError(f"unsupported SamplesPerPixel={samples}")
    offsets = tags.get(_TAG_STRIP_OFFSETS, [])
    counts = tags.get(_TAG_STRIP_COUNTS, [])
    if not offsets:
        raise ImageCodecError("TIFF missing StripOffsets")
    if not counts:
        counts = [w * h * samples]  # single strip, implicit size
    buf = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    need = w * h * samples
    if len(buf) < need:
        raise ImageCodecError("TIFF strip payload shorter than image")
    arr = np.frombuffer(buf, dtype=np.uint8, count=need)
    return arr.reshape((h, w, 3) if samples == 3 else (h, w)).copy()


def encode_tiff(img: np.ndarray, big_endian: bool = False) -> bytes:
    """uint8 [H, W] or [H, W, 3] → minimal single-strip uncompressed TIFF."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        samples, photometric = 1, 1  # BlackIsZero
    elif img.ndim == 3 and img.shape[2] == 3:
        samples, photometric = 3, 2  # RGB
    else:
        raise ImageCodecError(f"unsupported array shape {img.shape}")
    endian = ">" if big_endian else "<"
    h, w = img.shape[:2]
    pixel_data = img.tobytes()
    # layout: header (8) | pixel data | BitsPerSample array (if RGB) | IFD
    pix_off = 8
    bits_off = pix_off + len(pixel_data)
    entries = [
        (_TAG_WIDTH, 4, 1, w),
        (_TAG_HEIGHT, 4, 1, h),
        (_TAG_BITS, 3, samples, bits_off if samples == 3 else 8),
        (_TAG_COMPRESSION, 3, 1, 1),
        (_TAG_PHOTOMETRIC, 3, 1, photometric),
        (_TAG_STRIP_OFFSETS, 4, 1, pix_off),
        (_TAG_SAMPLES, 3, 1, samples),
        (_TAG_ROWS_PER_STRIP, 4, 1, h),
        (_TAG_STRIP_COUNTS, 4, 1, len(pixel_data)),
    ]
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
