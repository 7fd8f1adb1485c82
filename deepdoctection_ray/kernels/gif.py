"""Pure-Python/numpy GIF codec (GIF87a/89a, first frame).

The third LZW dialect in this repo (PDF streams are MSB-first with
EarlyChange; GIF packs codes LSB-first with clear/EOI bookkeeping per the
GIF89a spec appendix). Decode supports global/local palettes, interlace,
and multi-sub-block data; animated files decode their first image
descriptor. The encoder writes a real LZW stream (table resets at the
12-bit ceiling) so round trips exercise the decoder's full width schedule.
"""

from __future__ import annotations

import struct

import numpy as np


class ImageCodecError(ValueError):
    pass


def _lzw_decode_gif(data: bytes, min_code: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, clear=2^min, EOI=clear+1,
    width grows when the next free slot reaches 2^width (max 12)."""
    clear = 1 << min_code
    eoi = clear + 1
    singles = [bytes([i]) for i in range(clear)]

    out = bytearray()
    table: list[bytes] = []
    width = min_code + 1
    prev: int | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = singles + [b"", b""]
        width = min_code + 1
        prev = None

    reset()
    bitbuf = bits = 0
    for byte in data:
        bitbuf |= byte << bits
        bits += 8
        while bits >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            bits -= width
            if code == clear:
                reset()
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= len(table) or code >= clear:
                    raise ImageCodecError("corrupt GIF LZW (bad first code)")
                out += table[code]
                prev = code
                continue
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ImageCodecError("corrupt GIF LZW (code out of range)")
            out += entry
            if len(table) < 4096:
                table.append(table[prev] + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = code
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
    return bytes(out)


def _lzw_encode_gif(data: bytes, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    bitbuf = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bits
        bitbuf |= code << bits
        bits += width
        while bits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bits -= 8

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(clear)}, clear + 2, min_code + 1

    table, next_code, width = fresh()
    emit(clear, width)
    seq = b""
    for byte in data:
        cand = seq + bytes([byte])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # decoder trails one entry behind: it widens for the NEXT read
            # when its slot count hits 2^width, i.e. when our count passes it
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        seq = bytes([byte])
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if bits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(idx)
    out[np.array(order)] = idx
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF → uint8 [H, W, 3] RGB."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageCodecError("not a GIF (bad signature)")
    pos = 6
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", data, pos)
    pos += 7
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ImageCodecError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ImageCodecError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        raw = _lzw_decode_gif(bytes(lzw), min_code, w * h)
        if len(raw) < w * h:
            raise ImageCodecError("GIF pixel data truncated")
        idx = np.frombuffer(raw, np.uint8).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(pal):
            raise ImageCodecError("GIF palette index out of range")
        return pal[idx]
    raise ImageCodecError("GIF contains no image descriptor")


def encode_gif(img: np.ndarray) -> bytes:
    """uint8 [H, W, 3] RGB (≤ 256 distinct colors) or [H, W] grey → GIF89a."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ImageCodecError(f"unsupported array shape {img.shape}")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ImageCodecError(f"GIF needs a <=256-color palette (got {len(pal)})")
    pal_bits = max(1, int(len(pal) - 1).bit_length())
    n_pal = 1 << pal_bits
    pal_full = np.zeros((n_pal, 3), np.uint8)
    pal_full[: len(pal)] = pal
    min_code = max(2, pal_bits)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal_full.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    lzw = _lzw_encode_gif(idx.astype(np.uint8).tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
