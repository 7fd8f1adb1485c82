"""Pure-Python AES (FIPS-197) + CBC mode — for PDF Standard-handler crypt.

The PDF spec's AESV2 (AES-128-CBC, §7.6.2 Algorithm 1 with the `sAlT`
suffix) and AESV3 (AES-256-CBC, §7.6.3 / ISO 32000-2 Algorithm 2.A) crypt
filters need a block cipher; this container has no crypto libs, so the
standard algorithm is implemented from the public FIPS-197 specification.
Streams in test PDFs are small — clarity over throughput; the per-block work
is table lookups and XORs.

Parity target: the reference decrypts these files through pypdfium2
(`dd_core/utils/pdf_utils.py:168-331` capability); this module is what lets
the pure-Python parser match it on encrypted inputs.
"""

from __future__ import annotations

__all__ = ["aes_cbc_decrypt", "aes_cbc_encrypt", "aes_cbc_encrypt_nopad"]

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytes(256)
_inv = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _inv[_v] = _i
_INV_SBOX = bytes(_inv)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


# GF(2^8) multiply tables for the mix-columns coefficients
def _mul_table(c: int) -> bytes:
    t = bytearray(256)
    for x in range(256):
        acc, a, b = 0, x, c
        while b:
            if b & 1:
                acc ^= a
            a = _xtime(a)
            b >>= 1
        t[x] = acc
    return bytes(t)


_M2, _M3 = _mul_table(2), _mul_table(3)
_M9, _M11, _M13, _M14 = _mul_table(9), _mul_table(11), _mul_table(13), _mul_table(14)


def _expand_key(key: bytes) -> list[bytes]:
    """Key schedule → list of 16-byte round keys."""
    nk = len(key) // 4
    assert nk in (4, 6, 8), "AES-128/192/256 only"
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes([t[0] ^ _RCON[i // nk - 1], t[1], t[2], t[3]])
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)]


def _encrypt_block(rk: list[bytes], block: bytes) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rk[0]))
    nr = len(rk) - 1
    for rnd in range(1, nr):
        # sub-bytes + shift-rows
        t = bytes(
            _SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)
        )
        # mix-columns + add-round-key
        k = rk[rnd]
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c : 4 * c + 4]
            s[4 * c + 0] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3 ^ k[4 * c + 0]
            s[4 * c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3 ^ k[4 * c + 1]
            s[4 * c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3] ^ k[4 * c + 2]
            s[4 * c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3] ^ k[4 * c + 3]
    k = rk[nr]
    return bytes(
        _SBOX[s[(i + 4 * (i % 4)) % 16]] ^ k[i] for i in range(16)
    )


def _decrypt_block(rk: list[bytes], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[nr]))
    for rnd in range(nr - 1, 0, -1):
        # inv-shift-rows + inv-sub-bytes
        t = bytes(_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16))
        # add-round-key + inv-mix-columns
        k = rk[rnd]
        for c in range(4):
            a0 = t[4 * c + 0] ^ k[4 * c + 0]
            a1 = t[4 * c + 1] ^ k[4 * c + 1]
            a2 = t[4 * c + 2] ^ k[4 * c + 2]
            a3 = t[4 * c + 3] ^ k[4 * c + 3]
            s[4 * c + 0] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            s[4 * c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            s[4 * c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            s[4 * c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
    k = rk[0]
    return bytes(_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] ^ k[i] for i in range(16))


def aes_cbc_decrypt(key: bytes, data: bytes, strip_padding: bool = True) -> bytes:
    """CBC decrypt where ``data`` = IV || ciphertext (the PDF layout);
    strips PKCS#7 padding unless told otherwise."""
    if len(data) < 16 or len(data) % 16:
        raise ValueError("AES-CBC data must be IV + whole blocks")
    rk = _expand_key(key)
    iv, ct = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        blk = ct[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, blk), prev))
        prev = blk
    if not strip_padding:
        return bytes(out)
    if not out:
        return b""
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES-CBC padding")
    return bytes(out[:-pad])


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt with PKCS#7 padding; returns IV || ciphertext."""
    pad = 16 - len(data) % 16
    return aes_cbc_encrypt_nopad(key, iv, data + bytes([pad]) * pad)


def aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt of already-block-aligned data; returns IV || ciphertext.
    (The R6 key derivation and the /UE //OE wrapping encrypt unpadded.)"""
    if len(data) % 16:
        raise ValueError("data must be block-aligned")
    rk = _expand_key(key)
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(rk, blk)
        out += prev
    return bytes(out)
