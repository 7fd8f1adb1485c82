"""Pure-Python PDF container parsing: page split + text-layer extraction.

Replaces the reference's pypdfium2/pdfplumber dependencies for the
uncompressed / FlateDecode case (neither library exists in this
environment; the PDF 1.4+ container format is a public spec):

- ``PdfReader``  — classic xref table(s) (incl. /Prev chains), object
  parser (dicts, arrays, literal/hex strings, names, numbers, indirect
  refs, streams with indirect /Length), page-tree walk with inherited
  MediaBox, content-stream text extraction (BT/ET, Tf, Td, TD, TL, Tm,
  T*, Tj, ', TJ) with text-matrix positions. Reference semantics:
  ``PdfPlumberTextDetector.predict`` (``extern/pdftext.py:50-135``) —
  word records with page-relative boxes; ``PDFStreamer`` page split
  (``dd_core/utils/pdf_utils.py:406-545``).
- ``PdfWriter`` — minimal single-xref PDF writer (Helvetica, one Tj per
  word, optional Flate-compressed content) used to synthesize
  deterministic fixtures AND to re-serialize single-page documents for
  the per-page split (``SerializerPdfDoc.load`` contract,
  ``custom_serialize.py:658-717``).

PDF 1.5+ container features are parsed natively (public spec §7.5.7-7.5.8):
cross-reference STREAMS (``/Type /XRef`` with ``/W`` field widths,
``/Index`` subsections, FlateDecode + PNG row predictors 10-15), hybrid
files (``/XRefStm`` in a classic trailer), and OBJECT streams
(``/Type /ObjStm`` with ``/N``/``/First`` header pairs) — the layout every
post-2005 writer emits. ``write_pdf(..., xref_stream=True)`` emits that
modern layout (dict objects packed in one ObjStm, Flate+Up-predictor xref
stream) so fixtures exercise both paths. Reference capability:
``dd_core/utils/pdf_utils.py:406-545`` (via pypdfium2).

Encrypted documents using the Standard security handler decrypt
transparently with the empty user password, matching the reference's
decrypt capability (``pdf_utils.py:168-331``): RC4 V1/V2 R2/R3 (spec
§7.6.3, pure hashlib+RC4), AES-128 V4/R4 ``/AESV2`` (per-object key with
the ``sAlT`` suffix, CBC with leading IV), and AES-256 V5/R5/R6 ``/AESV3``
(SHA-2 key derivation incl. the R6 Algorithm-2.B iterated hash; /Perms
integrity check). The AES block cipher is the public FIPS-197 algorithm
(``kernels/aes.py``). ``write_pdf(encrypt="rc4"|"aesv2"|"aes256")``
produces each layout for fixtures.

Limitations (documented, raise loudly): password-locked documents (a
non-empty user password fails /U validation), public-key (non-Standard)
handlers. Word boxes use the nominal glyph advance 0.5*size per char
(Helvetica-average) — deterministic, so the differential golden path is
exact even though widths are approximate.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["PdfReader", "write_pdf", "PdfError"]


class PdfError(ValueError):
    pass


# ------------------------------------------------- standard security handler

_PW_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
        0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (public algorithm; symmetric, used for both the
    decrypt path and the fixture-writer encrypt path)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_file_key(
    password: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_len: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Spec §7.6.3.3 Algorithm 2: the file encryption key."""
    import hashlib

    h = hashlib.md5()
    h.update((password + _PW_PAD)[:32])
    h.update(o_entry[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def _std_user_check(key: bytes, id0: bytes, r: int) -> bytes:
    """Spec Algorithms 4 (R2) / 5 (R3): the expected /U entry."""
    import hashlib

    if r == 2:
        return _rc4(key, _PW_PAD)
    digest = hashlib.md5(_PW_PAD + id0).digest()
    u = _rc4(key, digest)
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def _object_key(file_key: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    """Spec §7.6.2 Algorithm 1: the per-object key (``sAlT`` suffix for
    the AESV2 crypt filter)."""
    import hashlib

    h = hashlib.md5(
        file_key
        + num.to_bytes(3, "little")
        + gen.to_bytes(2, "little")
        + (b"sAlT" if aes else b"")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _r6_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B: the R6 iterated SHA-2 hash (the hardened
    replacement for R5's single SHA-256). Needs AES-128-CBC encryption
    inside the loop — kernels/aes.py provides it."""
    import hashlib

    from .aes import aes_cbc_encrypt_nopad

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)[16:]  # drop IV prefix
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _std_owner_entry(owner_pw: bytes, user_pw: bytes, r: int, key_len: int) -> bytes:
    """Spec Algorithm 3: the /O entry (writer side, for fixtures)."""
    import hashlib

    h = hashlib.md5((owner_pw + _PW_PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:key_len]
    o = _rc4(key, (user_pw + _PW_PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in key), o)
    return o


class _EncryptionParams:
    """Writer-side bundle: file key + the /Encrypt dict + trailer /ID, for
    the Standard handler layouts ``_setup_encryption`` accepts, with empty
    user/owner passwords: ``rc4`` (V2/R3 RC4-128), ``aesv2`` (V4/R4
    AES-128-CBC) and ``aes256`` (V5/R6 AES-256, R6 iterated-hash entries).
    IVs/salts are deterministic functions of /ID so fixtures are
    byte-reproducible."""

    def __init__(self, id0: bytes, mode: str = "rc4") -> None:
        import hashlib

        assert mode in ("rc4", "rc4v4", "aesv2", "aes256")
        self.id0 = id0
        self.mode = mode
        self.p = -44
        if mode == "aes256":
            self.v, self.r, self.key_len = 5, 6, 32
            self.file_key = hashlib.sha256(id0 + b"filekey").digest()
            salt = lambda tag: hashlib.sha256(id0 + tag).digest()[:8]  # noqa: E731
            vs, ks = salt(b"user-vs"), salt(b"user-ks")
            self.u_entry = _r6_hash(b"", vs) + vs + ks
            from .aes import aes_cbc_encrypt_nopad

            self.ue_entry = aes_cbc_encrypt_nopad(
                _r6_hash(b"", ks), bytes(16), self.file_key
            )[16:]
            vso, kso = salt(b"owner-vs"), salt(b"owner-ks")
            self.o_entry = _r6_hash(b"", vso, self.u_entry) + vso + kso
            self.oe_entry = aes_cbc_encrypt_nopad(
                _r6_hash(b"", kso, self.u_entry), bytes(16), self.file_key
            )[16:]
            perms_blk = (
                (self.p & 0xFFFFFFFF).to_bytes(4, "little")
                + b"\xff\xff\xff\xff"
                + b"T"
                + b"adb"
                + hashlib.md5(id0 + b"perms").digest()[:4]
            )
            self.perms_entry = aes_cbc_encrypt_nopad(self.file_key, bytes(16), perms_blk)[16:]
        else:
            self.v, self.r = (4, 4) if mode in ("aesv2", "rc4v4") else (2, 3)
            self.key_len = 16
            self.o_entry = _std_owner_entry(b"", b"", self.r, self.key_len)
            self.file_key = _std_file_key(
                b"", self.o_entry, self.p, id0, self.r, self.key_len
            )
            self.u_entry = _std_user_check(self.file_key, id0, self.r)

    def _iv(self, num: int) -> bytes:
        import hashlib

        return hashlib.md5(self.id0 + num.to_bytes(4, "little")).digest()

    def encrypt_stream(self, num: int, body: bytes) -> bytes:
        if self.mode in ("rc4", "rc4v4"):
            return _rc4(_object_key(self.file_key, num, 0), body)
        from .aes import aes_cbc_encrypt

        if self.mode == "aesv2":
            return aes_cbc_encrypt(
                _object_key(self.file_key, num, 0, aes=True), self._iv(num), body
            )
        return aes_cbc_encrypt(self.file_key, self._iv(num), body)

    def dict_bytes(self) -> bytes:
        if self.mode == "rc4":
            return (
                f"<< /Filter /Standard /V {self.v} /R {self.r} /Length {self.key_len * 8} "
                f"/P {self.p} /O <{self.o_entry.hex()}> /U <{self.u_entry.hex()}> >>"
            ).encode()
        if self.mode == "aesv2":
            return (
                f"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                f"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> "
                f"/StmF /StdCF /StrF /StdCF "
                f"/P {self.p} /O <{self.o_entry.hex()}> /U <{self.u_entry.hex()}> >>"
            ).encode()
        if self.mode == "rc4v4":
            # V4 RC4 carrying the key length ONLY in StdCF /Length (bytes) —
            # the common real-file shape; no document-level /Length at all
            return (
                f"<< /Filter /Standard /V 4 /R 4 "
                f"/CF << /StdCF << /CFM /V2 /AuthEvent /DocOpen /Length 16 >> >> "
                f"/StmF /StdCF /StrF /StdCF "
                f"/P {self.p} /O <{self.o_entry.hex()}> /U <{self.u_entry.hex()}> >>"
            ).encode()
        return (
            f"<< /Filter /Standard /V 5 /R 6 /Length 256 "
            f"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
            f"/StmF /StdCF /StrF /StdCF /P {self.p} "
            f"/O <{self.o_entry.hex()}> /U <{self.u_entry.hex()}> "
            f"/OE <{self.oe_entry.hex()}> /UE <{self.ue_entry.hex()}> "
            f"/Perms <{self.perms_entry.hex()}> >>"
        ).encode()

    def trailer_extra(self, enc_num: int) -> str:
        return f"/Encrypt {enc_num} 0 R /ID [<{self.id0.hex()}> <{self.id0.hex()}>] "


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer over the raw byte buffer (shared by object and content
    stream parsing)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def read_token(self) -> bytes:
        self.skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return b""
        c = d[self.pos]
        if c == 0x3C and self.pos + 1 < n and d[self.pos + 1] == 0x3C:
            self.pos += 2
            return b"<<"
        if c == 0x3E and self.pos + 1 < n and d[self.pos + 1] == 0x3E:
            self.pos += 2
            return b">>"
        if c in b"[]()<>/":
            self.pos += 1
            return bytes([c])
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        return d[start : self.pos]


def _parse_object(lx: _Lexer):
    """Parse one PDF object at the lexer position (recursive descent)."""
    lx.skip_ws()
    d = lx.data
    tok = lx.read_token()
    if tok == b"<<":
        out = {}
        while True:
            lx.skip_ws()
            if d[lx.pos : lx.pos + 2] == b">>":
                lx.pos += 2
                return out
            key = _parse_object(lx)
            out[key] = _parse_object(lx)
    if tok == b"[":
        arr = []
        while True:
            lx.skip_ws()
            if d[lx.pos] == 0x5D:  # ']'
                lx.pos += 1
                return arr
            arr.append(_parse_object(lx))
    if tok == b"/":
        name = lx.read_token()
        return "/" + name.decode("latin-1")
    if tok == b"(":
        return _parse_literal_string(lx)
    if tok == b"<":
        end = d.index(b">", lx.pos)
        hexs = re.sub(rb"\s", b"", d[lx.pos : end])
        lx.pos = end + 1
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii"))
    if tok in (b"true", b"false"):
        return tok == b"true"
    if tok == b"null":
        return None
    # number or indirect reference "a b R"
    try:
        num = int(tok)
    except ValueError:
        try:
            return float(tok)
        except ValueError as exc:
            raise PdfError(f"unexpected token {tok!r} at {lx.pos}") from exc
    save = lx.pos
    tok2 = lx.read_token()
    if re.fullmatch(rb"\d+", tok2 or b"x"):
        tok3 = lx.read_token()
        if tok3 == b"R":
            return ("ref", num, int(tok2))
    lx.pos = save
    return num


def _parse_literal_string(lx: _Lexer) -> bytes:
    d = lx.data
    out = bytearray()
    depth = 1
    while depth:
        c = d[lx.pos]
        lx.pos += 1
        if c == 0x5C:  # backslash
            e = d[lx.pos]
            lx.pos += 1
            mapping = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
            if e in mapping:
                out.append(mapping[e])
            elif e in b"()\\":
                out.append(e)
            elif 0x30 <= e <= 0x37:  # octal
                oct_digits = [e]
                while len(oct_digits) < 3 and 0x30 <= d[lx.pos] <= 0x37:
                    oct_digits.append(d[lx.pos])
                    lx.pos += 1
                out.append(int(bytes(oct_digits), 8) & 0xFF)
            # else: backslash swallowed (incl. line continuation)
        elif c == 0x28:
            depth += 1
            out.append(c)
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
        else:
            out.append(c)
    return bytes(out)


class PdfReader:
    """Parse a PDF byte buffer: xref chain → objects → page tree → text."""

    def __init__(self, data: bytes) -> None:
        if not data.startswith(b"%PDF"):
            raise PdfError("not a PDF (missing %PDF header)")
        self.data = data
        self._cache: dict[tuple[int, int], object] = {}
        self._objstm_cache: dict[int, tuple[bytes, int, list]] = {}
        self.xref: dict = {}  # populated below; resolve() during xref parse sees {}
        self._file_key: bytes | None = None
        self.xref, self.trailer = self._load_xref_chain()
        self._setup_encryption()
        root = self.resolve(self.trailer.get("/Root"))
        if not isinstance(root, dict):
            raise PdfError("missing document catalog")
        self._page_refs: list[tuple[int, int]] = []
        self._collect_pages(root.get("/Pages"), inherited={})
        self._inherited: list[dict] = self._page_inherits

    # ------------------------------------------------------------- structure

    def _load_xref_chain(self) -> tuple[dict, dict]:
        """Walk the xref chain (newest section first wins), dispatching per
        section on classic ``xref`` tables vs PDF-1.5 xref STREAMS; classic
        trailers' ``/XRefStm`` (hybrid files) is processed before ``/Prev``
        per spec §7.5.8.4. Entries are ``offset:int`` (direct object) or
        ``("objstm", stream_num, index)`` (compressed object)."""
        tail = self.data[-2048:]
        m = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not m:
            raise PdfError("startxref not found")
        offset = int(m[-1].group(1))
        xref: dict = {}
        trailer_out: dict = {}
        seen = set()
        while offset and offset not in seen:
            seen.add(offset)
            lx = _Lexer(self.data, offset)
            save = lx.pos
            tok = lx.read_token()
            if tok == b"xref":
                trailer = self._parse_xref_table(lx, xref)
                xref_stm = trailer.get("/XRefStm")
                if xref_stm is not None:  # hybrid file: stream fills the gaps
                    self._parse_xref_stream(int(xref_stm), xref)
            else:
                lx.pos = save
                trailer = self._parse_xref_stream(offset, xref)
            if not trailer_out:
                trailer_out = trailer
            offset = trailer.get("/Prev", 0)
        return xref, trailer_out

    def _parse_xref_table(self, lx: _Lexer, xref: dict) -> dict:
        """Classic ``xref`` table section; returns its trailer dict."""
        while True:
            lx.skip_ws()
            if self.data[lx.pos : lx.pos + 7] == b"trailer":
                lx.pos += 7
                break
            first = int(lx.read_token())
            count = int(lx.read_token())
            lx.skip_ws()
            for i in range(count):
                entry = self.data[lx.pos : lx.pos + 20]
                lx.pos += 20
                off, _gen, kind = entry[:10], entry[11:16], entry[17:18]
                if kind == b"n" and (first + i) not in xref:
                    xref[first + i] = int(off)
        return _parse_object(lx)

    def _parse_xref_stream(self, offset: int, xref: dict) -> dict:
        """PDF-1.5 cross-reference stream (``/Type /XRef``): binary rows of
        ``/W``-wide fields over ``/Index`` subsections, usually Flate- and
        predictor-coded. Returns the stream dict (it doubles as trailer)."""
        lx = _Lexer(self.data, offset)
        lx.read_token()  # object number
        lx.read_token()  # generation
        if lx.read_token() != b"obj":
            raise PdfError(f"malformed xref stream object at offset {offset}")
        meta = _parse_object(lx)
        lx.skip_ws()
        if self.data[lx.pos : lx.pos + 6] != b"stream":
            raise PdfError("xref stream object has no stream body")
        lx.pos += 6
        raw = self._read_stream_raw(lx, meta)
        data = _Stream(meta, raw).decoded(self)
        w = [int(self.resolve(v)) for v in self.resolve(meta.get("/W", []))]
        if len(w) != 3:
            raise PdfError(f"xref stream /W must have 3 fields, got {w}")
        size = int(self.resolve(meta.get("/Size", 0)))
        index = [int(self.resolve(v)) for v in self.resolve(meta.get("/Index", [0, size]))]
        row_len = sum(w)
        pos = 0

        def field(width: int) -> int:
            nonlocal pos
            if width == 0:
                return -1  # absent field: type defaults to 1 (spec)
            v = int.from_bytes(data[pos : pos + width], "big")
            pos += width
            return v

        for first, count in zip(index[0::2], index[1::2]):
            for i in range(count):
                if pos + row_len > len(data):
                    raise PdfError("truncated xref stream data")
                t = field(w[0])
                if t == -1:
                    t = 1
                f2 = field(w[1])
                f3 = field(w[2])
                num = first + i
                if num in xref:
                    continue
                if t == 1:
                    xref[num] = f2
                elif t == 2:
                    xref[num] = ("objstm", f2, f3)
                # type 0 (free) and unknown types: skip
        return meta

    def _read_stream_raw(self, lx: _Lexer, meta: dict) -> bytes:
        """Raw stream bytes after the ``stream`` keyword at ``lx.pos``.
        ``/Length`` may be an indirect ref into a not-yet-built xref (legal
        in the xref stream itself) — fall back to scanning ``endstream``."""
        if self.data[lx.pos : lx.pos + 2] == b"\r\n":
            lx.pos += 2
        elif self.data[lx.pos : lx.pos + 1] == b"\n":
            lx.pos += 1
        length = meta.get("/Length")
        if isinstance(length, tuple):  # indirect — resolvable only post-xref
            try:
                length = self.resolve(length)
            except Exception:
                length = None
        if isinstance(length, (int, float)):
            return self.data[lx.pos : lx.pos + int(length)]
        end = self.data.index(b"endstream", lx.pos)
        raw = self.data[lx.pos : end]
        return raw.rstrip(b"\r\n")

    def _setup_encryption(self) -> None:
        """Standard security handler (spec §7.6.3 / ISO 32000-2 §7.6.4):
        RC4 V1/V2 R2/R3, AES-128 V4/R4 (/AESV2) and AES-256 V5/R5/R6
        (/AESV3), empty user password — the reference's decrypt capability
        (``pdf_utils.py:168-331``). Verifies /U before accepting the key so
        password-locked files fail loudly instead of yielding garbage."""
        enc_ref = self.trailer.get("/Encrypt")
        if enc_ref is None:
            return
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            raise PdfError("malformed /Encrypt dictionary")
        if self.resolve(enc.get("/Filter")) != "/Standard":
            raise PdfError("only the Standard security handler is supported")
        v = int(self.resolve(enc.get("/V", 0)))
        r = int(self.resolve(enc.get("/R", 2)))
        o_entry = self.resolve(enc.get("/O")) or b""
        u_entry = self.resolve(enc.get("/U")) or b""
        p_val = int(self.resolve(enc.get("/P", -1)))
        ids = self.resolve(self.trailer.get("/ID")) or []
        id0 = self.resolve(ids[0]) if ids else b""
        if not isinstance(id0, bytes):
            id0 = b""

        if v == 5 and r in (5, 6):
            self._setup_aes256(enc, o_entry, u_entry, p_val, r)
            return

        if v == 4:
            cf = self.resolve(enc.get("/CF")) or {}
            stdcf = self.resolve(cf.get("/StdCF")) or {}
            cfm = self.resolve(stdcf.get("/CFM"))
            stmf = self.resolve(enc.get("/StmF", "/Identity"))
            if stmf != "/StdCF":
                raise PdfError(f"unsupported stream crypt filter {stmf}")
            if cfm == "/AESV2":
                self._crypt_method = "aesv2"
            elif cfm == "/V2":
                self._crypt_method = "rc4"
            else:
                raise PdfError(f"unsupported crypt filter method {cfm}")
            # the crypt filter's own /Length wins when present — real V4
            # files commonly carry it ONLY there, in BYTES (values <= 40 are
            # read as bytes per the common convention; larger values as bits);
            # fall back to the document-level /Length (bits)
            cf_len = self.resolve(stdcf.get("/Length"))
            if cf_len is not None:
                cf_len = int(cf_len)
                key_len = cf_len if cf_len <= 40 else cf_len // 8
            else:
                key_len = int(self.resolve(enc.get("/Length", 128))) // 8
        elif v in (1, 2) and r in (2, 3):
            self._crypt_method = "rc4"
            key_len = int(self.resolve(enc.get("/Length", 40))) // 8 if v == 2 else 5
        else:
            raise PdfError(f"unsupported encryption V={v} R={r}")

        encrypt_metadata = self.resolve(enc.get("/EncryptMetadata", True))
        key = _std_file_key(
            b"", o_entry, p_val, id0, r, key_len,
            encrypt_metadata=bool(encrypt_metadata),
        )
        expect = _std_user_check(key, id0, r)
        ok = expect[:16] == u_entry[:16] if r >= 3 else expect == u_entry[:32]
        if not ok:
            raise PdfError("encrypted PDF requires a password (empty user password failed)")
        self._file_key = key

    def _setup_aes256(self, enc: dict, o_entry: bytes, u_entry: bytes, p_val: int, r: int) -> None:
        """AES-256 Standard handler (V5): validate the empty user password
        against /U, unwrap the file key from /UE, check /Perms integrity
        (R6 uses the Algorithm-2.B iterated hash; R5 a single SHA-256)."""
        import hashlib

        from .aes import aes_cbc_decrypt

        if len(u_entry) < 48:
            raise PdfError("malformed AES-256 /U entry")
        ue = self.resolve(enc.get("/UE")) or b""
        vsalt, ksalt = u_entry[32:40], u_entry[40:48]
        if r == 6:
            check = _r6_hash(b"", vsalt)
            inter = _r6_hash(b"", ksalt)
        else:
            check = hashlib.sha256(b"" + vsalt).digest()
            inter = hashlib.sha256(b"" + ksalt).digest()
        if check != u_entry[:32]:
            raise PdfError("encrypted PDF requires a password (empty user password failed)")
        key = aes_cbc_decrypt(inter, bytes(16) + ue[:32], strip_padding=False)
        perms = self.resolve(enc.get("/Perms"))
        if isinstance(perms, bytes) and len(perms) >= 16:
            blk = aes_cbc_decrypt(key, bytes(16) + perms[:16], strip_padding=False)
            if blk[9:12] != b"adb":
                raise PdfError("/Perms integrity check failed (wrong file key)")
        self._crypt_method = "aesv3"
        self._file_key = key

    def resolve(self, obj):
        while isinstance(obj, tuple) and obj and obj[0] == "ref":
            obj = self.get_object(obj[1], obj[2])
        return obj

    def get_object(self, num: int, gen: int = 0):
        key = (num, gen)
        if key in self._cache:
            return self._cache[key]
        entry = self.xref.get(num)
        if entry is None:
            return None
        if isinstance(entry, tuple):  # ("objstm", stream_num, index)
            value = self._objstm_object(entry[1], entry[2], num)
            self._cache[key] = value
            return value
        off = entry
        lx = _Lexer(self.data, off)
        lx.read_token()  # obj number
        lx.read_token()  # generation
        if lx.read_token() != b"obj":
            raise PdfError(f"malformed object {num} at offset {off}")
        value = _parse_object(lx)
        lx.skip_ws()
        if self.data[lx.pos : lx.pos + 6] == b"stream":
            lx.pos += 6
            raw = self._read_stream_raw(lx, value)
            value = _Stream(value, raw, num=num, gen=gen)
        self._cache[key] = value
        return value

    def _objstm_object(self, stm_num: int, idx: int, want_num: int):
        """Object ``idx`` out of object stream ``stm_num`` (``/Type /ObjStm``,
        spec §7.5.7): the decoded stream starts with ``/N`` pairs of
        ``objnum offset`` relative to ``/First``."""
        cached = self._objstm_cache.get(stm_num)
        if cached is None:
            stm = self.get_object(stm_num)
            if not isinstance(stm, _Stream):
                raise PdfError(f"object stream {stm_num} missing or not a stream")
            data = stm.decoded(self)
            n = int(self.resolve(stm.meta.get("/N", 0)))
            first = int(self.resolve(stm.meta.get("/First", 0)))
            hdr = _Lexer(data)
            pairs = [(int(hdr.read_token()), int(hdr.read_token())) for _ in range(n)]
            cached = (data, first, pairs)
            self._objstm_cache[stm_num] = cached
        data, first, pairs = cached
        if not 0 <= idx < len(pairs):
            raise PdfError(f"object stream {stm_num} has no index {idx}")
        obj_num, rel = pairs[idx]
        if obj_num != want_num:
            raise PdfError(
                f"object stream {stm_num}[{idx}] holds obj {obj_num}, xref said {want_num}"
            )
        return _parse_object(_Lexer(data, first + rel))

    def _collect_pages(self, node_ref, inherited: dict) -> None:
        if not hasattr(self, "_page_inherits"):
            self._page_inherits = []
        node = self.resolve(node_ref)
        if not isinstance(node, dict):
            return
        inh = dict(inherited)
        for k in ("/MediaBox", "/Resources", "/Rotate"):
            if k in node:
                inh[k] = node[k]
        if node.get("/Type") == "/Page":
            self._page_refs.append((node_ref[1], node_ref[2]))
            self._page_inherits.append(inh)
            return
        for kid in self.resolve(node.get("/Kids")) or []:
            self._collect_pages(kid, inh)

    @property
    def num_pages(self) -> int:
        return len(self._page_refs)

    # ------------------------------------------------------------------ text

    def page_size(self, i: int) -> tuple[float, float]:
        node = self.get_object(*self._page_refs[i])
        box = self.resolve(node.get("/MediaBox", self._inherited[i].get("/MediaBox")))
        box = [float(self.resolve(v)) for v in box]
        return box[2] - box[0], box[3] - box[1]

    def page_content(self, i: int) -> bytes:
        node = self.get_object(*self._page_refs[i])
        contents = self.resolve(node.get("/Contents"))
        streams = contents if isinstance(contents, list) else [contents]
        out = []
        for s in streams:
            s = self.resolve(s)
            if isinstance(s, _Stream):
                out.append(s.decoded(self))
        return b"\n".join(out)

    def page_words(self, i: int) -> list[dict]:
        """Word records ``{text, x0, top, x1, bottom}`` in pdfplumber's
        top-left coordinate convention (``extern/pdftext.py:98-120``)."""
        width, height = self.page_size(i)
        words: list[dict] = []
        content = self.page_content(i)
        lx = _Lexer(content)
        stack: list = []
        size = 12.0
        leading = 0.0
        tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]  # a b c d e f
        tlm = list(tm)

        def emit(raw: bytes) -> None:
            text = raw.decode("latin-1")
            if not text.strip():
                return
            x, y = tm[4], tm[5]
            w = 0.5 * size * len(text)
            words.append(
                {
                    "text": text,
                    "x0": round(x, 2),
                    "top": round(height - y - size, 2),
                    "x1": round(x + w, 2),
                    "bottom": round(height - y, 2),
                }
            )
            tm[4] += w  # nominal advance

        while lx.pos < len(content):
            lx.skip_ws()
            if lx.pos >= len(content):
                break
            c = content[lx.pos]
            if c in b"([</" or (0x30 <= c <= 0x39) or c in b"+-.":
                stack.append(_parse_object(lx))
                continue
            op = lx.read_token()
            if not op:
                break
            if op == b"Tf" and len(stack) >= 2:
                size = float(stack[-1])
                stack.clear()
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                tx, ty = float(stack[-2]), float(stack[-1])
                if op == b"TD":
                    leading = -ty
                tlm[4] += tx
                tlm[5] += ty
                tm[:] = tlm
                stack.clear()
            elif op == b"TL" and stack:
                leading = float(stack[-1])
                stack.clear()
            elif op == b"Tm" and len(stack) >= 6:
                tlm[:] = [float(v) for v in stack[-6:]]
                tm[:] = tlm
                stack.clear()
            elif op == b"T*":
                tlm[5] -= leading
                tm[:] = tlm
            elif op == b"Tj" and stack:
                emit(stack[-1])
                stack.clear()
            elif op == b"'" and stack:
                tlm[5] -= leading
                tm[:] = tlm
                emit(stack[-1])
                stack.clear()
            elif op == b"TJ" and stack:
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        emit(el)
                    else:  # kerning adjustment, thousandths of size
                        tm[4] -= float(el) / 1000.0 * size
                stack.clear()
            elif op in (b"BT", b"ET"):
                tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
                tlm = list(tm)
                stack.clear()
            else:
                stack.clear()  # ignore all non-text operators
        return words

    def page_lines(self, i: int) -> list[dict]:
        """Line-level records ``{text, x0, top, x1, bottom}`` — the
        ``Pdfmium2TextDetector`` granularity (``extern/pdftext.py:138-232``:
        pypdfium returns whole text objects, i.e. lines, not words). Words
        sharing a baseline (equal ``bottom``) merge left-to-right into one
        record whose box is the union."""
        words = self.page_words(i)
        by_baseline: dict[float, list[dict]] = {}
        for w in words:
            by_baseline.setdefault(w["bottom"], []).append(w)
        lines = []
        for bottom in sorted(by_baseline):
            ws = sorted(by_baseline[bottom], key=lambda w: w["x0"])
            lines.append(
                {
                    "text": " ".join(w["text"] for w in ws),
                    "x0": min(w["x0"] for w in ws),
                    "top": min(w["top"] for w in ws),
                    "x1": max(w["x1"] for w in ws),
                    "bottom": bottom,
                }
            )
        return lines

    def page_pdf_bytes(self, i: int) -> bytes:
        """Re-serialize page ``i`` as a standalone single-page PDF — the
        per-page split contract of ``SerializerPdfDoc.load``
        (``custom_serialize.py:658-717``)."""
        width, height = self.page_size(i)
        return write_pdf(
            [{"width": width, "height": height, "raw_content": self.page_content(i)}]
        )


class _Stream:
    def __init__(self, meta: dict, raw: bytes, num: int | None = None, gen: int = 0) -> None:
        self.meta = meta
        self.raw = raw
        self.num = num
        self.gen = gen

    def decoded(self, reader: PdfReader) -> bytes:
        raw = self.raw
        # decrypt before de-filtering (encryption is outermost, spec §7.6.2);
        # xref streams are never encrypted
        if (
            getattr(reader, "_file_key", None) is not None
            and self.num is not None
            and self.meta.get("/Type") != "/XRef"
        ):
            method = getattr(reader, "_crypt_method", "rc4")
            if method == "rc4":
                raw = _rc4(_object_key(reader._file_key, self.num, self.gen), raw)
            elif method == "aesv2":
                from .aes import aes_cbc_decrypt

                raw = aes_cbc_decrypt(
                    _object_key(reader._file_key, self.num, self.gen, aes=True), raw
                )
            elif method == "aesv3":
                from .aes import aes_cbc_decrypt

                raw = aes_cbc_decrypt(reader._file_key, raw)
            else:  # pragma: no cover - set only by _setup_encryption
                raise PdfError(f"unknown crypt method {method}")
        filt = reader.resolve(self.meta.get("/Filter"))
        if filt is None:
            return raw
        filters = filt if isinstance(filt, list) else [filt]
        parms = reader.resolve(self.meta.get("/DecodeParms"))
        parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
        data = raw
        for f, p in zip(filters, parms_list):
            p = reader.resolve(p)
            if f == "/FlateDecode":
                data = zlib.decompress(data)
            elif f == "/LZWDecode":
                early = 1
                if isinstance(p, dict):
                    early = int(reader.resolve(p.get("/EarlyChange", 1)))
                data = _lzw_decode(data, early)
            elif f == "/ASCIIHexDecode":
                data = _ascii_hex_decode(data)
            elif f == "/ASCII85Decode":
                data = _ascii85_decode(data)
            elif f == "/RunLengthDecode":
                data = _runlength_decode(data)
            else:
                raise PdfError(f"unsupported stream filter {f}")
            if f in ("/FlateDecode", "/LZWDecode"):
                if isinstance(p, dict) and int(reader.resolve(p.get("/Predictor", 1))) > 1:
                    data = _undo_predictor(
                        data,
                        int(reader.resolve(p.get("/Predictor", 1))),
                        int(reader.resolve(p.get("/Columns", 1))),
                        int(reader.resolve(p.get("/Colors", 1))),
                        int(reader.resolve(p.get("/BitsPerComponent", 8))),
                    )
        return data


def _ascii_hex_decode(data: bytes) -> bytes:
    """Spec §7.4.2: hex pairs, whitespace ignored, ``>`` EOD, odd trailing
    digit padded with 0."""
    digits = []
    for b in data:
        c = chr(b)
        if c == ">":
            break
        if c in "0123456789abcdefABCDEF":
            digits.append(c)
        elif b not in _WS:
            raise PdfError(f"invalid ASCIIHex character {c!r}")
    if len(digits) % 2:
        digits.append("0")
    return bytes.fromhex("".join(digits))


def _ascii85_decode(data: bytes) -> bytes:
    """Spec §7.4.3: base-85 groups of 5 → 4 bytes, ``z`` for an all-zero
    group, ``~>`` EOD, partial final group of n chars → n-1 bytes."""
    out = bytearray()
    group: list[int] = []
    i = 0
    while i < len(data):
        b = data[i]
        if b in _WS:
            i += 1
            continue
        if b == 0x7E:  # '~'
            break
        if b == 0x7A:  # 'z'
            if group:
                raise PdfError("'z' inside an ASCII85 group")
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        if not 0x21 <= b <= 0x75:
            raise PdfError(f"invalid ASCII85 character {b:#x}")
        group.append(b - 0x21)
        if len(group) == 5:
            n = 0
            for d in group:
                n = n * 85 + d
            out += n.to_bytes(4, "big")
            group = []
        i += 1
    if group:
        if len(group) == 1:
            raise PdfError("truncated ASCII85 group")
        k = len(group)
        n = 0
        for d in group + [84] * (5 - k):  # pad with 'u'
            n = n * 85 + d
        out += n.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """Spec §7.4.5: length byte 0-127 copies n+1 literals, 129-255 repeats
    the next byte 257-n times, 128 is EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:
            break
        if n < 128:
            out += data[i + 1 : i + 2 + n]
            i += 2 + n
        else:
            out += data[i + 1 : i + 2] * (257 - n)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """Spec §7.4.4: 9→12-bit LZW with clear (256) / EOD (257) codes and the
    PDF ``EarlyChange`` width-switch convention."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    bitbuf = bits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bits += 8
        while bits >= width:
            code = (bitbuf >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == 256:
                reset()
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise PdfError("corrupt LZW stream (first code out of range)")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PdfError("corrupt LZW stream (code out of range)")
            out += entry
            prev = entry
            # standard (xpdf/pdf.js/pdfminer) convention: with early=1 the
            # switch to 10 bits happens at table size 511, i.e. when
            # len(table) + early reaches 2^width
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Writer-side LZW (fixtures): mirrors ``_lzw_decode``'s table and
    width schedule so round trips are exact."""
    out = bytearray()
    bitbuf = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bits
        bitbuf = (bitbuf << width) | code
        bits += width
        while bits >= 8:
            out.append((bitbuf >> (bits - 8)) & 0xFF)
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    seq = b""
    for byte in data:
        cand = seq + bytes([byte])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code > 4095:
            # 12-bit code space exhausted: the spec requires a clear code
            # before any further table growth
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            seq = bytes([byte])
            continue
        table[cand] = next_code
        next_code += 1
        # decoder grows its table AFTER consuming this code (its table is one
        # entry behind next_code); widths must switch in lockstep with its
        # (len(table) + early) rule
        if next_code + early >= (1 << width) + 1 and width < 12:
            width += 1
        seq = bytes([byte])
    if seq:
        emit(table[seq], width)
        next_code += 1
        if next_code + early >= (1 << width) + 1 and width < 12:
            width += 1
    emit(257, width)
    if bits:
        out.append((bitbuf << (8 - bits)) & 0xFF)
    return bytes(out)


def _ascii85_encode(data: bytes) -> bytes:
    """Writer-side ASCII85 (fixtures): 4→5 base-85, partial tail, ``~>``."""
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        k = len(chunk)
        n = int.from_bytes(chunk + b"\x00" * (4 - k), "big")
        digits = []
        for _ in range(5):
            digits.append(n % 85)
            n //= 85
        enc = bytes(d + 0x21 for d in reversed(digits))
        out += enc if k == 4 else enc[: k + 1]
    return bytes(out) + b"~>"


def _runlength_encode(data: bytes) -> bytes:
    """Writer-side RunLength (fixtures): literal chunks only — valid per
    spec §7.4.5, no attempt at actual compression."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    out.append(128)
    return bytes(out)


def _undo_predictor(data: bytes, predictor: int, columns: int, colors: int, bpc: int) -> bytes:
    """Reverse the PNG row predictors (10-15; per-row filter tag 0-4) used by
    Flate-coded xref streams — spec §7.4.4.4 / PNG filtering. TIFF predictor
    2 is not emitted by mainstream writers and is rejected."""
    if predictor == 2:
        raise PdfError("TIFF predictor 2 is not supported")
    if predictor < 10:
        return data
    bpp = max(1, (colors * bpc) // 8)
    row_len = columns * bpp
    out = bytearray()
    prev = bytearray(row_len)
    i = 0
    while i < len(data):
        tag = data[i]
        i += 1
        row = bytearray(data[i : i + row_len])
        i += len(row)
        if tag == 1:  # Sub
            for j in range(bpp, len(row)):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif tag == 2:  # Up
            for j in range(len(row)):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif tag == 3:  # Average
            for j in range(len(row)):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif tag == 4:  # Paeth
            for j in range(len(row)):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        elif tag != 0:
            raise PdfError(f"unknown PNG filter tag {tag}")
        out += row
        prev = row
    return bytes(out)


# ---------------------------------------------------------------------- write


def _escape(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def write_pdf(
    pages: list[dict],
    compress: bool = False,
    xref_stream: bool = False,
    encrypt: bool | str = False,
    content_filter: str | None = None,
) -> bytes:
    """Minimal PDF writer for fixtures and page re-serialization.

    Each page dict: ``width``, ``height`` and either ``words`` (list of
    ``(text, x, baseline_y, size)`` in PDF bottom-left coordinates, one Tj
    per word) or ``raw_content`` (verbatim content-stream bytes).

    ``xref_stream=True`` emits the post-2005 PDF-1.5 layout instead of the
    classic table: all dictionary objects packed into ONE Flate-coded
    ``/ObjStm`` and a ``/Type /XRef`` cross-reference stream (W [1 4 2],
    Flate + PNG Up predictor) — the same container shape mainstream writers
    produce, so reader fixtures exercise the modern path end to end.

    ``encrypt`` applies the Standard security handler with empty passwords
    and a deterministic /ID from the page content: ``True``/``"rc4"`` →
    V2/R3 RC4-128, ``"aesv2"`` → V4/R4 AES-128-CBC, ``"aes256"`` → V5/R6
    AES-256 (R6 iterated-hash /U //UE //O //OE //Perms entries). Stream
    bodies are encrypted per object (after Flate — encryption is the
    outermost layer, spec §7.6.2). Composable with both layouts; in the
    1.5 layout the /Encrypt dict stays a direct object (never inside the
    ObjStm, spec §7.5.7) and the ObjStm body is itself encrypted.
    """
    import hashlib

    objects: list[bytes] = []  # 1-indexed
    stream_objs: set[int] = set()

    enc: _EncryptionParams | None = None
    if encrypt:
        seed = hashlib.md5(repr(sorted(repr(p) for p in pages)).encode()).digest()
        enc = _EncryptionParams(seed, "rc4" if encrypt is True else encrypt)

    def add(obj: bytes, is_stream: bool = False) -> int:
        objects.append(obj)
        if is_stream:
            stream_objs.add(len(objects))
        return len(objects)

    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_entries = []
    kids_placeholder = add(b"")  # Pages node, patched later
    for page in pages:
        if "raw_content" in page:
            content = page["raw_content"]
        else:
            parts = [b"BT"]
            for text, x, y, size in page["words"]:
                parts.append(f"/F1 {size:g} Tf".encode())
                parts.append(f"1 0 0 1 {x:g} {y:g} Tm".encode())
                parts.append(f"({_escape(text)}) Tj".encode())
            parts.append(b"ET")
            content = b"\n".join(parts)
        if content_filter is not None:
            encode, fname = {
                "lzw": (_lzw_encode, "/LZWDecode"),
                "ahx": (lambda d: d.hex().encode() + b">", "/ASCIIHexDecode"),
                "a85": (_ascii85_encode, "/ASCII85Decode"),
                "rl": (_runlength_encode, "/RunLengthDecode"),
            }[content_filter]
            body = encode(content)
            filter_part = f"/Filter {fname} "
        elif compress:
            body = zlib.compress(content)
            filter_part = "/Filter /FlateDecode "
        else:
            body = content
            filter_part = ""
        if enc is not None:
            body = enc.encrypt_stream(len(objects) + 1, body)
        stream_dict = f"<< /Length {len(body)} {filter_part}>>".encode()
        content_num = add(stream_dict + b"\nstream\n" + body + b"\nendstream", is_stream=True)
        page_num = add(
            (
                f"<< /Type /Page /Parent {kids_placeholder} 0 R "
                f"/MediaBox [0 0 {page['width']:g} {page['height']:g}] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        page_entries.append(page_num)
    kids = " ".join(f"{n} 0 R" for n in page_entries)
    objects[kids_placeholder - 1] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_entries)} >>".encode()
    )
    catalog_num = add(f"<< /Type /Catalog /Pages {kids_placeholder} 0 R >>".encode())
    enc_num = add(enc.dict_bytes()) if enc is not None else 0

    if xref_stream:
        return _emit_xref_stream_layout(objects, stream_objs, catalog_num, enc, enc_num)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, obj in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    trailer_extra = enc.trailer_extra(enc_num) if enc is not None else ""
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_num} 0 R {trailer_extra}>>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _png_up_encode(rows: list[bytes], row_len: int) -> bytes:
    """Forward PNG Up filter (tag 2 per row) — what real writers apply to
    xref stream data before Flate."""
    out = bytearray()
    prev = bytes(row_len)
    for row in rows:
        out.append(2)
        out += bytes((row[j] - prev[j]) & 0xFF for j in range(row_len))
        prev = row
    return bytes(out)


def _emit_xref_stream_layout(
    objects: list[bytes],
    stream_objs: set[int],
    catalog_num: int,
    enc: "_EncryptionParams | None" = None,
    enc_num: int = 0,
) -> bytes:
    """PDF-1.5 serialization: stream objects written directly, every
    dictionary object packed into one ``/ObjStm``, one ``/Type /XRef``
    cross-reference stream (W [1 4 2], Flate + Up predictor) as trailer."""
    objstm_num = len(objects) + 1
    xref_num = len(objects) + 2
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")

    entries: dict[int, tuple[int, int, int]] = {0: (0, 0, 65535)}

    # direct objects: streams, plus the /Encrypt dict which must never live
    # inside an object stream (spec §7.5.7)
    direct = set(stream_objs) | ({enc_num} if enc is not None else set())
    for i, obj in enumerate(objects, 1):
        if i in direct:
            entries[i] = (1, len(out), 0)
            out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"

    # pack the dictionary objects into one object stream
    packed = [i for i in range(1, len(objects) + 1) if i not in direct]
    bodies: list[bytes] = []
    offs: list[int] = []
    pos = 0
    for i in packed:
        offs.append(pos)
        body = objects[i - 1] + b"\n"
        bodies.append(body)
        pos += len(body)
    header = " ".join(f"{i} {o}" for i, o in zip(packed, offs)).encode() + b"\n"
    payload = header + b"".join(bodies)
    zipped = zlib.compress(payload)
    if enc is not None:
        zipped = enc.encrypt_stream(objstm_num, zipped)
    entries[objstm_num] = (1, len(out), 0)
    out += (
        f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(packed)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(zipped)} >>\nstream\n".encode()
        + zipped
        + b"\nendstream\nendobj\n"
    )
    for idx, i in enumerate(packed):
        entries[i] = (2, objstm_num, idx)

    # cross-reference stream (its own entry points at itself)
    xref_off = len(out)
    entries[xref_num] = (1, xref_off, 0)
    size = xref_num + 1
    rows = [
        bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        for t, f2, f3 in (entries[n] for n in range(size))
    ]
    xdata = zlib.compress(_png_up_encode(rows, 7))
    trailer_extra = enc.trailer_extra(enc_num) if enc is not None else ""
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Root {catalog_num} 0 R {trailer_extra}/Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns 7 >> "
        f"/Length {len(xdata)} >>\nstream\n".encode()
        + xdata
        + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)
