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

Limitations (documented, raise loudly): PDF-1.5 cross-reference *streams*
and object streams are not parsed; encrypted documents are rejected. Word
boxes use the nominal glyph advance 0.5*size per char (Helvetica-average) —
deterministic, so the differential golden path is exact even though widths
are approximate.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["PdfReader", "write_pdf", "PdfError"]


class PdfError(ValueError):
    pass


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
        self.xref, self.trailer = self._load_xref_chain()
        if "/Encrypt" in self.trailer:
            raise PdfError("encrypted PDFs are not supported")
        root = self.resolve(self.trailer.get("/Root"))
        if not isinstance(root, dict):
            raise PdfError("missing document catalog")
        self._page_refs: list[tuple[int, int]] = []
        self._collect_pages(root.get("/Pages"), inherited={})
        self._inherited: list[dict] = self._page_inherits

    # ------------------------------------------------------------- structure

    def _load_xref_chain(self) -> tuple[dict[int, int], dict]:
        tail = self.data[-2048:]
        m = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not m:
            raise PdfError("startxref not found")
        offset = int(m[-1].group(1))
        xref: dict[int, int] = {}
        trailer_out: dict = {}
        seen = set()
        while offset and offset not in seen:
            seen.add(offset)
            lx = _Lexer(self.data, offset)
            tok = lx.read_token()
            if tok != b"xref":
                raise PdfError(
                    "cross-reference streams (PDF 1.5 'xref stream') are not "
                    "supported by this pure-Python reader"
                )
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
            trailer = _parse_object(lx)
            if not trailer_out:
                trailer_out = trailer
            offset = trailer.get("/Prev", 0)
        return xref, trailer_out

    def resolve(self, obj):
        while isinstance(obj, tuple) and obj and obj[0] == "ref":
            obj = self.get_object(obj[1], obj[2])
        return obj

    def get_object(self, num: int, gen: int = 0):
        key = (num, gen)
        if key in self._cache:
            return self._cache[key]
        off = self.xref.get(num)
        if off is None:
            return None
        lx = _Lexer(self.data, off)
        lx.read_token()  # obj number
        lx.read_token()  # generation
        if lx.read_token() != b"obj":
            raise PdfError(f"malformed object {num} at offset {off}")
        value = _parse_object(lx)
        lx.skip_ws()
        if self.data[lx.pos : lx.pos + 6] == b"stream":
            lx.pos += 6
            if self.data[lx.pos : lx.pos + 2] == b"\r\n":
                lx.pos += 2
            elif self.data[lx.pos : lx.pos + 1] == b"\n":
                lx.pos += 1
            length = self.resolve(value.get("/Length"))
            raw = self.data[lx.pos : lx.pos + int(length)]
            value = _Stream(value, raw)
        self._cache[key] = value
        return value

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

    def page_pdf_bytes(self, i: int) -> bytes:
        """Re-serialize page ``i`` as a standalone single-page PDF — the
        per-page split contract of ``SerializerPdfDoc.load``
        (``custom_serialize.py:658-717``)."""
        width, height = self.page_size(i)
        return write_pdf(
            [{"width": width, "height": height, "raw_content": self.page_content(i)}]
        )


class _Stream:
    def __init__(self, meta: dict, raw: bytes) -> None:
        self.meta = meta
        self.raw = raw

    def decoded(self, reader: PdfReader) -> bytes:
        filt = reader.resolve(self.meta.get("/Filter"))
        if filt is None:
            return self.raw
        filters = filt if isinstance(filt, list) else [filt]
        data = self.raw
        for f in filters:
            if f == "/FlateDecode":
                data = zlib.decompress(data)
            else:
                raise PdfError(f"unsupported stream filter {f} (only FlateDecode)")
        return data


# ---------------------------------------------------------------------- write


def _escape(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def write_pdf(pages: list[dict], compress: bool = False) -> bytes:
    """Minimal PDF writer for fixtures and page re-serialization.

    Each page dict: ``width``, ``height`` and either ``words`` (list of
    ``(text, x, baseline_y, size)`` in PDF bottom-left coordinates, one Tj
    per word) or ``raw_content`` (verbatim content-stream bytes).
    """
    objects: list[bytes] = []  # 1-indexed

    def add(obj: bytes) -> int:
        objects.append(obj)
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
        if compress:
            body = zlib.compress(content)
            stream_dict = f"<< /Length {len(body)} /Filter /FlateDecode >>".encode()
        else:
            body = content
            stream_dict = f"<< /Length {len(body)} >>".encode()
        content_num = add(stream_dict + b"\nstream\n" + body + b"\nendstream")
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
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_num} 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)
