"""Pure-Python PDF container parser: writer→reader round trips, page split,
filter paths, error surfaces (kernels/pdf.py; reference semantics
extern/pdftext.py:50-135, dd_core/utils/pdf_utils.py:406-545)."""

from __future__ import annotations

from struct import error as struct_error

import pytest

from deepdoctection_ray.kernels.pdf import PdfError, PdfReader, write_pdf

PAGES = [
    {"width": 600, "height": 400, "words": [("hello", 50, 350, 12), ("world", 95, 350, 12)]},
    {"width": 300, "height": 200, "words": [("page", 30, 150, 10)]},
]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_words_and_sizes(compress):
    reader = PdfReader(write_pdf(PAGES, compress=compress))
    assert reader.num_pages == 2
    assert reader.page_size(0) == (600.0, 400.0)
    assert reader.page_size(1) == (300.0, 200.0)
    words = reader.page_words(0)
    assert [w["text"] for w in words] == ["hello", "world"]
    # pdfplumber top-left convention: top = height - y - size
    assert words[0]["top"] == 400 - 350 - 12
    assert words[0]["bottom"] == 400 - 350


def test_single_page_resplit_is_standalone():
    reader = PdfReader(write_pdf(PAGES, compress=True))
    single = reader.page_pdf_bytes(1)
    sub = PdfReader(single)
    assert sub.num_pages == 1
    assert [w["text"] for w in sub.page_words(0)] == ["page"]


def test_escaped_strings_and_tj_array():
    content = b"BT /F1 12 Tf 1 0 0 1 50 100 Tm [(a\\(b) -500 (c)] TJ ET"
    data = write_pdf([{"width": 200, "height": 200, "raw_content": content}])
    words = PdfReader(data).page_words(0)
    assert [w["text"] for w in words] == ["a(b", "c"]
    # kerning -500/1000 * 12 = -6 shifts x0 right by advance minus 6
    assert words[1]["x0"] == pytest.approx(words[0]["x1"] + 6.0)


def test_td_and_tstar_line_movement():
    content = b"BT /F1 10 Tf 10 20 Td (one) Tj 0 -15 TD (two) Tj T* (three) Tj ET"
    data = write_pdf([{"width": 200, "height": 200, "raw_content": content}])
    words = PdfReader(data).page_words(0)
    assert [w["text"] for w in words] == ["one", "two", "three"]
    assert words[1]["bottom"] - words[0]["bottom"] == 15.0
    assert words[2]["bottom"] - words[1]["bottom"] == 15.0  # T* reuses TD leading


def test_rejects_non_pdf_and_names_missing_feature():
    with pytest.raises(PdfError, match="missing %PDF header"):
        PdfReader(b"plain text")


def test_split_pdf_pages_real_pdf():
    from deepdoctection_ray.sources import split_pdf_pages

    data = write_pdf(PAGES)
    rows = split_pdf_pages({"bytes": data, "path": "/x/doc.pdf"})
    assert [r["page_number"] for r in rows] == [0, 1]
    assert all(r["pdf_bytes"].startswith(b"%PDF") for r in rows)
    assert '"words"' in rows[0]["text"]
    # legacy synthetic container still splits
    legacy = split_pdf_pages({"bytes": b"a%PAGE%b", "path": "/x/s.bin"})
    assert [r["pdf_bytes"] for r in legacy] == [b"a", b"b"]


def test_pdf_reader_fuzz_never_crashes_unexpectedly():
    """Poison-input robustness: arbitrary byte mutations of a valid PDF either
    parse or raise a controlled error type — never hang or corrupt."""
    from hypothesis import given, settings, strategies as st

    base = write_pdf(PAGES)

    @settings(max_examples=150, deadline=2000)
    @given(
        pos=st.integers(min_value=0, max_value=len(base) - 1),
        chunk=st.binary(min_size=1, max_size=64),
    )
    def mutate(pos, chunk):
        data = base[:pos] + chunk + base[pos + len(chunk):]
        try:
            reader = PdfReader(data)
            for i in range(reader.num_pages):
                reader.page_words(i)
        except (PdfError, ValueError, KeyError, IndexError, struct_error, EOFError, OverflowError, MemoryError, TypeError, AttributeError) as _:
            pass  # controlled failure classes
        except Exception as exc:  # noqa: BLE001
            import zlib
            if isinstance(exc, zlib.error):
                return
            raise AssertionError(f"unexpected {type(exc).__name__}: {exc}") from exc

    mutate()


# ------------------------------------------------------ PDF 1.5 container


@pytest.mark.parametrize("compress", [False, True])
def test_xref_stream_layout_roundtrips_identically(compress):
    """Modern layout (ObjStm + predictor-coded xref stream) must parse to
    the exact same words/sizes as the classic table layout."""
    classic = PdfReader(write_pdf(PAGES, compress=compress))
    modern_bytes = write_pdf(PAGES, compress=compress, xref_stream=True)
    assert modern_bytes.startswith(b"%PDF-1.5")
    assert b"/ObjStm" in modern_bytes and b"/XRef" in modern_bytes
    modern = PdfReader(modern_bytes)
    assert modern.num_pages == classic.num_pages
    for i in range(classic.num_pages):
        assert modern.page_words(i) == classic.page_words(i)
        assert modern.page_size(i) == classic.page_size(i)


def test_xref_stream_page_resplit():
    modern = PdfReader(write_pdf(PAGES, xref_stream=True))
    sub = PdfReader(modern.page_pdf_bytes(1))
    assert sub.num_pages == 1
    assert [w["text"] for w in sub.page_words(0)] == ["page"]


def test_hybrid_xrefstm_trailer():
    """Classic table whose trailer points at an /XRefStm (hybrid file,
    spec 7.5.8.4): entries from the stream fill gaps in the table."""
    modern = write_pdf(PAGES, xref_stream=True)
    r = PdfReader(modern)
    # find the xref stream offset from startxref
    import re as _re

    xref_off = int(_re.search(rb"startxref\s+(\d+)", modern[-100:]).group(1))
    # build a hybrid: classic empty-ish table + trailer with /XRefStm
    hybrid = modern[: len(modern) - len(b"startxref\n%d\n%%%%EOF\n" % xref_off)]
    table_off = len(hybrid)
    hybrid += (
        b"xref\n0 1\n0000000000 65535 f \n"
        b"trailer\n<< /Size %d /Root %s /XRefStm %d >>\n"
        b"startxref\n%d\n%%%%EOF\n"
        % (
            len(r.xref) + 2,
            next(
                v.encode() if isinstance(v, str) else b"%d %d R" % (v[1], v[2])
                for v in [r.trailer["/Root"]]
            ),
            xref_off,
            table_off,
        )
    )
    hr = PdfReader(hybrid)
    assert hr.num_pages == 2
    assert hr.page_words(0) == r.page_words(0)


def test_png_predictors_all_filters():
    """PNG Sub/Up/Average/Paeth rows decode exactly (encode-then-decode)."""
    from deepdoctection_ray.kernels.pdf import _undo_predictor

    import random

    rng = random.Random(9)
    row_len, n_rows = 7, 20
    rows = [bytes(rng.randrange(256) for _ in range(row_len)) for _ in range(n_rows)]

    def enc(tag):
        out = bytearray()
        prev = bytes(row_len)
        for row in rows:
            out.append(tag)
            if tag == 0:
                out += row
            elif tag == 1:
                out += bytes(
                    (row[j] - (row[j - 1] if j >= 1 else 0)) & 0xFF for j in range(row_len)
                )
            elif tag == 2:
                out += bytes((row[j] - prev[j]) & 0xFF for j in range(row_len))
            elif tag == 3:
                out += bytes(
                    (row[j] - (((row[j - 1] if j >= 1 else 0) + prev[j]) >> 1)) & 0xFF
                    for j in range(row_len)
                )
            elif tag == 4:
                enc_row = bytearray()
                for j in range(row_len):
                    a = row[j - 1] if j >= 1 else 0
                    b = prev[j]
                    c = prev[j - 1] if j >= 1 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc_row.append((row[j] - pred) & 0xFF)
                out += enc_row
            prev = row
        return bytes(out)

    flat = b"".join(rows)
    for tag in (0, 1, 2, 3, 4):
        assert _undo_predictor(enc(tag), 12, row_len, 1, 8) == flat, f"tag {tag}"


def test_pdf15_fixture_corpus_extracts():
    """make_pdf_corpus emits every third doc in the 1.5 layout; all of them
    must still extract their construction-truth text."""
    from deepdoctection_ray.synth import make_pdf_corpus

    files, truth = make_pdf_corpus(6, seed=11)
    by_file = {}
    for t in truth:
        by_file.setdefault(t["file_name"], []).append(t)
    n_modern = 0
    for name, data in files:
        if data.startswith(b"%PDF-1.5"):
            n_modern += 1
        reader = PdfReader(data)
        for t in sorted(by_file[name], key=lambda r: r["page_number"]):
            words = reader.page_words(t["page_number"])
            got_lines = []
            cur, cur_bottom = [], None
            for w in words:
                if cur_bottom is not None and w["bottom"] != cur_bottom:
                    got_lines.append(" ".join(cur))
                    cur = []
                cur.append(w["text"])
                cur_bottom = w["bottom"]
            if cur:
                got_lines.append(" ".join(cur))
            assert "\n".join(got_lines) == t["text"]
    assert n_modern == 2  # docs 0 and 3


# ------------------------------------------------------------- encryption


@pytest.mark.parametrize("mode", ["rc4", "rc4v4", "aesv2", "aes256"])
@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("xref_stream", [False, True])
def test_encrypted_roundtrip(mode, compress, xref_stream):
    """Standard-handler files (empty password) decrypt transparently in both
    container layouts for all three crypt generations: RC4 V2/R3, AES-128
    V4/R4 /AESV2, AES-256 V5/R6 /AESV3 (reference capability:
    dd_core/utils/pdf_utils.py:168-331)."""
    data = write_pdf(PAGES, compress=compress, xref_stream=xref_stream, encrypt=mode)
    assert b"/Encrypt" in data
    reader = PdfReader(data)
    assert reader.num_pages == 2
    assert [w["text"] for w in reader.page_words(0)] == ["hello", "world"]
    assert [w["text"] for w in reader.page_words(1)] == ["page"]


def test_encrypted_bytes_actually_ciphered():
    plain = write_pdf(PAGES)
    enc = write_pdf(PAGES, encrypt=True)
    assert b"(hello)" in plain
    assert b"(hello)" not in enc  # content stream is RC4-ciphered on disk


def test_encrypted_page_resplit_emits_plaintext():
    reader = PdfReader(write_pdf(PAGES, encrypt=True))
    single = reader.page_pdf_bytes(1)
    assert b"/Encrypt" not in single
    assert [w["text"] for w in PdfReader(single).page_words(0)] == ["page"]


def test_encrypted_wrong_password_rejected():
    data = bytearray(write_pdf(PAGES, encrypt=True))
    # corrupt the /U entry so the empty-password check must fail
    at = bytes(data).index(b"/U <") + 4
    data[at : at + 2] = b"00" if data[at : at + 2] != b"00" else b"ff"
    with pytest.raises(PdfError, match="password"):
        PdfReader(bytes(data))


def test_unknown_encryption_rejected_loudly():
    data = write_pdf(PAGES, encrypt=True)
    patched = data.replace(b"/V 2 /R 3", b"/V 3 /R 3")
    with pytest.raises(PdfError, match="V=3"):
        PdfReader(patched)


@pytest.mark.parametrize("mode", ["aesv2", "aes256"])
def test_aes_encrypted_bytes_actually_ciphered(mode):
    enc = write_pdf(PAGES, encrypt=mode)
    assert b"(hello)" not in enc


def test_aes256_wrong_password_rejected():
    data = bytearray(write_pdf(PAGES, encrypt="aes256"))
    at = bytes(data).index(b"/U <") + 4
    data[at : at + 2] = b"00" if data[at : at + 2] != b"00" else b"ff"
    with pytest.raises(PdfError, match="password"):
        PdfReader(bytes(data))


def test_aes256_perms_integrity_checked():
    data = bytearray(write_pdf(PAGES, encrypt="aes256"))
    at = bytes(data).index(b"/Perms <") + 8
    data[at : at + 2] = b"00" if data[at : at + 2] != b"00" else b"ff"
    with pytest.raises(PdfError, match="Perms"):
        PdfReader(bytes(data))


def test_aes_fips197_vectors():
    """The AES core is pinned to the public FIPS-197 Appendix C vectors and
    a NIST SP800-38A CBC vector — any table/schedule regression fails here."""
    from deepdoctection_ray.kernels.aes import (
        _decrypt_block,
        _encrypt_block,
        _expand_key,
        aes_cbc_decrypt,
        aes_cbc_encrypt,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    expected = {
        16: "69c4e0d86a7b0430d8cdb78070b4c55a",
        24: "dda97ca4864cdfe06eaf70a0ec0d7191",
        32: "8ea2b7ca516745bfeafc49904b496089",
    }
    for klen, exp in expected.items():
        key = bytes(range(klen))
        rk = _expand_key(key)
        ct = _encrypt_block(rk, pt)
        assert ct.hex() == exp
        assert _decrypt_block(rk, ct) == pt
    k = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090A0B0C0D0E0F")
    p1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert (
        aes_cbc_encrypt(k, iv, p1)[16:32].hex() == "7649abac8119b246cee98e9b12e9197d"
    )
    msg = b"arbitrary length payload round-trips through CBC with padding"
    assert aes_cbc_decrypt(k, aes_cbc_encrypt(k, iv, msg)) == msg


# ------------------------------------------------------------ stream filters


@pytest.mark.parametrize("cfilter", ["lzw", "ahx", "a85", "rl"])
@pytest.mark.parametrize("xref_stream", [False, True])
def test_filter_roundtrip(cfilter, xref_stream):
    """LZW / ASCIIHex / ASCII85 / RunLength content streams decode to the
    same words as plain (spec §7.4.2-7.4.5)."""
    data = write_pdf(PAGES, xref_stream=xref_stream, content_filter=cfilter)
    reader = PdfReader(data)
    assert [w["text"] for w in reader.page_words(0)] == ["hello", "world"]
    assert [w["text"] for w in reader.page_words(1)] == ["page"]


def _unpack_9bit(enc: bytes, n_codes: int) -> list:
    """Read the first n_codes 9-bit codes of an LZW bitstream (valid while
    the table stays below the 9→10 switch)."""
    bitbuf = int.from_bytes(enc, "big")
    total_bits = 8 * len(enc)
    return [(bitbuf >> (total_bits - 9 * (i + 1))) & 0x1FF for i in range(n_codes)]


def test_lzw_spec_example():
    """The PDF spec's own §7.4.4 worked example: input bytes
    45 45 45 45 45 65 45 45 45 66 encode to EXACTLY the code sequence
    256 45 258 258 65 259 66 257 (all 9-bit here), and decode back."""
    from deepdoctection_ray.kernels.pdf import _lzw_decode, _lzw_encode

    plain = bytes([45] * 5 + [65] + [45] * 3 + [66])
    enc = _lzw_encode(plain)
    assert _unpack_9bit(enc, 8) == [256, 45, 258, 258, 65, 259, 66, 257]
    assert _lzw_decode(enc) == plain
    # table growth past one width switch (9→10 bits needs 254 new entries)
    big = bytes(range(256)) * 12
    assert _lzw_decode(_lzw_encode(big)) == big


def test_lzw_decodes_standard_convention_stream():
    """Cross-width-boundary stream packed by an INDEPENDENT encoder following
    the xpdf/pdf.js/pdfminer convention — the width of the code being read is
    determined by (decoder table size + EarlyChange): with early=1 the 10-bit
    switch happens at table size 511, not 512. A decoder with the off-by-one
    convention raises 'code out of range' on this stream."""
    from deepdoctection_ray.kernels.pdf import _lzw_decode

    # input with no repeats early on -> one new table entry per code, so the
    # stream marches straight through the 9->10 and 10->11 boundaries
    data = bytes((i * 7 + (i >> 8)) % 256 for i in range(4000))

    # independent encoder: emit literal single-byte codes only (always valid
    # LZW: the encoder may choose not to use long matches), growing the
    # simulated decoder table by one entry per emitted code
    out = bitbuf = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal out, bitbuf, bits
        bitbuf = (bitbuf << width) | code
        bits += width

    early = 1
    table_len = 258
    width = 9
    emit(256, width)
    for i, b in enumerate(data):
        emit(b, width)
        if i > 0:
            table_len += 1  # decoder appends prev+entry[:1] per non-first code
        if table_len + early >= (1 << width) and width < 12:
            width += 1
    emit(257, width)
    if bits % 8:
        bitbuf <<= 8 - (bits % 8)
        bits += 8 - (bits % 8)
    enc = bitbuf.to_bytes(bits // 8, "big")
    assert _lzw_decode(enc) == data


def test_filter_decoders_edge_cases():
    from deepdoctection_ray.kernels.pdf import (
        _ascii85_decode,
        _ascii_hex_decode,
        _runlength_decode,
    )

    assert _ascii_hex_decode(b"48 65 6C 6C 6F >garbage-after-eod") == b"Hello"
    assert _ascii_hex_decode(b"4") == b"@"  # odd digit pads 0
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert _ascii85_decode(b"87cUR~>") == b"Hell"
    assert _runlength_decode(bytes([2]) + b"abc" + bytes([254]) + b"x" + bytes([128])) == b"abc" + b"x" * 3


def test_lzw_roundtrip_fuzz():
    from hypothesis import given, settings, strategies as st

    from deepdoctection_ray.kernels.pdf import _lzw_decode, _lzw_encode

    @settings(max_examples=200, deadline=4000)
    @given(st.binary(min_size=0, max_size=2000))
    def roundtrip(data):
        assert _lzw_decode(_lzw_encode(data)) == data

    roundtrip()


def test_lzw_table_exhaustion_emits_clear():
    """>4096 table entries force a mid-stream clear code; round trip stays
    exact (12-bit code-space limit, spec §7.4.4)."""
    import random as _random

    from deepdoctection_ray.kernels.pdf import _lzw_decode, _lzw_encode

    rng = _random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(16384))
    enc = _lzw_encode(data)
    assert _lzw_decode(enc) == data


# ------------------------------------------------------------ rasterization


def test_render_page_matches_construction_truth():
    """bytes → container parse → box mine → rasterize must reproduce the ink
    statistics the fixture generator computed from the geometry it wrote
    (covers plain, Flate, ObjStm/xref-stream and RC4 page variants)."""
    from deepdoctection_ray.kernels.raster import ink_stats, render_page
    from deepdoctection_ray.synth import make_pdf_corpus

    files, truth = make_pdf_corpus(12, seed=42)
    by_page = {(t["file_name"], t["page_number"]): t for t in truth}
    for name, data in files:
        reader = PdfReader(data)
        for p in range(reader.num_pages):
            got = ink_stats(render_page(reader, p, dpi=36))
            want = by_page[(name, p)]
            assert got["width_px"] == want["width_px"]
            assert got["height_px"] == want["height_px"]
            assert got["n_dark"] == want["n_dark"], (name, p)


def test_render_blank_and_clipping():
    import numpy as np

    from deepdoctection_ray.kernels.raster import ink_stats, render_words

    blank = render_words([], 100, 50, dpi=72)
    assert ink_stats(blank) == {"width_px": 100, "height_px": 50, "n_dark": 0}
    # a box hanging off the page clips instead of wrapping
    img = render_words(
        [{"x0": -10, "top": -5, "x1": 5, "bottom": 3}], 100, 50, dpi=72
    )
    assert (img[0:3, 0:5] == 0).all()
    assert int((img < 128).sum()) == 15


def test_deskew_from_pixels_matches_geometry_estimator():
    """The pixel-space projection-profile estimator (raster path, the
    reference's image-based jdeskew semantic) must agree with the geometry
    estimator on rendered skewed pages within the coarse grid step."""
    import json

    import numpy as np

    from deepdoctection_ray.kernels.raster import (
        estimate_skew_from_pixels, render_words,
    )
    from deepdoctection_ray.kernels.transforms import estimate_skew_angle
    from deepdoctection_ray.synth import make_deskew_docs

    docs = make_deskew_docs(8, seed=42)
    for payload in docs["text"].to_pylist():
        d = json.loads(payload)
        words = d["words"]
        img = render_words(words, d["page"]["width"], d["page"]["height"], dpi=72)
        px_angle = estimate_skew_from_pixels(img, limit_deg=10.0)
        boxes = np.array([[w["x0"], w["top"], w["x1"], w["bottom"]] for w in words])
        geo_angle = estimate_skew_angle(boxes, limit_deg=10.0)
        assert abs(px_angle - geo_angle) <= 0.5, (d["true_angle"], px_angle, geo_angle)


def test_pixel_detector_recovers_word_boxes():
    """Connected-component detection over the rendered raster must recover
    every word's glyph box (words render disjoint), back-projected to point
    coords within one pixel at the render scale — the bytes→pixels→detections
    chain the ReplayDetector path consumes."""
    from deepdoctection_ray.kernels.raster import (
        detect_words_from_pixels, render_page,
    )
    from deepdoctection_ray.synth import make_pdf_corpus

    files, truth = make_pdf_corpus(6, seed=42)
    by_page = {(t["file_name"], t["page_number"]): t for t in truth}
    tol = 72.0 / 36.0  # one pixel at dpi 36, in points
    for name, data in files:
        reader = PdfReader(data)
        for p in range(reader.num_pages):
            words = sorted(
                reader.page_words(p), key=lambda w: (w["top"], w["x0"])
            )
            det = detect_words_from_pixels(render_page(reader, p, dpi=36), dpi=36)
            n_words = len(by_page[(name, p)]["text"].split())
            assert len(det) == len(words) == n_words, (name, p)
            for w, d in zip(words, det):
                for k in ("x0", "top", "x1", "bottom"):
                    assert abs(d[k] - w[k]) <= tol, (name, p, k, d, w)


def test_boxes_from_pixels_matches_flood_fill_fuzz():
    """Run-based union-find CC labeling vs a brute-force flood fill on random
    bitmaps (4-connectivity, half-open boxes)."""
    import numpy as np

    from deepdoctection_ray.kernels.raster import boxes_from_pixels

    def brute(img):
        dark = img < 128
        h, w = dark.shape
        seen = np.zeros_like(dark, bool)
        boxes = []
        for y in range(h):
            for x in range(w):
                if dark[y, x] and not seen[y, x]:
                    stack = [(y, x)]
                    seen[y, x] = True
                    x0 = x1 = x
                    y0 = y1 = y
                    while stack:
                        cy, cx = stack.pop()
                        x0, x1 = min(x0, cx), max(x1, cx)
                        y0, y1 = min(y0, cy), max(y1, cy)
                        for ny, nx in ((cy + 1, cx), (cy - 1, cx), (cy, cx + 1), (cy, cx - 1)):
                            if 0 <= ny < h and 0 <= nx < w and dark[ny, nx] and not seen[ny, nx]:
                                seen[ny, nx] = True
                                stack.append((ny, nx))
                    boxes.append([x0, y0, x1 + 1, y1 + 1])
        return np.array(sorted(boxes, key=lambda b: (b[1], b[0])), np.int64).reshape(-1, 4)

    for t in range(40):
        rng = np.random.RandomState(t)
        img = np.where(rng.rand(rng.randint(1, 18), rng.randint(1, 18)) < 0.35, 0, 255).astype(
            np.uint8
        )
        got = boxes_from_pixels(img)
        want = brute(img)
        assert got.shape == want.shape and (got == want).all(), t


def test_glyph_ocr_recognizes_from_ink():
    """Pixels→text: the template recognizer must recover the exact characters
    from the glyph raster alone — including a corruption check proving it
    reads INK, not metadata (flipping pixels changes the answer)."""
    import numpy as np

    from deepdoctection_ray.kernels.raster import (
        expected_ocr_text,
        glyph_atlas,
        ocr_words_from_pixels,
        render_words_glyphs,
    )

    atlas = glyph_atlas()
    assert len(atlas) == 94
    # injective and edge-inked (the segmentation invariants)
    keys = {np.packbits(b).tobytes() for b in atlas.values()}
    assert len(keys) == 94
    for b in atlas.values():
        assert b[0].any() and b[6].any() and b[:, 0].any() and b[:, 4].any()

    words = [
        {"text": "Merge!", "x0": 50.0, "top": 28.0, "x1": 86.0, "bottom": 40.0},
        {"text": "sort42", "x0": 98.0, "top": 28.0, "x1": 134.0, "bottom": 40.0},
        {"text": "a", "x0": 50.0, "top": 56.0, "x1": 56.0, "bottom": 68.0},
    ]
    img = render_words_glyphs(words, 600.0, 400.0, dpi=144)
    rects = [(w["x0"], w["top"], w["x1"], w["bottom"]) for w in words]
    got = ocr_words_from_pixels(img, rects, dpi=144)
    assert got == ["Merge!", "sort42", "a"]
    assert " ".join(got) == expected_ocr_text(words, dpi=144)

    # whiting out one glyph's ink erases exactly that character
    img2 = img.copy()
    px0 = int(50.0 * 2)
    img2[56:80, px0 : px0 + 12] = 255  # first cell of "Merge!" (line 1 rows only)
    got2 = ocr_words_from_pixels(img2, rects, dpi=144)
    assert got2[0] == "erge!" and got2[1:] == got[1:]

    # a rect too small for scale-1 glyphs renders (and recognizes) nothing
    tiny = [{"text": "word", "x0": 10.0, "top": 10.0, "x1": 12.0, "bottom": 12.0}]
    t_img = render_words_glyphs(tiny, 100.0, 100.0, dpi=36)
    assert (t_img == 255).all()
    assert expected_ocr_text(tiny, dpi=36) == ""
    assert ocr_words_from_pixels(t_img, [(10.0, 10.0, 12.0, 12.0)], dpi=36) == [""]
