"""Minimal page rasterization — the ``to_image`` pixel semantic.

The reference renders PDF pages to pixel arrays at a DPI via poppler/pdfium
(``dd_core/utils/pdf_utils.py:594-669``) to feed its visual predictors. No
raster libs exist in this environment, so the same semantic is closed from
the text layer: every word box renders as a filled glyph-box run on a white
canvas at ``dpi/72`` scale. That is enough to drive the pixel-space
estimators (projection-profile deskew runs on the raster exactly as the
reference's jdeskew runs on the page image) and the ReplayDetector path from
pixels, and it is deterministic — the ``q_render_pdf`` oracle compares ink
statistics against construction truth computed by the fixture generator
through the independent writer→bytes→parser box path.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "word_pixel_rect",
    "render_words",
    "render_page",
    "ink_stats",
    "estimate_skew_from_pixels",
    "boxes_from_pixels",
    "detect_words_from_pixels",
]


def word_pixel_rect(
    x0: float, top: float, x1: float, bottom: float, scale: float
) -> tuple[int, int, int, int]:
    """Half-open pixel rect of a word box at ``scale`` px/pt: floor the
    origin, ceil the far edge, minimum 1 px each way. Shared by the renderer
    and the fixture-truth generator so ink counts are reproducible."""
    px0 = int(math.floor(x0 * scale))
    py0 = int(math.floor(top * scale))
    px1 = max(px0 + 1, int(math.ceil(x1 * scale)))
    py1 = max(py0 + 1, int(math.ceil(bottom * scale)))
    return px0, py0, px1, py1


def render_words(
    words: list[dict], width: float, height: float, dpi: int = 36
) -> np.ndarray:
    """Grayscale uint8 page raster (255 background, 0 ink) from word records
    ``{x0, top, x1, bottom}`` in the top-left point convention
    (:meth:`PdfReader.page_words`)."""
    scale = dpi / 72.0
    w_px = max(1, int(math.ceil(width * scale)))
    h_px = max(1, int(math.ceil(height * scale)))
    img = np.full((h_px, w_px), 255, dtype=np.uint8)
    for w in words:
        px0, py0, px1, py1 = word_pixel_rect(
            float(w["x0"]), float(w["top"]), float(w["x1"]), float(w["bottom"]), scale
        )
        px0, py0 = max(0, px0), max(0, py0)
        px1, py1 = min(w_px, px1), min(h_px, py1)
        if px1 > px0 and py1 > py0:
            img[py0:py1, px0:px1] = 0
    return img


def render_page(reader, page_no: int, dpi: int = 36) -> np.ndarray:
    """Rasterize one page of a :class:`~..kernels.pdf.PdfReader` document."""
    width, height = reader.page_size(page_no)
    return render_words(reader.page_words(page_no), width, height, dpi)


def ink_stats(img: np.ndarray) -> dict:
    """Deterministic raster summary: canvas size and dark-pixel count."""
    return {
        "width_px": int(img.shape[1]),
        "height_px": int(img.shape[0]),
        "n_dark": int((img < 128).sum()),
    }


def estimate_skew_from_pixels(
    img: np.ndarray,
    limit_deg: float = 10.0,
    coarse_step: float = 0.25,
    bin_px: float | None = None,
) -> float:
    """Projection-profile skew estimation ON PIXELS — the raster analog of
    :func:`..kernels.transforms.estimate_skew_angle` (same energy function,
    same sign convention: returns the angle that flattens the text lines).
    Every dark pixel is a sample point; for each candidate angle the points
    rotate and bin into horizontal lines, and the angle with the sharpest
    profile (max sum of squared bin counts) wins."""
    ys, xs = np.nonzero(img < 128)
    if ys.size < 8:
        return 0.0
    cy = ys.astype(np.float64)
    cx = xs.astype(np.float64)
    if bin_px is None:
        # glyph-box height at the rendering scale: ~half a text line
        bin_px = max(2.0, img.shape[0] / 80.0)

    def energy(angle_deg: float) -> float:
        a = np.deg2rad(angle_deg)
        y = cy * np.cos(a) - cx * np.sin(a)
        bins = np.floor((y - y.min()) / bin_px).astype(np.int64)
        counts = np.bincount(bins)
        return float((counts.astype(np.float64) ** 2).sum())

    coarse = np.arange(-limit_deg, limit_deg + coarse_step / 2, coarse_step)
    scores = np.array([energy(a) for a in coarse])
    near = np.where(scores >= scores.max() - 1e-9)[0]
    return float(coarse[near[len(near) // 2]])


def boxes_from_pixels(img: np.ndarray, threshold: int = 128) -> np.ndarray:
    """Bounding boxes of 4-connected dark components, [N, 4] half-open pixel
    coords (x0, y0, x1, y1) sorted by (y0, x0) — the pixel-space detector
    primitive: run-based two-pass connected-component labeling (union-find
    over per-row ink runs; runs are found vectorized per row, the Python loop
    is over RUNS, not pixels)."""
    dark = img < threshold
    h, w = dark.shape
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # per-row runs via diff on the padded mask
    run_rows: list[tuple[int, int, int, int]] = []  # (y, x0, x1, label)
    prev_runs: list[tuple[int, int, int]] = []  # (x0, x1, label) of row y-1
    for y in range(h):
        row = dark[y]
        if not row.any():
            prev_runs = []
            continue
        d = np.diff(np.concatenate([[0], row.view(np.int8), [0]]))
        starts = np.nonzero(d == 1)[0]
        ends = np.nonzero(d == -1)[0]
        cur: list[tuple[int, int, int]] = []
        pi = 0
        for x0, x1 in zip(starts, ends):
            lab = -1
            while pi < len(prev_runs) and prev_runs[pi][1] <= x0:
                pi += 1
            pj = pi
            while pj < len(prev_runs) and prev_runs[pj][0] < x1:
                if lab == -1:
                    lab = prev_runs[pj][2]
                else:
                    union(lab, prev_runs[pj][2])
                pj += 1
            if lab == -1:
                lab = len(parent)
                parent.append(lab)
            cur.append((int(x0), int(x1), lab))
            run_rows.append((y, int(x0), int(x1), lab))
        prev_runs = cur
    if not run_rows:
        return np.empty((0, 4), dtype=np.int64)
    boxes: dict[int, list[int]] = {}
    for y, x0, x1, lab in run_rows:
        root = find(lab)
        b = boxes.get(root)
        if b is None:
            boxes[root] = [x0, y, x1, y + 1]
        else:
            b[0] = min(b[0], x0)
            b[2] = max(b[2], x1)
            b[3] = y + 1
    out = np.array(sorted(boxes.values(), key=lambda b: (b[1], b[0])), dtype=np.int64)
    return out


def detect_words_from_pixels(img: np.ndarray, dpi: int = 36) -> list[dict]:
    """Pixel-space word detection: connected ink components back-projected to
    point coordinates — the raster analog of a layout detector's output shape
    (``{x0, top, x1, bottom, score}``), ready for the ReplayDetector /
    ``attach_detections`` offline-inference path. On glyph-box rasters the
    recovered boxes equal the rendered word rects exactly (pinned in tests);
    on real scans this is the classic run-length CC word detector."""
    scale = dpi / 72.0
    return [
        {
            "x0": round(b[0] / scale, 2),
            "top": round(b[1] / scale, 2),
            "x1": round(b[2] / scale, 2),
            "bottom": round(b[3] / scale, 2),
            "score": 1.0,
        }
        for b in boxes_from_pixels(img)
    ]


# ----------------------------------------------------- glyph atlas + toy OCR

_ATLAS: "dict[str, np.ndarray] | None" = None


def glyph_atlas() -> "dict[str, np.ndarray]":
    """Deterministic injective 7×5 glyph atlas for printable ASCII.

    Bitmaps are md5-derived patterns (not human letterforms — the point is a
    self-consistent, copyright-free atlas the raster and the recognizer
    share), with the outer rows/columns forced to carry ink so every glyph's
    ink bounding box equals its cell exactly (the property the segmentation
    step relies on), and a salt-retry loop enforcing pairwise distinctness.
    The ``DoctrTextRecognizer`` analog's model weights, in effect
    (``extern/doctrocr.py:254`` — the real recognizer is a CRNN; this is the
    same contract with a template bank)."""
    global _ATLAS
    if _ATLAS is not None:
        return _ATLAS
    import hashlib

    atlas: dict[str, np.ndarray] = {}
    seen: set[bytes] = set()
    for code in range(33, 127):
        ch = chr(code)
        for salt in range(64):
            h = hashlib.md5(f"glyph:{ch}:{salt}".encode()).digest()
            bits = np.unpackbits(np.frombuffer(h, np.uint8))[:35].reshape(7, 5).astype(bool)
            bits[0, :] |= np.unpackbits(np.frombuffer(h[8:], np.uint8))[:5].astype(bool)
            # force ink on every edge so the ink bbox == the glyph cell
            bits[0, 0] = bits[0, 4] = bits[6, 0] = bits[6, 4] = True
            key = np.packbits(bits).tobytes()
            if key not in seen:
                seen.add(key)
                atlas[ch] = bits
                break
        else:  # pragma: no cover - 64 salts never all collide over 94 chars
            raise RuntimeError("glyph atlas collision")
    _ATLAS = atlas
    return atlas


def _glyph_cell_geometry(px0: int, py0: int, px1: int, py1: int, n_chars: int):
    """Shared fitting rule: integer cell pitch and glyph scale for ``n_chars``
    glyphs inside a word's pixel rect. Returns ``(pitch, sx, sy)``;
    ``sx < 1`` or ``sy < 1`` means the rect is too small to carry glyphs."""
    if n_chars <= 0:
        return 0, 0, 0
    pitch = (px1 - px0) // n_chars
    sx = (pitch - 1) // 5  # ≥1 blank column between consecutive glyphs
    sy = (py1 - py0) // 7
    return pitch, sx, sy


def render_words_glyphs(
    words: list[dict], width: float, height: float, dpi: int = 144
) -> np.ndarray:
    """Glyph-level page raster: each word's characters stamp their atlas
    bitmaps at integer scale on the word's cell grid (vs :func:`render_words`
    which fills solid boxes — that path feeds the detector/deskew oracles and
    stays untouched). Words whose rect can't fit scale-1 glyphs render
    nothing, mirroring :func:`expected_ocr_text`."""
    scale = dpi / 72.0
    w_px = max(1, int(math.ceil(width * scale)))
    h_px = max(1, int(math.ceil(height * scale)))
    img = np.full((h_px, w_px), 255, dtype=np.uint8)
    atlas = glyph_atlas()
    for w in words:
        text = str(w.get("text", ""))
        px0, py0, px1, py1 = word_pixel_rect(
            float(w["x0"]), float(w["top"]), float(w["x1"]), float(w["bottom"]), scale
        )
        pitch, sx, sy = _glyph_cell_geometry(px0, py0, px1, py1, len(text))
        if sx < 1 or sy < 1:
            continue
        for i, ch in enumerate(text):
            bm = atlas.get(ch)
            if bm is None:
                continue
            big = np.kron(bm, np.ones((sy, sx), bool))
            x = px0 + i * pitch
            y = py0
            if y + big.shape[0] > h_px or x + big.shape[1] > w_px or x < 0 or y < 0:
                continue
            region = img[y : y + big.shape[0], x : x + big.shape[1]]
            region[big] = 0
    return img


def expected_ocr_text(words: list[dict], dpi: int = 144) -> str:
    """Construction truth for :func:`ocr_words_from_pixels`: the words whose
    rects carry scale-≥1 glyphs, with unknown-atlas chars dropped — computed
    from geometry alone (never by running the recognizer), so oracle equality
    pins the recognition itself, not just the plumbing."""
    scale = dpi / 72.0
    atlas = glyph_atlas()
    out = []
    for w in words:
        text = str(w.get("text", ""))
        px0, py0, px1, py1 = word_pixel_rect(
            float(w["x0"]), float(w["top"]), float(w["x1"]), float(w["bottom"]), scale
        )
        _, sx, sy = _glyph_cell_geometry(px0, py0, px1, py1, len(text))
        if sx < 1 or sy < 1:
            continue
        kept = "".join(ch for ch in text if ch in atlas)
        if kept:
            out.append(kept)
    return " ".join(out)


def ocr_words_from_pixels(
    img: np.ndarray, rects: list[tuple[float, float, float, float]], dpi: int = 144
) -> list[str]:
    """Recognize each word crop of a glyph raster: column-projection
    segmentation inside the rect finds ink runs (one per glyph — atlas edges
    are always inked), each run's exact integer downsample goes through
    nearest-template (Hamming) matching against the atlas. Pixels in, text
    out — the ``DoctrTextRecognizer`` crop→text contract."""
    scale = dpi / 72.0
    atlas = glyph_atlas()
    chars = sorted(atlas)  # deterministic tie order
    bank = np.stack([atlas[c] for c in chars]).reshape(len(chars), -1)
    texts: list[str] = []
    for x0, top, x1, bottom in rects:
        px0, py0, px1, py1 = word_pixel_rect(x0, top, x1, bottom, scale)
        px0c, py0c = max(0, px0), max(0, py0)
        crop = img[py0c : min(py1, img.shape[0]), px0c : min(px1, img.shape[1])]
        ink = crop < 128
        col_has = ink.any(axis=0)
        # ink-column runs = glyph cells
        edges = np.flatnonzero(np.diff(np.concatenate([[0], col_has.view(np.int8), [0]])))
        word = []
        for rs, re_ in zip(edges[0::2], edges[1::2]):
            run_w = int(re_ - rs)
            rows = np.flatnonzero(ink[:, rs:re_].any(axis=1))
            if not rows.size or run_w % 5:
                word.append("?")
                continue
            run_h = int(rows[-1] - rows[0] + 1)
            if run_h % 7:
                word.append("?")
                continue
            sx, sy = run_w // 5, run_h // 7
            cell = ink[rows[0] : rows[0] + 7 * sy, rs : rs + 5 * sx]
            small = cell.reshape(7, sy, 5, sx).max(axis=(1, 3))
            d = (bank != small.reshape(-1)).sum(axis=1)
            word.append(chars[int(np.argmin(d))])
        texts.append("".join(word))
    return texts
