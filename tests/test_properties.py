"""Property-based tests (hypothesis) for the round-3 kernels: HTML table
tiling occupancy invariants and MG/PPJoin guarantees — complements the
example-based pins with generated structure."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def html_tables(draw):
    """Random well-formed span tables as token streams: rows are generated
    left-to-right against an occupancy simulation INDEPENDENT of the
    implementation's (cells get spans that never collide with earlier
    rowspans by construction)."""
    n_rows = draw(st.integers(2, 6))
    n_cols = draw(st.integers(2, 6))
    occupied: set[tuple[int, int]] = set()
    tokens: list[str] = ["<tbody>"]
    cells = 0
    for r in range(n_rows):
        tokens.append("<tr>")
        c = 0
        while c < n_cols:
            if (r, c) in occupied:
                c += 1
                continue
            free_right = 0
            while c + free_right < n_cols and (r, c + free_right) not in occupied:
                free_right += 1
            cs = draw(st.integers(1, free_right))
            rs = draw(st.integers(1, n_rows - r))
            for dr in range(rs):
                for dc in range(cs):
                    occupied.add((r + dr, c + dc))
            if rs == 1 and cs == 1:
                tokens.append("<td>")
            else:
                tokens.append("<td")
                if rs > 1:
                    tokens.append(f'rowspan="{rs}"')
                if cs > 1:
                    tokens.append(f'colspan="{cs}"')
                tokens.append(">")
            cells += 1
            c += cs
        tokens.append("</tr>")
    tokens.append("</tbody>")
    return tokens, cells


@given(html_tables())
@settings(max_examples=60, deadline=None)
def test_tile_html_table_occupancy_invariants(table):
    from deepdoctection_ray.datasets import tile_html_table

    tokens, n_cells = table
    cells = tile_html_table(tokens)
    assert len(cells) == n_cells
    seen: set[tuple[int, int]] = set()
    for c in cells:
        assert c["row_number"] >= 1 and c["column_number"] >= 1
        region = {
            (c["row_number"] + dr, c["column_number"] + dc)
            for dr in range(c["row_span"])
            for dc in range(c["column_span"])
        }
        assert not (region & seen)  # spans never overlap
        seen |= region
    # row numbers are non-decreasing in document order
    rows = [c["row_number"] for c in cells]
    assert rows == sorted(rows)


@given(
    st.lists(st.text(alphabet="abcdefg ", min_size=0, max_size=60), min_size=2, max_size=12),
    st.sampled_from([0.3, 0.5, 0.8]),
)
@settings(max_examples=40, deadline=None)
def test_prefix_filter_lossless(texts, threshold):
    """PPJoin prefix lemma: any pair with Jaccard ≥ t shares a shingle in
    BOTH prefixes — the exact claim dedup_ngram_jaccard's pruning relies on."""
    from deepdoctection_ray.stages.dedup import jaccard, shingle_hashes

    sets = [np.unique(shingle_hashes(t)) for t in texts]

    def prefix(sh):
        n = len(sh)
        return set(sh[: max(1, n - int(np.ceil(threshold * n)) + 1)])

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            if jaccard(set(sets[i]), set(sets[j])) >= threshold:
                assert prefix(sets[i]) & prefix(sets[j])


@given(st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 500)), min_size=1, max_size=300, unique_by=lambda kv: kv[0]))
@settings(max_examples=30, deadline=None)
def test_misra_gries_merge_guarantee(pairs):
    """Merged MG summaries keep every item with frequency > N/capacity and
    never overcount."""
    from collections import Counter

    from deepdoctection_ray.stages.text_stats import MisraGries

    items = [f"i{k}" for k, rep in pairs for _ in range(rep % 7 + 1)]
    exact = Counter(items)
    total = len(items)
    cap = 16
    half = len(items) // 2
    a, b = MisraGries(cap), MisraGries(cap)
    a.add(items[:half])
    b.add(items[half:])
    merged = a.merge(b)
    for it, n in exact.items():
        if n > total / cap:
            assert it in merged.counts
    for it, n in merged.counts.items():
        assert n <= exact[it]
