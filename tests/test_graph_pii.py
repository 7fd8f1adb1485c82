"""Connected components (duplicate clusters) and PII redaction."""

import pyarrow as pa
import pytest

import ray.data

from deepdoctection_ray.stages.graph import connected_components, dup_clusters
from deepdoctection_ray.stages.pii import redact_pii


def _pairs(rows):
    a = pa.array([r[0] for r in rows], pa.int64())
    b = pa.array([r[1] for r in rows], pa.int64())
    return ray.data.from_arrow(pa.table({"id_a": a, "id_b": b}))


def _labels(ds):
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return dict(zip(out["doc_id"], out["cluster_id"]))


def test_cc_chain_and_islands(ray_session):
    # a 10-node chain (diameter 9 — forces several propagation rounds), a
    # separate pair, and a triangle with a redundant edge
    rows = [(i, i + 1) for i in range(1, 10)]
    rows += [(100, 101)]
    rows += [(200, 201), (201, 202), (200, 202)]
    lab = _labels(connected_components(_pairs(rows)))
    assert {n: lab[n] for n in range(1, 11)} == {n: 1 for n in range(1, 11)}
    assert lab[100] == lab[101] == 100
    assert lab[200] == lab[201] == lab[202] == 200
    assert len(lab) == 15


def test_cc_orientation_independent(ray_session):
    # (hi, lo) pairs must cluster the same as (lo, hi)
    lab = _labels(connected_components(_pairs([(5, 2), (9, 5)])))
    assert lab == {2: 2, 5: 2, 9: 2}


def test_cc_empty(ray_session):
    empty = ray.data.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    )
    out = connected_components(empty)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "cluster_id"}


def test_cc_star_equals_label(ray_session):
    """large-star/small-star must produce the identical cluster assignment
    on chains, islands, triangles and a random graph."""
    import random

    rows = [(i, i + 1) for i in range(1, 10)]
    rows += [(100, 101)]
    rows += [(200, 201), (201, 202), (200, 202)]
    rng = random.Random(17)
    rows += [
        (rng.randrange(300, 360), rng.randrange(300, 360)) for _ in range(80)
    ]
    rows = [(a, b) for a, b in rows if a != b]
    lab = _labels(connected_components(_pairs(rows), method="label"))
    star = _labels(connected_components(_pairs(rows), method="star"))
    assert star == lab


def test_cc_star_logarithmic_rounds_on_long_path(ray_session):
    """Adversarial 10k-node path: diameter 9999 would force ~10k label-
    propagation rounds; the star contraction must finish in O(log n)."""
    import math

    n = 10_000
    rows = [(i, i + 1) for i in range(n - 1)]
    stats: dict = {}
    out = connected_components(
        _pairs(rows), method="star", max_iters=64, stats=stats
    ).to_pandas()
    assert stats["rounds"] <= 3 * int(math.log2(n)) + 5
    assert len(out) == n
    assert (out["cluster_id"] == 0).all()


def test_cc_star_empty(ray_session):
    empty = ray.data.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    )
    out = connected_components(empty, method="star")
    assert out.count() == 0


def test_dup_clusters_planted(ray_session):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    docs = ray.data.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base},
            {"doc_id": 3, "text": base + " tail"},
            {"doc_id": 4, "text": "completely different words about ray data pipelines " * 6},
        ]
    )
    lab = _labels(dup_clusters(docs, "text", "doc_id", threshold=0.5))
    assert lab[1] == lab[2] == lab[3] == 1
    assert 4 not in lab  # no collisions -> never enters the graph


def test_redact_pii_planted(ray_session):
    ds = ray.data.from_items(
        [
            {
                "doc_id": 1,
                "text": "mail a@b.io and c.d+x@e-f.org, ssn 123-45-6789, "
                "call 800-555-1234 or 800.555.9999, host 192.168.0.1 ok",
            },
            {"doc_id": 2, "text": "nothing sensitive here"},
        ]
    )
    out = redact_pii(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    r0 = out.iloc[0]
    assert (r0.n_email, r0.n_ssn, r0.n_phone, r0.n_ipv4) == (2, 1, 2, 1)
    assert r0.clean_text == (
        "mail <EMAIL> and <EMAIL>, ssn <SSN>, "
        "call <PHONE> or <PHONE>, host <IPV4> ok"
    )
    r1 = out.iloc[1]
    assert (r1.n_email, r1.n_ssn, r1.n_phone, r1.n_ipv4) == (0, 0, 0, 0)
    assert r1.clean_text == "nothing sensitive here"


def test_pii_ordering_ssn_before_phone(ray_session):
    # an SSN must be consumed by the SSN pattern, not half-eaten by phone
    ds = ray.data.from_items([{"doc_id": 1, "text": "id 987-65-4321 tel 987-654-3210"}])
    row = redact_pii(ds).to_pandas().iloc[0]
    assert row.n_ssn == 1 and row.n_phone == 1
    assert row.clean_text == "id <SSN> tel <PHONE>"
