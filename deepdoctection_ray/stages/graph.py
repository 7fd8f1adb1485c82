"""Distributed connected components — duplicate-PAIR output → duplicate CLUSTERS.

Near-dup detection (``dedup_minhash`` / ``dedup_simhash`` /
``dedup_embedding_cosine``) emits verified (id_a, id_b) PAIRS. A training-data
pipeline needs CLUSTERS: every document assigned a canonical cluster id so one
representative per duplicate group survives. The reference has no cross-record
graph operation at all (its duplicate handling is per-record
``annotation_id`` rejection, dd_core/datapoint/image.py:686-707), so this
surface is native to the Ray rebuild.

Algorithm: iterative min-label propagation on the pairs graph, expressed as
ONE bucketed groupby per iteration (the repo's ``bucketed_map_groups``
co-partitioning — no joins, no per-key Python groups):

- state rows ``(node, val)`` are label candidates; edge rows carry the static
  adjacency. Both are hash-bucketed by node/src with the same vectorized hash,
  so a node's candidates and its outgoing edges meet in one pandas frame.
- each iteration reduces candidates to ``lab(node) = min(val)`` (vectorized
  groupby) and emits ``(node, lab)`` plus one message ``(dst, lab(src))`` per
  edge. Labels are monotone non-increasing, so the global sum of reduced
  labels is a convergence witness: fixpoint ⇔ the sum stops moving.

Scale notes (100-TB shape): only the PAIRS graph is touched — a tiny fraction
of the corpus (docs that collided in some LSH band). Each iteration is one
hash exchange of O(E) small int rows; iteration count is the max component
diameter, which for near-dup clusters (near-cliques around a template) is
2-4. For adversarial long-chain graphs switch to the alternating
large-star/small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond") — same bucketed primitive, O(log^2 n) rounds; not
needed for dedup workloads and kept out to keep the kernel auditable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.bucketed import BUCKET_COL, tag_buckets

__all__ = ["connected_components", "dup_clusters"]

_KIND_LAB = 0  # reduced (authoritative) label row
_KIND_MSG = 1  # label message sent along an edge
_KIND_EDGE = 2  # static adjacency row (node=src, val=dst)


def _step(g: pa.Table) -> pa.Table:
    """One propagation round for one bucket: reduce candidate labels per node,
    then forward each node's label along its outgoing edges."""
    node = g["node"].to_numpy(zero_copy_only=False)
    val = g["val"].to_numpy(zero_copy_only=False)
    kind = g["kind"].to_numpy(zero_copy_only=False)
    is_edge = kind == _KIND_EDGE
    cand = pd.DataFrame({"node": node[~is_edge], "val": val[~is_edge]})
    lab = cand.groupby("node")["val"].min()
    src = node[is_edge]
    dst = val[is_edge]
    msg_lab = lab.reindex(src).to_numpy()
    out_node = np.concatenate([lab.index.to_numpy(), dst])
    out_val = np.concatenate([lab.to_numpy(), msg_lab])
    out_kind = np.concatenate(
        [
            np.full(len(lab), _KIND_LAB, dtype=np.int8),
            np.full(len(dst), _KIND_MSG, dtype=np.int8),
        ]
    )
    return pa.table(
        {
            "node": pa.array(out_node, pa.int64()),
            "val": pa.array(out_val, pa.int64()),
            "kind": pa.array(out_kind, pa.int8()),
        }
    )


def _lab_sum(state: ray.data.Dataset) -> int:
    """Sum of reduced labels (kind=0 rows) — the monotone convergence witness.
    Per-batch partial sums; only one int per block reaches the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        kind = batch["kind"].to_numpy(zero_copy_only=False)
        val = batch["val"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(val[kind == _KIND_LAB].sum())], pa.int64())})

    part = state.map_batches(partial, batch_format="pyarrow", batch_size=None)
    total = part.sum("s")
    return int(total) if total is not None else 0


def connected_components(
    pairs: ray.data.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_buckets: int = 32,
    max_iters: int = 64,
) -> ray.data.Dataset:
    """Connected components over an undirected pair dataset.

    Returns ``(doc_id, cluster_id)`` for every node that appears in at least
    one pair, where ``cluster_id`` is the minimum node id of its component
    (the canonical representative; ``doc_id == cluster_id`` marks the row a
    training pipeline keeps). Node ids must be integers (the documents
    table's int64 ``doc_id``); monotone min-propagation is what makes the
    convergence check exact.
    """

    def explode(batch: pa.Table) -> pa.Table:
        a = batch[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        src = pa.array(np.concatenate([a, b]), pa.int64())
        dst = pa.array(np.concatenate([b, a]), pa.int64())
        kind = pa.array(np.full(len(src), _KIND_EDGE, dtype=np.int8))
        return pa.table({"node": src, "val": dst, "kind": kind})

    edges = pairs.map_batches(explode, batch_format="pyarrow", batch_size=None)
    edges = edges.map_batches(
        lambda t: tag_buckets(t, ["node"], num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
    )
    if edges.count() == 0:
        return ray.data.from_arrow(empty)

    # initial candidates: every endpoint labels itself (node, node); the tag
    # of (src, src) equals the edge row's tag — both hash the src value
    def init_state(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "val": batch["node"],
                "kind": pa.array(np.full(len(batch), _KIND_LAB, dtype=np.int8)),
                BUCKET_COL: batch[BUCKET_COL],
            }
        )

    state = edges.map_batches(init_state, batch_format="pyarrow", batch_size=None)
    prev_sum: int | None = None
    for _ in range(max_iters):
        stepped = (
            state.union(edges)
            .groupby(BUCKET_COL)
            .map_groups(_step, batch_format="pyarrow")
        )
        # re-tag (map_groups drops the bucket column) and pin this round's
        # blocks so the next union doesn't re-execute the whole history
        state = stepped.map_batches(
            lambda t: tag_buckets(t, ["node"], num_buckets),
            batch_format="pyarrow",
            batch_size=None,
        ).materialize()
        cur = _lab_sum(state)
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations"
        )

    def finish(batch: pa.Table) -> pa.Table:
        mask = pa.compute.equal(batch["kind"], _KIND_LAB)
        kept = batch.filter(mask)
        return pa.table({"doc_id": kept["node"], "cluster_id": kept["val"]})

    return state.map_batches(finish, batch_format="pyarrow", batch_size=None)


def dup_clusters(
    docs: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    threshold: float = 0.5,
    **minhash_kwargs,
) -> ray.data.Dataset:
    """MinHash near-dup pairs → transitive duplicate clusters.

    The end-to-end "which rows do I drop" operator: detect pairs with
    ``dedup_minhash`` (exact-verified), then assign every involved doc its
    component's canonical min id. Docs that collide with nothing never enter
    the graph (they are their own cluster by definition and are not emitted —
    the output stays pair-graph-sized, not corpus-sized).
    """
    from .dedup import dedup_minhash

    pairs = dedup_minhash(
        docs, text_column, id_column, threshold=threshold, **minhash_kwargs
    )
    return connected_components(pairs, "id_a", "id_b")
