"""Distributed PCA / embedding whitening (moment accumulation + projection).

Curation pipelines whiten or reduce embedding columns before clustering and
ANN search (SemDeDup clusters in a reduced space; IVF centroids train
faster there). The reference has no distributed linear algebra — this is a
Ray-Data-first addition in the spirit of its transform services.

Design (100-TB shape):

- **fitting is moment accumulation, not data movement.** Each batch emits
  ONE partial row — ``(n, Σx, ΣxᵀX)`` packed as binary — so the exchange
  carries block-count rows of ~``8·(d² + d)`` bytes, never the corpus. A
  tree-combine ``map_batches`` level coalesces partials 128:1 before the
  driver sums the remainder (add levels for extreme block counts; each is
  one cheap narrow stage).
- **the eigendecomposition is driver-side by construction**: the combined
  moment matrix is ``d × d`` (d = embedding dim, ~64-4096) — model-sized,
  like the IVF centroid and NB model paths.
- **projection is a stateless vectorized map**: one ``(X − μ) @ Wᵀ`` GEMM
  per batch; the model ships to workers once via the closure (put-once,
  broadcast by Ray's object store).

The distributed part (mean/covariance over the corpus) is what can go wrong
at scale, so that is what the gate oracle ``q_embed_cov`` hash-checks
against a DuckDB rebuild; the driver-side eigen step is pinned by pytest
against ``np.linalg.eigh`` on the same moments.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

from .similarity import embedding_matrix

__all__ = ["PCAModel", "fit_pca", "project_pca", "covariance_table"]


@dataclass
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = principal axes, eigval desc
    eigvals: np.ndarray       # (k,) population-covariance eigenvalues
    explained_ratio: np.ndarray  # (k,) eigval / total variance


def _moments(ds: ray.data.Dataset, embedding_column: str) -> tuple[int, np.ndarray, np.ndarray]:
    """One streaming pass → global ``(n, Σx, XᵀX)`` in float64.

    Per-batch partials (one tiny row each) → 128:1 tree combine →
    driver sum of the remainder. Nothing corpus-sized moves.
    """

    def partial(batch: pa.Table) -> pa.Table:
        X = embedding_matrix(batch[embedding_column]).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([len(X)], pa.int64()),
                "sx": pa.array([X.sum(axis=0).tobytes()], pa.binary()),
                "sxx": pa.array([(X.T @ X).tobytes()], pa.binary()),
                "d": pa.array([X.shape[1]], pa.int64()),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        d = int(batch["d"][0].as_py())
        n = int(np.sum(batch["n"].to_numpy(zero_copy_only=False)))
        sx = np.zeros(d, np.float64)
        sxx = np.zeros((d, d), np.float64)
        for b_sx, b_sxx in zip(batch["sx"].to_pylist(), batch["sxx"].to_pylist()):
            sx += np.frombuffer(b_sx, np.float64)
            sxx += np.frombuffer(b_sxx, np.float64).reshape(d, d)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "sx": pa.array([sx.tobytes()], pa.binary()),
                "sxx": pa.array([sxx.tobytes()], pa.binary()),
                "d": pa.array([d], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=128)
        .take_all()
    )  # ≤ ceil(blocks / 128) tiny rows
    if not rows:
        raise ValueError("empty dataset: no moments to accumulate")
    d = int(rows[0]["d"])
    n = sum(int(r["n"]) for r in rows)
    sx = np.zeros(d, np.float64)
    sxx = np.zeros((d, d), np.float64)
    for r in rows:
        sx += np.frombuffer(r["sx"], np.float64)
        sxx += np.frombuffer(r["sxx"], np.float64).reshape(d, d)
    return n, sx, sxx


def fit_pca(
    ds: ray.data.Dataset, embedding_column: str = "embedding", k: int | None = None
) -> PCAModel:
    """Fit PCA with one distributed moment pass + a d×d driver eigh."""
    n, sx, sxx = _moments(ds, embedding_column)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)  # population covariance
    cov = (cov + cov.T) / 2.0             # enforce symmetry against fp drift
    w, v = np.linalg.eigh(cov)            # ascending
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    if k is not None:
        w, v = w[:k], v[:, :k]
    # deterministic sign: largest-|coefficient| entry of each axis positive
    for j in range(v.shape[1]):
        i = int(np.argmax(np.abs(v[:, j])))
        if v[i, j] < 0:
            v[:, j] = -v[:, j]
    total = max(float(np.trace(cov)), 1e-300)
    return PCAModel(
        mean=mean,
        components=v.T.copy(),
        eigvals=w,
        explained_ratio=w / total,
    )


def project_pca(
    ds: ray.data.Dataset,
    model: PCAModel,
    embedding_column: str = "embedding",
    output_column: str = "pca",
    whiten: bool = False,
) -> ray.data.Dataset:
    """Project each embedding onto the principal axes (optionally whitened:
    unit variance per component). Replaces nothing — appends a new
    ``list<float>`` column."""
    mean = model.mean
    W = model.components  # (k, d)
    scale = 1.0 / np.sqrt(np.maximum(model.eigvals, 1e-12)) if whiten else None

    def proj(batch: pa.Table) -> pa.Table:
        X = embedding_matrix(batch[embedding_column]).astype(np.float64)
        Y = (X - mean[None, :]) @ W.T
        if scale is not None:
            Y = Y * scale[None, :]
        col = pa.array(list(Y.astype(np.float32)), pa.list_(pa.float32()))
        return batch.append_column(output_column, col)

    return ds.map_batches(proj, batch_format="pyarrow")


def covariance_table(
    ds: ray.data.Dataset, embedding_column: str = "embedding"
) -> pa.Table:
    """Upper-triangle population covariance as ``(di, dj, cov)`` rows
    (1-based dims, ``di <= dj``, rounded 6) — the SQL-checkable face of the
    distributed moment pass behind :func:`fit_pca`."""
    try:
        n, sx, sxx = _moments(ds, embedding_column)
    except ValueError:
        # zero-row corpus: the covariance is an empty (typed) triangle
        return pa.table(
            {
                "di": pa.array([], pa.int64()),
                "dj": pa.array([], pa.int64()),
                "cov": pa.array([], pa.float64()),
            }
        )
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    d = len(mean)
    iu = np.triu_indices(d)
    return pa.table(
        {
            "di": pa.array((iu[0] + 1).astype(np.int64), pa.int64()),
            "dj": pa.array((iu[1] + 1).astype(np.int64), pa.int64()),
            "cov": pa.array(np.round(cov[iu], 6), pa.float64()),
        }
    )
