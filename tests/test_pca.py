"""Distributed PCA (stages/pca.py)."""

import numpy as np
import pyarrow as pa

import ray.data

from deepdoctection_ray.stages.pca import (
    covariance_table,
    fit_pca,
    project_pca,
)


def _make_ds(n=400, d=8, seed=3, n_blocks=7):
    rng = np.random.RandomState(seed)
    # anisotropic data: strong first axis, decaying variances
    scales = np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.3, 0.2, 0.1])[:d]
    X = rng.standard_normal((n, d)) * scales[None, :] + rng.standard_normal(d)[None, :]
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                list(X.astype(np.float32)), pa.list_(pa.float32())
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks), X.astype(np.float32).astype(np.float64)


def test_covariance_matches_numpy(ray_session):
    ds, X = _make_ds()
    got = covariance_table(ds, "embedding").to_pandas()
    cov = np.cov(X, rowvar=False, bias=True)  # population covariance
    for _, r in got.iterrows():
        assert abs(r["cov"] - cov[int(r["di"]) - 1, int(r["dj"]) - 1]) < 2e-6
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2


def test_fit_pca_matches_numpy_eigh(ray_session):
    ds, X = _make_ds()
    model = fit_pca(ds, "embedding")
    cov = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    w = w[::-1]
    # eigenvalues descending and matching numpy's
    assert np.all(np.diff(model.eigvals) <= 1e-12)
    assert np.allclose(model.eigvals, w, atol=1e-8)
    # components orthonormal
    G = model.components @ model.components.T
    assert np.allclose(G, np.eye(len(G)), atol=1e-10)
    # axes match numpy's up to sign
    for j in range(X.shape[1]):
        dot = abs(float(model.components[j] @ v[:, ::-1][:, j]))
        assert dot > 1.0 - 1e-8
    # explained ratio sums to 1 over all components
    assert abs(model.explained_ratio.sum() - 1.0) < 1e-9


def test_project_pca_variance_and_whitening(ray_session):
    ds, X = _make_ds()
    model = fit_pca(ds, "embedding", k=3)
    out = project_pca(ds, model, output_column="pca").to_pandas()
    Y = np.asarray(out["pca"].tolist(), dtype=np.float64)
    assert Y.shape == (len(X), 3)
    # component variances equal the top eigenvalues (float32 storage noise)
    var = Y.var(axis=0)
    assert np.allclose(var, model.eigvals[:3], rtol=1e-3)
    # whitened projection has unit variance per component
    white = project_pca(ds, model, output_column="pca", whiten=True).to_pandas()
    Z = np.asarray(white["pca"].tolist(), dtype=np.float64)
    assert np.allclose(Z.var(axis=0), 1.0, rtol=1e-3)
    # original columns survive
    assert "vec_id" in out.columns and "embedding" in out.columns


def test_fit_pca_empty_raises(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"embedding": pa.array([], pa.list_(pa.float32()))})
    )
    try:
        fit_pca(ds, "embedding")
        raised = False
    except ValueError:
        raised = True
    assert raised
