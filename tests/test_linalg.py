"""Distributed PCA + softmax regression vs single-process references."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from document_ai_ray.stages.linalg import (
    _softmax,
    pca_fit,
    pca_project,
    softmax_eval,
    softmax_train,
)


def _toy(n=400, d=16, k=4, seed=5):
    rng = np.random.RandomState(seed)
    cents = rng.randn(k, d) * 3
    y = rng.randint(0, k, n)
    X = cents[y] + rng.randn(n, d)
    return X.astype(np.float64), y


def _ds(X, y=None, nblocks=4):
    cols = {"embedding": pa.array([list(map(float, r)) for r in X], pa.list_(pa.float32()))}
    if y is not None:
        cols["label"] = pa.array(y.tolist(), pa.int32())
    return rd.from_arrow(pa.table(cols)).repartition(nblocks)


def test_pca_matches_numpy_reference(ray_session):
    X, _ = _toy()
    Xf = X.astype(np.float32).astype(np.float64)  # the list<float> round-trip
    comps, ratio, mean = pca_fit(_ds(X), k=5)
    cov = np.cov(Xf, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:5]
    want = evecs[:, order].T
    flip = np.sign(want[np.arange(5), np.abs(want).argmax(axis=1)])
    want = want * flip[:, None]
    assert np.allclose(comps, want, atol=1e-8)
    assert np.allclose(ratio, evals[order] / evals.sum(), atol=1e-10)
    assert np.allclose(mean, Xf.mean(axis=0), atol=1e-10)
    # orthonormal, variance-sorted
    assert np.allclose(comps @ comps.T, np.eye(5), atol=1e-10)
    assert (np.diff(ratio) <= 1e-15).all()


def test_pca_project_captures_variance(ray_session):
    X, _ = _toy()
    comps, ratio, mean = pca_fit(_ds(X), k=3)
    out = pca_project(_ds(X), comps, mean).to_pandas()
    P = np.array(out["pc"].tolist())
    Xf = X.astype(np.float32).astype(np.float64)
    tot = np.var(Xf - Xf.mean(axis=0), axis=0).sum()
    assert np.allclose(P.var(axis=0, ddof=0).sum() / tot, ratio.sum(), atol=1e-6)


def test_softmax_train_matches_single_process(ray_session):
    X, y = _toy()
    Xf = X.astype(np.float32).astype(np.float64)
    W, b, hist = softmax_train(_ds(X, y, nblocks=5), n_classes=4, n_iter=15, lr=2.0)
    # reference: identical full-batch GD
    Wr = np.zeros((X.shape[1], 4)); br = np.zeros(4); histr = []
    Y = np.eye(4)[y]
    for _ in range(15):
        p = _softmax(Xf @ Wr + br)
        histr.append(float(-np.log(p[np.arange(len(y)), y]).mean()))
        Wr -= 2.0 * Xf.T @ (p - Y) / len(y)
        br -= 2.0 * (p - Y).mean(axis=0)
    assert np.allclose(W, Wr, atol=1e-9)
    assert np.allclose(b, br, atol=1e-9)
    assert np.allclose(hist, histr, atol=1e-9)
    assert all(b2 <= a2 + 1e-12 for a2, b2 in zip(hist, hist[1:]))


def test_softmax_learns_separable_clusters(ray_session):
    X, y = _toy()
    ds = _ds(X, y, nblocks=3)
    W, b, _ = softmax_train(ds, n_classes=4, n_iter=25, lr=2.0)
    conf = softmax_eval(_ds(X, y, nblocks=3), W, b)
    assert conf.sum() == len(y)
    acc = np.diag(conf).sum() / conf.sum()
    assert acc > 0.9  # well-separated gaussian clusters
