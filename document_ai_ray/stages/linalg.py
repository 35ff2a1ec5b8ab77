"""Distributed dense-embedding fits: PCA and softmax regression.

Both follow the engine's combiner discipline — the corpus-sized work is
a streaming pass emitting FIXED-size partials (d-, d*d- or d*k-sized
sums), merged on the driver; the model itself is broadcast once per
iteration via ray.put.  Nothing corpus-sized ever concentrates:

- `pca_fit`: moment accumulation (n, Σx, Σxxᵀ) per batch -> exact
  covariance -> driver-side eigh (d=64 here; eigh on d×d is trivial).
  The classic embedding-compression step before ANN indexing.
- `softmax_train`: full-batch gradient descent for multinomial
  logistic regression — per-batch partial gradient Xᵀ(P−Y) and loss,
  summed on the driver, one broadcast per iteration.  The
  FineWeb-Edu-style quality-classifier shape (train a cheap linear
  head on embeddings, then filter the corpus with it).  Deterministic:
  zero init + full-batch => no seed, byte-stable up to float summation
  order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from document_ai_ray.stages.similarity import _to_matrix


def _moment_partials(ds, vec_col: str):
    """Stream (n, Σx, Σxxᵀ) partials; returns merged (n, s, S)."""

    def partial(t: pa.Table) -> pa.Table:
        m = _to_matrix(t.column(vec_col)).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([m.shape[0]], pa.int64()),
                "s": pa.array([m.sum(axis=0).tobytes()], pa.binary()),
                "ss": pa.array([(m.T @ m).tobytes()], pa.binary()),
            }
        )

    n_tot, s_tot, ss_tot = 0, None, None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for n, s, ss in zip(
            b.column("n").to_pylist(), b.column("s").to_pylist(), b.column("ss").to_pylist()
        ):
            sv = np.frombuffer(s, dtype=np.float64)
            d = sv.shape[0]
            ssv = np.frombuffer(ss, dtype=np.float64).reshape(d, d)
            n_tot += n
            s_tot = sv if s_tot is None else s_tot + sv
            ss_tot = ssv if ss_tot is None else ss_tot + ssv
    return n_tot, s_tot, ss_tot


def pca_fit(ds, k: int, vec_col: str = "embedding"):
    """Exact PCA from one streaming moments pass.  Returns (components
    (k, d) rows = top-variance directions, explained_variance_ratio
    (k,), mean (d,)).  Sign convention: each component's
    largest-|coordinate| entry is made positive (eigh's sign is
    arbitrary; this pins a deterministic one)."""
    n, s, ss = _moment_partials(ds, vec_col)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    total_var = float(evals.sum())
    ratio = evals[order] / total_var if total_var > 0 else np.zeros(len(order))
    return comps, ratio, mean


def pca_project(ds, comps: np.ndarray, mean: np.ndarray, vec_col: str = "embedding", out_col: str = "pc"):
    """Project every vector onto the fitted components: one broadcast,
    one streaming matmul pass."""
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast

    ref = ray.put((comps, mean))

    def project(t: pa.Table) -> pa.Table:
        c, mu = get_broadcast((ref,), tag="pca_components")
        m = _to_matrix(t.column(vec_col)).astype(np.float64)
        proj = (m - mu) @ c.T
        return t.drop_columns([vec_col]).append_column(
            out_col, pa.array(list(proj), pa.list_(pa.float64()))
        )

    return ds.map_batches(project, batch_format="pyarrow")


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    p = np.exp(z)
    return p / p.sum(axis=1, keepdims=True)


def softmax_train(
    ds,
    n_classes: int,
    n_iter: int = 60,
    lr: float = 5.0,
    vec_col: str = "embedding",
    label_col: str = "label",
):
    """Full-batch multinomial logistic regression.  Returns (W (d, k),
    b (k,), loss_history).  Per iteration: broadcast (W, b), stream
    partial (Xᵀ(P−Y), Σ(P−Y), Σ−log p_y, n) per batch, merge on the
    driver (d*k floats per batch row), one gradient step."""
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast

    # iterative algorithm: materialize once so each of the n_iter scans
    # reads the object store, not the source parquet (kmeans_lloyd's
    # documented tradeoff — the store spills if the table outgrows RAM)
    ds = ds.materialize()
    W = b = None
    history: list[float] = []
    for it in range(n_iter):
        params_ref = ray.put((W, b, n_classes))
        tag = f"softmax_it{it}_{id(ds)}"

        def partial(t: pa.Table, _ref=params_ref, _tag=tag) -> pa.Table:
            Wc, bc, k = get_broadcast((_ref,), tag=_tag)
            m = _to_matrix(t.column(vec_col)).astype(np.float64)
            y = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if Wc is None:
                Wc = np.zeros((m.shape[1], k))
                bc = np.zeros(k)
            p = _softmax(m @ Wc + bc)
            Y = np.eye(k)[y]
            diff = p - Y
            loss = float(-np.log(np.maximum(p[np.arange(len(y)), y], 1e-300)).sum())
            return pa.table(
                {
                    "n": pa.array([m.shape[0]], pa.int64()),
                    "gw": pa.array([(m.T @ diff).tobytes()], pa.binary()),
                    "gb": pa.array([diff.sum(axis=0).tobytes()], pa.binary()),
                    "loss": pa.array([loss], pa.float64()),
                }
            )

        n_tot, gw, gb, loss = 0, None, None, 0.0
        for bt in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for n, w_, b_, l_ in zip(
                bt.column("n").to_pylist(),
                bt.column("gw").to_pylist(),
                bt.column("gb").to_pylist(),
                bt.column("loss").to_pylist(),
            ):
                gbv = np.frombuffer(b_, dtype=np.float64)
                k = gbv.shape[0]
                gwv = np.frombuffer(w_, dtype=np.float64).reshape(-1, k)
                n_tot += n
                gw = gwv if gw is None else gw + gwv
                gb = gbv if gb is None else gb + gbv
                loss += l_
        if W is None:
            W = np.zeros_like(gw)
            b = np.zeros_like(gb)
        W = W - lr * gw / n_tot
        b = b - lr * gb / n_tot
        history.append(loss / n_tot)
    return W, b, history


def softmax_eval(ds, W: np.ndarray, b: np.ndarray, vec_col: str = "embedding", label_col: str = "label"):
    """Streaming confusion counts -> per-class precision/recall/F1 +
    overall accuracy.  Partials are k×k count matrices."""
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast

    k = W.shape[1]
    ref = ray.put((W, b))

    def partial(t: pa.Table) -> pa.Table:
        Wc, bc = get_broadcast((ref,), tag="softmax_eval")
        m = _to_matrix(t.column(vec_col)).astype(np.float64)
        y = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pred = (m @ Wc + bc).argmax(axis=1)
        conf = np.zeros((k, k), np.int64)
        np.add.at(conf, (y, pred), 1)
        return pa.table({"conf": pa.array([conf.tobytes()], pa.binary())})

    conf = np.zeros((k, k), np.int64)
    for bt in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for c in bt.column("conf").to_pylist():
            conf += np.frombuffer(c, dtype=np.int64).reshape(k, k)
    return conf
