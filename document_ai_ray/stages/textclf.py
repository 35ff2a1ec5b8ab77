"""fastText-style linear text classifier on hashed character n-grams.

The shape of fastText's supervised mode (Joulin et al. 2016, "Bag of
Tricks for Efficient Text Classification") and of its famous lid.176
language-ID model: hash character n-grams into a fixed-size feature
table, average them, and fit a linear softmax on top.  Here the
"embedding average + linear" composition is folded into one linear map
over L1-normalized hashed counts (mathematically the same family), and
training is FULL-BATCH distributed gradient descent in the exact shape
of `stages/linalg.softmax_train`: broadcast (W, b) per iteration,
stream per-batch gradient partials, merge on the driver, step.

Everything is vectorized: a document's trigram stream is a numpy
rolling-window hash over its utf-8 bytes; per-batch logits and
gradients are `np.add.at` scatter-adds — no Python loop over tokens.

100 TB shape: per-iteration traffic is (feature_dim x k) floats per
BATCH (constant in corpus size); the hashed-feature dataset is
materialized once so the n_iter scans hit the object store, not the
source parquet (kmeans_lloyd's documented tradeoff).  feature_dim is
the standard fastText memory/collision knob.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FEATURE_DIM = 1 << 16  # hashed trigram buckets (fastText's -hash knob)


def trigram_hashes(text: str) -> np.ndarray:
    """Vectorized rolling-hash over utf-8 bytes: h_i = ((b_i*31 +
    b_{i+1})*31 + b_{i+2}) mod FEATURE_DIM.  Returns int64 bucket ids
    (empty for texts shorter than 3 bytes)."""
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), np.uint8).astype(np.int64)
    if b.shape[0] < 3:
        return np.empty(0, np.int64)
    return ((b[:-2] * 31 + b[1:-1]) * 31 + b[2:]) % FEATURE_DIM


def batch_features(texts: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat bucket ids, owning row index, per-token L1 weight) for a
    batch of texts — the sparse CSR-ish triplet every training and
    scoring pass consumes."""
    per_doc = [trigram_hashes(t) for t in texts]
    counts = np.array([h.shape[0] for h in per_doc], np.int64)
    rows = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    flat = np.concatenate(per_doc) if per_doc else np.empty(0, np.int64)
    inv = np.zeros(len(texts), np.float64)
    nz = counts > 0
    inv[nz] = 1.0 / counts[nz]
    return flat, rows, inv[rows]


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def _logits(flat, rows, w, n_rows, W, b):
    acc = np.tile(b, (n_rows, 1))
    if flat.shape[0]:
        np.add.at(acc, rows, W[flat] * w[:, None])
    return acc


def textclf_train(
    ds,
    n_classes: int,
    n_iter: int = 40,
    lr: float = 1.0,
    text_col: str = "text",
    label_col: str = "y",
):
    """Distributed full-batch softmax regression over hashed-trigram
    features with a driver-side ADAGRAD step (per-feature adaptive
    scaling — plain fixed-step GD is badly conditioned here because a
    handful of whitespace-bearing trigrams appear in every document
    while the informative ones are rare).  `ds` rows: (text_col,
    label_col int in [0, n_classes)).  Returns (W (FEATURE_DIM, k)
    float32, b (k,), loss_history).  The optimizer state lives on the
    driver and is model-sized; the distributed part is unchanged —
    broadcast params, stream gradient partials, merge."""
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast

    feats = ds.map_batches(
        lambda t: _featurize(t, text_col, label_col), batch_format="pyarrow"
    ).materialize()

    W = np.zeros((FEATURE_DIM, n_classes), np.float64)
    b = np.zeros(n_classes, np.float64)
    GW = np.zeros_like(W)  # Adagrad accumulators (driver-side)
    Gb = np.zeros_like(b)
    history: list[float] = []
    for it in range(n_iter):
        ref = ray.put((W.astype(np.float32), b, n_classes))
        tag = f"textclf_it{it}_{id(ds)}"

        def partial(t: pa.Table, _ref=ref, _tag=tag) -> pa.Table:
            Wc32, bc, k = get_broadcast((_ref,), tag=_tag)
            Wc = Wc32.astype(np.float64)
            flat, rows, w, y, n = _unpack(t)
            p = _softmax(_logits(flat, rows, w, n, Wc, bc))
            diff = p - np.eye(k)[y]
            gW = np.zeros((FEATURE_DIM, k), np.float64)
            if flat.shape[0]:
                np.add.at(gW, flat, diff[rows] * w[:, None])
            loss = float(-np.log(np.maximum(p[np.arange(n), y], 1e-300)).sum())
            return pa.table(
                {
                    "n": pa.array([n], pa.int64()),
                    "gw": pa.array([gW.astype(np.float32).tobytes()], pa.binary()),
                    "gb": pa.array([diff.sum(axis=0).tobytes()], pa.binary()),
                    "loss": pa.array([loss], pa.float64()),
                }
            )

        n_tot, gW, gb, loss = 0, None, None, 0.0
        for bt in feats.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for n, w_, b_, l_ in zip(
                bt.column("n").to_pylist(),
                bt.column("gw").to_pylist(),
                bt.column("gb").to_pylist(),
                bt.column("loss").to_pylist(),
            ):
                gbv = np.frombuffer(b_, np.float64)
                gwv = np.frombuffer(w_, np.float32).reshape(FEATURE_DIM, -1).astype(np.float64)
                n_tot += n
                gW = gwv if gW is None else gW + gwv
                gb = gbv if gb is None else gb + gbv
                loss += l_
        gW /= n_tot
        gb /= n_tot
        GW += gW * gW
        Gb += gb * gb
        W -= lr * gW / (np.sqrt(GW) + 1e-8)
        b -= lr * gb / (np.sqrt(Gb) + 1e-8)
        history.append(loss / n_tot)
    return W.astype(np.float32), b, history


def textclf_predict(ds, W: np.ndarray, b: np.ndarray, text_col: str = "text"):
    """Score a dataset with a trained model: appends pred:int32 and
    pred_prob:float64 columns (one streaming pass, model broadcast
    once via ray.put)."""
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast

    ref = ray.put((W, b))
    tag = f"textclf_pred_{id(ds)}"

    def score(t: pa.Table, _ref=ref, _tag=tag) -> pa.Table:
        Wc32, bc = get_broadcast((_ref,), tag=_tag)
        Wc = Wc32.astype(np.float64)
        texts = t.column(text_col).to_pylist()
        flat, rows, w = batch_features(texts)
        p = _softmax(_logits(flat, rows, w, len(texts), Wc, bc))
        pred = p.argmax(axis=1)
        return t.append_column(
            "pred", pa.array(pred.astype(np.int32), pa.int32())
        ).append_column(
            "pred_prob", pa.array(p[np.arange(len(texts)), pred], pa.float64())
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _featurize(t: pa.Table, text_col: str, label_col: str) -> pa.Table:
    """One compact binary-blob row per input BATCH (int32/float32
    buffers, not Arrow lists — zero per-element Python conversion on
    the n_iter re-reads)."""
    texts = t.column(text_col).to_pylist()
    flat, rows, w = batch_features(texts)
    y = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int32)
    return pa.table(
        {
            "flat": pa.array([flat.astype(np.int32).tobytes()], pa.binary()),
            "rows": pa.array([rows.astype(np.int32).tobytes()], pa.binary()),
            "w": pa.array([w.astype(np.float32).tobytes()], pa.binary()),
            "y": pa.array([y.tobytes()], pa.binary()),
            "n": pa.array([len(texts)], pa.int64()),
        }
    )


def _unpack(t: pa.Table):
    """Concatenate the (possibly several) pre-featurized blob rows of a
    batch back into flat numpy arrays."""
    flats, rowss, ws, ys = [], [], [], []
    n = 0
    for f, r, w_, y_, nn in zip(
        t.column("flat").to_pylist(),
        t.column("rows").to_pylist(),
        t.column("w").to_pylist(),
        t.column("y").to_pylist(),
        t.column("n").to_pylist(),
    ):
        flats.append(np.frombuffer(f, np.int32).astype(np.int64))
        rowss.append(np.frombuffer(r, np.int32).astype(np.int64) + n)
        ws.append(np.frombuffer(w_, np.float32).astype(np.float64))
        ys.append(np.frombuffer(y_, np.int32).astype(np.int64))
        n += int(nn)
    if not flats:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0), np.empty(0, np.int64), 0
    return (
        np.concatenate(flats),
        np.concatenate(rowss),
        np.concatenate(ws),
        np.concatenate(ys),
        n,
    )
