"""fastText-style hashed-trigram classifier tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from document_ai_ray.stages.textclf import (
    FEATURE_DIM,
    batch_features,
    trigram_hashes,
)


def test_trigram_hashes_reference():
    s = "chat"
    b = s.encode()
    want = [((b[i] * 31 + b[i + 1]) * 31 + b[i + 2]) % FEATURE_DIM for i in range(len(b) - 2)]
    assert trigram_hashes(s).tolist() == want
    assert trigram_hashes("ab").shape == (0,)
    assert trigram_hashes("").shape == (0,)
    # unicode goes through utf-8 bytes
    assert trigram_hashes("héllo").shape[0] == len("héllo".encode()) - 2


def test_batch_features_weights_normalize():
    flat, rows, w = batch_features(["abcd", "xy", "hello world"])
    assert flat.shape == rows.shape == w.shape
    # per-row weights sum to 1 for rows with features
    for r in (0, 2):
        assert np.isclose(w[rows == r].sum(), 1.0)
    assert (rows != 1).all()  # "xy" too short -> no features


@pytest.mark.usefixtures("ray_session")
def test_textclf_train_separates_langs_and_loss_decreases():
    import random

    import ray.data as rd

    from document_ai_ray.stages.textclf import textclf_predict, textclf_train
    from document_ai_ray.synth import WORDS, _sentence

    langs = sorted(WORDS)

    def gen(batch: pa.Table) -> pa.Table:
        ids, texts, ys = [], [], []
        for i in batch.column("id").to_pylist():
            rng = random.Random(1000 + i)
            lang = langs[i % len(langs)]
            ids.append(i)
            texts.append(" ".join(_sentence(rng, WORDS[lang]) for _ in range(3)))
            ys.append(i % len(langs))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "y": pa.array(ys, pa.int32()),
            }
        )

    ds = rd.range(150, override_num_blocks=4).map_batches(gen, batch_format="pyarrow")
    W, b, hist = textclf_train(ds, n_classes=len(langs), n_iter=12, lr=1.0)
    assert hist[-1] < hist[0] * 0.5  # loss collapsed
    assert all(h2 <= h1 + 1e-9 for h1, h2 in zip(hist, hist[1:]))  # monotone

    scored = textclf_predict(ds, W, b).to_pandas()
    acc = (scored["pred"].to_numpy() == scored["y"].to_numpy()).mean()
    assert acc >= 0.99


@pytest.mark.usefixtures("ray_session")
def test_langid_fasttext_query_heldout_accuracy():
    from document_ai_ray.pipelines.text_queries import langid_fasttext_docs

    t = langid_fasttext_docs("unused").to_pandas()
    assert len(t) == 120  # the held-out fifth of 600
    assert (t["lang"] != "").all()
    acc = t["correct"].mean()
    assert acc >= 0.95
    # held-out rows really are the (i // 5) % 5 == 0 block slice
    assert ((t["doc_id"] // 5) % 5 == 0).all()
    # eval slice covers every class
    assert t["lang"].nunique() == 5
