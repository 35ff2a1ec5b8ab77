"""Text analysis: lang-ID, quality, tokens, fingerprints, multimodal stubs."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from document_ai_ray.functions.hashing import stable64, winnow_fingerprint
from document_ai_ray.stages.multimodal import MEDIA_SCHEMA, DecodeMedia, make_media_payload, media_features
from document_ai_ray.stages.text_analysis import langid_batch, langid_text, quality_batch, token_count_batch


def test_langid_basic():
    assert langid_text("the cat sat on the mat and the dog was in the house")[0] == "en"
    assert langid_text("le chat est dans la maison et le chien est sur le pont")[0] == "fr"
    assert langid_text("der hund und die katze sind in dem haus über der brücke")[0] == "de"
    assert langid_text("")[0] == "und"
    assert langid_text("zzz qqq xxx")[0] == "und"


def test_langid_batch_cols():
    t = pa.Table.from_pylist([{"text": "the cat and the dog"}, {"text": ""}])
    out = langid_batch(t)
    assert out.column("pred_lang").to_pylist() == ["en", "und"]


def test_quality_batch():
    t = pa.Table.from_pylist(
        [
            {"text": "The quick brown fox jumps over the lazy dog near the river bank today."},
            {"text": "x"},
            {"text": ""},
        ]
    )
    out = quality_batch(t)
    scores = out.column("quality_score").to_pylist()
    assert scores[0] > 0.5
    assert scores[1] == 0.0 and scores[2] == 0.0
    assert out.column("n_words").to_pylist()[0] == 14


def test_token_counts():
    t = pa.Table.from_pylist([{"text": "hello world it's 42 degrees!"}])
    out = token_count_batch(t)
    assert out.column("n_ws_tokens").to_pylist() == [5]
    assert out.column("n_bpe_tokens").to_pylist()[0] >= 6  # punctuation split off


def test_winnow_fingerprint_properties():
    toks = "a b c d e f g h i j k l m n".split()
    th = np.array([stable64(w) for w in toks], dtype=np.uint64)
    fp1 = winnow_fingerprint(th)
    fp2 = winnow_fingerprint(th)
    assert fp1 == fp2 and len(fp1) > 0
    # a local edit changes few fingerprints (winnowing locality)
    toks2 = list(toks)
    toks2[0] = "z"
    th2 = np.array([stable64(w) for w in toks2], dtype=np.uint64)
    fp3 = winnow_fingerprint(th2)
    assert len(set(fp1) & set(fp3)) >= len(fp1) - 3


def test_multimodal_decode_plumbing():
    rows = [
        {
            "media_id": i,
            "media_type": "image/synthetic",
            "payload": make_media_payload(i, 64, 48),
            "meta": {"width": 64, "height": 48, "sample_rate": 0},
        }
        for i in range(10)
    ]
    rows.append(
        {
            "media_id": 99,
            "media_type": "image/png",
            "payload": b"\x89PNG\r\n unsupported",
            "meta": {"width": 0, "height": 0, "sample_rate": 0},
        }
    )
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    out = media_features(ds).take_all()
    by_id = {r["media_id"]: r for r in out}
    assert len(out) == 11
    assert by_id[0]["error"] is None and len(by_id[0]["features"]) == DecodeMedia.FEATURE_DIM
    assert by_id[99]["error"].startswith("decode_error")
    # determinism
    out2 = media_features(rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))).take_all()
    assert {r["media_id"]: r["features"] for r in out2} == {r["media_id"]: r["features"] for r in out}


def test_multimodal_strict_mode_stubs():
    t = pa.Table.from_pylist(
        [{"media_id": 1, "media_type": "image/png", "payload": b"\x89PNG real image bytes", "meta": None}],
        schema=MEDIA_SCHEMA,
    )
    out = DecodeMedia(strict=True)(t)
    assert out.column("error").to_pylist()[0].startswith("decode_stubbed")


def test_kmv_sketch_accuracy_and_merge(sf_small):
    """KMV estimate within the theoretical error envelope of the exact
    distinct count, and exact when distinct < k."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from document_ai_ray.functions.sketch import kmv_estimate, kmv_merge, kmv_sketch
    from document_ai_ray.stages.text_analysis import approx_distinct_ngrams_per_lang

    # unit: exact below k
    sk = kmv_sketch([f"v{i}" for i in range(100)], k=256)
    assert kmv_estimate(sk, k=256) == 100.0
    # merge == sketch of union
    a = kmv_sketch([f"a{i}" for i in range(500)], k=64)
    b = kmv_sketch([f"b{i}" for i in range(500)], k=64)
    u = kmv_merge([a, b], k=64)
    direct = kmv_sketch([f"a{i}" for i in range(500)] + [f"b{i}" for i in range(500)], k=64)
    assert np.array_equal(u, direct)

    # distributed estimate vs exact per lang
    t = pq.read_table(f"{sf_small}/documents.parquet", columns=["lang", "text"])
    exact = {}
    for lang, text in zip(t.column("lang").to_pylist(), t.column("text").to_pylist()):
        w = text.split()
        exact.setdefault(lang, set()).update(
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        )
    got = approx_distinct_ngrams_per_lang(
        rd.from_arrow(t), n=3, k=256
    ).to_pandas().set_index("lang")
    for lang, s in exact.items():
        est = got.loc[lang, "approx_distinct"]
        rel = abs(est - len(s)) / len(s)
        assert rel < 0.25, f"{lang}: est {est} vs exact {len(s)} (rel {rel:.3f})"
