"""Text-analysis queries over the documents table (lang-ID, quality
scoring, token counting, fingerprinting)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from document_ai_ray.pipelines.ops import partial_group_agg
from document_ai_ray.pipelines.registry import register
from document_ai_ray.sources.tables import read_table
from document_ai_ray.stages.text_analysis import (
    fingerprint_batch,
    langid_batch,
    quality_batch,
    token_count_batch,
)


@register(
    "token_counts",
    # whitespace-robust oracle: collapse runs, trim, and count 0 for
    # whitespace-only text — the exact semantics of Python str.split()
    # (the old `len(string_split(text, ' '))` only agreed on strictly
    # single-space corpora)
    oracle=r"""
    SELECT doc_id,
           CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN 0
                ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
           END AS n_ws_tokens
    FROM documents
    """,
)
def token_counts(sf_dir: str):
    """Whitespace token counts (the BPE-ish count has no SQL analogue
    and rides in `token_stats` below)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def project(t: pa.Table) -> pa.Table:
        t = token_count_batch(t)
        return t.select(["doc_id", "n_ws_tokens"])

    return ds.map_batches(project, batch_format="pyarrow")


@register(
    "token_stats",
    # the BPE-ish pattern is RE2-compatible, so DuckDB can count the
    # identical matches ('' escapes the literal quote in SQL)
    oracle=r"""
    SELECT doc_id,
           CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN 0
                ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
           END AS n_ws_tokens,
           len(regexp_extract_all(text, '''?[A-Za-zÀ-ɏ]+|[0-9]+|[^\sA-Za-z0-9À-ɏ]')) AS n_bpe_tokens
    FROM documents
    """,
)
def token_stats(sf_dir: str):
    """Full token statistics incl. BPE-ish regex tokens — oracle-checked
    (the tokenizer pattern runs verbatim under DuckDB's RE2)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_ws_tokens", "n_bpe_tokens"]
    )


@register(
    "doc_length_hist",
    oracle="""
    SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket, COUNT(*) AS n
    FROM documents GROUP BY 1
    """,
)
def doc_length_hist(sf_dir: str):
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["n_chars"])

    def derive(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t.column("n_chars").cast(pa.float64()), 100.0)), pa.int64())
        return pa.Table.from_arrays([b], names=["bucket"])

    return partial_group_agg(ds.map_batches(derive, batch_format="pyarrow"), ["bucket"], count_alias="n")


# the stopword-hit argmax IS SQL-expressible: per-language inlined
# hit counts, GREATEST + first-in-sorted-order tie-break (exactly
# the `hits > best_hits` loop over sorted languages), 'und' at 0
_LANGID_PRED_CTE = r"""
    WITH w AS (SELECT doc_id, lower(unnest(regexp_extract_all(text, '\p{L}+'))) AS w FROM documents),
    st AS (SELECT doc_id,
                  SUM(CASE WHEN w IN ('am','auf','bei','das','dem','den','der','des','die','ein','eine','einen','für','im','ist','mit','nach','sind','und','von','wo','während','zu','über') THEN 1 ELSE 0 END) AS h_de,
                  SUM(CASE WHEN w IN ('a','about','across','an','and','are','as','at','be','by','for','from','in','is','it','near','not','of','on','or','over','that','the','this','to','toward','was','where','while','with') THEN 1 ELSE 0 END) AS h_en,
                  SUM(CASE WHEN w IN ('al','con','de','del','donde','el','en','es','hacia','la','las','los','mientras','para','por','que','se','sobre','son','su','un','una','y') THEN 1 ELSE 0 END) AS h_es,
                  SUM(CASE WHEN w IN ('au','aux','avec','ce','cette','dans','de','des','du','elle','est','et','il','la','le','les','où','par','pendant','pour','que','qui','sont','sur','un','une','vers') THEN 1 ELSE 0 END) AS h_fr,
                  SUM(CASE WHEN w IN ('che','con','dei','del','della','delle','di','dove','e','gli','i','il','in','la','le','lo','mentre','per','sono','sopra','su','un','una','verso','è') THEN 1 ELSE 0 END) AS h_it
           FROM w GROUP BY doc_id),
    g AS (SELECT *, GREATEST(h_de, h_en, h_es, h_fr, h_it) AS g FROM st),
    p AS (SELECT doc_id,
                 CASE WHEN g = 0 THEN 'und' WHEN h_de = g THEN 'de' WHEN h_en = g THEN 'en' WHEN h_es = g THEN 'es' WHEN h_fr = g THEN 'fr' ELSE 'it' END AS pred_lang
          FROM g)
"""


@register(
    "langid_docs",
    oracle=_LANGID_PRED_CTE
    + """
    SELECT d.doc_id, COALESCE(p.pred_lang, 'und') AS pred_lang,
           COALESCE(p.pred_lang, 'und') = d.lang AS agrees
    FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
""",
)
def langid_docs(sf_dir: str):
    """Heuristic language ID per document + agreement with the declared
    lang column, oracle-checked against the pure-SQL recomputation."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def project(t: pa.Table) -> pa.Table:
        t = langid_batch(t)
        agree = pc.equal(t.column("pred_lang"), t.column("lang"))
        return pa.Table.from_arrays(
            [t.column("doc_id"), t.column("pred_lang"), agree],
            names=["doc_id", "pred_lang", "agrees"],
        )

    return ds.map_batches(project, batch_format="pyarrow")


# the full feature battery is SQL-expressible: \p{L} matches the
# same unicode letter classes as Python isalpha / [^\W\d_], the
# stopword table is inlined, and the composite-score arithmetic is
# written in the identical operation order (ROUND(...,6) both sides)
_QUALITY_ORACLE = r"""
    WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\p{L}+')) AS wd FROM documents),
    ws AS (SELECT doc_id, lower(wd) AS w, len(wd) AS l FROM w),
    st AS (SELECT doc_id, COUNT(*) AS n_words,
                  SUM(l)/CAST(COUNT(*) AS DOUBLE) AS mean_word_len,
                  SUM(CASE WHEN w IN ('a','about','across','al','am','an','and','are','as','at','au','auf','aux','avec','be','bei','by','ce','cette','che','con','dans','das','de','dei','del','della','delle','dem','den','der','des','di','die','donde','dove','du','e','ein','eine','einen','el','elle','en','es','est','et','for','from','für','gli','hacia','i','il','im','in','is','ist','it','la','las','le','les','lo','los','mentre','mientras','mit','nach','near','not','of','on','or','over','où','par','para','pendant','per','por','pour','que','qui','se','sind','sobre','son','sono','sont','sopra','su','sur','that','the','this','to','toward','un','una','und','une','vers','verso','von','was','where','while','with','wo','während','y','zu','è','über') THEN 1 ELSE 0 END)/CAST(COUNT(*) AS DOUBLE) AS stopword_ratio
           FROM ws GROUP BY doc_id),
    ch AS (SELECT doc_id,
                  CASE WHEN len(text)=0 THEN 0.0
                       ELSE len(regexp_extract_all(text, '\p{L}'))/CAST(len(text) AS DOUBLE) END AS alpha_ratio
           FROM documents),
    f AS (SELECT d.doc_id,
                 COALESCE(st.n_words, 0) AS n_words,
                 ch.alpha_ratio,
                 COALESCE(st.stopword_ratio, 0.0) AS stopword_ratio,
                 COALESCE(st.mean_word_len, 0.0) AS mean_word_len
          FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id JOIN ch ON ch.doc_id = d.doc_id),
    sc AS (SELECT *,
                  GREATEST(0.0, LEAST(1.0, 1.0 - abs(mean_word_len - 5.0) / 5.0)) AS wlen_sane
           FROM f)
    SELECT doc_id, n_words,
           ROUND(alpha_ratio, 6) AS alpha_ratio,
           ROUND(stopword_ratio, 6) AS stopword_ratio,
           ROUND(mean_word_len, 6) AS mean_word_len,
           ROUND(GREATEST(0.0, LEAST(1.0, 0.4 * alpha_ratio + 0.3 * LEAST(stopword_ratio / 0.3, 1.0) + 0.3 * wlen_sane))
                 * (CASE WHEN n_words >= 5 THEN 1.0 ELSE 0.0 END), 6) AS quality_score
    FROM sc
"""


@register("quality_scores", oracle=_QUALITY_ORACLE)
def quality_scores(sf_dir: str):
    """Quality features + composite score per document, oracle-checked
    feature-for-feature against a pure-SQL recomputation."""
    from document_ai_ray.pipelines.ops import round_cols

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(quality_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_words", "alpha_ratio", "stopword_ratio", "mean_word_len", "quality_score"]
    )
    return out.map_batches(
        lambda t: round_cols(t, {"alpha_ratio": 6, "stopword_ratio": 6, "mean_word_len": 6, "quality_score": 6}),
        batch_format="pyarrow",
    )


@register("fingerprint_docs")
def fingerprint_docs(sf_dir: str):
    """Winnowing fingerprints + simhash per document (rows-only)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint", "simhash"]
    )


@register(
    "normalize_text_fr",
    oracle="""
    SELECT doc_id, strip_accents(text) AS norm_text
    FROM documents WHERE lang = 'fr'
    """,
)
def normalize_text_fr(sf_dir: str):
    """NFD diacritic strip (≙ normalize_str, /root/reference/utils.py:5)
    over the French slice, byte-compared against DuckDB strip_accents."""
    from document_ai_ray.functions.strings import normalize_str

    ds = read_table(
        sf_dir, "documents", columns=["doc_id", "text", "lang"],
        filter=(pc.field("lang") == "fr"),
    )

    def norm(t: pa.Table) -> pa.Table:
        out = pa.array([normalize_str(x or "") for x in t.column("text").to_pylist()], pa.string())
        return pa.Table.from_arrays([t.column("doc_id"), out], names=["doc_id", "norm_text"])

    return ds.map_batches(norm, batch_format="pyarrow")


@register(
    "url_parse_parts",
    oracle="""
    WITH urls AS (
      SELECT 'https://site' || CAST(i % 37 AS VARCHAR) || '.example/' ||
             CASE i % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'fr' WHEN 2 THEN 'de'
                        WHEN 3 THEN 'es' ELSE 'it' END ||
             '/page' || CAST(i AS VARCHAR) AS url
      FROM range(300) t(i)
    )
    SELECT url,
           split_part(replace(url, 'https://', ''), '/', 1) AS host,
           split_part(split_part(replace(url, 'https://', ''), '/', 1), '.', -1) AS tld,
           '/' || split_part(replace(url, 'https://', ''), '/', 2) || '/' ||
               split_part(replace(url, 'https://', ''), '/', 3) AS path
    FROM urls
    """,
)
def url_parse_parts(sf_dir: str):
    """URL identity parsing: host / tld / path per page (≙ the
    filename->plate identity parse, /root/reference/performances.py:
    96-120).  Runs on the synthetic corpus; the oracle reconstructs the
    same urls from range() — both sides genuinely parse."""
    from urllib.parse import urlsplit

    import ray.data as rd

    from document_ai_ray.synth import pages_dataset

    def parse(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        hosts, tlds, paths = [], [], []
        for u in urls:
            sp = urlsplit(u)
            hosts.append(sp.netloc)
            tlds.append(sp.netloc.rsplit(".", 1)[-1])
            paths.append(sp.path)
        return pa.Table.from_arrays(
            [pa.array(urls), pa.array(hosts), pa.array(tlds), pa.array(paths)],
            names=["url", "host", "tld", "path"],
        )

    return pages_dataset(300).select_columns(["url"]).map_batches(parse, batch_format="pyarrow")


@register("approx_distinct_ngrams")
def approx_distinct_ngrams(sf_dir: str):
    """KMV-sketch approximate distinct word-3-grams per lang (rows-only:
    approximate by nature; the accuracy bound is asserted in tests
    against the exact count)."""
    from document_ai_ray.stages.text_analysis import approx_distinct_ngrams_per_lang

    ds = read_table(sf_dir, "documents", columns=["lang", "text"])
    return approx_distinct_ngrams_per_lang(ds, n=3, k=256)


@register(
    "tfidf_top_terms",
    # rank by the ROUNDED score on both sides so tie-breaking cannot
    # diverge on sub-1e-6 float noise
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), w2 AS (SELECT doc_id, word FROM w WHERE word != ''),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w2 GROUP BY 1, 2),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w2 GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word, ROUND(tf.tf * ln(n.n / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
    )
    SELECT doc_id, word, tfidf FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) <= 5
    """,
)
def tfidf_top_terms(sf_dir: str):
    """Top-5 TF-IDF terms per document: exact per-doc term counts,
    bucketed DF groupby, bucketed DF join, shuffle-free grouped top-k
    (stages/tfidf.py)."""
    from document_ai_ray.stages.tfidf import tfidf_topk

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk(ds, k=5)


from document_ai_ray.stages.text_analysis import (  # noqa: E402
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    chunk_batch,
    pii_scrub_batch,
)

_PII_ORACLE = f"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
      '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
      '{PII_IPV4_RE}', '<IP>', 'g'),
      '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
  len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_email,
  len(regexp_extract_all(regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
      '{PII_IPV4_RE}')) AS n_ip,
  len(regexp_extract_all(regexp_replace(regexp_replace(text,
      '{PII_EMAIL_RE}', '<EMAIL>', 'g'), '{PII_IPV4_RE}', '<IP>', 'g'),
      '{PII_PHONE_RE}')) AS n_phone
FROM documents
"""


@register("pii_scrub_docs", oracle=_PII_ORACLE)
def pii_scrub_docs(sf_dir: str):
    """PII redaction (emails / IPv4 / intl phone numbers) with per-kind
    counts — the C4/RefinedWeb-style pre-training scrub, one stateless
    vectorizable pass; the SAME RE2-compatible patterns run in Python
    and in the DuckDB oracle."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(pii_scrub_batch, batch_format="pyarrow")


_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48

_CHUNK_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_idx,
         ws[CAST(t.i*{_CHUNK_STRIDE}+1 AS BIGINT):CAST(t.i*{_CHUNK_STRIDE}+{_CHUNK_SIZE} AS BIGINT)] AS win
  FROM w, UNNEST(generate_series(0, CAST(floor((len(ws)-1)/{_CHUNK_STRIDE}) AS BIGINT))) AS t(i))
SELECT doc_id, chunk_idx, array_to_string(win, ' ') AS chunk_text,
       len(win) AS n_tokens
FROM c
"""


@register("chunk_docs", oracle=_CHUNK_ORACLE)
def chunk_docs(sf_dir: str):
    """Fixed-window token chunking with overlap (size {0}, stride {1})
    — the training-sample windowing step; one flat-map pass, chunk
    boundaries byte-identical to the SQL list-slice oracle.""".format(
        _CHUNK_SIZE, _CHUNK_STRIDE
    )
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda t: chunk_batch(t, _CHUNK_SIZE, _CHUNK_STRIDE), batch_format="pyarrow"
    )


from document_ai_ray.stages.text_analysis import (  # noqa: E402
    REP_DUP_2GRAM_MAX,
    REP_DUP_LINE_MAX,
    repetition_batch,
)

_REP_ORACLE = f"""
WITH l AS (SELECT doc_id, UNNEST(string_split(text, chr(10))) AS line FROM documents),
lc AS (SELECT doc_id, line, COUNT(*) AS c FROM l GROUP BY 1, 2),
lf AS (SELECT doc_id,
              SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / SUM(c) AS dup_line_frac
       FROM lc GROUP BY 1),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id, ws[CAST(t.i AS BIGINT)] || ' ' || ws[CAST(t.i+1 AS BIGINT)] AS gram
      FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
gf AS (SELECT doc_id,
              SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / SUM(c) AS dup_2gram_frac
       FROM gc GROUP BY 1)
SELECT d.doc_id,
       ROUND(COALESCE(lf.dup_line_frac, 0.0), 6) AS dup_line_frac,
       ROUND(COALESCE(gf.dup_2gram_frac, 0.0), 6) AS dup_2gram_frac,
       (COALESCE(lf.dup_line_frac, 0.0) <= {REP_DUP_LINE_MAX}
        AND COALESCE(gf.dup_2gram_frac, 0.0) <= {REP_DUP_2GRAM_MAX}) AS keep
FROM documents d
LEFT JOIN lf ON lf.doc_id = d.doc_id
LEFT JOIN gf ON gf.doc_id = d.doc_id
"""


@register("repetition_filter_docs", oracle=_REP_ORACLE)
def repetition_filter_docs(sf_dir: str):
    """Gopher-style within-document repetition filter: duplicated-line
    and duplicated-2gram occurrence fractions + the keep decision —
    one stateless pass per document, no shuffle."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(repetition_batch, batch_format="pyarrow")


_DECON_N, _DECON_MOD = 8, 50

_DECON_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT DISTINCT doc_id,
             array_to_string(ws[CAST(t.i AS BIGINT):CAST(t.i+{_DECON_N - 1} AS BIGINT)], ' ') AS gram
      FROM w, UNNEST(generate_series(1, len(ws) - {_DECON_N - 1})) AS t(i)),
eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_MOD} = 0),
ov AS (SELECT g.doc_id, COUNT(*) AS n_overlap FROM g JOIN eg USING (gram) GROUP BY 1)
SELECT d.doc_id,
       COALESCE(ov.n_overlap, 0) AS n_overlap,
       COALESCE(ov.n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN ov ON ov.doc_id = d.doc_id
"""


@register("decontaminate_docs", oracle=_DECON_ORACLE)
def decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: flag training documents sharing any
    {0}-word-gram with the (deterministic doc_id % {1} == 0) benchmark
    subset.  Eval grams are collected once (small by definition),
    broadcast via ray.put, and every doc is annotated in one
    shuffle-free pass — at 100 TB only the corpus STREAMS; the eval
    set never re-ships per batch.""".format(_DECON_N, _DECON_MOD)
    import ray

    from document_ai_ray.stages.text_analysis import (
        contamination_batch,
        eval_grams_batch,
    )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    parts = docs.map_batches(
        lambda t: eval_grams_batch(t, _DECON_N, _DECON_MOD), batch_format="pyarrow"
    )
    egrams: set[str] = set()
    for batch in parts.iter_batches(batch_format="pyarrow"):
        egrams.update(batch.column("gram").to_pylist())
    ref = ray.put(egrams)
    docs2 = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs2.map_batches(
        contamination_batch,
        fn_kwargs={"eval_ref": (ref,), "n": _DECON_N},
        batch_format="pyarrow",
    )


_MIX_ORACLE = """
SELECT doc_id, source
FROM documents
QUALIFY (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)
        % (1 + (CAST(substr(source, 4) AS INT) % 4)) = 0
"""


@register("mix_corpus_sources", oracle=_MIX_ORACLE)
def mix_corpus_sources(sf_dir: str):
    """Corpus MIXING: deterministic per-source systematic downsampling
    to target proportions (source srcN keeps every (1 + N%4)-th doc in
    doc_id order) — the reweighting step a pre-training mixture runs.
    Global per-source ranks come from the range-partitioned sort
    (`with_group_ranks`), so no task holds a whole source partition."""
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import with_group_ranks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    ranked = with_group_ranks(docs, "source", ["doc_id"])

    def keep(t: pa.Table) -> pa.Table:
        import numpy as np

        src = t.column("source").to_pylist()
        stride = np.array([1 + (int(s[3:]) % 4) for s in src], dtype=np.int64)
        r = t.column("__rank").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(r % stride == 0)).select(["doc_id", "source"])

    return ranked.map_batches(keep, batch_format="pyarrow")


_SHUFFLE_SEED = "graft-r3"

_SHUFFLE_ORACLE = f"""
SELECT doc_id,
       md5(CAST(doc_id AS VARCHAR) || '-{_SHUFFLE_SEED}') AS shuffle_key,
       ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || '-{_SHUFFLE_SEED}')) - 1 AS pos
FROM documents
"""


@register("shuffle_docs_deterministic", oracle=_SHUFFLE_ORACLE)
def shuffle_docs_deterministic(sf_dir: str):
    """Deterministic seeded GLOBAL shuffle (training-batch order):
    shuffle_key = md5(doc_id || seed), position = global rank under
    that key.  Reproducible across engines (the oracle computes the
    identical md5 order in SQL); the rank comes from the distributed
    sort + offset-merged block ranks, never a single task."""
    import hashlib

    import pyarrow as pa

    from document_ai_ray.pipelines.ops import with_group_ranks

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def add_key(t: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(f"{i}-{_SHUFFLE_SEED}".encode()).hexdigest()
            for i in t.column("doc_id").to_pylist()
        ]
        return t.append_column("shuffle_key", pa.array(keys, pa.string())).append_column(
            "__g", pa.array([0] * len(t), pa.int8())
        )

    keyed = docs.map_batches(add_key, batch_format="pyarrow")
    ranked = with_group_ranks(keyed, "__g", ["shuffle_key"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("doc_id"), t.column("shuffle_key"), t.column("__rank")],
            names=["doc_id", "shuffle_key", "pos"],
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


_SHARD_TOKENS = 8192

_PACK_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN 0
              ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
         END AS n_ws_tokens
  FROM documents)
SELECT doc_id, n_ws_tokens,
       CAST(COALESCE(SUM(n_ws_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         // {_SHARD_TOKENS} AS BIGINT) AS shard
FROM toks
"""


@register("pack_token_shards", oracle=_PACK_ORACLE)
def pack_token_shards(sf_dir: str):
    """SEQUENCE PACKING: assign documents (in deterministic doc_id
    order) to fixed-token-budget training shards — shard = exclusive
    running token total // budget, the layout a pre-training data
    loader consumes.  The running total is the distributed exclusive
    prefix sum from `with_group_ranks(value_col=...)` (per-block sums
    prefix-merged on the driver, vectorized per-block attach): no task
    ever holds the corpus, so the assignment streams at any scale."""
    from document_ai_ray.pipelines.ops import with_group_ranks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        t = token_count_batch(t)
        return t.select(["doc_id", "n_ws_tokens"]).append_column(
            "__g", pa.array([0] * len(t), pa.int8())
        )

    ranked = with_group_ranks(
        docs.map_batches(toks, batch_format="pyarrow"),
        "__g",
        ["doc_id"],
        value_col="n_ws_tokens",
    )

    def finish(t: pa.Table) -> pa.Table:
        shard = pc.divide(t.column("__cum"), pa.scalar(_SHARD_TOKENS, pa.int64()))
        return pa.Table.from_arrays(
            [t.column("doc_id"), t.column("n_ws_tokens"), shard],
            names=["doc_id", "n_ws_tokens", "shard"],
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


_WSAMPLE_SEED = "wsample-r3"
_WSAMPLE_CAP = 2000  # n_chars at which keep-probability saturates at 1

_WSAMPLE_ORACLE = f"""
SELECT doc_id, n_chars
FROM documents
WHERE n_chars >= {_WSAMPLE_CAP}
   OR substr(md5(CAST(doc_id AS VARCHAR) || '-{_WSAMPLE_SEED}'), 1, 8)
      < lpad(lower(to_hex(CAST(n_chars AS BIGINT) * 4294967296 // {_WSAMPLE_CAP})), 8, '0')
"""


@register("sample_docs_weighted", oracle=_WSAMPLE_ORACLE)
def sample_docs_weighted(sf_dir: str):
    """Quality-WEIGHTED deterministic downsampling: keep each doc with
    probability p = min(1, n_chars/_WSAMPLE_CAP) by comparing a
    per-doc uniform hash u = md5(doc_id||seed)[:8] against p — the
    reweighting step that keeps long/high-quality docs and thins short
    ones, reproducible across engines and runs (no RNG state).  Pure
    per-batch map: embarrassingly parallel, no shuffle at all."""
    import hashlib

    import numpy as np

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        u = np.array(
            [
                int(hashlib.md5(f"{i}-{_WSAMPLE_SEED}".encode()).hexdigest()[:8], 16)
                for i in t.column("doc_id").to_pylist()
            ],
            dtype=np.int64,
        )
        thresh = nc.astype(np.int64) * 4294967296 // _WSAMPLE_CAP
        return t.filter(pa.array((nc >= _WSAMPLE_CAP) | (u < thresh)))

    return docs.map_batches(keep, batch_format="pyarrow")


_URL_HOSTS = 50

_URLDEDUP_ORACLE = """
SELECT 'http://example' || CAST(doc_id % 50 AS VARCHAR) || '.com/path/' ||
       CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS url,
       3 AS n_variants
FROM documents
"""


@register("url_canonical_dedup", oracle=_URLDEDUP_ORACLE)
def url_canonical_dedup(sf_dir: str):
    """URL CANONICALIZATION + exact URL dedup: each document appears
    under three spellings (case-shifted host with default port +
    fragment, www + trailing slash, utm-tracking params) and all must
    collapse to one canonical row with the variant count — the
    crawl-side dedup every web corpus runs before content dedup.
    Shape = `dedup_exact_docs`: per-batch canonicalize + LOCAL
    combiner, then a hash-BUCKET shuffle (P buckets, never N urls as
    groups) with a vectorized per-bucket merge; only canonical url
    strings and counts move, at any scale."""
    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.urls import canonicalize_url

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    P = 64

    def variants(t: pa.Table) -> pa.Table:
        urls = []
        for i in t.column("doc_id").to_pylist():
            h = i % _URL_HOSTS
            urls.append(f"HTTP://WWW.Example{h}.COM:80/path/{i}?b=2&a=1#frag")
            urls.append(f"http://www.example{h}.com/path/{i}/?a=1&b=2")
            urls.append(f"http://example{h}.com/path/{i}?a=1&b=2&utm_source=feed")
        return pa.table({"raw_url": pa.array(urls, pa.string())})

    def canon_combine(t: pa.Table) -> pa.Table:
        cu = pa.array(
            [canonicalize_url(u) for u in t.column("raw_url").to_pylist()], pa.string()
        )
        g = (
            pa.Table.from_arrays([cu], names=["url"])
            .group_by("url")
            .aggregate([([], "count_all")])
        )
        bucket = pa.array(
            [crc_bucket(u, P) for u in g.column("url").to_pylist()], pa.int32()
        )
        return pa.Table.from_arrays(
            [g.column("url"), g.column("count_all"), bucket],
            names=["url", "n", "bucket"],
        )

    def per_bucket(df):
        out = df.groupby("url", as_index=False).agg(n_variants=("n", "sum"))
        out["n_variants"] = out["n_variants"].astype("int32")
        return out[["url", "n_variants"]]

    return (
        docs.map_batches(variants, batch_format="pyarrow")
        .map_batches(canon_combine, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


_VOCAB_K = 100

_VOCAB_ORACLE = """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word, COUNT(*) AS n FROM w WHERE word != '' GROUP BY 1)
SELECT word, n FROM c ORDER BY n DESC, word LIMIT 100
"""


@register("vocab_top_words", oracle=_VOCAB_ORACLE)
def vocab_top_words(sf_dir: str):
    """EXACT corpus heavy hitters (top-100 vocabulary words): per-batch
    word-count COMBINER (vocab-sized partials, never word instances),
    hash-bucketed exact merge (equal words meet in equal buckets), each
    bucket emits only its local top-k (a global top-k row is top-k in
    its bucket, so this loses nothing), and one final task sorts the
    P x k candidates.  The shuffle moves vocabulary entries, not the
    corpus."""
    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    docs = read_table(sf_dir, "documents", columns=["text"])
    P = auto_buckets(docs.count())

    def partial_counts(t: pa.Table) -> pa.Table:
        from document_ai_ray.stages.text_analysis import word_value_counts

        g = word_value_counts(t.column("text"))  # vectorized combiner
        bucket = pa.array(
            [crc_bucket(w, P) for w in g.column("word").to_pylist()], pa.int32()
        )
        return g.append_column("bucket", bucket)

    def bucket_topk(df):
        out = df.groupby("word", as_index=False)["n"].sum()
        return out.sort_values(["n", "word"], ascending=[False, True]).head(_VOCAB_K)

    candidates = bucket_map_groups(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        "bucket",
        bucket_topk,
        P,
        batch_format="pandas",
    )

    def final(df):
        return df.sort_values(["n", "word"], ascending=[False, True]).head(_VOCAB_K)

    return candidates.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


@register("vocab_top_words_approx")
def vocab_top_words_approx(sf_dir: str):
    """APPROXIMATE heavy hitters via a mergeable Misra-Gries summary
    (capacity 4096): per-batch MG partials, two-level merge on one
    final task (the summary is O(m), corpus-size-independent — the
    documented 100 TB path where even the vocabulary shuffle of
    `vocab_top_words` is unwelcome).  Rows-only: estimates are
    under-counts within N/(m+1); the bound is asserted in tests.
    Output includes the error bound so downstream can reason about it."""
    import pickle

    from document_ai_ray.functions.sketch import mg_from_counts, mg_merge

    M = 4096
    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        from document_ai_ray.stages.text_analysis import word_value_counts

        g = word_value_counts(t.column("text"))  # vectorized count base
        c = dict(zip(g.column("word").to_pylist(), g.column("n").to_pylist()))
        total = int(pc.sum(g.column("n")).as_py() or 0)
        return pa.table(
            {
                "sketch": pa.array([pickle.dumps(mg_from_counts(c, M))], pa.binary()),
                "total": pa.array([total], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        sketches = [pickle.loads(b) for b in t.column("sketch").to_pylist()]
        n_total = int(pc.sum(t.column("total")).as_py() or 0)
        sk = mg_merge(sketches, M)
        bound = n_total // (M + 1)
        top = sorted(sk.items(), key=lambda kv: (-kv[1], kv[0]))[:_VOCAB_K]
        return pa.table(
            {
                "word": pa.array([w for w, _ in top], pa.string()),
                "est_count": pa.array([c for _, c in top], pa.int64()),
                "err_bound": pa.array([bound] * len(top), pa.int64()),
            }
        )

    partials = docs.map_batches(partial, batch_format="pyarrow")
    return partials.repartition(1).map_batches(merge, batch_format="pyarrow", batch_size=None)


_ULM_ORACLE = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
w2 AS (SELECT doc_id, word FROM w WHERE word != ''),
c AS (SELECT word, COUNT(*) AS n FROM w2 GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM c),
lp AS (SELECT word, ln(n / t) AS logp FROM c CROSS JOIN tot),
d AS (SELECT w2.doc_id, AVG(lp.logp) AS avg_logprob, COUNT(*) AS n_tok
      FROM w2 JOIN lp USING (word) GROUP BY 1)
SELECT doc_id, ROUND(avg_logprob, 6) AS avg_logprob, n_tok FROM d
"""


def unigram_scored(sf_dir: str):
    """(doc_id, avg_logprob ROUND 6, n_tok) under a corpus-trained
    unigram LM — the shared substrate for `unigram_logprob_docs` and
    `ccnet_perplexity_buckets`.

    Scale note: the broadcast model is VOCAB-sized, not corpus-sized;
    at 100 TB cap it to the top-K words by count (the Misra-Gries
    summary in `vocab_top_words_approx` is the collector) with an OOV
    floor — the synthetic corpus is far below any cap, so the exact
    model runs here and the oracle is exact too."""
    import math

    import numpy as np
    import ray

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, get_broadcast

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = auto_buckets(docs.count())

    def partial_counts(t: pa.Table) -> pa.Table:
        from document_ai_ray.stages.text_analysis import word_value_counts

        g = word_value_counts(t.column("text"))  # vectorized combiner
        bucket = pa.array(
            [crc_bucket(w, P) for w in g.column("word").to_pylist()], pa.int32()
        )
        return g.append_column("bucket", bucket)

    def bucket_sum(df):
        return df.groupby("word", as_index=False)["n"].sum()

    counts = bucket_map_groups(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        "bucket",
        bucket_sum,
        P,
        batch_format="pandas",
    )
    vocab: dict[str, int] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        vocab.update(zip(b.column("word").to_pylist(), b.column("n").to_pylist()))
    total = float(sum(vocab.values()))
    model = {w: math.log(n / total) for w, n in vocab.items()}
    ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        import pandas as pd

        lp: dict = get_broadcast((ref,), tag="unigram_lm")
        # vectorized explode: word -> owning row index, no per-doc loop
        lists = pc.split_pattern(t.column("text"), " ")
        n_per_row = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(t), dtype=np.int64), n_per_row)
        flat = pc.list_flatten(lists)
        w = flat.to_pandas()
        mask = (w != "").to_numpy()
        df = pd.DataFrame(
            {"i": row_idx[mask], "v": w[mask].map(lp).to_numpy(dtype=np.float64)}
        )
        agg = df.groupby("i")["v"].agg(["mean", "size"])
        # rows with zero tokens drop out, same as the oracle's inner join
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)[agg.index.to_numpy()]
        a = agg["mean"].to_numpy(dtype=np.float64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "avg_logprob": pa.array(
                    np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6, pa.float64()
                ),
                "n_tok": pa.array(agg["size"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


@register("unigram_logprob_docs", oracle=_ULM_ORACLE)
def unigram_logprob_docs(sf_dir: str):
    """CCNet-style LM quality proxy: train a unigram model on the
    corpus (distributed bucketed word counts), broadcast the logprob
    table once via ray.put, and score every document's mean token
    log-probability in one streaming pass (low avg_logprob = rare-word
    soup = candidate for the quality cut).  See `unigram_scored`."""
    return unigram_scored(sf_dir)


_BLM_LAMBDA = 0.9  # interpolation weight on the bigram MLE term

# NOTE: probability expression is written with IDENTICAL associativity
# on both sides — (0.9*nb)/n1 + (0.1*n2)/t — so the doubles agree to
# the ulp before the ROUND-6.
_BLM_ORACLE = f"""
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
uc AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM uc),
b AS (SELECT doc_id,
             unnest(ws[1:len(ws)-1]) AS w1,
             unnest(ws[2:len(ws)]) AS w2
      FROM w WHERE len(ws) >= 2),
bc AS (SELECT w1, w2, COUNT(*) AS nb FROM b GROUP BY 1, 2),
sc AS (SELECT b.doc_id,
              ln({_BLM_LAMBDA} * bc.nb / u1.n + {1.0 - _BLM_LAMBDA} * u2.n / tot.t) AS lp
       FROM b JOIN bc USING (w1, w2)
              JOIN uc u1 ON u1.word = b.w1
              JOIN uc u2 ON u2.word = b.w2
              CROSS JOIN tot),
d AS (SELECT doc_id, AVG(lp) AS avg_logprob_bi, COUNT(*) AS n_bigram
      FROM sc GROUP BY 1)
SELECT doc_id, ROUND(avg_logprob_bi, 6) AS avg_logprob_bi, n_bigram FROM d
"""


@register("bigram_logprob_docs", oracle=_BLM_ORACLE)
def bigram_logprob_docs(sf_dir: str):
    """KenLM-style (one order up from `unigram_logprob_docs`) document
    LM score: train an interpolated bigram model on the corpus itself —
    p(w2|w1) = λ·c(w1w2)/c(w1) + (1−λ)·c(w2)/T — and score every
    document's mean bigram log-probability in one streaming pass.
    Low scores flag rare-transition soup (word-salad spam that a
    unigram model, seeing only common words, scores well).

    Distributed shape: bigram counts via per-batch vectorized COMBINER
    partials (`bigram_value_counts` — pair-vocabulary-sized, never
    token instances) merged through the manual hash exchange; unigram
    counts the same substrate; the fused logprob table is broadcast
    once via ray.put and probed per batch with a vectorized pandas map.

    Scale note: the broadcast model is BIGRAM-VOCAB-sized, not
    corpus-sized; at 100 TB prune to the top-K bigrams by count (the
    interpolation form degrades gracefully — a pruned pair backs off
    to its (1−λ)·unigram term, still a proper probability).  The
    synthetic corpus is far below any cap, so the exact model runs
    here and the oracle is exact too."""
    import math

    import numpy as np
    import pandas as pd
    import ray

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, get_broadcast
    from document_ai_ray.stages.text_analysis import (
        PAIR_SEP,
        bigram_value_counts,
        doc_word_pairs,
        word_value_counts,
    )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = auto_buckets(docs.count())

    def _collect(counts_fn, key_name: str) -> dict[str, int]:
        def partial(t: pa.Table) -> pa.Table:
            g = counts_fn(t.column("text"))
            bucket = pa.array(
                [crc_bucket(k, P) for k in g.column(key_name).to_pylist()], pa.int32()
            )
            return g.append_column("bucket", bucket)

        def bucket_sum(df):
            return df.groupby(key_name, as_index=False)["n"].sum()

        merged = bucket_map_groups(
            docs.map_batches(partial, batch_format="pyarrow"),
            "bucket",
            bucket_sum,
            P,
            batch_format="pandas",
        )
        out: dict[str, int] = {}
        for b in merged.iter_batches(batch_format="pyarrow"):
            out.update(zip(b.column(key_name).to_pylist(), b.column("n").to_pylist()))
        return out

    uni = _collect(word_value_counts, "word")
    big = _collect(bigram_value_counts, "pair")
    total = float(sum(uni.values()))
    lam, ilam = _BLM_LAMBDA, 1.0 - _BLM_LAMBDA
    model = {}
    for pair, nb in big.items():
        w1, w2 = pair.split(PAIR_SEP)
        model[pair] = math.log(lam * nb / uni[w1] + ilam * uni[w2] / total)
    ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        lp: dict = get_broadcast((ref,), tag="bigram_lm")
        rows, w1, w2 = doc_word_pairs(t.column("text"))
        if len(rows) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "avg_logprob_bi": pa.array([], pa.float64()),
                    "n_bigram": pa.array([], pa.int64()),
                }
            )
        keys = pc.binary_join_element_wise(w1, w2, PAIR_SEP).to_pandas()
        df = pd.DataFrame({"i": rows, "v": keys.map(lp).to_numpy(dtype=np.float64)})
        agg = df.groupby("i")["v"].agg(["mean", "size"])
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)[agg.index.to_numpy()]
        a = agg["mean"].to_numpy(dtype=np.float64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "avg_logprob_bi": pa.array(
                    np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6, pa.float64()
                ),
                "n_bigram": pa.array(agg["size"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


_PMI_WINDOW = 3
_PMI_MIN_PAIR = 5
_PMI_K = 50

# Both sides ORDER BY the ROUNDED pmi (then w1, w2) so the top-K cut
# line is robust to sub-1e-6 double divergence between engines; the
# pmi expression keeps identical associativity: (np*t)/(nl*nr).
_PMI_ORACLE = f"""
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
pos AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM w),
pr AS (SELECT ws[i] AS w1,
              unnest(ws[i + 1 : least(i + {_PMI_WINDOW}, len(ws))]) AS w2
       FROM pos WHERE i < len(ws)),
pcnt AS (SELECT w1, w2, COUNT(*) AS np FROM pr GROUP BY 1, 2),
lm AS (SELECT w1, SUM(np) AS nl FROM pcnt GROUP BY 1),
rm AS (SELECT w2, SUM(np) AS nr FROM pcnt GROUP BY 1),
tt AS (SELECT CAST(SUM(np) AS DOUBLE) AS t FROM pcnt),
s AS (SELECT pcnt.w1, pcnt.w2, pcnt.np,
             ROUND(ln(pcnt.np * tt.t / (lm.nl * rm.nr)), 6) AS pmi
      FROM pcnt JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tt
      WHERE pcnt.np >= {_PMI_MIN_PAIR})
SELECT w1, w2, np AS n_pair, pmi
FROM s ORDER BY pmi DESC, w1, w2 LIMIT {_PMI_K}
"""


@register("word_cooccur_pmi", oracle=_PMI_ORACLE)
def word_cooccur_pmi(sf_dir: str):
    """Top-K collocations by pointwise mutual information over an
    ordered ±0/+3 skip-gram window (the word2vec/SGNS co-occurrence
    statistic; high-PMI pairs are multiword expressions and fixed
    phrases — a building block for phrase-aware tokenization).

    Distributed shape: per-batch vectorized pair-count COMBINER
    (`window_pair_counts` — pair-vocabulary-sized partials), manual
    hash exchange merge; the merged pair table is materialized ONCE
    (it is output-vocab-sized, not corpus-sized) and re-read for (a)
    the two marginal reductions — vocab-sized, collected to the driver
    and broadcast — and (b) per-bucket PMI scoring with a local top-K
    (a global top-K row is top-K in its bucket), one tiny final sort.

    Scale note: the driver only ever holds vocab-sized marginals and
    P×K candidates; pair counts stay distributed end-to-end."""
    import math

    import numpy as np
    import ray

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, get_broadcast
    from document_ai_ray.stages.text_analysis import PAIR_SEP, window_pair_counts

    docs = read_table(sf_dir, "documents", columns=["text"])
    P = auto_buckets(docs.count())

    def partial(t: pa.Table) -> pa.Table:
        g = window_pair_counts(t.column("text"), _PMI_WINDOW)
        bucket = pa.array(
            [crc_bucket(k, P) for k in g.column("pair").to_pylist()], pa.int32()
        )
        return g.append_column("bucket", bucket)

    def bucket_sum(df):
        return df.groupby("pair", as_index=False)["n"].sum()

    pairs = bucket_map_groups(
        docs.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        bucket_sum,
        P,
        batch_format="pandas",
    ).materialize()  # pair-vocab-sized; consumed by marginals AND scoring

    left: dict[str, int] = {}
    right: dict[str, int] = {}
    total = 0
    for b in pairs.iter_batches(batch_format="pyarrow"):
        ns = b.column("n").to_numpy(zero_copy_only=False)
        total += int(ns.sum())
        for key, n in zip(b.column("pair").to_pylist(), ns):
            w1, w2 = key.split(PAIR_SEP)
            left[w1] = left.get(w1, 0) + int(n)
            right[w2] = right.get(w2, 0) + int(n)
    t_pairs = float(total)
    lref = ray.put((left, right))

    def score(t: pa.Table) -> pa.Table:
        lm, rm = get_broadcast((lref,), tag="pmi_marginals")
        t = t.filter(pc.greater_equal(t.column("n"), _PMI_MIN_PAIR))
        keys = t.column("pair").to_pylist()
        np_ = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        w1s, w2s, nl, nr = [], [], [], []
        for key in keys:
            w1, w2 = key.split(PAIR_SEP)
            w1s.append(w1)
            w2s.append(w2)
            nl.append(lm[w1])
            nr.append(rm[w2])
        pmi = np.log(np_ * t_pairs / (np.asarray(nl, np.float64) * np.asarray(nr, np.float64)))
        pmi = np.copysign(np.floor(np.abs(pmi) * 1e6 + 0.5), pmi) / 1e6
        out = pa.table(
            {
                "w1": pa.array(w1s, pa.string()),
                "w2": pa.array(w2s, pa.string()),
                "n_pair": t.column("n"),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )
        # local top-K: global top-K rows are top-K within their bucket
        idx = sorted(
            range(len(out)),
            key=lambda i: (-pmi[i], w1s[i], w2s[i]),
        )[:_PMI_K]
        return out.take(pa.array(idx, pa.int64()))

    def final(df):
        return df.sort_values(
            ["pmi", "w1", "w2"], ascending=[False, True, True]
        ).head(_PMI_K)

    candidates = pairs.map_batches(score, batch_format="pyarrow")
    return candidates.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


@register(
    "select_top_quality",
    # nested WITH: the whole quality battery as a subquery, then one
    # global window rank; the keep budget ceil(n/5) is written in pure
    # integer arithmetic on BOTH sides so no float rounding can move
    # the cut line
    oracle="WITH q AS (" + _QUALITY_ORACLE + """),
    r AS (SELECT doc_id, quality_score,
                 ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) AS rn,
                 COUNT(*) OVER () AS n
          FROM q)
    SELECT doc_id, quality_score FROM r WHERE rn <= (n + 4) // 5
""",
)
def select_top_quality(sf_dir: str):
    """Top-20%-by-quality document selection — the data-curation step
    that keeps only the best-scoring fraction of a corpus (CCNet-style
    head/middle/tail bucketing reduced to its top bucket).  Global
    EXACT rank via the distributed range-partitioned sort + per-block
    offset-merged rank substrate (`ops.with_group_ranks` with a
    constant group), so no task ever holds more than one sorted block;
    ties broken by doc_id for a deterministic cut."""
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import round_cols, with_group_ranks

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    scored = ds.map_batches(quality_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "quality_score"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = round_cols(t, {"quality_score": 6})
        negq = np.negative(t.column("quality_score").to_numpy(zero_copy_only=False))
        t = t.append_column("__negq", pa.array(negq, pa.float64()))
        return t.append_column("__g", pa.array(np.zeros(len(t), np.int64)))

    ranked = with_group_ranks(
        scored.map_batches(prep, batch_format="pyarrow"), "__g", ["__negq", "doc_id"]
    )

    def keep(t: pa.Table) -> pa.Table:
        rank = t.column("__rank").to_numpy(zero_copy_only=False)
        n = t.column("__gn").to_numpy(zero_copy_only=False)
        mask = rank < (n + 4) // 5  # 0-based rank < ceil(n/5) == 1-based rn <= ceil(n/5)
        return t.filter(pa.array(mask)).select(["doc_id", "quality_score"])

    return ranked.map_batches(keep, batch_format="pyarrow")


_CAP_PER_SOURCE = 15

_CAP_ORACLE = f"""
WITH r AS (SELECT doc_id, source, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents)
SELECT doc_id, source, n_chars FROM r WHERE rn <= {_CAP_PER_SOURCE}
"""


@register("cap_docs_per_source", oracle=_CAP_ORACLE)
def cap_docs_per_source(sf_dir: str):
    """Per-source document cap (RefinedWeb-style per-domain cap): keep
    at most N docs per source, preferring the longest (n_chars DESC,
    doc_id tie-break).  Distributed shape = `ops.grouped_topk`:
    per-batch local top-k prune, then a hash-BUCKETED final per key
    group — no task ever holds the k x n_sources global output."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import grouped_topk

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    capped = grouped_topk(
        docs,
        keys=["source"],
        sort_cols=[("n_chars", False), ("doc_id", True)],
        k=_CAP_PER_SOURCE,
        n_buckets=auto_buckets(docs.count()),
    )
    return capped.map_batches(
        lambda t: t.select(["doc_id", "source", "n_chars"]), batch_format="pyarrow"
    )


_DSIR_ORACLE = """
WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id, lang,
             CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 8)) AS BIGINT)
               % 1024 AS b
      FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
tc AS (SELECT b, COUNT(*) AS c FROM g WHERE lang = 'en' GROUP BY b),
rc AS (SELECT b, COUNT(*) AS c FROM g GROUP BY b),
tot AS (SELECT (SELECT COUNT(*) FROM g WHERE lang = 'en') AS tt,
               (SELECT COUNT(*) FROM g) AS tr),
lr AS (SELECT rc.b,
              ln((COALESCE(tc.c, 0) + 1.0) / (tot.tt + 1024.0))
              - ln((rc.c + 1.0) / (tot.tr + 1024.0)) AS lr
       FROM rc LEFT JOIN tc USING (b), tot),
per AS (SELECT g.doc_id, COUNT(*) AS n_bigrams, SUM(lr.lr) AS lw
        FROM g JOIN lr USING (b) GROUP BY g.doc_id)
SELECT d.doc_id, COALESCE(p.n_bigrams, 0) AS n_bigrams,
       ROUND(COALESCE(p.lw, 0.0), 6) AS logweight
FROM documents d LEFT JOIN per p USING (doc_id)
"""


@register("dsir_logweights", oracle=_DSIR_ORACLE)
def dsir_logweights_query(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): hashed-bigram
    target-vs-raw log-likelihood ratio per document, target = lang='en'.
    Histogram partials aggregate per block with NO shuffle (fixed-size
    vectors), the 1024-float log-ratio vector broadcasts via ray.put —
    the md5 bucket hash is shared with the oracle so the whole operator
    is value-checked (stages/dsir.py)."""
    from document_ai_ray.stages.dsir import dsir_logweights

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return dsir_logweights(docs)


def _words_hll_oracle() -> str:
    from document_ai_ray.functions.sketch import hll60_sql

    return (
        "WITH vals AS (SELECT DISTINCT word AS v FROM "
        "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) "
        "WHERE word != ''),"
        + hll60_sql("SELECT v FROM vals")
        + """,
ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals)
SELECT est_milli AS n_distinct_est_milli,
       ex.n AS n_distinct_exact,
       CAST(ABS(est_milli - 1000 * ex.n) * 10000 // (1000 * ex.n) AS BIGINT)
         AS rel_err_bp,
       ABS(est_milli - 1000 * ex.n) * 10000 // (1000 * ex.n) <= 500
         AS within_bound
FROM est, ex
"""
    )


@register("approx_distinct_words_hll", oracle=_words_hll_oracle())
def approx_distinct_words_hll(sf_dir: str):
    """Corpus distinct-word cardinality by HyperLogLog (p=12, 4 KiB
    fixed-size registers, elementwise-max merge) next to the EXACT
    distributed distinct.  ORACLE-CHECKED (round 5): the md5-60-bit
    register spec + exact-integer estimate substrate
    (`functions/sketch.py:hll60_*`) replays bit-for-bit in DuckDB —
    registers, harmonic sum, linear-counting branch and all — so the
    sketch itself is value-hash-verified, not just bound-asserted."""
    import numpy as np

    from document_ai_ray.functions.sketch import (
        hll60_est_milli,
        hll60_registers,
        hll_merge,
    )
    from document_ai_ray.pipelines.ops import distinct_rows
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        vc = word_value_counts(t.column("text"))
        regs = hll60_registers(vc.column("word").to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def merge(t: pa.Table) -> pa.Table:
        regs = [np.frombuffer(b, dtype=np.uint8) for b in t.column("regs").to_pylist()]
        return pa.table({"regs": pa.array([hll_merge(regs).tobytes()], pa.binary())})

    parts = docs.map_batches(partial, batch_format="pyarrow")
    # num_cpus=0.5: fusion break (see ops.merge_partials)
    merged = parts.map_batches(
        merge, batch_format="pyarrow", batch_size=1 << 20, num_cpus=0.5
    )
    merged = merged.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=1 << 30
    )
    final = [np.frombuffer(b["regs"], dtype=np.uint8) for b in merged.take_all()]
    est_milli, _ = hll60_est_milli(hll_merge(final))

    words = docs.map_batches(
        lambda t: word_value_counts(t.column("text")).select(["word"]),
        batch_format="pyarrow",
    )
    exact = distinct_rows(words, ["word"]).count()
    rel_bp = abs(est_milli - 1000 * exact) * 10000 // (1000 * exact) if exact else 0
    return pa.table(
        {
            "n_distinct_est_milli": pa.array([est_milli], pa.int64()),
            "n_distinct_exact": pa.array([exact], pa.int64()),
            "rel_err_bp": pa.array([rel_bp], pa.int64()),
            "within_bound": pa.array([rel_bp <= 500], pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# fastText-style supervised language ID (hashed-trigram linear softmax)
# ---------------------------------------------------------------------------

_FT_N_DOCS = 600
_FT_HOLDOUT = 5  # every 5th doc is eval-only


def _langid_ft_corpus():
    """Label-by-construction language corpus (same discipline as the F5
    classifier corpus in synth.py): text drawn from synth.WORDS[lang],
    so character trigrams genuinely carry the label.  Deterministic
    per id; generated in-task."""
    import random

    import ray.data as rd

    from document_ai_ray.synth import WORDS, _sentence

    langs = sorted(WORDS)

    def gen(batch: pa.Table) -> pa.Table:
        ids, texts, ys = [], [], []
        for i in batch.column("id").to_pylist():
            lang = langs[i % len(langs)]
            rng = random.Random((77 << 32) ^ i)
            text = " ".join(_sentence(rng, WORDS[lang]) for _ in range(rng.randint(2, 5)))
            ids.append(i)
            texts.append(text)
            ys.append(i % len(langs))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "y": pa.array(ys, pa.int32()),
            }
        )

    return rd.range(_FT_N_DOCS, override_num_blocks=8).map_batches(
        gen, batch_format="pyarrow"
    ), langs


@register("langid_fasttext_docs")
def langid_fasttext_docs(sf_dir: str):
    """LEARNED language ID, the fastText lid.176 shape (hashed char
    trigrams -> linear softmax), next to the heuristic stopword-argmax
    `langid_docs`: train by distributed full-batch GD on the
    label-by-construction corpus (every doc NOT in the held-out fifth),
    then score the HELD-OUT fifth.  Rows carry (lang, pred_lang,
    correct) — self-evidencing; tests assert held-out accuracy and a
    monotone training loss.  Rows-only: an iterative learned model has
    no SQL analogue.  sf_dir unused (the corpus is synthesized —
    the sf documents table's lang column is uncorrelated with its text
    by construction, so nothing learnable lives there)."""
    import numpy as np

    from document_ai_ray.stages.textclf import textclf_predict, textclf_train

    ds, langs = _langid_ft_corpus()

    # hold out every 5th BLOCK of 5 (i//5 % 5): the label itself is
    # i % 5, so holding out i % 5 == 0 would hide class 0 from training
    # entirely and make the eval slice single-class
    def is_train(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids // _FT_HOLDOUT) % _FT_HOLDOUT != 0))

    def is_eval(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids // _FT_HOLDOUT) % _FT_HOLDOUT == 0))

    train = ds.map_batches(is_train, batch_format="pyarrow")
    W, b, hist = textclf_train(train, n_classes=len(langs), n_iter=10, lr=1.0)
    scored = textclf_predict(
        ds.map_batches(is_eval, batch_format="pyarrow"), W, b
    )

    def finish(t: pa.Table) -> pa.Table:
        y = t.column("y").to_numpy(zero_copy_only=False)
        pred = t.column("pred").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": pa.array([langs[v] for v in y], pa.string()),
                "pred_lang": pa.array([langs[v] for v in pred], pa.string()),
                "pred_prob": t.column("pred_prob"),
                "correct": pa.array(y == pred),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SentencePiece-style unigram-LM tokenizer (the other trainer family)
# ---------------------------------------------------------------------------

_UT_VOCAB = 300


def _unigram_vocab(sf_dir: str):
    from document_ai_ray.stages.bpe import corpus_word_counts
    from document_ai_ray.stages.unigram_tok import unigram_train

    docs = read_table(sf_dir, "documents", columns=["text"])
    wc = corpus_word_counts(docs, vocab_cap=20000)
    return unigram_train(wc, vocab_size=_UT_VOCAB)


@register("unigram_tok_train")
def unigram_tok_train(sf_dir: str):
    """Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece
    family, next to the BPE trainer `bpe_train_merges`): seed from all
    frequent substrings, hard-EM piece probabilities over the
    distributed distinct-word table, prune to the target vocab.
    Rows-only (an EM fixpoint has no SQL analogue); determinism and
    likelihood monotonicity per fixed vocab are asserted in
    tests/test_unigram_tok.py.  Output: the trained vocab with
    logprobs and ranks."""
    logp, hist = _unigram_vocab(sf_dir)
    pieces = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.table(
        {
            "rank": pa.array(range(1, len(pieces) + 1), pa.int64()),
            "piece": pa.array([p for p, _ in pieces], pa.string()),
            "logprob": pa.array([round(v, 6) for _, v in pieces], pa.float64()),
            "n_pieces": pa.array([len(pieces)] * len(pieces), pa.int64()),
        }
    )


@register("unigram_tokenize_docs")
def unigram_tokenize_docs(sf_dir: str):
    """Tokenize the corpus with the trained unigram vocab — per-doc
    token counts, char counts, and a self-evidencing ROUNDTRIP column
    (each word's pieces must concatenate back to the word; all rows
    must carry roundtrip_ok=true).  The compression ratio
    n_chars_tok/n_tokens is the fertility metric tokenizer teams
    track."""
    from document_ai_ray.stages.unigram_tok import unigram_encode_docs

    logp, _ = _unigram_vocab(sf_dir)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return unigram_encode_docs(docs, logp)


def _seg_langid_oracle() -> str:
    """Per-half stopword-argmax battery, GENERATED from the one
    STOPWORDS table so the SQL can never drift from the Python lists."""
    from document_ai_ray.stages.text_analysis import STOPWORDS, _LANG_ORDER

    def hits(src: str) -> str:
        cols = []
        for lang in _LANG_ORDER:
            words = ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))
            cols.append(f"SUM(CASE WHEN w IN ({words}) THEN 1 ELSE 0 END) AS h_{lang}")
        return f"SELECT doc_id, {', '.join(cols)} FROM {src} GROUP BY doc_id"

    greatest = ", ".join(f"h_{lang}" for lang in _LANG_ORDER)
    pick = " ".join(
        f"WHEN h_{lang} = g THEN '{lang}'" for lang in _LANG_ORDER[:-1]
    )
    pred = f"CASE WHEN g = 0 THEN 'und' {pick} ELSE '{_LANG_ORDER[-1]}' END"
    return rf"""
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\p{{L}}+') AS ws
             FROM documents),
h AS (SELECT doc_id,
             ws[1 : len(ws) // 2] AS w1,
             ws[len(ws) // 2 + 1 : len(ws)] AS w2
      FROM tok),
u1 AS (SELECT doc_id, unnest(w1) AS w FROM h),
u2 AS (SELECT doc_id, unnest(w2) AS w FROM h),
s1 AS ({hits('u1')}),
s2 AS ({hits('u2')}),
p1 AS (SELECT doc_id, {pred} AS pred_first
       FROM (SELECT *, GREATEST({greatest}) AS g FROM s1)),
p2 AS (SELECT doc_id, {pred} AS pred_second
       FROM (SELECT *, GREATEST({greatest}) AS g FROM s2))
SELECT d.doc_id,
       COALESCE(p1.pred_first, 'und') AS pred_first,
       COALESCE(p2.pred_second, 'und') AS pred_second,
       COALESCE(p1.pred_first, 'und') != COALESCE(p2.pred_second, 'und') AS mixed
FROM documents d
LEFT JOIN p1 ON d.doc_id = p1.doc_id
LEFT JOIN p2 ON d.doc_id = p2.doc_id
"""


@register("langid_segments_docs", oracle=_seg_langid_oracle())
def langid_segments_docs(sf_dir: str):
    """Mixed-language document detection (the per-segment langid pass
    CCNet runs per paragraph): tokenize once, langid the first and
    second token halves independently, flag disagreement.  The oracle's
    per-half stopword battery is GENERATED from the same STOPWORDS
    table the Python path uses, so the two sides cannot drift.
    Stateless streaming map."""
    from document_ai_ray.stages.text_analysis import _WORD_RE, langid_words

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def seg(t: pa.Table) -> pa.Table:
        p1, p2, mixed = [], [], []
        for text in t.column("text").to_pylist():
            words = _WORD_RE.findall(text.lower())
            n = len(words)
            a = langid_words(words[: n // 2])
            b = langid_words(words[n // 2 :])
            p1.append(a)
            p2.append(b)
            mixed.append(a != b)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "pred_first": pa.array(p1, pa.string()),
                "pred_second": pa.array(p2, pa.string()),
                "mixed": pa.array(mixed),
            }
        )

    return docs.map_batches(seg, batch_format="pyarrow")


_KEY_K = 10

_KEYNESS_ORACLE = r"""
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
w2 AS (SELECT source, word FROM w WHERE word != ''),
c AS (SELECT source, word, CAST(COUNT(*) AS DOUBLE) AS a FROM w2 GROUP BY 1, 2),
ws AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS ns FROM w2 GROUP BY 1),
wt AS (SELECT word, CAST(COUNT(*) AS DOUBLE) AS nw FROM w2 GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM w2),
g AS (SELECT c.source, c.word, c.a,
             wt.nw - c.a AS b, ws.ns - c.a AS cc, tot.n - wt.nw - ws.ns + c.a AS d,
             wt.nw, ws.ns, tot.n
      FROM c JOIN ws USING (source) JOIN wt USING (word) CROSS JOIN tot),
s AS (SELECT source, word, a,
        2 * ((CASE WHEN a > 0 THEN a * ln(a * n / (nw * ns)) ELSE 0 END)
           + (CASE WHEN b > 0 THEN b * ln(b * n / (nw * (n - ns))) ELSE 0 END)
           + (CASE WHEN cc > 0 THEN cc * ln(cc * n / ((n - nw) * ns)) ELSE 0 END)
           + (CASE WHEN d > 0 THEN d * ln(d * n / ((n - nw) * (n - ns))) ELSE 0 END)) AS g2
      FROM g),
r AS (SELECT source, word, CAST(a AS BIGINT) AS n_in_source, ROUND(g2, 6) AS g2,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY ROUND(g2, 6) DESC, word) AS rn
      FROM s)
SELECT source, word, n_in_source, g2 FROM r WHERE rn <= 10
"""


@register("keyness_terms_by_source", oracle=_KEYNESS_ORACLE)
def keyness_terms_by_source(sf_dir: str):
    """DISTINCTIVE terms per source by Dunning log-likelihood keyness
    (G² over the word-in-source 2×2 contingency) — the corpus-
    linguistics op behind per-domain keyword profiles.  Distributed
    shape: bucketed (source, word) count COMBINER, vocab-sized word
    totals + tiny per-source totals broadcast, per-bucket vectorized G²
    with a per-source local top-k prune (a global top-k row is top-k
    in its bucket), one small final sort.  The G² expression keeps
    identical associativity on both sides; ordering uses the ROUNDED
    score so the cut line is engine-robust."""
    import math

    import numpy as np
    import pandas as pd
    import ray

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, get_broadcast
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["source", "text"])
    P = auto_buckets(docs.count())

    def partial(t: pa.Table) -> pa.Table:
        src_col = t.column("source").to_numpy(zero_copy_only=False)
        srcs, words, ns_ = [], [], []
        for src in np.unique(src_col):
            sub = t.filter(pa.array(src_col == src))
            g = word_value_counts(sub.column("text"))
            srcs.extend([str(src)] * len(g))
            words.extend(g.column("word").to_pylist())
            ns_.extend(g.column("n").to_pylist())
        bucket = pa.array([crc_bucket(w, P) for w in words], pa.int32())
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "word": pa.array(words, pa.string()),
                "n": pa.array(ns_, pa.int64()),
                "bucket": bucket,
            }
        )

    def bucket_sum(df):
        return df.groupby(["source", "word"], as_index=False)["n"].sum()

    counts = bucket_map_groups(
        docs.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        bucket_sum,
        P,
        batch_format="pandas",
    ).materialize()  # consumed by totals AND scoring

    nw: dict[str, int] = {}
    ns: dict[str, int] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        for s_, w_, n_ in zip(
            b.column("source").to_pylist(), b.column("word").to_pylist(), b.column("n").to_pylist()
        ):
            nw[w_] = nw.get(w_, 0) + n_
            ns[s_] = ns.get(s_, 0) + n_
    n_total = float(sum(ns.values()))
    ref = ray.put((nw, ns, n_total))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        nw_, ns_, n = get_broadcast((ref,), tag="keyness_totals")
        a = df["n"].to_numpy(np.float64)
        w_tot = df["word"].map(nw_).to_numpy(np.float64)
        s_tot = df["source"].map(ns_).to_numpy(np.float64)
        b = w_tot - a
        cc = s_tot - a
        d = n - w_tot - s_tot + a
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = np.where(a > 0, a * np.log(a * n / (w_tot * s_tot)), 0.0)
            tb = np.where(b > 0, b * np.log(b * n / (w_tot * (n - s_tot))), 0.0)
            tc = np.where(cc > 0, cc * np.log(cc * n / ((n - w_tot) * s_tot)), 0.0)
            td = np.where(d > 0, d * np.log(d * n / ((n - w_tot) * (n - s_tot))), 0.0)
        g2 = 2 * (ta + tb + tc + td)
        g2 = np.copysign(np.floor(np.abs(g2) * 1e6 + 0.5), g2) / 1e6
        out = pd.DataFrame(
            {
                "source": df["source"].to_numpy(),
                "word": df["word"].to_numpy(),
                "n_in_source": df["n"].to_numpy(np.int64),
                "g2": g2,
            }
        )
        out = out.sort_values(["source", "g2", "word"], ascending=[True, False, True],
                              kind="mergesort")
        return out.groupby("source", as_index=False).head(_KEY_K)

    # re-bucket for scoring: any bucketing works for the local prune,
    # keep the word hash so bucket contents match the merged counts
    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = [crc_bucket(w, P) for w in df["word"]]
        return df

    candidates = bucket_map_groups(
        counts.map_batches(rebucket, batch_format="pandas"), "bucket", score, P,
        batch_format="pandas",
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "g2", "word"], ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("source", as_index=False).head(_KEY_K)

    return candidates.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


_HEAPS_K = 8

_HEAPS_ORACLE = f"""
WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
cp AS (SELECT CAST(CEIL(nd.n_docs * t.k / {_HEAPS_K}.0) AS BIGINT) AS c
       FROM nd, UNNEST(generate_series(1, {_HEAPS_K})) AS t(k)),
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
w2 AS (SELECT doc_id, word FROM w WHERE word != ''),
m AS (SELECT word, MIN(doc_id) AS first_doc FROM w2 GROUP BY 1)
SELECT cp.c AS checkpoint_docs,
       CAST((SELECT COUNT(*) FROM w2 WHERE doc_id < cp.c) AS BIGINT) AS n_tokens,
       CAST((SELECT COUNT(*) FROM m WHERE first_doc < cp.c) AS BIGINT) AS n_distinct
FROM cp
"""


@register("heaps_vocab_growth", oracle=_HEAPS_ORACLE)
def heaps_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary growth curve (distinct words vs tokens at
    8 corpus checkpoints) — the corpus statistic tokenizer sizing and
    dedup-health monitoring read.  Exact at every checkpoint WITHOUT
    rescanning per checkpoint: one bucketed MIN-combiner gives each
    word's first doc, one streaming pass gives per-checkpoint token
    counts (vectorized against all checkpoints at once), and the
    distinct counts fall out of a histogram over first-doc — two
    scans total for all 8 points."""
    import numpy as np

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()
    cps = np.array(
        [int(np.ceil(n_docs * k / float(_HEAPS_K))) for k in range(1, _HEAPS_K + 1)],
        np.int64,
    )
    P = auto_buckets(n_docs)

    def word_first_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        lists = pc.split_pattern(t.column("text"), " ")
        n_per = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        rows = np.repeat(ids, n_per)
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        keep = pc.not_equal(flat, "")
        words = flat.filter(keep).to_pandas()
        rows = rows[keep.to_numpy(zero_copy_only=False)]
        g = pd.DataFrame({"word": words, "first_doc": rows}).groupby("word", as_index=False)[
            "first_doc"
        ].min()
        g["bucket"] = [crc_bucket(w, P) for w in g["word"]]
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_min(df):
        return df.groupby("word", as_index=False)["first_doc"].min()

    firsts = bucket_map_groups(
        docs.map_batches(word_first_partial, batch_format="pyarrow"),
        "bucket",
        bucket_min,
        P,
        batch_format="pandas",
    )

    # histogram of first-doc against the checkpoints (tiny partials)
    def first_hist(t: pa.Table) -> pa.Table:
        fd = t.column("first_doc").to_numpy(zero_copy_only=False)
        counts = (fd[None, :] < cps[:, None]).sum(axis=1)
        return pa.table(
            {"k": pa.array(range(_HEAPS_K)), "n_distinct": pa.array(counts, pa.int64())}
        )

    def token_hist(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t.column("text"), " ")
        n_per = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        # empties must not count: per-row non-empty token counts
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        rows = np.repeat(np.arange(len(ids)), n_per)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        per_row = np.bincount(rows[nonempty], minlength=len(ids)).astype(np.int64)
        counts = ((ids[None, :] < cps[:, None]) * per_row[None, :]).sum(axis=1)
        return pa.table(
            {"k": pa.array(range(_HEAPS_K)), "n_tokens": pa.array(counts, pa.int64())}
        )

    from document_ai_ray.pipelines.ops import partial_group_agg

    dist = partial_group_agg(
        firsts.map_batches(first_hist, batch_format="pyarrow"), ["k"], {"n_distinct": "n_distinct"}
    ).to_pandas()
    toks = partial_group_agg(
        docs.map_batches(token_hist, batch_format="pyarrow"), ["k"], {"n_tokens": "n_tokens"}
    ).to_pandas()
    merged = toks.merge(dist, on="k").sort_values("k")
    return pa.table(
        {
            "checkpoint_docs": pa.array(cps, pa.int64()),
            "n_tokens": pa.array(merged["n_tokens"].to_numpy(), pa.int64()),
            "n_distinct": pa.array(merged["n_distinct"].to_numpy(), pa.int64()),
        }
    )


_ZIPF_N = 50

_ZIPF_ORACLE = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word, COUNT(*) AS n FROM w WHERE word != '' GROUP BY 1),
r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rnk FROM c)
SELECT ROUND(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6) AS zipf_slope,
       CAST(COUNT(*) AS BIGINT) AS n_words
FROM r WHERE rnk <= {_ZIPF_N}
"""


@register("zipf_slope_vocab", oracle=_ZIPF_ORACLE)
def zipf_slope_vocab(sf_dir: str):
    """Zipf rank-frequency fit: least-squares slope of ln(freq) vs
    ln(rank) over the top-{N} vocabulary (the corpus-health statistic —
    natural text sits near −1; the synthetic near-uniform vocab is much
    flatter, and the value itself is the oracle-checked output).
    Distributed part = the exact bucketed heavy-hitter reduction of
    `vocab_top_words`; the fit is O(N) driver arithmetic written as
    cov/var exactly like SQL's regr_slope."""
    import math

    top = vocab_top_words(sf_dir).to_pandas()  # already globally sorted
    top = top.head(_ZIPF_N)
    n = len(top)
    xs = [math.log(r) for r in range(1, n + 1)]
    ys = [math.log(float(v)) for v in top["n"]]
    mx = sum(xs) / n
    my = sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    var = sum((x - mx) ** 2 for x in xs) / n
    slope = cov / var
    slope = math.copysign(math.floor(abs(slope) * 1e6 + 0.5), slope) / 1e6
    return pa.table(
        {
            "zipf_slope": pa.array([slope], pa.float64()),
            "n_words": pa.array([n], pa.int64()),
        }
    )


_JW_ORACLE = """
WITH t AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents),
v AS (SELECT w FROM t WHERE w <> '')
SELECT a.w AS w1, b.w AS w2,
       ROUND(jaro_winkler_similarity(a.w, b.w), 4) AS jw
FROM v a JOIN v b
  ON a.w < b.w AND substr(a.w, 1, 1) = substr(b.w, 1, 1)
WHERE jaro_winkler_similarity(a.w, b.w) >= 0.6
"""


@register("jaro_winkler_word_pairs", oracle=_JW_ORACLE)
def jaro_winkler_word_pairs(sf_dir: str):
    """Jaro-Winkler near-duplicate vocabulary pairs (the record-linkage
    similarity, complementing the Levenshtein fuzzy join): distinct
    corpus words via the shuffle-free distinct merge, then blocked
    all-pairs JW (same-first-char blocks, declared in the oracle too —
    JW's prefix weighting makes the first character the natural
    blocking key).  The Python jaro_winkler is exact-float-equal to
    DuckDB's (functions/strings.py differential note).  The pair scan
    is distributed over the distinct-word dataset with the word list
    broadcast once — vocabulary-bounded by construction (at corpus
    scale, feed it `vocab_top_words`' top-K instead)."""
    import ray

    from document_ai_ray.functions.strings import jaro_winkler
    from document_ai_ray.pipelines.ops import distinct_rows, get_broadcast

    docs = read_table(sf_dir, "documents", columns=["text"])

    def words(t: pa.Table) -> pa.Table:
        out: set[str] = set()
        for txt in t.column("text").to_pylist():
            out.update((txt or "").split(" "))
        out.discard("")
        return pa.table({"w": pa.array(sorted(out), pa.string())})

    vocab = distinct_rows(docs.map_batches(words, batch_format="pyarrow"), ["w"]).materialize()
    # vocabulary-bounded collect (same bound as the BM25/TF-IDF DF maps)
    all_words = sorted(
        w
        for ref in vocab.to_arrow_refs()
        for w in ray.get(ref).column("w").to_pylist()
    )
    wref = (ray.put(all_words),)

    def pairs(t: pa.Table, _ref=wref) -> pa.Table:
        vs = get_broadcast(_ref, tag="jw_vocab")
        w1s, w2s, sims = [], [], []
        for a in t.column("w").to_pylist():
            for b in vs:
                if a < b and a[0] == b[0]:
                    s = jaro_winkler(a, b)
                    if s >= 0.6:
                        w1s.append(a)
                        w2s.append(b)
                        sims.append(round(s, 4))
        return pa.table(
            {
                "w1": pa.array(w1s, pa.string()),
                "w2": pa.array(w2s, pa.string()),
                "jw": pa.array(sims, pa.float64()),
            }
        )

    return vocab.map_batches(pairs, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SQL-checkable winnowing fingerprints (MOSS; Schleimer et al. 2003)
# and lexical-diversity quality signals.
# ---------------------------------------------------------------------------

from document_ai_ray.stages.text_analysis import (  # noqa: E402
    WINNOW_K,
    WINNOW_W,
    winnow_md5_batch,
)

_WINNOW_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
             substr(md5(array_to_string(
                 ws[CAST(t.i AS BIGINT):CAST(t.i + {WINNOW_K - 1} AS BIGINT)], ' ')), 1, 16) AS h
      FROM w, UNNEST(generate_series(1, GREATEST(len(ws) - {WINNOW_K - 1}, 1))) AS t(i)),
c AS (SELECT doc_id, COUNT(*) AS n_g FROM g GROUP BY doc_id),
s AS (SELECT g.doc_id, g.pos, c.n_g,
             MIN(h) OVER (PARTITION BY g.doc_id ORDER BY g.pos
                          ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS m
      FROM g JOIN c USING (doc_id))
SELECT DISTINCT doc_id, m AS fp
FROM s
WHERE pos + {WINNOW_W} - 1 <= n_g OR (n_g <= {WINNOW_W} AND pos = 1)
"""


@register("winnow_fingerprints_docs", oracle=_WINNOW_ORACLE)
def winnow_fingerprints_docs(sf_dir: str):
    """Winnowing document fingerprints with an exact SQL replay: k-word
    md5 grams -> sliding-window minima -> distinct per doc, exploded to
    (doc_id, fp) rows.  Stateless vectorized map_batches (numpy
    sliding_window_view for the window minima); the oracle rebuilds the
    identical scheme with md5() + a ROWS-frame window MIN."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(winnow_md5_batch, batch_format="pyarrow")


_LEXDIV_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
wn AS (SELECT doc_id, len(ws) AS n_words,
              len(list_distinct(ws)) AS n_distinct_words FROM w),
ch AS (SELECT doc_id, substr(text, CAST(t.i AS BIGINT), 1) AS c
       FROM documents, UNNEST(generate_series(1, len(text))) AS t(i)),
cc AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY doc_id, c),
tot AS (SELECT doc_id, SUM(n) AS tot FROM cc GROUP BY doc_id),
ent AS (SELECT cc.doc_id,
               -SUM((n / tot) * log2(n / tot)) AS e
        FROM cc JOIN tot USING (doc_id) GROUP BY cc.doc_id)
SELECT wn.doc_id, wn.n_words, wn.n_distinct_words,
       ROUND(CAST(wn.n_distinct_words AS DOUBLE) / wn.n_words, 6) AS ttr,
       ROUND(COALESCE(ent.e, 0), 6) AS char_entropy
FROM wn LEFT JOIN ent USING (doc_id)
"""


@register("lexical_diversity_docs", oracle=_LEXDIV_ORACLE)
def lexical_diversity_docs(sf_dir: str):
    """Per-document lexical-diversity quality signals: type-token ratio
    (distinct words / words — a standard feature in quality
    classifiers) and Shannon character entropy (low-entropy pages are
    repetitive chrome or encoded junk).  Stateless vectorized
    map_batches; the oracle recomputes both from scratch (entropy's
    ~60-term float sum agrees under ROUND(...,6))."""
    import numpy as np

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        from collections import Counter

        ids, nw, ndw, ttr, ent = [], [], [], [], []
        for i, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            s = s or ""
            ws = s.split(" ")
            ids.append(i)
            nw.append(len(ws))
            ndw.append(len(set(ws)))
            ttr.append(len(set(ws)) / len(ws))
            if s:
                cnt = np.array(list(Counter(s).values()), np.float64)
                p = cnt / cnt.sum()
                # fixed ascending-p sum order; divergence vs DuckDB's
                # order is ~1e-16, absorbed by ROUND 6
                e = float(-(np.sort(p * np.log2(p)).sum()))
            else:
                e = 0.0
            ent.append(e)

        def r6(xs):
            import numpy as _np

            a = _np.asarray(xs, _np.float64)
            return _np.copysign(_np.floor(_np.abs(a) * 1e6 + 0.5), a) / 1e6

        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "n_distinct_words": pa.array(ndw, pa.int64()),
                "ttr": pa.array(r6(ttr), pa.float64()),
                "char_entropy": pa.array(r6(ent), pa.float64()),
            }
        )

    return docs.map_batches(feats, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram scoring: the production n-gram-LM smoother
# (KenLM's default).  Unlike the interpolated model above, the backoff
# weight is the CONTINUATION count (how many distinct contexts a word
# follows) — "francisco" is frequent but follows only "san", so KN
# scores it low in novel contexts where raw-frequency interpolation
# overrates it.
# ---------------------------------------------------------------------------

_KN_D = 0.75

_KN_ORACLE = f"""
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
uc AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY 1),
b AS (SELECT doc_id,
             unnest(ws[1:len(ws)-1]) AS w1,
             unnest(ws[2:len(ws)]) AS w2
      FROM w WHERE len(ws) >= 2),
bc AS (SELECT w1, w2, COUNT(*) AS nb FROM b GROUP BY 1, 2),
nf AS (SELECT w1, COUNT(*) AS k FROM bc GROUP BY 1),
nbk AS (SELECT w2, COUNT(*) AS k FROM bc GROUP BY 1),
nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM bc),
sc AS (SELECT b.doc_id,
              ln(GREATEST(bc.nb - {_KN_D}, 0) / u1.n
                 + ({_KN_D} * nf.k / u1.n) * (nbk.k / nt.t)) AS lp
       FROM b JOIN bc USING (w1, w2)
              JOIN uc u1 ON u1.word = b.w1
              JOIN nf ON nf.w1 = b.w1
              JOIN nbk ON nbk.w2 = b.w2
              CROSS JOIN nt),
d AS (SELECT doc_id, AVG(lp) AS a, COUNT(*) AS n_bigram FROM sc GROUP BY 1)
SELECT doc_id, ROUND(a, 6) AS avg_logprob_kn, n_bigram FROM d
"""


@register("kneser_ney_logprob_docs", oracle=_KN_ORACLE)
def kneser_ney_logprob_docs(sf_dir: str):
    """Absolute-discounting Kneser-Ney bigram document scores:
    p(w2|w1) = max(c(w1w2)−D, 0)/c(w1) + (D·N1+(w1·)/c(w1)) ·
    (N1+(·w2)/N1+(··)), D = 0.75.  Same distributed shape as
    `bigram_logprob_docs` (combiner count partials through the manual
    exchange, model broadcast once, one streaming score pass); the
    continuation counts N1+ are DERIVED from the bigram-type table
    driver-side (vocab-sized, never corpus-sized).  Probability
    expressions keep identical associativity on both sides so ln()
    sees bit-identical doubles."""
    import math

    import numpy as np
    import pandas as pd
    import ray

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, get_broadcast
    from document_ai_ray.stages.text_analysis import (
        PAIR_SEP,
        bigram_value_counts,
        doc_word_pairs,
        word_value_counts,
    )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = auto_buckets(docs.count())

    def _collect(counts_fn, key_name: str) -> dict[str, int]:
        def partial(t: pa.Table) -> pa.Table:
            g = counts_fn(t.column("text"))
            bucket = pa.array(
                [crc_bucket(k, P) for k in g.column(key_name).to_pylist()], pa.int32()
            )
            return g.append_column("bucket", bucket)

        def bucket_sum(df):
            return df.groupby(key_name, as_index=False)["n"].sum()

        merged = bucket_map_groups(
            docs.map_batches(partial, batch_format="pyarrow"),
            "bucket",
            bucket_sum,
            P,
            batch_format="pandas",
        )
        out: dict[str, int] = {}
        for b in merged.iter_batches(batch_format="pyarrow"):
            out.update(zip(b.column(key_name).to_pylist(), b.column("n").to_pylist()))
        return out

    uni = _collect(word_value_counts, "word")
    big = _collect(bigram_value_counts, "pair")
    # continuation counts from the bigram-TYPE table (vocab-sized)
    nf: dict[str, int] = {}
    nb: dict[str, int] = {}
    for pair in big:
        w1, w2 = pair.split(PAIR_SEP)
        nf[w1] = nf.get(w1, 0) + 1
        nb[w2] = nb.get(w2, 0) + 1
    ntypes = float(len(big))
    D = _KN_D
    model = {}
    for pair, nbp in big.items():
        w1, w2 = pair.split(PAIR_SEP)
        model[pair] = math.log(
            max(nbp - D, 0) / uni[w1] + (D * nf[w1] / uni[w1]) * (nb[w2] / ntypes)
        )
    ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        lp: dict = get_broadcast((ref,), tag="kn_lm")
        rows, w1, w2 = doc_word_pairs(t.column("text"))
        if len(rows) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "avg_logprob_kn": pa.array([], pa.float64()),
                    "n_bigram": pa.array([], pa.int64()),
                }
            )
        keys = pc.binary_join_element_wise(w1, w2, PAIR_SEP).to_pandas()
        df = pd.DataFrame({"i": rows, "v": keys.map(lp).to_numpy(dtype=np.float64)})
        agg = df.groupby("i")["v"].agg(["mean", "size"])
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)[agg.index.to_numpy()]
        a = agg["mean"].to_numpy(dtype=np.float64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "avg_logprob_kn": pa.array(
                    np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6, pa.float64()
                ),
                "n_bigram": pa.array(agg["size"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# KWIC concordance (key word in context): every occurrence of a target
# word with its ±2-word context — the corpus-linguistics inspection
# primitive behind "show me how the corpus uses X".
# ---------------------------------------------------------------------------

_KWIC_WORD = "spark"
_KWIC_CTX = 2

_KWIC_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM w)
SELECT doc_id, CAST(i AS BIGINT) AS pos,
       COALESCE(array_to_string(ws[GREATEST(i - {_KWIC_CTX}, 1):i - 1], ' '), '') AS left_ctx,
       COALESCE(array_to_string(ws[i + 1:LEAST(i + {_KWIC_CTX}, len(ws))], ' '), '') AS right_ctx
FROM p WHERE ws[CAST(i AS BIGINT)] = '{_KWIC_WORD}'
"""


@register("kwic_concordance", oracle=_KWIC_ORACLE)
def kwic_concordance(sf_dir: str):
    """KWIC concordance lines for one target word: (doc_id, 1-based
    position, ±2-word contexts) per occurrence.  Stateless per-batch
    pass — at scale this is a streaming map feeding an interactive
    sampler, never a shuffle."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def kwic(t: pa.Table) -> pa.Table:
        ids, poss, lefts, rights = [], [], [], []
        for i, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            ws = (s or "").split(" ")
            for j, wd in enumerate(ws):
                if wd != _KWIC_WORD:
                    continue
                ids.append(i)
                poss.append(j + 1)
                lefts.append(" ".join(ws[max(j - _KWIC_CTX, 0) : j]))
                rights.append(" ".join(ws[j + 1 : j + 1 + _KWIC_CTX]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
                "left_ctx": pa.array(lefts, pa.string()),
                "right_ctx": pa.array(rights, pa.string()),
            }
        )

    return docs.map_batches(kwic, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Token-budget corpus selection: take documents in quality order until a
# global token budget (25% of the corpus) is exhausted — the "best K
# tokens" cut every pre-training data mix performs after scoring.
# ---------------------------------------------------------------------------

_BUDGET_FRAC = 0.25  # of total whitespace tokens

_BUDGET_ORACLE = f"""
WITH q AS ({_QUALITY_ORACLE}),
t AS (SELECT doc_id,
             CASE WHEN trim(regexp_replace(text, '\\s+', ' ', 'g')) = '' THEN 0
                  ELSE len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
             END AS n_ws_tokens
      FROM documents),
s AS (SELECT q.doc_id, q.quality_score, t.n_ws_tokens,
             CAST(COALESCE(SUM(t.n_ws_tokens) OVER (
                 ORDER BY q.quality_score DESC, q.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_tokens
      FROM q JOIN t USING (doc_id)),
tot AS (SELECT SUM(n_ws_tokens) AS total FROM t)
SELECT doc_id, quality_score, n_ws_tokens, cum_tokens
FROM s, tot WHERE cum_tokens < {_BUDGET_FRAC} * total
"""


@register("select_quality_token_budget", oracle=_BUDGET_ORACLE)
def select_quality_token_budget(sf_dir: str):
    """TOKEN-BUDGET corpus selection: keep documents in descending
    quality order until their exclusive running token total reaches 25%
    of the corpus's tokens (the first doc crossing the budget is kept —
    its exclusive prefix is still under budget, SQL's `cum < frac*total`
    rule on both sides).  Quality is ROUNDed to 6 digits BEFORE the sort
    on both sides so the order is engine-independent (doc_id breaks
    ties); the running total is the distributed exclusive prefix sum
    from `with_group_ranks(value_col=...)` — integer-exact, and no task
    ever holds the corpus."""
    import numpy as np

    from document_ai_ray.pipelines.ops import round_cols, with_group_ranks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        t = token_count_batch(quality_batch(t))
        t = round_cols(t, {"quality_score": 6})
        negq = np.negative(t.column("quality_score").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "quality_score": t.column("quality_score"),
                "n_ws_tokens": t.column("n_ws_tokens"),
                "__negq": pa.array(negq, pa.float64()),
                "__g": pa.array(np.zeros(len(t), np.int8)),
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow").materialize()
    total = scored.sum("n_ws_tokens")
    budget = _BUDGET_FRAC * float(total)  # exact: total/4 in binary

    ranked = with_group_ranks(
        scored, "__g", ["__negq", "doc_id"], value_col="n_ws_tokens"
    )

    def keep(t: pa.Table) -> pa.Table:
        cum = t.column("__cum").to_numpy(zero_copy_only=False)
        m = pa.array(cum < budget)
        out = t.filter(m)
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "quality_score": out.column("quality_score"),
                "n_ws_tokens": out.column("n_ws_tokens"),
                "cum_tokens": out.column("__cum"),
            }
        )

    return ranked.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Flesch reading-ease readability scoring: the classic surface-form
# readability filter (word/sentence/syllable ratios), each count
# replayed exactly in SQL (ASCII word regex + vowel-group syllable
# heuristic with a 1-syllable-per-word floor).
# ---------------------------------------------------------------------------

_FLESCH_ORACLE = r"""
WITH wd AS (SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z]+')) AS w
            FROM documents),
sy AS (SELECT doc_id, COUNT(*) AS n_words,
              CAST(SUM(GREATEST(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1)) AS BIGINT) AS n_syll
       FROM wd GROUP BY doc_id),
se AS (SELECT doc_id, GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents
       FROM documents)
SELECT s.doc_id, s.n_words, se.n_sents, s.n_syll,
       ROUND(206.835 - 1.015 * (s.n_words / CAST(se.n_sents AS DOUBLE))
                     - 84.6 * (s.n_syll / CAST(s.n_words AS DOUBLE)), 6) AS flesch
FROM sy s JOIN se USING (doc_id)
WHERE s.n_words > 0
"""


@register("flesch_readability_docs", oracle=_FLESCH_ORACLE)
def flesch_readability_docs(sf_dir: str):
    """Flesch reading-ease per document: 206.835 − 1.015·(words/sents)
    − 84.6·(syllables/words), with syllables = vowel-group runs per
    ASCII word (≥1) and sentences = [.!?]+ runs (≥1).  Stateless
    per-batch map with module-compiled regexes; the oracle replays every
    count with the identical regexes and the identical left-associative
    arithmetic so ROUND(…,6) agrees bit-for-bit."""
    import re

    import numpy as np

    from document_ai_ray.pipelines.ops import round_cols

    rx_word = re.compile(r"[A-Za-z]+")
    rx_vowel = re.compile(r"[aeiouy]+")
    rx_sent = re.compile(r"[.!?]+")

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def flesch(t: pa.Table) -> pa.Table:
        ids, nw, ns, sy = [], [], [], []
        for i, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            words = rx_word.findall(s or "")
            if not words:
                continue
            ids.append(i)
            nw.append(len(words))
            ns.append(max(len(rx_sent.findall(s or "")), 1))
            sy.append(sum(max(len(rx_vowel.findall(w.lower())), 1) for w in words))
        w = np.asarray(nw, np.float64)
        f = 206.835 - 1.015 * (w / np.asarray(ns, np.float64)) - 84.6 * (np.asarray(sy, np.float64) / w)
        out = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "n_sents": pa.array(ns, pa.int64()),
                "n_syll": pa.array(sy, pa.int64()),
                "flesch": pa.array(f, pa.float64()),
            }
        )
        return round_cols(out, {"flesch": 6})

    return docs.map_batches(flesch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Corpus composition report: per-language doc counts, token totals and
# corpus share — the data-mix summary every pre-training run records.
# ---------------------------------------------------------------------------

_MIX_ORACLE = r"""
WITH t AS (SELECT doc_id, lang,
                  CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN 0
                       ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
                  END AS n_ws_tokens
           FROM documents),
g AS (SELECT lang, COUNT(*) AS n_docs, SUM(n_ws_tokens) AS n_tokens FROM t GROUP BY lang),
tot AS (SELECT SUM(n_tokens) AS total FROM g)
SELECT lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(n_tokens / CAST(total AS DOUBLE), 6) AS token_share
FROM g, tot
"""


@register("corpus_mix_report", oracle=_MIX_ORACLE)
def corpus_mix_report(sf_dir: str):
    """Per-language corpus composition (docs, tokens, token share).
    Combiner aggregate to language cardinality, then shares computed in
    ONE final task over the lang-sized table (`repartition(1)` — the
    two-level-merge rule from ops.py)."""
    import numpy as np

    from document_ai_ray.pipelines.ops import round_cols

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def toks(t: pa.Table) -> pa.Table:
        t = token_count_batch(t)
        return t.select(["lang", "n_ws_tokens"])

    agg = partial_group_agg(
        docs.map_batches(toks, batch_format="pyarrow"),
        ["lang"],
        {"n_ws_tokens": "n_tokens"},
        count_alias="n_docs",
    )

    def share(t: pa.Table) -> pa.Table:
        n = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        out = pa.table(
            {
                "lang": t.column("lang"),
                "n_docs": t.column("n_docs"),
                "n_tokens": t.column("n_tokens"),
                "token_share": pa.array(n / n.sum(), pa.float64()),
            }
        )
        return round_cols(out, {"token_share": 6})

    return agg.repartition(1).map_batches(share, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Character-entropy quality signal: low-entropy documents are repeated
# boilerplate / padding; the Shannon entropy over codepoint frequencies
# is a classic cheap filter feature.
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = r"""
WITH c AS (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch FROM documents),
f AS (SELECT doc_id, ch, COUNT(*) AS k FROM c GROUP BY 1, 2),
n AS (SELECT doc_id, SUM(k) AS n FROM f GROUP BY 1)
SELECT f.doc_id, CAST(ANY_VALUE(n.n) AS BIGINT) AS n_cp,
       ROUND(-SUM((k / CAST(n.n AS DOUBLE)) * ln(k / CAST(n.n AS DOUBLE))), 6) AS char_entropy
FROM f JOIN n ON f.doc_id = n.doc_id
GROUP BY f.doc_id
"""


@register("char_entropy_docs", oracle=_ENTROPY_ORACLE)
def char_entropy_docs(sf_dir: str):
    """Shannon entropy (nats) of each document's codepoint distribution,
    newline excluded to mirror RE2's '.' (the oracle's
    regexp_extract_all(text, '.')).  Per-batch numpy unique-count —
    stateless, streaming; the sum order differs between engines but the
    ~1e-15 drift sits far under ROUND(…,6)."""
    import numpy as np

    from document_ai_ray.pipelines.ops import round_cols

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def entropy(t: pa.Table) -> pa.Table:
        ids, ns, hs = [], [], []
        for i, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            cp = np.frombuffer((s or "").encode("utf-32-le"), dtype=np.uint32)
            cp = cp[cp != 10]  # RE2 '.' skips \n
            if len(cp) == 0:
                continue
            _, k = np.unique(cp, return_counts=True)
            p = k / len(cp)
            ids.append(i)
            ns.append(len(cp))
            hs.append(float(-(p * np.log(p)).sum()))
        out = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_cp": pa.array(ns, pa.int64()),
                "char_entropy": pa.array(hs, pa.float64()),
            }
        )
        return round_cols(out, {"char_entropy": 6})

    return docs.map_batches(entropy, batch_format="pyarrow")


@register(
    "langid_confusion",
    oracle=_LANGID_PRED_CTE
    + """
    SELECT d.lang, COALESCE(p.pred_lang, 'und') AS pred_lang, COUNT(*) AS n
    FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
    GROUP BY 1, 2
""",
)
def langid_confusion(sf_dir: str):
    """Language-ID confusion matrix (declared lang × predicted lang
    counts) — the error-analysis rollup a langid deployment reports.
    Per-batch prediction then the combiner aggregate over the
    lang²-cardinality key; the oracle shares `langid_docs`' prediction
    CTE so both queries certify the same spec."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def project(t: pa.Table) -> pa.Table:
        t = langid_batch(t)
        return t.select(["lang", "pred_lang"])

    return partial_group_agg(
        ds.map_batches(project, batch_format="pyarrow"), ["lang", "pred_lang"], count_alias="n"
    )


# ---------------------------------------------------------------------------
# SURT canonical URL keys + per-host CDX ordering — the CommonCrawl
# index format: host labels reversed so one host's (and one domain
# tree's) URLs are a contiguous key range.
# ---------------------------------------------------------------------------

_SURT_ORACLE = """
WITH u AS (SELECT doc_id, source || '.example' AS host,
                  'http://' || source || '.example/' || CAST(doc_id AS VARCHAR) AS url
           FROM documents),
s AS (SELECT doc_id, host, url,
             array_to_string(list_reverse(string_split(host, '.')), ',')
               || ')/' || CAST(doc_id AS VARCHAR) AS surt_key
      FROM u)
SELECT doc_id, url, surt_key,
       CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY surt_key) AS BIGINT) AS cdx_pos
FROM s
"""


@register("surt_doc_urls", oracle=_SURT_ORACLE)
def surt_doc_urls(sf_dir: str):
    """SURT keys (reversed host labels + ')/' + path — the CommonCrawl
    CDX index ordering) for every document URL, plus each URL's 1-based
    position within its host's key range (the range-scan offset a CDX
    lookup uses).  Key derivation is a stateless batch map; the per-host
    position rides the exact-rank substrate (hosts are the group key —
    source cardinality, well under the substrate's contract)."""
    from document_ai_ray.pipelines.ops import with_group_ranks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def keys(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        srcs = t.column("source").to_pylist()
        hosts = [f"{s}.example" for s in srcs]
        urls = [f"http://{h}/{i}" for h, i in zip(hosts, ids)]
        surts = [
            ",".join(reversed(h.split("."))) + f")/{i}" for h, i in zip(hosts, ids)
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "host": pa.array(hosts, pa.string()),
                "url": pa.array(urls, pa.string()),
                "surt_key": pa.array(surts, pa.string()),
            }
        )

    ranked = with_group_ranks(
        docs.map_batches(keys, batch_format="pyarrow"), "host", ["surt_key"]
    )

    def finish(t: pa.Table) -> pa.Table:
        pos = pc.add(t.column("__rank"), pa.scalar(1, pa.int64()))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "url": t.column("url"),
                "surt_key": t.column("surt_key"),
                "cdx_pos": pos,
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Positional phrase search: find the corpus's most frequent bigram
# (exact, bucketed heavy-hitter), then return every occurrence with its
# 1-based position — the positional-index intersection an IR engine
# runs for quoted-phrase queries.
# ---------------------------------------------------------------------------

_PHRASE_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram, COUNT(*) AS n
       FROM w, UNNEST(generate_series(1, len(ws)-1)) AS t(i)
       GROUP BY 1),
top AS (SELECT bigram FROM bg ORDER BY n DESC, bigram LIMIT 1),
occ AS (SELECT doc_id, i AS pos
        FROM w, UNNEST(generate_series(1, len(ws)-1)) AS t(i), top
        WHERE ws[i] || ' ' || ws[i+1] = top.bigram)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, (SELECT bigram FROM top) AS phrase
FROM occ
"""


@register("phrase_search_top_bigram", oracle=_PHRASE_ORACLE)
def phrase_search_top_bigram(sf_dir: str):
    """Quoted-phrase search, end to end: pass 1 finds the corpus's most
    frequent space-split bigram EXACTLY (per-batch combiner partials →
    bucketed merge on the bigram's 64-bit hash → per-bucket winner →
    tiny final, ties broken lexicographically on BOTH sides); pass 2
    emits every (doc_id, 1-based position) occurrence of that phrase —
    the positional-postings intersection, here as one vectorized
    shifted-equality scan per batch.  The oracle recomputes the top
    bigram and its occurrences from scratch in SQL."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.hashing import stable64
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = auto_buckets(docs.count() * 64)

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t.column("text").to_pylist():
            ws = (s or "").split(" ")
            for a, b in zip(ws, ws[1:]):
                g = a + " " + b
                counts[g] = counts.get(g, 0) + 1
        grams = list(counts)
        return pa.table(
            {
                "bigram": pa.array(grams, pa.string()),
                "n": pa.array([counts[g] for g in grams], pa.int64()),
                "bk": pa.array(
                    [stable64(g) % P for g in grams], pa.int64()
                ),
            }
        )

    def bucket_winner(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"bigram": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
            )
        g = df.groupby("bigram", as_index=False)["n"].sum()
        g = g.sort_values(["n", "bigram"], ascending=[False, True], kind="mergesort")
        return g.head(1)

    winners = bucket_map_groups(
        docs.map_batches(partial, batch_format="pyarrow"),
        "bk",
        bucket_winner,
        P,
        batch_format="pandas",
    ).take_all()  # <= P rows (one winner per bucket)
    best = min(((-(r["n"]), r["bigram"]) for r in winners))
    phrase = best[1]
    w1, w2 = phrase.split(" ", 1)

    def occurrences(t: pa.Table) -> pa.Table:
        ids, poss = [], []
        for i, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            ws = np.array((s or "").split(" "), dtype=object)
            if len(ws) < 2:
                continue
            hit = np.nonzero((ws[:-1] == w1) & (ws[1:] == w2))[0]
            ids.extend([i] * len(hit))
            poss.extend((hit + 1).tolist())  # 1-based, matching SQL ws[i]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
                "phrase": pa.array([phrase] * len(ids), pa.string()),
            }
        )

    return docs.map_batches(occurrences, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Per-source quality ranking: the report a curation team reads before
# up/down-weighting an origin in the data mix.
# ---------------------------------------------------------------------------

_SRC_QUALITY_ORACLE = f"""
WITH q AS ({_QUALITY_ORACLE}),
j AS (SELECT q.doc_id, q.quality_score, d.source
      FROM q JOIN documents d USING (doc_id)),
g AS (SELECT source, COUNT(*) AS n_docs,
             ROUND(SUM(quality_score) / COUNT(*), 6) AS mean_quality
      FROM j GROUP BY source)
SELECT source, n_docs, mean_quality,
       CAST(RANK() OVER (ORDER BY mean_quality DESC, source) AS BIGINT) AS quality_rank
FROM g
"""


@register("source_quality_report", oracle=_SRC_QUALITY_ORACLE)
def source_quality_report(sf_dir: str):
    """Per-source mean quality + rank (best = 1).  Quality scores are
    ROUNDed per doc BEFORE the sum on both sides; the mean divides the
    engine-exact sum by the count in the oracle's association; ranks
    come from the tiny source-cardinality final (one task)."""
    import numpy as np

    from document_ai_ray.pipelines.ops import partial_group_agg, round_cols

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def score(t: pa.Table) -> pa.Table:
        t = quality_batch(t)
        t = round_cols(t, {"quality_score": 6})
        return pa.table(
            {"source": t.column("source"), "quality_score": t.column("quality_score")}
        )

    agg = partial_group_agg(
        docs.map_batches(score, batch_format="pyarrow"),
        ["source"],
        {"quality_score": "q_sum"},
        count_alias="n_docs",
    )

    def finish(t: pa.Table) -> pa.Table:
        qs = t.column("q_sum").to_numpy(zero_copy_only=False)
        n = t.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
        mq = qs / n
        mq = np.copysign(np.floor(np.abs(mq) * 1e6 + 0.5), mq) / 1e6
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        order = np.lexsort((src, -mq))
        # the ORDER BY carries the source tiebreaker, so SQL's RANK can
        # never tie: rank == ordinal position on both sides
        rank = np.empty(len(t), np.int64)
        rank[order] = np.arange(1, len(t) + 1)
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": t.column("n_docs"),
                "mean_quality": pa.array(mq, pa.float64()),
                "quality_rank": pa.array(rank),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Corpus length quantiles: p10/p50/p90 of document length — the first
# line of any corpus datasheet.
# ---------------------------------------------------------------------------

_LEN_Q_ORACLE = """
SELECT ROUND(quantile_cont(n_chars, 0.10), 6) AS p10,
       ROUND(quantile_cont(n_chars, 0.50), 6) AS p50,
       ROUND(quantile_cont(n_chars, 0.90), 6) AS p90,
       COUNT(*) AS n_docs
FROM documents
"""


@register("doc_length_quantiles", oracle=_LEN_Q_ORACLE)
def doc_length_quantiles(sf_dir: str):
    """Exact p10/p50/p90 of n_chars (PERCENTILE_CONT interpolation) on
    the rank substrate's boundary-pick — <= 6 rows reach the driver."""
    import numpy as np

    from document_ai_ray.pipelines.ops import with_group_ranks

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_chars": t.column("n_chars"),
                "__g": pa.array(np.zeros(len(t), np.int8)),
            }
        )

    ranked = with_group_ranks(ds.map_batches(prep, batch_format="pyarrow"), "__g", ["n_chars"])
    qs = (0.10, 0.50, 0.90)

    def pick(t: pa.Table) -> pa.Table:
        r = t.column("__rank").to_numpy(zero_copy_only=False)
        n = t.column("__gn").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        for q in qs:
            h = (n - 1) * q
            keep |= (r == np.floor(h)) | (r == np.ceil(h))
        return t.filter(pa.array(keep))

    rows = ranked.map_batches(pick, batch_format="pyarrow").take_all()
    rm = {r["__rank"]: (r["n_chars"], r["__gn"]) for r in rows}
    n = next(iter(rm.values()))[1]
    vals = []
    for q in qs:
        h = (n - 1) * q
        lo, hi = rm[int(np.floor(h))][0], rm[int(np.ceil(h))][0]
        v = lo + (h - np.floor(h)) * (hi - lo)
        vals.append(float(np.copysign(np.floor(abs(v) * 1e6 + 0.5), v) / 1e6))
    return pa.table(
        {
            "p10": pa.array([vals[0]], pa.float64()),
            "p50": pa.array([vals[1]], pa.float64()),
            "p90": pa.array([vals[2]], pa.float64()),
            "n_docs": pa.array([n], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Gini coefficient of document length per source — inequality of the
# length distribution (a skew/imbalance lens for corpus datasheets).
# Ordinal ranks are tie-order-invariant here: within a tie group the
# x values are equal, so sum(rank * x) over the group is fixed no
# matter how the tie is ordered — no tiebreak convention needed for
# the VALUE, but (n_chars, doc_id) keeps the rank itself deterministic.
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH r AS (SELECT source, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk
           FROM documents)
SELECT source, COUNT(*) AS n_docs,
       ROUND(2.0 * CAST(SUM(rk * n_chars) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(n_chars) AS DOUBLE))
             - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE), 6) AS gini
FROM r GROUP BY source
"""


@register("gini_doc_length_by_source", oracle=_GINI_ORACLE)
def gini_doc_length_by_source(sf_dir: str):
    """Per-source Gini of n_chars via the rank-sum identity
    G = 2*sum(r_i x_i)/(n*sum(x)) - (n+1)/n: one distributed rank
    substrate pass, then combiner partials of (sum r*x, sum x, count)
    per source — the final sees one row per source."""
    import numpy as np

    from document_ai_ray.pipelines.ops import partial_group_agg, with_group_ranks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    ranked = with_group_ranks(docs, "source", ["n_chars", "doc_id"])

    def terms(t: pa.Table) -> pa.Table:
        r = t.column("__rank").to_numpy(zero_copy_only=False) + 1
        x = t.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": t.column("source"),
                "rx": pa.array((r * x).astype(np.int64)),
                "x": pa.array(x.astype(np.int64)),
            }
        )

    agg = partial_group_agg(
        ranked.map_batches(terms, batch_format="pyarrow"),
        ["source"],
        {"rx": "srx", "x": "sx"},
        count_alias="n_docs",
    )

    def finish(t: pa.Table) -> pa.Table:
        srx = t.column("srx").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t.column("sx").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
        g = 2.0 * srx / (n * sx) - (n + 1.0) / n
        g = np.copysign(np.floor(np.abs(g) * 1e6 + 0.5), g) / 1e6
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": t.column("n_docs"),
                "gini": pa.array(g, pa.float64()),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Per-source vocabulary KL divergence to the corpus, term by term —
# the domain-shift lens: which sources skew which of the top words.
# Emitting PER-TERM contributions (not the summed divergence) keeps
# the comparison free of cross-term float-summation order (the PMI
# precedent: round each log term, never sum unrounded logs across an
# engine boundary).
# ---------------------------------------------------------------------------

_KL_TOP = 50

_KL_ORACLE = f"""
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT source, word, COUNT(*) AS n FROM w WHERE word != '' GROUP BY 1, 2),
gw AS (SELECT word, SUM(n) AS gn FROM c GROUP BY 1),
top AS (SELECT word, gn FROM gw ORDER BY gn DESC, word LIMIT {_KL_TOP}),
tw AS (SELECT CAST(SUM(gn) AS DOUBLE) AS gtot FROM top),
sc AS (SELECT c.source, c.word, c.n, top.gn FROM c JOIN top USING (word)),
st AS (SELECT source, CAST(SUM(n) AS DOUBLE) AS stot FROM sc GROUP BY 1)
SELECT sc.source, sc.word,
       ROUND((CAST(sc.n AS DOUBLE) / st.stot)
             * LN((CAST(sc.n AS DOUBLE) / st.stot) / (CAST(sc.gn AS DOUBLE) / gtot)), 6)
       AS kl_term
FROM sc JOIN st USING (source) CROSS JOIN tw
"""


@register("source_vocab_kl", oracle=_KL_ORACLE)
def source_vocab_kl(sf_dir: str):
    """KL(source ‖ corpus) contributions over the top-{0} global words
    (both distributions renormalized within that word set).  Shape:
    the exact heavy-hitter pass supplies the word set and global
    counts; one pyarrow-kernel scan counts (source, word in W) pairs
    into a low-cardinality combiner ({0} x n_sources keys); the final
    computes each p·ln(p/q) term on one task.""".format(_KL_TOP)
    import numpy as np
    import pyarrow.compute as pc

    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.stages.text_analysis import word_value_counts

    top = vocab_top_words(sf_dir).to_pandas().head(_KL_TOP)
    gcnt = dict(zip(top["word"], top["n"].astype("int64")))
    gtot = float(top["n"].sum())
    wset = pa.array(sorted(gcnt), pa.string())

    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        srcs, words, ns = [], [], []
        for s in pc.unique(t.column("source")).to_pylist():
            sub = t.filter(pc.equal(t.column("source"), s))
            vc = word_value_counts(sub.column("text"))
            vc = vc.filter(pc.is_in(vc.column("word"), value_set=wset))
            k = len(vc)
            srcs.extend([s] * k)
            words.extend(vc.column("word").to_pylist())
            ns.extend(vc.column("n").to_pylist())
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "word": pa.array(words, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    agg = merge_partials(
        docs.map_batches(partial, batch_format="pyarrow"), ["source", "word"], {"n": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        stot = df.groupby("source")["n"].transform("sum").astype("float64")
        p = df["n"].astype("float64") / stot
        q = df["word"].map(gcnt).astype("float64") / gtot
        term = (p * np.log(p / q)).to_numpy()
        term = np.copysign(np.floor(np.abs(term) * 1e6 + 0.5), term) / 1e6
        return pa.table(
            {
                "source": pa.array(df["source"], pa.string()),
                "word": pa.array(df["word"], pa.string()),
                "kl_term": pa.array(term, pa.float64()),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Term burstiness: collection frequency / document frequency for the
# top vocabulary — bursty words (cf >> df) cluster in few documents,
# the classic topicality signal.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# TextRank keyword extraction (Mihalcea-Tarau): PageRank over the word
# co-occurrence graph — top-100 vocabulary words are nodes, an
# undirected weighted edge joins two DIFFERENT vocab words whenever
# they appear within 4 positions in a document's token sequence.  The
# engine reuses the links-family PageRank verbatim (sparse contribute/
# merge partials, edges collapsed + materialized once); the oracle
# reconstructs the identical edge table with generate_series position
# indexing and replays the 10-iteration damped fixpoint as unrolled
# MATERIALIZED CTEs (the pagerank_hosts oracle pattern — float drift
# over 10 iterations is ~1e-15, far under the 1e-6 rounding grid).
# ---------------------------------------------------------------------------

_TR_WINDOW = 4
_TR_VOCAB = 100
_TR_ITERS = 10


def _textrank_oracle(iters: int = _TR_ITERS, d: float = 0.85, round_to: int = 6) -> str:
    its = []
    prev = "r0"
    for k in range(1, iters + 1):
        cur = f"r{k}"
        its.append(f"""
{cur} AS MATERIALIZED (
  SELECT h.host, h.outdeg,
         {1.0 - d} / (SELECT n FROM nn)
         + {d} * (COALESCE(c.s, 0.0)
                  + (SELECT COALESCE(SUM(rank), 0.0) FROM {prev} WHERE outdeg = 0.0)
                    / (SELECT n FROM nn)) AS rank
  FROM h
  LEFT JOIN (SELECT e.dst AS host, SUM(e.w * r.rank / r.outdeg) AS s
             FROM edges e JOIN {prev} r ON e.src = r.host GROUP BY 1) c
  USING (host))""")
        prev = cur
    return f"""
WITH wd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
posn AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS i, ws FROM wd),
tok AS (SELECT doc_id, i, ws[i] AS w FROM posn WHERE ws[i] <> ''),
cnts AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY 1),
vocab AS (SELECT w FROM cnts ORDER BY n DESC, w LIMIT {_TR_VOCAB}),
kt AS (SELECT doc_id, i, w FROM tok JOIN vocab USING (w)),
prs AS (SELECT a.w AS src, b.w AS dst FROM kt a JOIN kt b
        ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + {_TR_WINDOW}
           AND a.w <> b.w),
edges AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM (SELECT src, dst FROM prs UNION ALL SELECT dst AS src, src AS dst FROM prs)
  GROUP BY 1, 2),
hosts AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
odeg AS (SELECT src AS host, SUM(w) AS outdeg FROM edges GROUP BY 1),
h AS MATERIALIZED (
  SELECT host, COALESCE(odeg.outdeg, 0.0) AS outdeg
  FROM hosts LEFT JOIN odeg USING (host)),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM h),
r0 AS MATERIALIZED (SELECT host, outdeg, 1.0 / (SELECT n FROM nn) AS rank FROM h),
{",".join(its)}
SELECT host AS word, ROUND(rank, {round_to}) AS rank FROM {prev}
"""


@register("textrank_keywords", oracle=_textrank_oracle())
def textrank_keywords(sf_dir: str):
    """TextRank keywords: vectorized co-occurrence edge extraction
    (split_pattern flatten -> position arithmetic from list offsets ->
    shift-compare; two vocab words within window {0} are at most {0}
    apart in the KEPT subsequence since positions strictly increase,
    so shifts 1..{0} with an explicit distance check are exhaustive)
    feeding `stages.links.pagerank_hosts` unchanged.""".format(_TR_WINDOW)
    import numpy as np
    import pandas as pd
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast
    from document_ai_ray.stages.links import pagerank_hosts

    top = vocab_top_words(sf_dir).to_pandas().head(_TR_VOCAB)
    vocab_list = list(top["word"])
    vref = (ray.put(pd.Index(vocab_list)),)
    vocab_arr = np.array(vocab_list, dtype=object)

    docs = read_table(sf_dir, "documents", columns=["text"])

    def edges_batch(t: pa.Table) -> pa.Table:
        vidx = get_broadcast(vref)
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern(col, " ")
        offs = lists.offsets.to_numpy().astype(np.int64)
        words = lists.values.to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        docidx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        pos = np.arange(len(words), dtype=np.int64) - np.repeat(offs[:-1], counts)
        codes = vidx.get_indexer(words)  # -1 for OOV ('' is never in vocab)
        keep = codes >= 0
        dk, pk, ck = docidx[keep], pos[keep], codes[keep]
        srcs, dsts = [], []
        for s in range(1, _TR_WINDOW + 1):
            if len(dk) <= s:
                break
            m = (dk[:-s] == dk[s:]) & ((pk[s:] - pk[:-s]) <= _TR_WINDOW) & (
                ck[:-s] != ck[s:]
            )
            srcs.append(ck[:-s][m])
            dsts.append(ck[s:][m])
        if srcs and sum(len(a) for a in srcs):
            a = np.concatenate(srcs)
            b = np.concatenate(dsts)
            return pa.table(
                {"src": pa.array(np.concatenate([vocab_arr[a], vocab_arr[b]])),
                 "dst": pa.array(np.concatenate([vocab_arr[b], vocab_arr[a]]))}
            )
        return pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
        )

    edges = docs.map_batches(edges_batch, batch_format="pyarrow")
    pr = pagerank_hosts(edges, iters=_TR_ITERS)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"word": t.column("host"), "rank": t.column("rank")})

    return pr.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence terms per (source, observed top word) —
# the SYMMETRIC, bounded sibling of source_vocab_kl, same per-cell
# emission discipline: round each 0.5·p·ln(p/m)+0.5·q·ln(q/m) term,
# never sum unrounded logs across the engine boundary.
# ---------------------------------------------------------------------------

_JS_ORACLE = f"""
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT source, word, COUNT(*) AS n FROM w WHERE word != '' GROUP BY 1, 2),
gw AS (SELECT word, SUM(n) AS gn FROM c GROUP BY 1),
top AS (SELECT word, gn FROM gw ORDER BY gn DESC, word LIMIT {_KL_TOP}),
tw AS (SELECT CAST(SUM(gn) AS DOUBLE) AS gtot FROM top),
sc AS (SELECT c.source, c.word, c.n, top.gn FROM c JOIN top USING (word)),
st AS (SELECT source, CAST(SUM(n) AS DOUBLE) AS stot FROM sc GROUP BY 1),
pq AS (SELECT sc.source, sc.word,
              CAST(sc.n AS DOUBLE) / st.stot AS p,
              CAST(sc.gn AS DOUBLE) / gtot AS q
       FROM sc JOIN st USING (source) CROSS JOIN tw)
SELECT source, word,
       ROUND(0.5 * p * LN(p / ((p + q) / 2))
             + 0.5 * q * LN(q / ((p + q) / 2)), 6) AS js_term
FROM pq
"""


@register("source_vocab_js", oracle=_JS_ORACLE)
def source_vocab_js(sf_dir: str):
    """JS(source ‖ corpus) contributions over the top-{0} global words
    (observed cells; both distributions renormalized within the word
    set, mixture m = (p+q)/2).  Same distributed shape as
    `source_vocab_kl`: exact heavy-hitter word set, one pyarrow-kernel
    counting scan into a {0}×n_sources combiner, one-task final.""".format(_KL_TOP)
    import numpy as np
    import pyarrow.compute as pc

    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.stages.text_analysis import word_value_counts

    top = vocab_top_words(sf_dir).to_pandas().head(_KL_TOP)
    gcnt = dict(zip(top["word"], top["n"].astype("int64")))
    gtot = float(top["n"].sum())
    wset = pa.array(sorted(gcnt), pa.string())

    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        srcs, words, ns = [], [], []
        for s in pc.unique(t.column("source")).to_pylist():
            sub = t.filter(pc.equal(t.column("source"), s))
            vc = word_value_counts(sub.column("text"))
            vc = vc.filter(pc.is_in(vc.column("word"), value_set=wset))
            k = len(vc)
            srcs.extend([s] * k)
            words.extend(vc.column("word").to_pylist())
            ns.extend(vc.column("n").to_pylist())
        return pa.table(
            {"source": pa.array(srcs, pa.string()),
             "word": pa.array(words, pa.string()),
             "n": pa.array(ns, pa.int64())}
        )

    agg = merge_partials(
        docs.map_batches(partial, batch_format="pyarrow"), ["source", "word"], {"n": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        stot = df.groupby("source")["n"].transform("sum").astype("float64")
        p = (df["n"].astype("float64") / stot).to_numpy()
        q = (df["word"].map(gcnt).astype("float64") / gtot).to_numpy()
        m = (p + q) / 2
        term = 0.5 * p * np.log(p / m) + 0.5 * q * np.log(q / m)
        term = np.copysign(np.floor(np.abs(term) * 1e6 + 0.5), term) / 1e6
        return pa.table(
            {"source": pa.array(df["source"], pa.string()),
             "word": pa.array(df["word"], pa.string()),
             "js_term": pa.array(term, pa.float64())}
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


_BURST_ORACLE = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
cf AS (SELECT word, COUNT(*) AS cf FROM w WHERE word != '' GROUP BY 1),
df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w WHERE word != '' GROUP BY 1),
top AS (SELECT word, cf FROM cf ORDER BY cf DESC, word LIMIT 50)
SELECT t.word, t.cf, d.df,
       ROUND(CAST(t.cf AS DOUBLE) / CAST(d.df AS DOUBLE), 6) AS burstiness
FROM top t JOIN df d USING (word)
"""


@register("term_burstiness", oracle=_BURST_ORACLE)
def term_burstiness(sf_dir: str):
    """cf/df burstiness for the top-50 corpus words.  The exact
    heavy-hitter pass supplies the word set + collection frequencies;
    document frequencies come from one scan emitting per-doc distinct
    membership (a doc is one row, so batch-local distinct-per-doc is
    globally exact) into a 50-key combiner.  The ratio is an exact
    integer quotient."""
    import numpy as np

    from document_ai_ray.pipelines.ops import merge_partials

    top = vocab_top_words(sf_dir).to_pandas().head(50)
    cf = dict(zip(top["word"], top["n"].astype("int64")))
    wset = set(cf)

    docs = read_table(sf_dir, "documents", columns=["text"])

    def df_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for tx in t.column("text").to_pylist():
            c.update((set((tx or "").split(" ")) - {""}) & wset)
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "df": pa.array(list(c.values()), pa.int64()),
            }
        )

    dfs = merge_partials(
        docs.map_batches(df_partial, batch_format="pyarrow"), ["word"], {"df": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cfv = df["word"].map(cf).to_numpy(dtype=np.int64)
        dfv = df["df"].to_numpy(dtype=np.int64)
        b = cfv.astype(np.float64) / dfv.astype(np.float64)
        b = np.copysign(np.floor(np.abs(b) * 1e6 + 0.5), b) / 1e6
        return pa.table(
            {
                "word": pa.array(df["word"], pa.string()),
                "cf": pa.array(cfv),
                "df": pa.array(dfv),
                "burstiness": pa.array(b, pa.float64()),
            }
        )

    return dfs.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Bigram novelty curve: per doc, the fraction of its DISTINCT word
# bigrams never seen in any earlier doc (doc_id order) — the
# contamination / content-freshness lens over an ordered corpus.
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT DISTINCT doc_id,
             ws[CAST(t.i AS BIGINT)] || ' ' || ws[CAST(t.i + 1 AS BIGINT)] AS gram
      FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
f AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY 1)
SELECT g.doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       ROUND(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
FROM g JOIN f USING (gram) GROUP BY 1
"""


@register("ngram_novelty_docs", oracle=_NOVELTY_ORACLE)
def ngram_novelty_docs(sf_dir: str):
    """Per-doc bigram novelty vs all earlier docs.  Shape: per-doc
    DISTINCT bigrams ship as (md5(gram), doc_id) pairs — the repo's
    documented 2^-64 hash-equality convention — through one hash(gram)
    exchange; each bucket owns every occurrence of its grams, so
    first_doc = min(doc_id) is bucket-local, and only per-doc
    (n_grams, n_novel) partials ride the combiner back out."""
    import hashlib

    import numpy as np

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = auto_buckets(docs.count())

    def grams(t: pa.Table) -> pa.Table:
        ids, hs, bks = [], [], []
        for did, tx in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            ws = (tx or "").split(" ")
            seen = {f"{a} {b}" for a, b in zip(ws, ws[1:])}
            for g in seen:
                h = hashlib.md5(g.encode("utf-8", "surrogatepass")).digest()
                ids.append(did)
                hs.append(h)
                bks.append(int.from_bytes(h[:8], "little") % P)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "h": pa.array(hs, pa.binary(16)),
                "bk": pa.array(bks, pa.int64()),
            }
        )

    def per_bucket(df):
        cols = {"doc_id": "int64", "n_grams": "int64", "n_novel": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        first = df.groupby("h")["doc_id"].transform("min")
        novel = (df["doc_id"] == first).astype("int64")
        g = df.assign(nv=novel).groupby("doc_id", as_index=False).agg(
            n_grams=("nv", "size"), n_novel=("nv", "sum")
        )
        return g[["doc_id", "n_grams", "n_novel"]].astype("int64")

    parts = bucket_map_groups(
        docs.map_batches(grams, batch_format="pyarrow"), "bk", per_bucket, P,
        batch_format="pandas",
    )
    merged = merge_partials(parts, ["doc_id"], {"n_grams": "sum", "n_novel": "sum"})

    def finish(t: pa.Table) -> pa.Table:
        ng = t.column("n_grams").to_numpy(zero_copy_only=False)
        nv = t.column("n_novel").to_numpy(zero_copy_only=False)
        rate = nv.astype(np.float64) / ng.astype(np.float64)
        rate = np.copysign(np.floor(np.abs(rate) * 1e6 + 0.5), rate) / 1e6
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": t.column("n_grams"),
                "n_novel": t.column("n_novel"),
                "novelty": pa.array(rate, pa.float64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# LM eval: next-word top-1 accuracy of the argmax-bigram model.  Train
# on doc_id % 5 != 0, evaluate every adjacent pair in the held-out
# docs; the prediction is argmax bigram count with the (count DESC,
# word ASC) deterministic tiebreak both engines replay.
# ---------------------------------------------------------------------------

_NEXTWORD_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tr AS (SELECT ws[CAST(t.i AS BIGINT)] AS w1, ws[CAST(t.i + 1 AS BIGINT)] AS w2
       FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
       WHERE doc_id % 5 != 0 AND ws[CAST(t.i AS BIGINT)] != ''
         AND ws[CAST(t.i + 1 AS BIGINT)] != ''),
bc AS (SELECT w1, w2, COUNT(*) AS c FROM tr GROUP BY 1, 2),
pred AS (SELECT w1, w2 AS predicted
         FROM (SELECT w1, w2, ROW_NUMBER() OVER (PARTITION BY w1
                                                 ORDER BY c DESC, w2) AS rn
               FROM bc) WHERE rn = 1),
ev AS (SELECT ws[CAST(t.i AS BIGINT)] AS w1, ws[CAST(t.i + 1 AS BIGINT)] AS w2
       FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
       WHERE doc_id % 5 = 0 AND ws[CAST(t.i AS BIGINT)] != ''
         AND ws[CAST(t.i + 1 AS BIGINT)] != '')
SELECT COUNT(*) AS n_eval,
       CAST(SUM(CASE WHEN p.predicted = ev.w2 THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       ROUND(SUM(CASE WHEN p.predicted = ev.w2 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS top1_accuracy
FROM ev LEFT JOIN pred p USING (w1)
"""


@register("bigram_next_word_accuracy", oracle=_NEXTWORD_ORACLE)
def bigram_next_word_accuracy(sf_dir: str):
    """Held-out next-word top-1 accuracy of the count-argmax bigram
    model (train = doc_id%5 != 0).  Shape: bigram counts ride a
    hash(w1) exchange where each bucket elects its contexts' argmax
    (deterministic tiebreak); the context->prediction map is
    vocabulary-sized and broadcasts into the eval scan; one combiner
    row comes back."""
    import numpy as np

    import ray

    from document_ai_ray.functions.hashing import stable64
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        get_broadcast,
        merge_partials,
    )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = auto_buckets(docs.count())

    def bigram_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for did, tx in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            if did % 5 == 0:
                continue
            ws = [w for w in (tx or "").split(" ") if w]
            c.update(zip(ws, ws[1:]))
        w1 = [k[0] for k in c]
        return pa.table(
            {
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array([k[1] for k in c], pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
                "bk": pa.array([stable64(x) % P for x in w1], pa.int64()),
            }
        )

    def argmax_in_bucket(df):
        import pandas as pd

        cols = {"w1": "object", "predicted": "object"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = df.groupby(["w1", "w2"], as_index=False)["c"].sum()
        g = g.sort_values(["w1", "c", "w2"], ascending=[True, False, True], kind="mergesort")
        top = g.groupby("w1", as_index=False).head(1)
        return pd.DataFrame({"w1": top["w1"], "predicted": top["w2"]})

    pred_ds = bucket_map_groups(
        docs.map_batches(bigram_partial, batch_format="pyarrow"), "bk", argmax_in_bucket,
        P, batch_format="pandas",
    )
    pred_tbl = pred_ds.to_pandas()  # context-vocabulary sized
    pred_ref = (ray.put(dict(zip(pred_tbl["w1"], pred_tbl["predicted"]))),)

    def score(t: pa.Table) -> pa.Table:
        pred = get_broadcast(pred_ref, tag="nextword_pred")
        n = correct = 0
        for did, tx in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            if did % 5 != 0:
                continue
            ws = [w for w in (tx or "").split(" ") if w]
            for a, b in zip(ws, ws[1:]):
                n += 1
                if pred.get(a) == b:
                    correct += 1
        return pa.table(
            {"n_eval": pa.array([n], pa.int64()), "n_correct": pa.array([correct], pa.int64())}
        )

    agg = merge_partials(
        docs.map_batches(score, batch_format="pyarrow").map_batches(
            lambda t: t.append_column("__k", pa.array(np.zeros(len(t), np.int8))),
            batch_format="pyarrow",
        ),
        ["__k"],
        {"n_eval": "sum", "n_correct": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        n = int(t.column("n_eval").to_numpy(zero_copy_only=False).sum())
        c = int(t.column("n_correct").to_numpy(zero_copy_only=False).sum())
        acc = float(c) / float(n)
        acc = float(np.copysign(np.floor(abs(acc) * 1e6 + 0.5), acc) / 1e6)
        return pa.table(
            {
                "n_eval": pa.array([n], pa.int64()),
                "n_correct": pa.array([c], pa.int64()),
                "top1_accuracy": pa.array([acc], pa.float64()),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Lorenz curve of document length: cumulative length share at each
# population decile (the curve behind the Gini number).
# ---------------------------------------------------------------------------

_LORENZ_ORACLE = """
WITH r AS (SELECT n_chars,
                  ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rk,
                  COUNT(*) OVER () AS n,
                  SUM(n_chars) OVER (ORDER BY n_chars, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
           FROM documents),
t AS (SELECT SUM(n_chars) AS tot FROM documents)
SELECT CAST(rk * 10 / n AS BIGINT) AS decile,
       ROUND(CAST(MAX(cum) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE), 6) AS cum_share
FROM r CROSS JOIN t
WHERE rk * 10 % n = 0 OR rk = n
GROUP BY 1
"""


@register("lorenz_curve_lengths", oracle=_LORENZ_ORACLE)
def lorenz_curve_lengths(sf_dir: str):
    """Lorenz curve points: at each exact population decile boundary
    (rank*10 divisible by n), the cumulative share of total characters
    held by the shortest docs.  One rank-substrate pass with the
    integer length as the prefix-sum column; the boundary rows filter
    locally and only <= 10 rows reach the final."""
    import numpy as np

    from document_ai_ray.pipelines.ops import with_group_ranks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"n_chars": t.column("n_chars"), "doc_id": t.column("doc_id"),
             "__g": pa.array(np.zeros(len(t), np.int8))}
        )

    ranked = with_group_ranks(
        docs.map_batches(prep, batch_format="pyarrow"), "__g", ["n_chars", "doc_id"],
        value_col="n_chars",
    )

    def boundaries(t: pa.Table) -> pa.Table:
        rk = t.column("__rank").to_numpy(zero_copy_only=False) + 1  # 1-based
        n = t.column("__gn").to_numpy(zero_copy_only=False)
        cum = t.column("__cum").to_numpy(zero_copy_only=False) + t.column(
            "n_chars"
        ).to_numpy(zero_copy_only=False)  # inclusive
        keep = ((rk * 10) % n == 0) | (rk == n)
        return pa.table(
            {"decile": pa.array(((rk * 10) // n)[keep].astype(np.int64)),
             "cum": pa.array(cum[keep].astype(np.int64))}
        )

    rows = ranked.map_batches(boundaries, batch_format="pyarrow").to_pandas()
    tot = float(read_table(sf_dir, "documents", columns=["n_chars"]).sum("n_chars"))
    g = rows.groupby("decile")["cum"].max()
    share = g.to_numpy().astype(np.float64) / tot
    share = np.copysign(np.floor(np.abs(share) * 1e6 + 0.5), share) / 1e6
    return pa.table(
        {"decile": pa.array(g.index.to_numpy().astype(np.int64)),
         "cum_share": pa.array(share, pa.float64())}
    )


# ---------------------------------------------------------------------------
# Corpus unigram perplexity: exp of the unigram entropy — the
# "effective vocabulary size" datasheet number.
# ---------------------------------------------------------------------------

_PPLX_ORACLE = """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word, COUNT(*) AS n FROM w WHERE word != '' GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot, COUNT(*) AS vocab FROM c)
SELECT CAST(tot AS BIGINT) AS n_tokens, vocab AS vocab_size,
       ROUND(EXP(-SUM((CAST(n AS DOUBLE) / tot) * LN(CAST(n AS DOUBLE) / tot))), 6)
         AS unigram_perplexity
FROM c CROSS JOIN t GROUP BY tot, vocab
"""


@register("unigram_perplexity_corpus", oracle=_PPLX_ORACLE)
def unigram_perplexity_corpus(sf_dir: str):
    """exp(entropy) of the corpus unigram distribution.  Word counts
    ride the hash(word) combiner; the entropy sum runs over the
    vocabulary-sized final (float-sum drift ~1e-13 under the 1e-6
    grid — the keyness/PSI precedent)."""
    import numpy as np

    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        return word_value_counts(t.column("text"))

    counts = merge_partials(
        docs.map_batches(partial, batch_format="pyarrow"), ["word"], {"n": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        tot = float(n.sum())
        p = n / tot
        pplx = float(np.exp(-(p * np.log(p)).sum()))
        pplx = float(np.copysign(np.floor(abs(pplx) * 1e6 + 0.5), pplx) / 1e6)
        return pa.table(
            {"n_tokens": pa.array([int(tot)], pa.int64()),
             "vocab_size": pa.array([len(t)], pa.int64()),
             "unigram_perplexity": pa.array([pplx], pa.float64())}
        )

    return counts.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Multinomial naive Bayes language classifier, FULLY oracle-checked:
# per-(word, class) Laplace log-likelihoods are quantized to integer
# MICRO-NATS (floor(1e6 * ln(p)) — glibc log on identical doubles is
# identical), so every document score is an order-free integer sum and
# the argmax is engine-exact, unlike float log accumulation.
# ---------------------------------------------------------------------------

_NB_PRED_CTE = """
WITH w AS (SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
tok AS (SELECT doc_id, lang, unnest(ws) AS word FROM w),
v AS (SELECT COUNT(DISTINCT word) AS vsz FROM tok),
cl AS (SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY 1),
nd AS (SELECT lang AS c, COUNT(*) AS n_docs FROM documents GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM documents),
pr AS (SELECT nd.c,
              CAST(FLOOR(1000000 * LN(CAST(nd.n_docs AS DOUBLE) / nn.n)) AS BIGINT)
                AS prior_l
       FROM nd, nn),
wc AS (SELECT word, lang AS c, COUNT(*) AS n FROM tok GROUP BY 1, 2),
dt AS (SELECT doc_id, word, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
sc AS (SELECT dt.doc_id, cl.c,
              CAST(SUM(dt.cnt
                       * CAST(FLOOR(1000000 * LN((COALESCE(wc.n, 0) + 1.0)
                                                 / (cl.n_tok + v.vsz))) AS BIGINT))
                   AS BIGINT)
              + ANY_VALUE(pr.prior_l) AS score
       FROM dt CROSS JOIN cl CROSS JOIN v
       LEFT JOIN wc ON wc.word = dt.word AND wc.c = cl.c
       JOIN pr ON pr.c = cl.c
       GROUP BY 1, 2),
pred AS (SELECT doc_id, c,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, c) AS rn
         FROM sc)"""

_NB_ORACLE = _NB_PRED_CTE + """
SELECT d.lang AS true_lang, p.c AS pred_lang, COUNT(*) AS n
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
WHERE p.rn = 1 GROUP BY 1, 2
"""

# Per-class precision/recall/F1 of the NB langid (integer confusion
# counts; the ratios are single divisions + ROUND on both engines).
_NB_PRF_ORACLE = _NB_PRED_CTE + """,
j AS (SELECT d.lang AS t, p.c AS y
      FROM pred p JOIN documents d ON d.doc_id = p.doc_id WHERE p.rn = 1),
cls AS (SELECT DISTINCT lang AS c FROM documents),
m AS (SELECT cls.c,
             CAST(SUM(CASE WHEN j.t = cls.c AND j.y = cls.c THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN j.t <> cls.c AND j.y = cls.c THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN j.t = cls.c AND j.y <> cls.c THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM cls CROSS JOIN j GROUP BY 1)
SELECT c AS lang, tp, fp, fn,
       CASE WHEN tp + fp > 0 THEN ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) ELSE 0.0 END AS prec,
       CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) ELSE 0.0 END AS rec,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6)
            ELSE 0.0 END AS f1
FROM m
"""


def nb_predictions(sf_dir: str):
    """Per-document multinomial-NB prediction Dataset
    (doc_id, true_lang, pred_lang) — the substrate for
    `nb_langid_confusion` and `classifier_agreement_kappa`.

    Train a multinomial naive Bayes on (lang -> word counts) over
    the whole corpus (distributed bucketed counts), broadcast the
    (vocab x classes) integer micro-nat likelihood matrix once, and
    score every document in one vectorized np.add.at pass (token ->
    L[word_idx, :] accumulation — no per-token Python).  Prediction =
    argmax(prior + sum), ties broken by class name; the oracle replays
    the entire spec (Laplace smoothing, quantization, argmax) in SQL.
    Reported as the (true, predicted) confusion so the driver hash
    pins both the model and the classifications."""
    import math

    import numpy as np
    import pandas as pd

    import ray

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        get_broadcast,
        merge_partials,
    )
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    P = auto_buckets(docs.count())

    def partial_counts(t: pa.Table) -> pa.Table:
        outs = []
        df = t.to_pandas()
        for lang, g in df.groupby("lang"):
            vc = word_value_counts(pa.array(g["text"]))
            outs.append(
                vc.append_column("lang", pa.array([lang] * len(vc), pa.string()))
            )
        out = pa.concat_tables(outs) if outs else pa.table(
            {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
             "lang": pa.array([], pa.string())}
        )
        bucket = pa.array(
            [crc_bucket(w, P) for w in out.column("word").to_pylist()], pa.int32()
        )
        return out.append_column("bucket", bucket)

    def bucket_sum(df):
        return df.groupby(["word", "lang"], as_index=False)["n"].sum()

    counts = bucket_map_groups(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        "bucket", bucket_sum, P, batch_format="pandas",
    )

    # model assembly: vocab x classes — vocabulary-sized, never corpus-sized
    wc: dict[tuple, int] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        wc.update(
            zip(zip(b.column("word").to_pylist(), b.column("lang").to_pylist()),
                b.column("n").to_pylist())
        )
    classes = sorted({c for _, c in wc})
    vocab = sorted({w for w, _ in wc})
    widx = {w: i for i, w in enumerate(vocab)}
    vsz = len(vocab)
    n_tok = {c: 0 for c in classes}
    for (w, c), n in wc.items():
        n_tok[c] += n
    L = np.empty((vsz, len(classes)), np.int64)
    for j, c in enumerate(classes):
        denom = n_tok[c] + vsz
        l0 = math.floor(1000000 * math.log(1.0 / denom))
        L[:, j] = l0
        for (w, cc), n in wc.items():
            if cc == c:
                L[widx[w], j] = math.floor(1000000 * math.log((n + 1.0) / denom))
    # class priors from doc counts
    nd = docs.map_batches(
        lambda t: pa.Table.from_pandas(
            t.to_pandas().groupby("lang", as_index=False).size().rename(columns={"size": "n"}),
            preserve_index=False,
        ),
        batch_format="pyarrow",
    )
    ndf = merge_partials(nd, ["lang"], {"n": "sum"}).to_pandas()
    n_total = int(ndf["n"].sum())
    prior = np.array(
        [math.floor(1000000 * math.log(float(ndf.set_index("lang")["n"][c]) / n_total))
         for c in classes],
        np.int64,
    )
    model_ref = (ray.put({"widx": widx, "L": L, "prior": prior, "classes": classes}),)

    def classify(t: pa.Table) -> pa.Table:
        m = get_broadcast(model_ref, tag="nb_langid")
        widx_, L_, prior_, classes_ = m["widx"], m["L"], m["prior"], m["classes"]
        lists = pc.split_pattern(t.column("text"), " ")
        n_per_row = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(t), dtype=np.int64), n_per_row)
        flat = pc.list_flatten(lists).to_pandas()
        mask = (flat != "").to_numpy()
        w_i = flat[mask].map(widx_).to_numpy(np.int64)  # full-corpus vocab: no OOV
        scores = np.tile(prior_, (len(t), 1))
        np.add.at(scores, row_idx[mask], L_[w_i])
        # argmax with class-name tiebreak = first max under stable order
        pred = np.asarray(classes_, object)[np.argmax(scores, axis=1)]
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "true_lang": t.column("lang"),
             "pred_lang": pa.array(pred.astype(str), pa.string())}
        )

    return docs.map_batches(classify, batch_format="pyarrow")


@register("nb_langid_confusion", oracle=_NB_ORACLE)
def nb_langid_confusion(sf_dir: str):
    """(true, predicted) confusion rollup of the per-doc NB
    predictions — see `nb_predictions` for the model spec."""
    from document_ai_ray.pipelines.ops import merge_partials, partial_group_agg

    preds = nb_predictions(sf_dir)
    return partial_group_agg(preds, ["true_lang", "pred_lang"], count_alias="n")


# ---------------------------------------------------------------------------
# Boolean retrieval: A AND B AND NOT C over token membership, with the
# query terms chosen BY RULE from the corpus vocabulary (frequency
# ranks 10/20/30, ties by word) — the oracle replays term selection
# and evaluation, so nothing is hardcoded.
# ---------------------------------------------------------------------------

_BOOL_ORACLE = """
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
vc AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY 1),
rk AS (SELECT word, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS r FROM vc),
q AS (SELECT MAX(CASE WHEN r = 10 THEN word END) AS ta,
             MAX(CASE WHEN r = 20 THEN word END) AS tb,
             MAX(CASE WHEN r = 30 THEN word END) AS tc
      FROM rk)
SELECT w.doc_id, q.ta AS term_a, q.tb AS term_b, q.tc AS term_c
FROM w, q
WHERE list_contains(w.ws, q.ta) AND list_contains(w.ws, q.tb)
  AND NOT list_contains(w.ws, q.tc)
"""


@register("boolean_retrieval_docs", oracle=_BOOL_ORACLE)
def boolean_retrieval_docs(sf_dir: str):
    """Boolean AND/AND-NOT retrieval: query terms are the corpus's
    10th/20th/30th most frequent words (deterministic rule, replayed
    by the oracle), evaluated as token-set membership in one streaming
    pass.  Vocabulary ranks ride the bucketed word-count exchange; the
    three terms broadcast in the task closure."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = auto_buckets(docs.count())

    def partial_counts(t: pa.Table) -> pa.Table:
        g = word_value_counts(t.column("text"))
        bucket = pa.array([crc_bucket(w, P) for w in g.column("word").to_pylist()], pa.int32())
        return g.append_column("bucket", bucket)

    def bucket_sum(df):
        return df.groupby("word", as_index=False)["n"].sum()

    counts = bucket_map_groups(
        docs.map_batches(partial_counts, batch_format="pyarrow"), "bucket", bucket_sum, P,
        batch_format="pandas",
    ).to_pandas()  # vocabulary-sized
    counts = counts.sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
    ta, tb, tc = counts["word"].iloc[9], counts["word"].iloc[19], counts["word"].iloc[29]

    def match(t: pa.Table) -> pa.Table:
        ids, texts = t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        keep = []
        for x in texts:
            toks = set((x or "").split(" "))
            keep.append(ta in toks and tb in toks and tc not in toks)
        k = pa.array(keep)
        out_ids = t.column("doc_id").filter(k)
        n = len(out_ids)
        return pa.table(
            {"doc_id": out_ids,
             "term_a": pa.array([ta] * n, pa.string()),
             "term_b": pa.array([tb] * n, pa.string()),
             "term_c": pa.array([tc] * n, pa.string())}
        )

    return docs.map_batches(match, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cohen's kappa between the two INDEPENDENT oracle-checked language
# classifiers (stopword heuristic vs naive Bayes) — chance-corrected
# inter-annotator agreement, the model-governance staple.  The oracle
# replays BOTH classifiers end-to-end and the kappa algebra.
# ---------------------------------------------------------------------------

_KAPPA_ORACLE = (
    _LANGID_PRED_CTE
    + """,
nw AS (SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x != '') AS ws
       FROM documents),
tok AS (SELECT doc_id, lang, unnest(ws) AS word FROM nw),
v AS (SELECT COUNT(DISTINCT word) AS vsz FROM tok),
cl AS (SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY 1),
nd AS (SELECT lang AS c, COUNT(*) AS n_docs FROM documents GROUP BY 1),
ntot AS (SELECT COUNT(*) AS n FROM documents),
pr AS (SELECT nd.c,
              CAST(FLOOR(1000000 * LN(CAST(nd.n_docs AS DOUBLE) / ntot.n)) AS BIGINT)
                AS prior_l
       FROM nd, ntot),
wc AS (SELECT word, lang AS c, COUNT(*) AS n FROM tok GROUP BY 1, 2),
dt AS (SELECT doc_id, word, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
sc AS (SELECT dt.doc_id, cl.c,
              CAST(SUM(dt.cnt
                       * CAST(FLOOR(1000000 * LN((COALESCE(wc.n, 0) + 1.0)
                                                 / (cl.n_tok + v.vsz))) AS BIGINT))
                   AS BIGINT)
              + ANY_VALUE(pr.prior_l) AS score
       FROM dt CROSS JOIN cl CROSS JOIN v
       LEFT JOIN wc ON wc.word = dt.word AND wc.c = cl.c
       JOIN pr ON pr.c = cl.c
       GROUP BY 1, 2),
npred AS (SELECT doc_id, c,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, c) AS rn
          FROM sc),
joint AS (SELECT COALESCE(hp.pred_lang, 'und') AS pred_h, np2.c AS pred_nb
          FROM documents d
          LEFT JOIN p hp ON hp.doc_id = d.doc_id
          JOIN npred np2 ON np2.doc_id = d.doc_id AND np2.rn = 1),
cells AS (SELECT pred_h, pred_nb, COUNT(*) AS n FROM joint GROUP BY 1, 2),
m AS (SELECT CAST(SUM(n) AS BIGINT) AS nn_tot,
             CAST(SUM(CASE WHEN pred_h = pred_nb THEN n ELSE 0 END) AS BIGINT) AS agree
      FROM cells),
px AS (SELECT CAST(SUM(h.rs * b.cs) AS BIGINT) AS cross_mass
       FROM (SELECT pred_h AS k, CAST(SUM(n) AS BIGINT) AS rs FROM cells GROUP BY 1) h
       JOIN (SELECT pred_nb AS k, CAST(SUM(n) AS BIGINT) AS cs FROM cells GROUP BY 1) b
         ON b.k = h.k)
SELECT nn_tot AS n_docs, agree AS n_agree,
       ROUND((CAST(agree AS DOUBLE) / nn_tot
              - CAST(cross_mass AS DOUBLE) / (CAST(nn_tot AS DOUBLE) * nn_tot))
             / (1.0 - CAST(cross_mass AS DOUBLE) / (CAST(nn_tot AS DOUBLE) * nn_tot)), 6)
         AS kappa
FROM m, px
"""
)


@register("classifier_agreement_kappa", oracle=_KAPPA_ORACLE)
def classifier_agreement_kappa(sf_dir: str):
    """Cohen's kappa between the stopword-heuristic langid and the
    naive-Bayes langid over every document: both per-doc prediction
    Datasets ride one hash(doc) exchange; only the (pred_h, pred_nb)
    cell counts leave the buckets; the kappa algebra runs on exact
    integers with the identical float expression on both engines."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials

    h = langid_docs(sf_dir)
    nbp = nb_predictions(sf_dir)
    n_docs_hint = h.count()
    P = auto_buckets(n_docs_hint)

    def tag_h(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        bk = (d.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"doc_id": t.column("doc_id"), "pred": t.column("pred_lang"),
             "is_nb": pa.array(np.zeros(len(t), bool)),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def tag_nb(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        bk = (d.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"doc_id": t.column("doc_id"), "pred": t.column("pred_lang"),
             "is_nb": pa.array(np.ones(len(t), bool)),
             "bk": pa.array(bk.astype(np.int64))}
        )

    both = h.map_batches(tag_h, batch_format="pyarrow").union(
        nbp.map_batches(tag_nb, batch_format="pyarrow")
    )

    def cells(df):
        cols = {"pred_h": "object", "pred_nb": "object", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=dt) for c, dt in cols.items()})
        hh = df[~df["is_nb"]][["doc_id", "pred"]].rename(columns={"pred": "pred_h"})
        nn = df[df["is_nb"]][["doc_id", "pred"]].rename(columns={"pred": "pred_nb"})
        j = hh.merge(nn, on="doc_id")
        g = j.groupby(["pred_h", "pred_nb"], as_index=False).size()
        return pd.DataFrame(
            {"pred_h": g["pred_h"], "pred_nb": g["pred_nb"],
             "n": g["size"].astype("int64")}
        )

    merged = merge_partials(
        bucket_map_groups(both, "bk", cells, P, batch_format="pandas"),
        ["pred_h", "pred_nb"], {"n": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        nn = int(df["n"].sum())
        agree = int(df.loc[df["pred_h"] == df["pred_nb"], "n"].sum())
        rs = df.groupby("pred_h")["n"].sum()
        cs = df.groupby("pred_nb")["n"].sum()
        cross = int(sum(int(rs[k]) * int(cs[k]) for k in rs.index if k in cs.index))
        po = float(agree) / nn
        pe = float(cross) / (float(nn) * nn)
        kappa = (po - pe) / (1.0 - pe)
        kappa = float(np.copysign(np.floor(abs(kappa) * 1e6 + 0.5), kappa) / 1e6)
        return pa.table(
            {"n_docs": pa.array([nn], pa.int64()),
             "n_agree": pa.array([agree], pa.int64()),
             "kappa": pa.array([kappa], pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Hapax legomena share per source: the fraction of a source's
# vocabulary seen exactly once — the classic vocabulary-richness /
# OCR-noise signal (noisy sources have inflated hapax mass).
# ---------------------------------------------------------------------------

_HAPAX_ORACLE = """
WITH tok AS (SELECT source, unnest(list_filter(string_split(text, ' '), x -> x != ''))
                      AS word
             FROM documents),
wc AS (SELECT source, word, COUNT(*) AS n FROM tok GROUP BY 1, 2),
g AS (SELECT source, COUNT(*) AS vocab,
             CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
      FROM wc GROUP BY 1)
SELECT source, vocab, hapax,
       ROUND(CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE), 6) AS hapax_share
FROM g
"""


@register("hapax_share_by_source", oracle=_HAPAX_ORACLE)
def hapax_share_by_source(sf_dir: str):
    """Per-source hapax share: (source, word) counts ride the bucketed
    word exchange (hash(word) — a word's counts for all sources
    co-reside, so n==1 is decided in-bucket), then only
    source-cardinality (vocab, hapax) partials merge; one division per
    source in the final."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["source", "text"])
    P = auto_buckets(docs.count())

    def partial_counts(t: pa.Table) -> pa.Table:
        outs = []
        df = t.to_pandas()
        for src, g in df.groupby("source"):
            vc = word_value_counts(pa.array(g["text"]))
            outs.append(vc.append_column("source", pa.array([src] * len(vc), pa.string())))
        out = pa.concat_tables(outs) if outs else pa.table(
            {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
             "source": pa.array([], pa.string())}
        )
        bucket = pa.array([crc_bucket(w, P) for w in out.column("word").to_pylist()], pa.int32())
        return out.append_column("bucket", bucket)

    def per_bucket(df):
        g = df.groupby(["source", "word"], as_index=False)["n"].sum()
        out = g.groupby("source", as_index=False).agg(
            vocab=("n", "size"), hapax=("n", lambda x: int((x == 1).sum()))
        )
        return pd.DataFrame(
            {"source": out["source"], "vocab": out["vocab"].astype("int64"),
             "hapax": out["hapax"].astype("int64")}
        )

    merged = merge_partials(
        bucket_map_groups(
            docs.map_batches(partial_counts, batch_format="pyarrow"), "bucket", per_bucket, P,
            batch_format="pandas",
        ),
        ["source"], {"vocab": "sum", "hapax": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        v = t.column("vocab").to_numpy(zero_copy_only=False).astype(np.float64)
        h = t.column("hapax").to_numpy(zero_copy_only=False).astype(np.float64)
        share = np.floor(h / v * 1e6 + 0.5) / 1e6
        return pa.table(
            {"source": t.column("source"), "vocab": t.column("vocab"),
             "hapax": t.column("hapax"), "hapax_share": pa.array(share, pa.float64())}
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Shannon diversity of sources within each language: entropy of the
# per-lang source distribution + the effective source count e^H — the
# corpus-mix concentration gauge.
# ---------------------------------------------------------------------------

_DIVERSITY_ORACLE = """
WITH c AS (SELECT lang, source, COUNT(*) AS k FROM documents GROUP BY 1, 2),
n AS (SELECT lang, CAST(SUM(k) AS BIGINT) AS n FROM c GROUP BY 1)
SELECT c.lang, ANY_VALUE(n.n) AS n_docs, COUNT(*) AS n_sources,
       ROUND(-SUM((k / CAST(n.n AS DOUBLE)) * LN(k / CAST(n.n AS DOUBLE))), 6)
         AS shannon_h,
       ROUND(EXP(-SUM((k / CAST(n.n AS DOUBLE)) * LN(k / CAST(n.n AS DOUBLE)))), 6)
         AS effective_sources
FROM c JOIN n ON n.lang = c.lang
GROUP BY c.lang
"""


@register("source_diversity_by_lang", oracle=_DIVERSITY_ORACLE)
def source_diversity_by_lang(sf_dir: str):
    """Shannon entropy (and its exponential, the effective source
    count) of each language's source mix: (lang, source) counts ride
    the combiner; the <=20-term entropy sums run in the tiny final
    (the ~1e-15 cross-engine drift sits far under ROUND 6, same
    precedent as char_entropy_docs)."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.pipelines.ops import partial_group_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "source"])
    counts = partial_group_agg(docs, ["lang", "source"], count_alias="k")

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = {"lang": [], "n_docs": [], "n_sources": [], "shannon_h": [],
               "effective_sources": []}
        for lang, g in df.groupby("lang"):
            k = g["k"].to_numpy(np.int64)
            n = int(k.sum())
            p = k / float(n)
            h = float(-(p * np.log(p)).sum())
            out["lang"].append(lang)
            out["n_docs"].append(n)
            out["n_sources"].append(len(k))
            out["shannon_h"].append(float(np.floor(abs(h) * 1e6 + 0.5) / 1e6))
            out["effective_sources"].append(float(np.floor(np.exp(h) * 1e6 + 0.5) / 1e6))
        return pa.table(
            {"lang": pa.array(out["lang"], pa.string()),
             "n_docs": pa.array(out["n_docs"], pa.int64()),
             "n_sources": pa.array(out["n_sources"], pa.int64()),
             "shannon_h": pa.array(out["shannon_h"], pa.float64()),
             "effective_sources": pa.array(out["effective_sources"], pa.float64())}
        )

    return counts.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# IR evaluation suite: NDCG@20 / MRR / MAP@20 of a rule-derived ranking
# against a rule-derived relevance label — the search-quality metrics a
# retrieval pipeline ships with.  Everything is integer-exact or
# quantized identically on both sides: the ranking key is an integer
# term frequency (ties by doc_id), relevance is binary membership, DCG
# discounts are micro-quantized floor(1e9/log2(i+1)) summed as
# integers, and AP rides exact rational arithmetic via LCM(1..20)
# numerators — no float accumulation order anywhere.
# ---------------------------------------------------------------------------

_SEARCH_EVAL_K = 20
_SEARCH_EVAL_LCM = 232792560  # lcm(1..20): AP terms stay exact integers

_SEARCH_EVAL_ORACLE = """
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
vc AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY 1),
rk AS (SELECT word, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS r FROM vc),
q AS (SELECT MAX(CASE WHEN r = 10 THEN word END) AS ta,
             MAX(CASE WHEN r = 20 THEN word END) AS tb
      FROM rk),
d AS (SELECT w.doc_id,
             LENGTH(list_filter(w.ws, x -> x = q.ta)) AS tf,
             list_contains(w.ws, q.tb) AS rel
      FROM w, q),
nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rel FROM d WHERE rel),
top AS (SELECT doc_id, tf, CAST(rel AS BIGINT) AS rel,
               ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS pos
        FROM d WHERE tf > 0 ORDER BY tf DESC, doc_id LIMIT 20),
disc AS (SELECT CAST(i AS BIGINT) AS pos,
                CAST(FLOOR(1000000000 / LOG2(CAST(i + 1 AS DOUBLE))) AS BIGINT) AS dm
         FROM range(1, 21) t(i)),
pr AS (SELECT t.pos, t.rel, SUM(t.rel) OVER (ORDER BY t.pos) AS relk, disc.dm
       FROM top t JOIN disc ON t.pos = disc.pos),
m AS (SELECT CAST(COALESCE(SUM(rel * dm), 0) AS BIGINT) AS dcg_micro,
             CAST(COALESCE(MIN(CASE WHEN rel = 1 THEN pos END), 0) AS BIGINT) AS rank_first,
             CAST(COALESCE(SUM(CASE WHEN rel = 1 THEN relk * (232792560 // pos) END), 0) AS BIGINT) AS ap_num,
             CAST(COUNT(*) AS BIGINT) AS n_ranked
      FROM pr),
ic AS (SELECT CAST(COALESCE(SUM(dm), 0) AS BIGINT) AS idcg_micro
       FROM disc, nr WHERE disc.pos <= LEAST(nr.n_rel, 20))
SELECT (SELECT ta FROM q) AS term_a, (SELECT tb FROM q) AS term_b,
       nr.n_rel, m.n_ranked, m.rank_first,
       CASE WHEN m.rank_first > 0 THEN ROUND(1.0 / m.rank_first, 6) ELSE 0.0 END AS rr,
       CASE WHEN LEAST(nr.n_rel, 20) > 0
            THEN ROUND(CAST(m.ap_num AS DOUBLE) / (232792560.0 * LEAST(nr.n_rel, 20)), 6)
            ELSE 0.0 END AS ap,
       m.dcg_micro, ic.idcg_micro,
       CASE WHEN ic.idcg_micro > 0
            THEN ROUND(CAST(m.dcg_micro AS DOUBLE) / ic.idcg_micro, 6)
            ELSE 0.0 END AS ndcg
FROM m, nr, ic
"""


@register("search_eval_metrics", oracle=_SEARCH_EVAL_ORACLE)
def search_eval_metrics(sf_dir: str):
    """NDCG@20 / MRR / MAP@20 over a deterministic retrieval task: the
    query term is the corpus's 10th most frequent word, the ranking is
    integer term frequency (ties by doc_id), and a doc is 'relevant'
    when it also contains the 20th-ranked word.  Vocabulary ranks ride
    the bucketed word-count exchange; the per-doc (tf, rel) pass
    streams; the top-20 shortlist is the only driver-side state.  DCG
    discounts are integer micro-units (floor(1e9/log2(pos+1))) and AP
    numerators use LCM(1..20) rational arithmetic, so every metric is
    bit-reproducible against the SQL replay."""
    import math

    import numpy as np

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials, topk
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = auto_buckets(docs.count())

    def partial_counts(t: pa.Table) -> pa.Table:
        g = word_value_counts(t.column("text"))
        bucket = pa.array([crc_bucket(w, P) for w in g.column("word").to_pylist()], pa.int32())
        return g.append_column("bucket", bucket)

    def bucket_sum(df):
        return df.groupby("word", as_index=False)["n"].sum()

    counts = bucket_map_groups(
        docs.map_batches(partial_counts, batch_format="pyarrow"), "bucket", bucket_sum, P,
        batch_format="pandas",
    ).to_pandas()  # vocabulary-sized
    counts = counts.sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
    ta, tb = str(counts["word"].iloc[9]), str(counts["word"].iloc[19])

    def per_doc(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        tf = np.empty(len(texts), np.int64)
        rel = np.empty(len(texts), np.int64)
        for i, x in enumerate(texts):
            toks = (x or "").split(" ")
            tf[i] = toks.count(ta)
            rel[i] = 1 if tb in toks else 0
        return pa.table({"doc_id": t.column("doc_id"), "tf": pa.array(tf), "rel": pa.array(rel)})

    perdoc = docs.map_batches(per_doc, batch_format="pyarrow")

    # corpus relevant-doc count: combiner partials, shuffle-free merge
    def nrel_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table({"k": pa.array([0], pa.int64()),
                         "n_rel": pa.array([int(_pc.sum(t.column("rel")).as_py() or 0)], pa.int64())})

    n_rel = int(
        merge_partials(perdoc.map_batches(nrel_partial, batch_format="pyarrow"),
                       ["k"], {"n_rel": "sum"}).take_all()[0]["n_rel"]
    )

    def only_hits(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("tf"), 0))

    shortlist = topk(
        perdoc.map_batches(only_hits, batch_format="pyarrow"),
        keys=[("tf", True), ("doc_id", False)],  # tf DESC, doc_id ASC
        k=_SEARCH_EVAL_K,
    ).take_all()  # <= 20 rows on the driver by construction
    shortlist.sort(key=lambda r: (-r["tf"], r["doc_id"]))

    disc = [math.floor(1e9 / math.log2(i + 1)) for i in range(1, _SEARCH_EVAL_K + 1)]
    dcg = sum(int(r["rel"]) * disc[i] for i, r in enumerate(shortlist))
    rank_first = next((i + 1 for i, r in enumerate(shortlist) if r["rel"]), 0)
    relk, ap_num = 0, 0
    for i, r in enumerate(shortlist):
        if r["rel"]:
            relk += 1
            ap_num += relk * (_SEARCH_EVAL_LCM // (i + 1))
    r_cap = min(n_rel, _SEARCH_EVAL_K)
    idcg = sum(disc[:r_cap])

    def rnd6(x: float) -> float:  # == DuckDB ROUND(x, 6) for x >= 0
        return float(np.floor(x * 1e6 + 0.5) / 1e6)

    rr = rnd6(1.0 / rank_first) if rank_first else 0.0
    ap = rnd6(ap_num / (float(_SEARCH_EVAL_LCM) * r_cap)) if r_cap else 0.0
    ndcg = rnd6(dcg / idcg) if idcg else 0.0
    return pa.table(
        {"term_a": pa.array([ta], pa.string()),
         "term_b": pa.array([tb], pa.string()),
         "n_rel": pa.array([n_rel], pa.int64()),
         "n_ranked": pa.array([len(shortlist)], pa.int64()),
         "rank_first": pa.array([rank_first], pa.int64()),
         "rr": pa.array([rr], pa.float64()),
         "ap": pa.array([ap], pa.float64()),
         "dcg_micro": pa.array([dcg], pa.int64()),
         "idcg_micro": pa.array([idcg], pa.int64()),
         "ndcg": pa.array([ndcg], pa.float64())}
    )


# ---------------------------------------------------------------------------
# Lead-3 extractive-summary ROUGE-1 recall: score the classic lead-3
# baseline (first 3 derived 10-word lines = first 30 tokens) against
# the rest of the document — the summarization-eval staple, all
# integer set-overlap counts.
# ---------------------------------------------------------------------------

_LEAD3_ORACLE = """
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
sp AS (SELECT doc_id,
              list_distinct(ws[1:30]) AS summ,
              list_distinct(ws[31:]) AS rest
       FROM w),
c AS (SELECT doc_id,
             CAST(LENGTH(summ) AS BIGINT) AS n_sum_types,
             CAST(LENGTH(rest) AS BIGINT) AS n_rest_types,
             CAST(LENGTH(list_filter(rest, x -> list_contains(summ, x))) AS BIGINT) AS n_overlap
      FROM sp)
SELECT doc_id, n_sum_types, n_rest_types, n_overlap,
       CASE WHEN n_rest_types > 0
            THEN ROUND(CAST(n_overlap AS DOUBLE) / n_rest_types, 6)
            ELSE 0.0 END AS rouge1_recall
FROM c
"""


@register("lead3_rouge1_docs", oracle=_LEAD3_ORACLE)
def lead3_rouge1_docs(sf_dir: str):
    """ROUGE-1 recall of the lead-3 (first 30 tokens) extractive
    summary against the document remainder, per doc.  One stateless
    vectorized map; all counts are integer set overlaps."""
    import numpy as np

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = len(texts)
        ns = np.empty(n, np.int64)
        nr = np.empty(n, np.int64)
        ov = np.empty(n, np.int64)
        rec = np.empty(n, np.float64)
        for i, x in enumerate(texts):
            ws = [w for w in (x or "").split(" ") if w]
            summ = set(ws[:30])
            rest = set(ws[30:])
            ns[i] = len(summ)
            nr[i] = len(rest)
            ov[i] = len(summ & rest)
            rec[i] = np.floor(ov[i] / nr[i] * 1e6 + 0.5) / 1e6 if nr[i] else 0.0
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "n_sum_types": pa.array(ns), "n_rest_types": pa.array(nr),
             "n_overlap": pa.array(ov), "rouge1_recall": pa.array(rec)}
        )

    return docs.map_batches(score, batch_format="pyarrow")


@register("nb_langid_prf", oracle=_NB_PRF_ORACLE)
def nb_langid_prf(sf_dir: str):
    """Per-class precision / recall / F1 of the multinomial-NB langid —
    the classifier-eval rollup next to `nb_langid_confusion`.  Rides
    the same distributed `nb_predictions` substrate; the PRF algebra
    runs over the |classes|^2 confusion counts (integer tp/fp/fn, one
    ROUND-ed division per cell)."""
    import numpy as np

    from document_ai_ray.pipelines.ops import partial_group_agg

    conf = partial_group_agg(
        nb_predictions(sf_dir), ["true_lang", "pred_lang"], count_alias="n"
    ).take_all()  # |classes|^2 rows
    classes = sorted({r["true_lang"] for r in conf})
    tp = {c: 0 for c in classes}
    fp = {c: 0 for c in classes}
    fn = {c: 0 for c in classes}
    for r in conf:
        t_, y, n = r["true_lang"], r["pred_lang"], int(r["n"])
        if t_ == y:
            tp[t_] += n
        else:
            fn[t_] += n
            fp[y] += n

    def rnd6(x: float) -> float:
        return float(np.floor(x * 1e6 + 0.5) / 1e6)

    prec = [rnd6(tp[c] / (tp[c] + fp[c])) if tp[c] + fp[c] else 0.0 for c in classes]
    rec = [rnd6(tp[c] / (tp[c] + fn[c])) if tp[c] + fn[c] else 0.0 for c in classes]
    f1 = [
        rnd6(2 * tp[c] / (2 * tp[c] + fp[c] + fn[c])) if 2 * tp[c] + fp[c] + fn[c] else 0.0
        for c in classes
    ]
    return pa.table(
        {"lang": pa.array(classes, pa.string()),
         "tp": pa.array([tp[c] for c in classes], pa.int64()),
         "fp": pa.array([fp[c] for c in classes], pa.int64()),
         "fn": pa.array([fn[c] for c in classes], pa.int64()),
         "prec": pa.array(prec, pa.float64()),
         "rec": pa.array(rec, pa.float64()),
         "f1": pa.array(f1, pa.float64())}
    )


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing (mu=2000) — the
# classic LM ranking next to BM25.  Per-(doc, term) log terms are
# quantized to integer micro-nats BEFORE the sum, so the ranking is an
# exact integer argsort on both engines.
# ---------------------------------------------------------------------------

_QL_MU = 2000.0

_QL_ORACLE = """
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
vc AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY 1),
nt AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tok FROM vc),
rk AS (SELECT word, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS r FROM vc),
q AS (SELECT MAX(CASE WHEN r = 10 THEN word END) AS ta,
             MAX(CASE WHEN r = 20 THEN word END) AS tb
      FROM rk),
cf AS (SELECT (SELECT CAST(n AS BIGINT) FROM vc WHERE word = (SELECT ta FROM q)) AS cfa,
              (SELECT CAST(n AS BIGINT) FROM vc WHERE word = (SELECT tb FROM q)) AS cfb),
d AS (SELECT w.doc_id, LENGTH(w.ws) AS dl,
             LENGTH(list_filter(w.ws, x -> x = q.ta)) AS tfa,
             LENGTH(list_filter(w.ws, x -> x = q.tb)) AS tfb
      FROM w, q),
sc AS (SELECT doc_id,
              CAST(FLOOR(1000000 * LN((tfa + 2000.0 * cf.cfa / nt.n_tok) / (dl + 2000.0))) AS BIGINT)
            + CAST(FLOOR(1000000 * LN((tfb + 2000.0 * cf.cfb / nt.n_tok) / (dl + 2000.0))) AS BIGINT)
                AS score_micro
       FROM d, cf, nt)
SELECT sc.doc_id, sc.score_micro, q.ta AS term_a, q.tb AS term_b
FROM sc, q ORDER BY sc.score_micro DESC, sc.doc_id LIMIT 10
"""


@register("query_likelihood_search", oracle=_QL_ORACLE)
def query_likelihood_search(sf_dir: str):
    """Top-10 docs under the Dirichlet-smoothed query-likelihood model
    for the two rule-chosen query terms (vocab ranks 10/20).  Corpus
    stats ride the bucketed word-count exchange; per-doc scoring is one
    streaming pass; only the 10-row shortlist reaches the driver."""
    import math

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, topk
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = auto_buckets(docs.count())

    def partial_counts(t: pa.Table) -> pa.Table:
        g = word_value_counts(t.column("text"))
        bucket = pa.array([crc_bucket(w, P) for w in g.column("word").to_pylist()], pa.int32())
        return g.append_column("bucket", bucket)

    def bucket_sum(df):
        return df.groupby("word", as_index=False)["n"].sum()

    counts = bucket_map_groups(
        docs.map_batches(partial_counts, batch_format="pyarrow"), "bucket", bucket_sum, P,
        batch_format="pandas",
    ).to_pandas()  # vocabulary-sized
    n_tok = int(counts["n"].sum())
    ranked = counts.sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
    ta, tb = str(ranked["word"].iloc[9]), str(ranked["word"].iloc[19])
    by_word = counts.set_index("word")["n"]
    cfa, cfb = int(by_word[ta]), int(by_word[tb])

    def score(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        texts = t.column("text").to_pylist()
        out = []
        for x in texts:
            ws = [w for w in (x or "").split(" ") if w]
            dl = len(ws)
            tfa = ws.count(ta)
            tfb = ws.count(tb)
            s = math.floor(1e6 * math.log((tfa + _QL_MU * cfa / n_tok) / (dl + _QL_MU))) + math.floor(
                1e6 * math.log((tfb + _QL_MU * cfb / n_tok) / (dl + _QL_MU))
            )
            out.append(s)
        return pa.table({"doc_id": ids, "score_micro": pa.array(out, pa.int64())})

    short = topk(
        docs.map_batches(score, batch_format="pyarrow"),
        keys=[("score_micro", True), ("doc_id", False)],
        k=10,
    )

    def attach(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {"doc_id": t.column("doc_id"), "score_micro": t.column("score_micro"),
             "term_a": pa.array([ta] * n, pa.string()),
             "term_b": pa.array([tb] * n, pa.string())}
        )

    return short.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Inverted-index posting-list statistics: per term df / cf / max tf and
# the integer micro-nat idf — the index-build byproduct every retrieval
# stack reports.  Vocabulary-sized output.
# ---------------------------------------------------------------------------

_POSTINGS_ORACLE = """
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
dt AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
n AS (SELECT COUNT(*) AS nd FROM documents),
a AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
             CAST(MAX(tf) AS BIGINT) AS max_tf
      FROM dt GROUP BY 1)
SELECT word, df, cf, max_tf,
       CAST(FLOOR(1000000 * LN(CAST(n.nd AS DOUBLE) / df)) AS BIGINT) AS idf_micro
FROM a, n
"""


@register("posting_list_stats", oracle=_POSTINGS_ORACLE)
def posting_list_stats(sf_dir: str):
    """Per-term posting-list stats (df, cf, max tf, micro-nat idf) from
    a distributed inverted-index build: each task Counter-izes its docs
    (docs never span batches, so per-batch df partials are exact) and
    the vocabulary-sized merge is the shuffle-free combiner."""
    import math
    from collections import Counter

    import numpy as np

    from document_ai_ray.pipelines.ops import merge_partials

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    def partial(t: pa.Table) -> pa.Table:
        df: dict[str, int] = {}
        cf: dict[str, int] = {}
        mx: dict[str, int] = {}
        for x in t.column("text").to_pylist():
            c = Counter(w for w in (x or "").split(" ") if w)
            for wd, k in c.items():
                df[wd] = df.get(wd, 0) + 1
                cf[wd] = cf.get(wd, 0) + k
                if k > mx.get(wd, 0):
                    mx[wd] = k
        words = sorted(df)
        return pa.table(
            {"word": pa.array(words, pa.string()),
             "df": pa.array([df[w] for w in words], pa.int64()),
             "cf": pa.array([cf[w] for w in words], pa.int64()),
             "max_tf": pa.array([mx[w] for w in words], pa.int64())}
        )

    merged = merge_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["word"], {"df": "sum", "cf": "sum", "max_tf": "max"},
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        idf = np.array([math.floor(1e6 * math.log(n_docs / int(d))) for d in df], np.int64)
        return pa.table(
            {"word": t.column("word"), "df": t.column("df"), "cf": t.column("cf"),
             "max_tf": t.column("max_tf"), "idf_micro": pa.array(idf)}
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Phonetic blocking census: simplified Soundex over the corpus
# vocabulary — the record-linkage blocking key next to the
# sorted-neighborhood and edit-distance blockers.  The oracle replays
# the ALGORITHM in SQL (translate -> per-digit run collapse -> zero
# strip -> pad); DuckDB's RE2 regexes have no backreferences, so the
# run collapse is seven chained single-digit replaces.
# ---------------------------------------------------------------------------


def _soundex_sql(expr: str) -> str:
    """SQL expression computing simplified Soundex of upper-alpha
    ``expr`` (must already be upper(regexp_replace(.., '[^A-Za-z]')))."""
    coll = (
        f"translate({expr}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
        " '01230120022455012623010202')"
    )
    for d in "0123456":
        coll = f"regexp_replace({coll}, '{d}{d}+', '{d}', 'g')"
    return f"substr({expr}, 1, 1) || substr(replace(substr({coll}, 2), '0', '') || '000', 1, 3)"


_SOUNDEX_ORACLE = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS raw FROM documents),
a AS (SELECT upper(regexp_replace(raw, '[^A-Za-z]', '', 'g')) AS u FROM w),
c AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS n FROM a WHERE u != '' GROUP BY 1),
s AS (SELECT u, n, {_soundex_sql('u')} AS code FROM c)
SELECT code, CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
       CAST(SUM(n) AS BIGINT) AS n_occurrences, MIN(u) AS sample_word
FROM s GROUP BY 1
"""


@register("soundex_word_census", oracle=_SOUNDEX_ORACLE)
def soundex_word_census(sf_dir: str):
    """Group the corpus vocabulary by simplified-Soundex code: distinct
    words, total occurrences, and the lexicographically first word per
    code.  Distributed shape: per-batch word-count combiner ->
    vocab-keyed exact merge -> code-keyed combiner merge (code table is
    letter x 3-digit bounded, far smaller than the vocabulary)."""
    from document_ai_ray.functions.strings import soundex
    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        g = word_value_counts(t.column("text"))
        # fold case/punct variants of a word together BEFORE the merge
        out: dict[str, int] = {}
        for w, n in zip(g.column("word").to_pylist(), g.column("n").to_pylist()):
            u = _ALPHA_ONLY.sub("", w).upper()
            if u:
                out[u] = out.get(u, 0) + n
        return pa.table(
            {"u": pa.array(list(out), pa.string()),
             "n": pa.array(list(out.values()), pa.int64())}
        )

    words = merge_partials(
        docs.map_batches(partial, batch_format="pyarrow"), ["u"], {"n": "sum"}
    )

    def code_partial(t: pa.Table) -> pa.Table:
        us = t.column("u").to_pylist()
        codes = [soundex(u) for u in us]
        return pa.table(
            {"code": pa.array(codes, pa.string()),
             "n_distinct_words": pa.array([1] * len(us), pa.int64()),
             "n_occurrences": t.column("n"),
             "sample_word": t.column("u")}
        )

    return merge_partials(
        words.map_batches(code_partial, batch_format="pyarrow"),
        ["code"],
        {"n_distinct_words": "sum", "n_occurrences": "sum", "sample_word": "min"},
    )


import re as _re_sx  # noqa: E402

_ALPHA_ONLY = _re_sx.compile(r"[^A-Za-z]")


# ---------------------------------------------------------------------------
# Count-min sketch, replayed bit-for-bit in SQL: the engine builds a
# d=4 x w=1024 CMS from mergeable per-batch partials (the 100 TB
# heavy-hitter shape where even the vocabulary is too wide to shuffle),
# then reports the sketch estimate next to the exact count for the
# exact top-20 words.  Hash = md5(word || '|cms' || j) first 8 hex
# chars mod w — identical in Python and DuckDB, so the oracle
# recomputes every bucket sum and the MIN-over-rows estimate exactly.
# ---------------------------------------------------------------------------

_CMS_W = 1024
_CMS_D = 4
_CMS_TOP = 20

_CMS_ORACLE = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w WHERE word != '' GROUP BY 1),
top AS (SELECT word, n FROM c ORDER BY n DESC, word LIMIT {_CMS_TOP}),
b AS (SELECT c.word, c.n, j.j,
             CAST(('0x' || substr(md5(c.word || '|cms' || j.j), 1, 8)) AS BIGINT)
               % {_CMS_W} AS bkt
      FROM c, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j) j),
cms AS (SELECT j, bkt, CAST(SUM(n) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
est AS (SELECT t.word, t.n, MIN(cms.cnt) AS e
        FROM top t JOIN b ON b.word = t.word
        JOIN cms ON cms.j = b.j AND cms.bkt = b.bkt
        GROUP BY 1, 2)
SELECT word, n AS n_true, CAST(e AS BIGINT) AS cms_est FROM est
"""


@register("cms_word_counts", oracle=_CMS_ORACLE)
def cms_word_counts(sf_dir: str):
    """Count-min sketch word counts vs exact truth for the top-20
    words.  The sketch is built the mergeable way — each batch emits
    (row j, bucket, count) partials from its local word counts and
    merge_partials sums them into the final d x w table (4096 cells,
    corpus-size-independent); the exact top-20 rides the existing
    bucketed heavy-hitter path.  cms_est >= n_true always (one-sided
    error); equality whenever no collision lands in all 4 rows."""
    import hashlib

    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["text"])

    def bucket_of(word: str, j: int) -> int:
        return int(hashlib.md5(f"{word}|cms{j}".encode()).hexdigest()[:8], 16) % _CMS_W

    def cms_partial(t: pa.Table) -> pa.Table:
        g = word_value_counts(t.column("text"))
        cells: dict[tuple[int, int], int] = {}
        for w, n in zip(g.column("word").to_pylist(), g.column("n").to_pylist()):
            for j in range(_CMS_D):
                k = (j, bucket_of(w, j))
                cells[k] = cells.get(k, 0) + n
        return pa.table(
            {"j": pa.array([k[0] for k in cells], pa.int64()),
             "bkt": pa.array([k[1] for k in cells], pa.int64()),
             "cnt": pa.array(list(cells.values()), pa.int64())}
        )

    sketch = merge_partials(
        docs.map_batches(cms_partial, batch_format="pyarrow"),
        ["j", "bkt"],
        {"cnt": "sum"},
    ).take_all()  # d x w = 4096 cells, corpus-size-independent
    cms = {(r["j"], r["bkt"]): r["cnt"] for r in sketch}

    top = vocab_top_words(sf_dir).take_all()[:_CMS_TOP]

    def finish(words: list[dict]) -> pa.Table:
        ws = [r["word"] for r in words]
        ns = [r["n"] for r in words]
        est = [
            min(cms.get((j, bucket_of(w, j)), 0) for j in range(_CMS_D)) for w in ws
        ]
        return pa.table(
            {"word": pa.array(ws, pa.string()),
             "n_true": pa.array(ns, pa.int64()),
             "cms_est": pa.array(est, pa.int64())}
        )

    return finish(top)


# ---------------------------------------------------------------------------
# Prefix-autocomplete index: for every 3-char prefix, the most frequent
# completion (ties broken lexicographically) — the type-ahead /
# query-suggestion substrate, built from the same distributed
# word-count combiner as the vocabulary queries.
# ---------------------------------------------------------------------------

_AUTOCOMPLETE_ORACLE = """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w
      WHERE length(word) >= 3 GROUP BY 1),
p AS (SELECT substr(word, 1, 3) AS prefix, word, n,
             ROW_NUMBER() OVER (PARTITION BY substr(word, 1, 3)
                                ORDER BY n DESC, word) AS rk,
             CAST(SUM(n) OVER (PARTITION BY substr(word, 1, 3)) AS BIGINT)
               AS n_prefix
      FROM c)
SELECT prefix, word AS top_word, n AS top_n, n_prefix
FROM p WHERE rk = 1
"""


@register("prefix_autocomplete_top", oracle=_AUTOCOMPLETE_ORACLE)
def prefix_autocomplete_top(sf_dir: str):
    """Top completion per 3-char prefix.  Per-batch word-count
    combiner -> vocab-keyed exact merge -> prefix-keyed argmax merge
    (the prefix table is alphabet^3-bounded).  Ties break (count desc,
    word asc) on both sides."""
    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        g = word_value_counts(t.column("text"))
        mask = pc.greater_equal(pc.utf8_length(g.column("word")), 3)
        return g.filter(mask)

    words = merge_partials(
        docs.map_batches(partial, batch_format="pyarrow"), ["word"], {"n": "sum"}
    )

    def prefix_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        df["prefix"] = df["word"].str[:3]
        # per-prefix argmax under (n desc, word asc): sort then first
        df = df.sort_values(["prefix", "n", "word"], ascending=[True, False, True])
        top = df.groupby("prefix", as_index=False).first()
        tot = df.groupby("prefix", as_index=False)["n"].sum().rename(
            columns={"n": "n_prefix"}
        )
        out = top.merge(tot, on="prefix")
        return pa.table(
            {
                "prefix": pa.array(out["prefix"], pa.string()),
                "top_word": pa.array(out["word"], pa.string()),
                "top_n": pa.array(out["n"].astype("int64")),
                "n_prefix": pa.array(out["n_prefix"].astype("int64")),
            }
        )

    # words is exactly-merged (one row per word), so per-prefix argmax
    # partials are safe to merge by (top_n desc, top_word asc) argmax…
    # but merge_partials only does sum/min/max.  The prefix table is
    # tiny (≤ alphabet^3): one consolidation level suffices.
    return (
        words.map_batches(prefix_partial, batch_format="pyarrow", batch_size=1 << 20,
                          num_cpus=0.5)
        .repartition(1)
        .map_batches(prefix_partial_final, batch_format="pyarrow", batch_size=1 << 30)
    )


def prefix_partial_final(t: pa.Table) -> pa.Table:
    """Final merge for prefix_autocomplete_top: argmax by (top_n desc,
    top_word asc) + sum of n_prefix per prefix."""
    import pandas as pd

    df = t.to_pandas()
    df = df.sort_values(
        ["prefix", "top_n", "top_word"], ascending=[True, False, True]
    )
    top = df.groupby("prefix", as_index=False).first()
    tot = df.groupby("prefix", as_index=False)["n_prefix"].sum()
    out = top.drop(columns=["n_prefix"]).merge(tot, on="prefix")
    return pa.table(
        {
            "prefix": pa.array(out["prefix"], pa.string()),
            "top_word": pa.array(out["top_word"], pa.string()),
            "top_n": pa.array(out["top_n"].astype("int64")),
            "n_prefix": pa.array(out["n_prefix"].astype("int64")),
        }
    )
