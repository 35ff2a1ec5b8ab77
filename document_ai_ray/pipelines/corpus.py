"""End-to-end training-corpus build: the flagship composition query.

Chains the individually-oracled training-data stages into the pipeline
an LLM-pretraining team actually runs over a web crawl, in one
streaming pass plus one distributed sort:

    quality filter  ->  benchmark decontamination  ->  PII scrub
      ->  token counting  ->  sequence packing into token shards

Every stage reuses the exact batch function its standalone query uses
(`quality_batch`, `eval_grams_batch` + broadcast membership,
`pii_scrub_batch`, `token_count_batch`, `with_group_ranks`), so the
composed oracle is the same CTEs chained.  Scale shape: stages 1-4 are
one fused stateless `map_batches` pass (the eval-gram set is broadcast
once via ray.put, never re-shipped per batch); packing is the
distributed sort + offset-merged prefix sum — no task ever holds the
corpus, and the output is partitioned by shard for a resumable write.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from document_ai_ray.pipelines.registry import register
from document_ai_ray.pipelines.text_queries import _DECON_MOD, _DECON_N
from document_ai_ray.sources.tables import read_table
from document_ai_ray.stages.text_analysis import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    eval_grams_batch,
    pii_scrub_batch,
    quality_batch,
    token_count_batch,
)

BUILD_MIN_QUALITY = 0.66
BUILD_SHARD_TOKENS = 4096

# The stopword list inlined in the quality_scores oracle, reused verbatim.
_STOPWORD_SQL = (
    "'a','about','across','al','am','an','and','are','as','at','au','auf','aux',"
    "'avec','be','bei','by','ce','cette','che','con','dans','das','de','dei','del',"
    "'della','delle','dem','den','der','des','di','die','donde','dove','du','e',"
    "'ein','eine','einen','el','elle','en','es','est','et','for','from','für','gli',"
    "'hacia','i','il','im','in','is','ist','it','la','las','le','les','lo','los',"
    "'mentre','mientras','mit','nach','near','not','of','on','or','over','où','par',"
    "'para','pendant','per','por','pour','que','qui','se','sind','sobre','son',"
    "'sono','sont','sopra','su','sur','that','the','this','to','toward','un','una',"
    "'und','une','vers','verso','von','was','where','while','with','wo','während',"
    "'y','zu','è','über'"
)

_BUILD_ORACLE = rf"""
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\p{{L}}+')) AS wd FROM documents),
ws AS (SELECT doc_id, lower(wd) AS w, len(wd) AS l FROM w),
st AS (SELECT doc_id, COUNT(*) AS n_words,
              SUM(l)/CAST(COUNT(*) AS DOUBLE) AS mean_word_len,
              SUM(CASE WHEN w IN ({_STOPWORD_SQL}) THEN 1 ELSE 0 END)/CAST(COUNT(*) AS DOUBLE) AS stopword_ratio
       FROM ws GROUP BY doc_id),
ch AS (SELECT doc_id,
              CASE WHEN len(text)=0 THEN 0.0
                   ELSE len(regexp_extract_all(text, '\p{{L}}'))/CAST(len(text) AS DOUBLE) END AS alpha_ratio
       FROM documents),
f AS (SELECT d.doc_id,
             COALESCE(st.n_words, 0) AS n_words,
             ch.alpha_ratio,
             COALESCE(st.stopword_ratio, 0.0) AS stopword_ratio,
             COALESCE(st.mean_word_len, 0.0) AS mean_word_len
      FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id JOIN ch ON ch.doc_id = d.doc_id),
q AS (SELECT doc_id FROM f
      WHERE ROUND(GREATEST(0.0, LEAST(1.0,
                 0.4 * alpha_ratio + 0.3 * LEAST(stopword_ratio / 0.3, 1.0)
                 + 0.3 * GREATEST(0.0, LEAST(1.0, 1.0 - abs(mean_word_len - 5.0) / 5.0))))
            * (CASE WHEN n_words >= 5 THEN 1.0 ELSE 0.0 END), 6) >= {BUILD_MIN_QUALITY}),
dw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT DISTINCT doc_id,
             array_to_string(ws[CAST(t.i AS BIGINT):CAST(t.i+{_DECON_N - 1} AS BIGINT)], ' ') AS gram
      FROM dw, UNNEST(generate_series(1, len(ws) - {_DECON_N - 1})) AS t(i)),
eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_MOD} = 0),
cont AS (SELECT DISTINCT g.doc_id FROM g JOIN eg USING (gram)),
surv AS (SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)
         WHERE d.doc_id NOT IN (SELECT doc_id FROM cont)),
clean AS (SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(text,
                     '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                     '{PII_IPV4_RE}', '<IP>', 'g'),
                     '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text
          FROM surv),
tok AS (SELECT doc_id, clean_text,
               CASE WHEN trim(regexp_replace(clean_text, '\s+', ' ', 'g')) = '' THEN 0
                    ELSE len(string_split(trim(regexp_replace(clean_text, '\s+', ' ', 'g')), ' '))
               END AS n_ws_tokens
        FROM clean)
SELECT doc_id, clean_text, n_ws_tokens,
       CAST(COALESCE(SUM(n_ws_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         // {BUILD_SHARD_TOKENS} AS BIGINT) AS shard
FROM tok
"""


@register("build_corpus", oracle=_BUILD_ORACLE)
def build_corpus(sf_dir: str):
    """The FLAGSHIP corpus build (see module docstring): one fused
    filter+scrub+count pass over the stream, then distributed packing.
    Output: one row per surviving document with its scrubbed text,
    token count, and token-budget shard assignment."""
    import ray
    import ray.data  # noqa: F401

    from document_ai_ray.pipelines.ops import get_broadcast, with_group_ranks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    # Eval-set grams: collected once (benchmarks are small by
    # definition), broadcast once.
    egrams: set[str] = set()
    parts = docs.map_batches(
        lambda t: eval_grams_batch(t, _DECON_N, _DECON_MOD), batch_format="pyarrow"
    )
    for b in parts.iter_batches(batch_format="pyarrow"):
        egrams.update(b.column("gram").to_pylist())
    ref = ray.put(egrams)

    def stage(t: pa.Table) -> pa.Table:
        # 1. quality gate (round-6 before compare, same as the oracle)
        t = quality_batch(t)
        qs = t.column("quality_score").to_numpy(zero_copy_only=False)
        q6 = np.copysign(np.floor(np.abs(qs) * 1e6 + 0.5), qs) / 1e6
        t = t.filter(pa.array(q6 >= BUILD_MIN_QUALITY)).select(["doc_id", "text"])
        # 2. benchmark decontamination (broadcast membership, no shuffle)
        eg: set[str] = get_broadcast((ref,), tag="decontam")
        keep = []
        for txt in t.column("text").to_pylist():
            toks = (txt or "").split(" ")
            grams = {" ".join(toks[j : j + _DECON_N]) for j in range(len(toks) - _DECON_N + 1)}
            keep.append(grams.isdisjoint(eg))
        t = t.filter(pa.array(keep))
        # 3. PII scrub, 4. token count over the scrubbed text
        t = pii_scrub_batch(t)
        t = token_count_batch(t, text_col="clean_text")
        return t.select(["doc_id", "clean_text", "n_ws_tokens"]).append_column(
            "__g", pa.array([0] * len(t), pa.int8())
        )

    survivors = docs.map_batches(stage, batch_format="pyarrow")
    ranked = with_group_ranks(survivors, "__g", ["doc_id"], value_col="n_ws_tokens")

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        shard = pc.divide(t.column("__cum"), pa.scalar(BUILD_SHARD_TOKENS, pa.int64()))
        return pa.Table.from_arrays(
            [t.column("doc_id"), t.column("clean_text"), t.column("n_ws_tokens"), shard],
            names=["doc_id", "clean_text", "n_ws_tokens", "shard"],
        )

    return ranked.map_batches(finish, batch_format="pyarrow")
