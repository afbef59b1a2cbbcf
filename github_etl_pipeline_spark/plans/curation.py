"""Training-data curation queries: decontamination, chunking, sequence
packing, quality filtering, temperature mixture sampling, embedding
cluster dedup — each registered with a DuckDB oracle generated from the
SAME constants as the Spark builders so both engines compute
bit-identical values (md5 buckets/hashes, integer token counts,
exact-rational sampling thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators import curation as C
from github_etl_pipeline_spark.operators import dedup as D
from github_etl_pipeline_spark.operators.text import TOKEN_RE, WORD_RE
from github_etl_pipeline_spark.plans.extensions import (
    _docs,
    _emb,
    _hyperplane_pairs_ctes,
)
from github_etl_pipeline_spark.plans.registry import register
from github_etl_pipeline_spark.sources.tables import read_table


def _kgram_shingle_hashes_sql(k: int, table: str = "documents") -> str:
    """DuckDB mirror of operators.dedup.shingle_hashes(text, k): distinct
    word k-grams -> md5-prefix 32-bit hashes. Returns a CTE body ending
    with ``hs_{table}(doc_id, hs)``."""
    gram = " || ' ' || ".join(f"toks[i+{j}]" for j in range(k))
    return f"""g_{table} AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= {k}
              THEN list_distinct(list_transform(range(1, len(toks) - {k - 2}), i -> {gram}))
              WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
              ELSE [] END AS sh
  FROM (SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS toks FROM {table})
),
hs_{table} AS (
  SELECT doc_id,
         list_distinct(list_transform(sh, s -> CAST(('0x' || substr(md5(s),1,8)) AS BIGINT))) AS hs
  FROM g_{table}
)"""


# ---------------------------------------------------------------------------
# Decontamination: corpus docs sharing word 3-gram shingles with a
# benchmark (here: the 'src0' stratum stands in for an eval set).
# ---------------------------------------------------------------------------
_DECON_K = 3
_BENCH_SOURCE = "src0"


def _decontaminate_oracle() -> str:
    return f"""
WITH {_kgram_shingle_hashes_sql(_DECON_K)},
bench AS (
  SELECT DISTINCT unnest(hs) AS sh FROM hs_documents
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = '{_BENCH_SOURCE}')
),
overlap AS (
  SELECT d.doc_id, COUNT(*) AS n_overlap
  FROM (SELECT doc_id, unnest(hs) AS sh FROM hs_documents) d
  JOIN bench b ON d.sh = b.sh
  GROUP BY d.doc_id
)
SELECT h.doc_id,
       CAST(len(h.hs) AS INTEGER) AS n_shingles,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       COALESCE(o.n_overlap, 0) >= 1 AS contaminated
FROM hs_documents h LEFT JOIN overlap o ON o.doc_id = h.doc_id
"""


@register(
    "decontaminate_documents",
    oracle=_decontaminate_oracle(),
    doc="benchmark decontamination: word 3-gram shingle overlap vs the src0 eval stratum; benchmark shingle set broadcast, one groupBy(doc_id) aggregate",
)
def decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("source") == _BENCH_SOURCE)
    return C.decontaminate(docs, bench, k=_DECON_K, min_overlap=1)


# ---------------------------------------------------------------------------
# Chunking: fixed-size token windows with overlap
# ---------------------------------------------------------------------------
_CHUNK, _OVERLAP = 32, 8
_STRIDE = _CHUNK - _OVERLAP


@register(
    "chunk_documents",
    oracle=f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS toks,
         len(regexp_extract_all(text, '{TOKEN_RE}')) AS n
  FROM documents
  WHERE len(regexp_extract_all(text, '{TOKEN_RE}')) > 0
),
c AS (
  SELECT doc_id, toks,
         CAST(unnest(range(0, (greatest(n - {_OVERLAP}, 1) + {_STRIDE - 1}) // {_STRIDE})) AS INTEGER) AS chunk_id
  FROM t
)
SELECT doc_id, chunk_id,
       CAST(len(list_slice(toks, chunk_id * {_STRIDE} + 1, chunk_id * {_STRIDE} + {_CHUNK})) AS INTEGER) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, chunk_id * {_STRIDE} + 1, chunk_id * {_STRIDE} + {_CHUNK}), ' ')) AS chunk_hash
FROM c
""",
    doc=f"context-window chunking: {_CHUNK}-token windows, {_OVERLAP}-token overlap; tokenize-once array slicing in the scan, chunks carried as md5 not text",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=_CHUNK, overlap=_OVERLAP
    )


# ---------------------------------------------------------------------------
# Sequence packing: contiguous per-source packing by running token total
# ---------------------------------------------------------------------------
_BUDGET = 128


@register(
    "pack_sequences_documents",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST((cum - n_tokens) // {_BUDGET} AS BIGINT) AS seq_id
FROM c
""",
    doc=f"sequence packing: contiguous {_BUDGET}-token-budget assignment by per-source running token total (window partitioned by source, never global)",
)
def pack_sequences_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.pack_sequences(_docs(spark, sf_dir), budget=_BUDGET)


# ---------------------------------------------------------------------------
# Quality filter: Gopher/C4-style rules with reason strings
# ---------------------------------------------------------------------------
def _quality_filter_oracle() -> str:
    # mirrors operators.curation.quality_filter: per-row signals +
    # repetition aggregates, identical rule order in the reasons list
    return f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS ws FROM documents),
tops AS (
  SELECT doc_id, MAX(c) AS top, SUM(c) AS total FROM (
    SELECT doc_id, word, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(ws) AS word FROM w) GROUP BY doc_id, word
  ) GROUP BY doc_id
),
bg AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 2
              THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
              ELSE [] END AS bgs
  FROM w
),
rep AS (
  SELECT w.doc_id,
    CAST(COALESCE(t.total, 0) AS BIGINT) AS n_words,
    round(CASE WHEN t.total > 0 THEN CAST(t.top AS DOUBLE) / t.total ELSE 0.0 END, 6) AS top_word_frac,
    round(CASE WHEN len(b.bgs) > 0 THEN 1.0 - CAST(len(list_distinct(b.bgs)) AS DOUBLE) / len(b.bgs) ELSE 0.0 END, 6) AS dup_bigram_frac
  FROM w LEFT JOIN tops t ON t.doc_id = w.doc_id LEFT JOIN bg b ON b.doc_id = w.doc_id
),
base AS (
  SELECT doc_id,
    CASE WHEN length(text) > 0
         THEN CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) / length(text)
         ELSE 0.0 END AS punct_ratio,
    CASE WHEN len(regexp_extract_all(text, '{TOKEN_RE}')) > 0
         THEN CAST(length(text) - (len(regexp_extract_all(text, '{TOKEN_RE}')) - 1) AS DOUBLE)
              / len(regexp_extract_all(text, '{TOKEN_RE}'))
         ELSE 0.0 END AS mean_word_len
  FROM documents
),
j AS (SELECT base.doc_id, punct_ratio, mean_word_len, n_words, top_word_frac, dup_bigram_frac
      FROM base JOIN rep ON rep.doc_id = base.doc_id)
SELECT doc_id,
  NOT (n_words < 5 OR top_word_frac > 0.30 OR dup_bigram_frac > 0.30
       OR punct_ratio > 0.30 OR mean_word_len > 12) AS keep,
  concat_ws(',',
    CASE WHEN n_words < 5 THEN 'too_few_words' END,
    CASE WHEN top_word_frac > 0.30 THEN 'repetitive_top_word' END,
    CASE WHEN dup_bigram_frac > 0.30 THEN 'repetitive_bigrams' END,
    CASE WHEN punct_ratio > 0.30 THEN 'punct_soup' END,
    CASE WHEN mean_word_len > 12 THEN 'words_too_long' END) AS reasons
FROM j
"""


@register(
    "quality_filter_documents",
    oracle=_quality_filter_oracle(),
    doc="rule-based quality filter (Gopher/C4-style): length, repetition, punctuation, word-shape rules -> keep + fixed-order reason list",
)
def quality_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.quality_filter(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Temperature mixture sampling (alpha = 0.5, exact-integer keep rule)
# ---------------------------------------------------------------------------
def _temperature_oracle() -> str:
    from github_etl_pipeline_spark.operators.sampling import BUCKETS, SAMPLE_SEED

    bucket = (
        f"CAST(('0x' || substr(md5('{SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {BUCKETS}"
    )
    return f"""
WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
m AS (SELECT MIN(n) AS n_min FROM counts)
SELECT d.doc_id, d.source
FROM documents d JOIN counts c ON c.source = d.source CROSS JOIN m
WHERE ({bucket}) * ({bucket}) * c.n < m.n_min * {BUCKETS * BUCKETS}
"""


@register(
    "temperature_sample_documents",
    oracle=_temperature_oracle(),
    doc="alpha=0.5 temperature mixture rebalancing: per-source rate sqrt(n_min/n_s) via an exact integer inequality on the md5 bucket — no float boundary, no driver rates",
)
def temperature_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.temperature_sample(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Embedding cluster dedup: connected components over the LSH-mined
# high-cosine pair graph (oracle: recursive-CTE transitive closure over
# the SAME banded-candidate + exact-verify pair set)
# ---------------------------------------------------------------------------
_EMB_THRESHOLD = 0.45


def _embedding_clusters_oracle() -> str:
    return f"""
WITH RECURSIVE {_hyperplane_pairs_ctes(_EMB_THRESHOLD)},
bi AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION ALL SELECT id_b, id_a FROM verified
),
walk(id, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT b.dst, w.lbl FROM walk w JOIN bi b ON b.src = w.id
)
SELECT id AS vec_id, MIN(lbl) AS cluster_id FROM walk GROUP BY id
"""


@register(
    "embedding_dup_clusters",
    oracle=_embedding_clusters_oracle(),
    doc="embedding near-dup connected components: hyperplane-LSH pair mining -> min-label propagation -> (vec_id, cluster_id); oracle is a recursive-CTE closure over the mirrored pair set",
)
def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    pairs = D.embedding_dup_pairs_lsh(emb, threshold=_EMB_THRESHOLD)
    return D.connected_components(emb.select("vec_id"), pairs, "vec_id")
