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
from github_etl_pipeline_spark.operators.text import PUNCT_RE, STOPWORDS, TOKEN_RE, WORD_RE
from github_etl_pipeline_spark.plans.extensions import (
    _band_sql,
    _docs,
    _emb,
    _hyperplane_pairs_ctes,
    _SHASH_SQL,
    _SHINGLES_SQL,
    _SIG_CTE,
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
# Boilerplate n-gram detection: word bigrams present in >= 1/20 of docs
# (exact integer rule: doc_freq * 20 >= total * 1, plus doc_freq >= 2)
# ---------------------------------------------------------------------------
_BP_NUM, _BP_DEN, _BP_MIN_DOCS = 1, 20, 2


@register(
    "boilerplate_ngrams_documents",
    oracle=f"""
WITH g AS ({_SHINGLES_SQL}),
e AS (SELECT unnest(sh) AS gram FROM g),
c AS (SELECT gram, COUNT(*) AS doc_freq FROM e GROUP BY 1),
t AS (SELECT COUNT(*) AS total FROM documents)
SELECT gram, doc_freq,
       round(CAST(doc_freq AS DOUBLE) / total, 6) AS doc_frac
FROM c CROSS JOIN t
WHERE doc_freq * {_BP_DEN} >= total * {_BP_NUM} AND doc_freq >= {_BP_MIN_DOCS}
""",
    doc=f"boilerplate detection: word bigrams in >= {_BP_NUM}/{_BP_DEN} of documents (exact integer threshold); per-doc distinct shingles -> one groupBy(gram) doc-frequency count, corpus total broadcast",
)
def boilerplate_ngrams_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.boilerplate_ngrams(
        _docs(spark, sf_dir),
        min_doc_ratio=(_BP_NUM, _BP_DEN),
        min_docs=_BP_MIN_DOCS,
    )


# ---------------------------------------------------------------------------
# phi-heavy-hitter k-grams: CMS candidate prune + exact verify
# (operators/sketches.py::cms_heavy_hitters). Non-vacuity is seeded:
# every 3rd document gains a fixed disclaimer suffix whose 5-grams
# recur at ~0.1% of the occurrence stream — above phi, so the seeded
# boilerplate MUST surface at every scale (phi-HH is replication-
# invariant) while organic grams pass only if genuinely heavy.
# ---------------------------------------------------------------------------
_HH_K, _HH_PHI, _HH_SEED_MOD = 5, 5e-4, 3
_HH_DISCLAIMER = (
    "this document is provided as is without warranty of any kind express or implied"
)


@register(
    "heavy_grams_documents",
    oracle=f"""
WITH base AS (
  SELECT CASE WHEN doc_id % {_HH_SEED_MOD} = 0
              THEN text || ' {_HH_DISCLAIMER}' ELSE text END AS text
  FROM documents
),
toks AS (
  SELECT COALESCE(regexp_extract_all(text, '{TOKEN_RE}'),
                  CAST([] AS VARCHAR[])) AS w
  FROM base
),
g AS (
  SELECT array_to_string(w[i:i+{_HH_K - 1}], ' ') AS gram
  FROM toks,
       UNNEST(CASE WHEN len(w) >= {_HH_K}
                   THEN range(1, len(w) - {_HH_K} + 2)
                   ELSE CAST([] AS BIGINT[]) END) AS t(i)
),
t AS (SELECT GREATEST(1, CAST(CEIL({_HH_PHI!r} * COUNT(*)) AS BIGINT)) AS tau FROM g)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM g GROUP BY gram
HAVING COUNT(*) >= (SELECT tau FROM t)
""",
    doc=f"exact phi-heavy-hitter word {_HH_K}-grams (phi={_HH_PHI}): pass 1 builds a count-min sketch (constant-size partial agg, driver-collected like IVF centroids), pass 2 re-scans filtering on the CMS estimate as a broadcast-literal EXPRESSION so only candidate occurrences reach the exact groupBy — CMS never underestimates, so the output is EXACT (the oracle is a plain HAVING over true counts, no sketch mirror needed); seeded disclaimer grams prove non-vacuity at every tier",
)
def heavy_grams_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_etl_pipeline_spark.operators.dedup import kgrams_of
    from github_etl_pipeline_spark.operators.sketches import cms_heavy_hitters

    docs = _docs(spark, sf_dir)
    text = F.when(
        F.col("doc_id") % _HH_SEED_MOD == 0,
        F.concat(F.col("text"), F.lit(" " + _HH_DISCLAIMER)),
    ).otherwise(F.col("text"))
    toks = F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)
    grams_arr = F.when(F.size(toks) >= _HH_K, kgrams_of(toks, _HH_K)).otherwise(
        F.array().cast("array<string>")
    )
    # the gram stream feeds BOTH sketch and verify passes — persist the
    # skinny occurrence relation so the tokenize+zip shingling runs once
    # (the harness's managed_caches sweep releases it after the query)
    grams = docs.select(F.explode(grams_arr).alias("gram")).persist()
    out = cms_heavy_hitters(grams, "gram", phi=_HH_PHI)
    return out.select(F.col("key").alias("gram"), "cnt")


# ---------------------------------------------------------------------------
# Duplicate-span detection: maximal runs of token positions whose word
# 5-gram occurs >= 2 times corpus-wide (substring-level dedup, Lee et
# al. 2022 re-expressed relationally — see operators.curation.
# duplicate_spans for the 100-TB shape).
# ---------------------------------------------------------------------------
_SPAN_K, _SPAN_MIN = 5, 2

# shared CTE chain: tokenize -> positional 5-gram hashes -> positions
# whose gram repeats corpus-wide -> gaps-and-islands grouping key
_SPAN_CTES = f"""toks AS (
  SELECT doc_id, COALESCE(regexp_extract_all(text, '{TOKEN_RE}'),
                          CAST([] AS VARCHAR[])) AS w
  FROM documents
),
pos AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
         substr(md5(array_to_string(w[i:i+{_SPAN_K - 1}], ' ')), 1, 16) AS gh
  FROM toks,
       UNNEST(CASE WHEN len(w) >= {_SPAN_K}
                   THEN range(1, len(w) - {_SPAN_K} + 2)
                   ELSE CAST([] AS BIGINT[]) END) AS t(i)
),
hits AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY gh) AS freq FROM pos
  ) WHERE freq >= {_SPAN_MIN}
),
isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM hits
)"""


@register(
    "dup_span_documents",
    oracle=f"""
WITH {_SPAN_CTES}
SELECT doc_id,
       CAST(MIN(pos) AS INTEGER) AS span_start,
       CAST(MAX(pos) + {_SPAN_K - 1} AS INTEGER) AS span_end,
       COUNT(*) AS n_dup_grams
FROM isl GROUP BY doc_id, g
""",
    doc=f"substring-level duplicate spans: maximal runs of positions whose word {_SPAN_K}-gram occurs >= {_SPAN_MIN}x corpus-wide; skinny (id,pos,hash) explode + ONE count-window shuffle + per-doc islands pass",
)
def dup_span_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.duplicate_spans(
        _docs(spark, sf_dir), k=_SPAN_K, min_count=_SPAN_MIN
    )


# keep-first variant: swap the count window for a global-occurrence-rank
# window — the first occurrence of each repeated k-gram is exempt
_SPAN_CTES_KEEP_FIRST = _SPAN_CTES.replace(
    """hits AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY gh) AS freq FROM pos
  ) WHERE freq >= {m}
),""".format(m=_SPAN_MIN),
    """hits AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS occ
    FROM pos
  ) WHERE occ >= {m}
),""".format(m=_SPAN_MIN),
)
assert "occ" in _SPAN_CTES_KEEP_FIRST  # replace() must have matched


@register(
    "dup_span_keep_first_documents",
    oracle=f"""
WITH {_SPAN_CTES_KEEP_FIRST}
SELECT doc_id,
       CAST(MIN(pos) AS INTEGER) AS span_start,
       CAST(MAX(pos) + {_SPAN_K - 1} AS INTEGER) AS span_end,
       COUNT(*) AS n_dup_grams
FROM isl GROUP BY doc_id, g
""",
    doc=f"duplicate spans under Lee-et-al keep-one-copy removal: the globally first occurrence of each repeated {_SPAN_K}-gram survives, later occurrences merge into removal spans; same single gram-hash shuffle as dup_span_documents with a rank window instead of a count window",
)
def dup_span_keep_first_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.duplicate_spans(
        _docs(spark, sf_dir), k=_SPAN_K, min_count=_SPAN_MIN, keep_first=True
    )


@register(
    "remove_dup_spans_documents",
    oracle=f"""
WITH {_SPAN_CTES},
span_rows AS (
  SELECT doc_id, CAST(MIN(pos) AS INTEGER) AS s,
         CAST(MAX(pos) + {_SPAN_K - 1} AS INTEGER) AS e
  FROM isl GROUP BY doc_id, g
),
spans AS (SELECT doc_id, list([s, e]) AS sp FROM span_rows GROUP BY doc_id),
clean AS (
  SELECT t.doc_id,
         CAST(len(t.w) AS INTEGER) AS n_tokens,
         list_transform(
           list_filter(range(0, len(t.w)),
                       i -> len(list_filter(COALESCE(s.sp, CAST([] AS INTEGER[][])),
                                            x -> i >= x[1] AND i <= x[2])) = 0),
           i -> t.w[i+1]) AS kept
  FROM toks t LEFT JOIN spans s USING (doc_id)
)
SELECT doc_id, n_tokens,
       CAST(n_tokens - len(kept) AS INTEGER) AS n_removed,
       -- array_to_string([]) is NULL in DuckDB (string_agg semantics)
       -- where Spark's array_join([]) is '' — pin to Spark's behavior
       md5(COALESCE(array_to_string(kept, ' '), '')) AS clean_md5
FROM clean
""",
    doc="apply the duplicate-span mask: tokens inside any duplicated span dropped, cleaned text fingerprinted as md5 so only (id, counts, 16-byte hash) leave the scan; spans LEFT-join back by doc id",
)
def remove_dup_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.remove_duplicate_spans(
        _docs(spark, sf_dir), k=_SPAN_K, min_count=_SPAN_MIN
    )


# ---------------------------------------------------------------------------
# Distribution-derived quality gate: keep docs at or above the corpus's
# 20th-percentile composite quality score
# ---------------------------------------------------------------------------
_QGATE_P = 0.2

_QUALITY_SQL = """round(0.25 * (CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 1.0 ELSE 0.5 END)
      + 0.25 * least(CASE WHEN n_tokens > 0 THEN CAST(n_words AS DOUBLE)/n_tokens ELSE 0.0 END, 1.0)
      + 0.25 * (CASE WHEN (CASE WHEN n_tokens > 0 THEN CAST(s_en AS DOUBLE)/n_tokens ELSE 0.0 END) > 0.02 THEN 1.0 ELSE 0.5 END)
      + 0.25 * (CASE WHEN (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END) > 0.2 THEN 0.5 ELSE 1.0 END), 4)"""


@register(
    "quality_percentile_gate_documents",
    oracle=f"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
         len(regexp_extract_all(text, '{WORD_RE}')) AS n_words,
         len(regexp_extract_all(text, '{PUNCT_RE}')) AS n_punct,
         len(regexp_extract_all(lower(text), '{STOPWORDS["en"]}')) AS s_en
  FROM documents
),
q AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM f),
thr AS (SELECT round(quantile_cont(quality, {_QGATE_P}), 6) AS _thr FROM q)
SELECT doc_id, quality, quality >= _thr AS keep
FROM q CROSS JOIN thr
""",
    doc=f"distribution-derived quality gate: keep docs >= the corpus p{int(_QGATE_P*100)} composite quality score; the threshold is a broadcast single-row EXACT percentile (4dp scores, 6dp threshold — cross-engine-stable compare; at fleet scale swap in approx_percentile, same plan shape)",
)
def quality_percentile_gate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from github_etl_pipeline_spark.operators.text import quality_score

    docs = _docs(spark, sf_dir)
    # persisted: the scored relation feeds BOTH the threshold aggregate
    # and the output gate — without the cache the quality expression
    # (three regexp passes) runs twice over the corpus. Narrow rows
    # (id + one double), MEMORY_AND_DISK; harnesses clear cache between
    # queries.
    scored = docs.select("doc_id", quality_score("text").alias("quality")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    thr = scored.agg(
        F.round(F.expr(f"percentile(quality, {_QGATE_P})"), 6).alias("_thr")
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id", "quality", (F.col("quality") >= F.col("_thr")).alias("keep")
    )


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
def _temp_bucket_sql() -> tuple[str, int]:
    from github_etl_pipeline_spark.operators.sampling import BUCKETS, SAMPLE_SEED

    bucket = (
        f"CAST(('0x' || substr(md5('{SAMPLE_SEED}:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {BUCKETS}"
    )
    return bucket, BUCKETS * BUCKETS


_TEMP_BUCKET_SQL, _TEMP_B2 = _temp_bucket_sql()


def _temperature_oracle() -> str:
    return f"""
WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
m AS (SELECT MIN(n) AS n_min FROM counts)
SELECT d.doc_id, d.source
FROM documents d JOIN counts c ON c.source = d.source CROSS JOIN m
WHERE ({_TEMP_BUCKET_SQL}) * ({_TEMP_BUCKET_SQL}) * c.n < m.n_min * {_TEMP_B2}
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
    # r10: depth-adaptive banding (see extensions._EMB_PAIR_LSH) — the
    # fixed-depth pair set spilled >78 GB at the sf10 probe
    return f"""
WITH RECURSIVE {_hyperplane_pairs_ctes(_EMB_THRESHOLD, n_planes=128, bands=8, target_bucket=8)},
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
    doc="embedding near-dup connected components: depth-adaptive hyperplane-LSH pair mining -> min-label propagation -> (vec_id, cluster_id); oracle is a recursive-CTE closure over the mirrored (banding AND depth) pair set. Config note (VERDICT r11 #5): this registered query keeps the fixed 8-band production config because its DEDUP semantics target exact/near-exact duplicates (cos ~ 1), which are depth-invariant — banding recall decay never loses them; high-recall NEAR-dup mining at scale should call embedding_dup_pairs_lsh(recall_target=...) instead, which routes through bands_for_recall (the registered embedding_lsh_recall_tuned query pins that mode's driver-tier config)",
)
def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed 8-band config on purpose: cluster semantics here are
    # exact-duplicate collapse (depth-invariant); see the doc note above
    # and embedding_dup_pairs_lsh's recall_target kwarg for the
    # recall-preserving scale mode
    emb = _emb(spark, sf_dir)
    pairs = D.embedding_dup_pairs_lsh(
        emb, threshold=_EMB_THRESHOLD, n_planes=128, bands=8, target_bucket=8
    )
    return D.connected_components(emb.select("vec_id"), pairs, "vec_id")


# ---------------------------------------------------------------------------
# End-to-end curation pipeline: the flagship composition. Four
# independent per-doc keep signals (quality rules, dedup-canonical,
# decontamination, temperature sampling) intersected as left-semi joins,
# then the survivors packed into training sequences. The corpus is
# scanned/tokenized/shingled ONCE into a persisted narrow base relation
# every signal reads (operators.curation.curation_pipeline — Catalyst
# does NOT share a file scan across sibling aggregates, so r7's plan
# re-ran the regexp chains per signal). Signals are computed over the
# FULL corpus then intersected (signal independence — the standard
# production shape, and what keeps each stage's semantics identical to
# its standalone query above).
# ---------------------------------------------------------------------------
_PIPE_DEDUP_THRESHOLD = 0.2


def _curation_pipeline_oracle() -> str:
    quality = _quality_filter_oracle().strip()
    assert quality.startswith("WITH ")
    quality_ctes = quality[len("WITH ") :]
    # strip the final SELECT: everything up to the last 'SELECT doc_id,'
    cut = quality_ctes.rindex("SELECT doc_id,")
    quality_ctes = quality_ctes[:cut].rstrip().rstrip(",")
    jac = (
        "CASE WHEN len(list_distinct(x.hs || y.hs)) > 0 "
        "THEN CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE) / len(list_distinct(x.hs || y.hs)) "
        "ELSE 0.0 END"
    )
    minhash_ctes = _SIG_CTE.replace("WITH ", "", 1).strip()
    return f"""
WITH RECURSIVE {quality_ctes},
qkeep AS (
  SELECT doc_id FROM j
  WHERE NOT (n_words < 5 OR top_word_frac > 0.30 OR dup_bigram_frac > 0.30
             OR punct_ratio > 0.30 OR mean_word_len > 12)
),
{minhash_ctes},
bandkeys AS ({_band_sql(4)}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandkeys a JOIN bandkeys b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
hs2 AS (SELECT doc_id, {_SHASH_SQL} AS hs FROM g),
verified AS (
  SELECT id_a, id_b
  FROM cand JOIN hs2 x ON x.doc_id = id_a JOIN hs2 y ON y.doc_id = id_b
  WHERE {jac} >= {_PIPE_DEDUP_THRESHOLD}
),
bi AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION ALL SELECT id_b, id_a FROM verified
),
walk(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT b.dst, w.lbl FROM walk w JOIN bi b ON b.src = w.id
),
canon AS (SELECT id AS doc_id FROM walk GROUP BY id HAVING MIN(lbl) = id),
{_kgram_shingle_hashes_sql(_DECON_K)},
bench AS (
  SELECT DISTINCT unnest(hs) AS sh FROM hs_documents
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = '{_BENCH_SOURCE}')
),
overlap2 AS (
  SELECT d.doc_id, COUNT(*) AS n_overlap
  FROM (SELECT doc_id, unnest(hs) AS sh FROM hs_documents) d
  JOIN bench b ON d.sh = b.sh
  GROUP BY d.doc_id
),
clean AS (
  SELECT h.doc_id FROM hs_documents h
  LEFT JOIN overlap2 o ON o.doc_id = h.doc_id
  WHERE COALESCE(o.n_overlap, 0) = 0
),
counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
m AS (SELECT MIN(n) AS n_min FROM counts),
tkeep AS (
  SELECT d.doc_id
  FROM documents d JOIN counts c ON c.source = d.source CROSS JOIN m
  WHERE ({_TEMP_BUCKET_SQL}) * ({_TEMP_BUCKET_SQL}) * c.n < m.n_min * {_TEMP_B2}
),
survivors AS (
  SELECT d.doc_id, d.source,
         CAST(len(regexp_extract_all(d.text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens
  FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM qkeep)
    AND d.doc_id IN (SELECT doc_id FROM canon)
    AND d.doc_id IN (SELECT doc_id FROM clean)
    AND d.doc_id IN (SELECT doc_id FROM tkeep)
),
packed AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM survivors
)
SELECT doc_id, source, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST((cum - n_tokens) // {_BUDGET} AS BIGINT) AS seq_id
FROM packed
"""


@register(
    "curation_pipeline_documents",
    oracle=_curation_pipeline_oracle(),
    doc="end-to-end curation: quality rules AND dedup-canonical AND decontaminated AND temperature-sampled, survivors packed into 128-token sequences — the corpus scanned/tokenized/shingled ONCE into a persisted narrow base shared by all four signals",
)
def curation_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.curation_pipeline(
        _docs(spark, sf_dir),
        bench_source=_BENCH_SOURCE,
        dedup_k=2,
        dedup_threshold=_PIPE_DEDUP_THRESHOLD,
        decon_k=_DECON_K,
        budget=_BUDGET,
    )


# ---------------------------------------------------------------------------
# Exactly-k per-stratum deterministic sample (distributed reservoir
# sampling with a portable md5 coin)
# ---------------------------------------------------------------------------
def _exact_k_oracle() -> str:
    from github_etl_pipeline_spark.operators.sampling import BUCKETS, SAMPLE_SEED

    return f"""
WITH b AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('{SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {BUCKETS} AS bkt
  FROM documents
),
r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY bkt ASC, doc_id ASC) AS sample_rank
  FROM b
)
SELECT source, sample_rank, doc_id FROM r WHERE sample_rank <= 10
"""


@register(
    "exact_k_sample_documents",
    oracle=_exact_k_oracle(),
    doc="exactly-k (k=10) deterministic sample per source: md5-bucket ranking = distributed reservoir sampling; WindowGroupLimit keeps per-map state at k rows per stratum",
)
def exact_k_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_etl_pipeline_spark.operators.sampling import exact_k_per_stratum

    return exact_k_per_stratum(read_table(spark, sf_dir, "documents"), k=10).select(
        "source", "sample_rank", "doc_id"
    )


# ---------------------------------------------------------------------------
# Cross-source contamination matrix: exact word-bigram Jaccard per source
# pair (the corpus-level companion of decontaminate)
# ---------------------------------------------------------------------------
@register(
    "source_overlap_documents",
    oracle=f"""
WITH t AS (SELECT source, regexp_extract_all(text, '{TOKEN_RE}') AS toks FROM documents),
sh AS (
  SELECT source,
         CASE WHEN len(toks) >= 2
              THEN list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))
              WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
              ELSE [] END AS sh
  FROM t
),
sg AS (
  SELECT DISTINCT source AS src,
         CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS gh
  FROM (SELECT source, unnest(sh) AS s FROM sh)
),
n AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM sg GROUP BY src),
p AS (
  SELECT a.src AS source_a, b.src AS source_b, CAST(COUNT(*) AS BIGINT) AS common_grams
  FROM sg a JOIN sg b ON a.gh = b.gh AND a.src < b.src
  GROUP BY 1, 2
)
SELECT source_a, source_b, common_grams,
       na.n + nb.n - common_grams AS union_grams,
       CAST(common_grams AS DOUBLE) / (na.n + nb.n - common_grams) AS jaccard
FROM p JOIN n na ON na.src = source_a JOIN n nb ON nb.src = source_b
""",
    doc="cross-source contamination matrix: exact word-bigram Jaccard for every source pair sharing a shingle — corpus reduces to the distinct (source, gram-hash) index first, pairwise fan-out bounded by #sources per gram, documents never join",
)
def source_overlap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.source_overlap_matrix(_docs(spark, sf_dir))
