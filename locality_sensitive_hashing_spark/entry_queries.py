"""Driver-harness query registry: Spark queries + DuckDB oracle SQL.

Each SQL-expressible operator from SURVEY.md section 2 gets a
``queries()`` entry (Spark DataFrame) and a matching ``oracle_sql()``
entry (ANSI/DuckDB SQL over the driver's pre-registered parquet views).
Column names and rounding are aligned on both sides because the driver's
compare hashes values after sorting columns by name
(``__spark_entry__.py`` contract).

UDF-backed and iterative operators (MinHash/SimHash signatures, winnowed
suffix-array, audio verify, full pipeline) cannot be expressed in DuckDB
SQL at identical hash families, so they register as rows-only checks --
EXCEPT clustering: ``sql_dedup_clusters`` cross-checks the Spark
connected-components operator against a DuckDB recursive-CTE transitive
closure over a pure-SQL candidate graph, which pins O21's semantics to an
independent engine.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
from locality_sensitive_hashing_spark.functions import text as TX
from locality_sensitive_hashing_spark.sources.tables import read_testdata

# ---------------------------------------------------------------------------
# shared SQL fragments (kept in one place so Spark & DuckDB stay in sync)
# ---------------------------------------------------------------------------

NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
SHINGLE_K = CFG.shingle_k
WORD_N = 3
BLOCK_CAP = CFG.bucket_cap
FP_MOD = 1_000_000_007

_EN = ", ".join(f"'{w}'" for w in TX.EN_STOPWORDS)
_ES = ", ".join(f"'{w}'" for w in TX.ES_STOPWORDS)


def _docs_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_testdata(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars", TX.normalize_text("text").alias("norm")
    )


# ---------------------------------------------------------------------------
# SQL-checked queries (Spark side)
# ---------------------------------------------------------------------------

def q_normalize(spark, sf_dir):
    """O2 text normalization."""
    return _docs_norm(spark, sf_dir).select("doc_id", "norm")


def q_shingle_explode(spark, sf_dir):
    """O3-O5 k-shingling: distinct char k-grams per doc (string form)."""
    return (
        _docs_norm(spark, sf_dir)
        .select("doc_id", F.explode(TX.char_shingles("norm", SHINGLE_K)).alias("shingle"))
        .distinct()
    )


def q_shingle_counts(spark, sf_dir):
    """O5 distinct-shingle-set size per document."""
    return (
        _docs_norm(spark, sf_dir)
        .select(
            "doc_id",
            F.size(F.array_distinct(TX.char_shingles("norm", SHINGLE_K))).alias(
                "n_shingles"
            ),
        )
    )


def _word_blocks(spark, sf_dir) -> DataFrame:
    """(doc_id, wshingle) distinct word 3-gram blocking table."""
    return (
        _docs_norm(spark, sf_dir)
        .select("doc_id", F.explode(TX.word_shingles("norm", WORD_N)).alias("wshingle"))
        .distinct()
    )


def q_word_shingles(spark, sf_dir):
    """O3 word-shingle variant (reference `shingle_type` word-n)."""
    return _word_blocks(spark, sf_dir)


def q_bucket_sizes(spark, sf_dir):
    """O8 groupBy-bucket: shared word-3gram block sizes (>1 member)."""
    return (
        _word_blocks(spark, sf_dir)
        .groupBy("wshingle")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


def _candidate_pairs(spark, sf_dir) -> DataFrame:
    """O9-O10 + O25: blocked self-join with the bucket cap, pure SQL form."""
    blocks = _word_blocks(spark, sf_dir)
    sizes = blocks.groupBy("wshingle").agg(F.count("*").alias("n"))
    elig = sizes.where((F.col("n") > 1) & (F.col("n") <= BLOCK_CAP)).select("wshingle")
    pruned = blocks.join(elig, "wshingle")
    l = pruned.select("wshingle", F.col("doc_id").alias("id1"))
    r = pruned.select("wshingle", F.col("doc_id").alias("id2"))
    return (
        l.join(r, "wshingle").where(F.col("id1") < F.col("id2"))
        .select("id1", "id2").distinct()
    )


def q_candidate_pairs(spark, sf_dir):
    return _candidate_pairs(spark, sf_dir)


def q_pair_jaccard_topk(spark, sf_dir):
    """O11 + O28: exact token-set Jaccard on blocked pairs, top-20 report."""
    toks = (
        _docs_norm(spark, sf_dir)
        .select("doc_id", F.explode(F.split("norm", " ")).alias("tok"))
        .distinct()
    )
    cnt = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    pairs = _candidate_pairs(spark, sf_dir)
    t1 = toks.select(F.col("doc_id").alias("id1"), "tok")
    t2 = toks.select(F.col("doc_id").alias("id2"), "tok")
    shared = (
        pairs.join(t1, "id1").join(t2, ["id2", "tok"])
        .groupBy("id1", "id2").agg(F.count("*").alias("shared"))
    )
    c1 = cnt.select(F.col("doc_id").alias("id1"), F.col("n_tok").alias("n1"))
    c2 = cnt.select(F.col("doc_id").alias("id2"), F.col("n_tok").alias("n2"))
    j = (
        shared.join(c1, "id1").join(c2, "id2")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")), 6),
        )
        .select("id1", "id2", "jaccard")
    )
    return j.orderBy(F.desc("jaccard"), "id1", "id2").limit(20)


def q_exact_dedup(spark, sf_dir):
    """Exact dedup via md5 hash-groupBy on a corpus with planted exact
    copies (documents unioned with itself)."""
    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionAll(docs)
    return (
        doubled.groupBy(F.md5("text").alias("h"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("min_doc"))
        .where(F.col("n_copies") > 1)
    )


def q_lang_id_counts(spark, sf_dir):
    """Language-ID heuristic distribution (training-data text analysis)."""
    return (
        read_testdata(spark, sf_dir, "documents")
        .select(TX.lang_id("text").alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count("*").alias("n_docs"))
    )


def q_quality_scores(spark, sf_dir):
    return (
        read_testdata(spark, sf_dir, "documents")
        .select("doc_id", TX.quality_score("text").alias("q"))
    )


def q_token_counts(spark, sf_dir):
    return (
        read_testdata(spark, sf_dir, "documents")
        .select("doc_id", TX.token_count("text").alias("n_tokens"))
    )


def q_doc_fingerprints(spark, sf_dir):
    return (
        _docs_norm(spark, sf_dir)
        .select("doc_id", TX.doc_fingerprint("norm", FP_MOD).alias("fingerprint"))
    )


def q_embedding_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-20 pairs (ANN baseline) -- JVM-side
    zip_with/aggregate dot products, no UDF."""
    emb = (
        read_testdata(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 120)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    e1 = emb.select(F.col("vec_id").alias("id1"), F.col("v").alias("v1"))
    e2 = emb.select(F.col("vec_id").alias("id2"), F.col("v").alias("v2"))
    dot = F.aggregate(
        F.zip_with("v1", "v2", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return (
        e1.crossJoin(e2)
        .where(F.col("id1") < F.col("id2"))
        .withColumn("cosine", F.round(dot / (nrm(F.col("v1")) * nrm(F.col("v2"))), 6))
        .select("id1", "id2", "cosine")
        .orderBy(F.desc("cosine"), "id1", "id2")
        .limit(20)
    )


def q_events_type_agg(spark, sf_dir):
    """Generic aggregation parity over the events table."""
    return (
        read_testdata(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


def q_top_docs_per_lang(spark, sf_dir):
    """Window-function parity: top-3 longest docs per lang (O25-style
    deterministic rank capping)."""
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    return (
        read_testdata(spark, sf_dir, "documents")
        .select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


def _sql_edges_subquery() -> str:
    """Shared SQL: candidate pairs with token-Jaccard >= threshold."""
    return f"""
norm AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
toks AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS tok FROM norm),
tcnt AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id),
words AS (SELECT doc_id, norm, unnest(generate_series(1, greatest(len(string_split(norm,' ')) - {WORD_N - 1}, 0))) AS i FROM norm),
blocks AS (SELECT DISTINCT doc_id, array_to_string(list_slice(string_split(norm, ' '), i, i + {WORD_N - 1}), ' ') AS wshingle FROM words),
sizes AS (SELECT wshingle, count(*) AS n FROM blocks GROUP BY wshingle),
elig AS (SELECT wshingle FROM sizes WHERE n > 1 AND n <= {BLOCK_CAP}),
pruned AS (SELECT b.doc_id, b.wshingle FROM blocks b JOIN elig e USING (wshingle)),
cand AS (SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
         FROM pruned l JOIN pruned r USING (wshingle) WHERE l.doc_id < r.doc_id),
shared AS (SELECT c.id1, c.id2, count(*) AS shared
           FROM cand c JOIN toks t1 ON t1.doc_id = c.id1
                        JOIN toks t2 ON t2.doc_id = c.id2 AND t2.tok = t1.tok
           GROUP BY c.id1, c.id2),
edges AS (SELECT s.id1, s.id2
          FROM shared s JOIN tcnt c1 ON c1.doc_id = s.id1
                        JOIN tcnt c2 ON c2.doc_id = s.id2
          WHERE s.shared * 1.0 / (c1.n_tok + c2.n_tok - s.shared) >= {CFG.jaccard_threshold})
"""


def q_sql_dedup_clusters(spark, sf_dir):
    """Mini dedup end-to-end in pure relational form: word-3gram blocking
    -> capped candidate join -> exact token-Jaccard verify -> Spark
    connected-components (O21). The DuckDB oracle replays the same graph
    with a recursive-CTE transitive closure, independently pinning the
    min-label clustering semantics."""
    from locality_sensitive_hashing_spark.operators.connected_components import (
        connected_components,
    )

    docs = _docs_norm(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("norm", " ")).alias("tok")).distinct()
    cnt = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    pairs = _candidate_pairs(spark, sf_dir)
    t1 = toks.select(F.col("doc_id").alias("id1"), "tok")
    t2 = toks.select(F.col("doc_id").alias("id2"), "tok")
    shared = (
        pairs.join(t1, "id1").join(t2, ["id2", "tok"])
        .groupBy("id1", "id2").agg(F.count("*").alias("shared"))
    )
    c1 = cnt.select(F.col("doc_id").alias("id1"), F.col("n_tok").alias("n1"))
    c2 = cnt.select(F.col("doc_id").alias("id2"), F.col("n_tok").alias("n2"))
    edges = (
        shared.join(c1, "id1").join(c2, "id2")
        .where(
            F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared"))
            >= CFG.jaccard_threshold
        )
        .select(
            F.lpad(F.col("id1").cast("string"), 8, "0").alias("id1"),
            F.lpad(F.col("id2").cast("string"), 8, "0").alias("id2"),
        )
    )
    nodes = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("clip_id")
    )
    out = connected_components(edges, nodes, CFG)
    return out.select(
        F.col("clip_id").alias("doc_key"), F.col("cluster_id").alias("cluster_key")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

ORACLE_SQL: dict[str, str] = {
    "normalize_transcripts": f"SELECT doc_id, {NORM_SQL} AS norm FROM documents",
    "shingle_explode": f"""
WITH n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
pos AS (SELECT doc_id, norm, unnest(generate_series(1, greatest(length(norm)-{SHINGLE_K - 1}, 0))) AS i FROM n)
SELECT DISTINCT doc_id, substring(norm, i, {SHINGLE_K}) AS shingle FROM pos
""",
    "shingle_counts": f"""
WITH n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
pos AS (SELECT doc_id, norm, unnest(generate_series(1, greatest(length(norm)-{SHINGLE_K - 1}, 0))) AS i FROM n),
s AS (SELECT DISTINCT doc_id, substring(norm, i, {SHINGLE_K}) AS shingle FROM pos)
SELECT d.doc_id, CAST(coalesce(c.n, 0) AS INT) AS n_shingles
FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id) c USING (doc_id)
""",
    "word_shingles": f"""
WITH n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
w AS (SELECT doc_id, norm, unnest(generate_series(1, greatest(len(string_split(norm,' ')) - {WORD_N - 1}, 0))) AS i FROM n)
SELECT DISTINCT doc_id, array_to_string(list_slice(string_split(norm, ' '), i, i + {WORD_N - 1}), ' ') AS wshingle FROM w
""",
    "bucket_sizes": f"""
WITH n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
w AS (SELECT doc_id, norm, unnest(generate_series(1, greatest(len(string_split(norm,' ')) - {WORD_N - 1}, 0))) AS i FROM n),
blocks AS (SELECT DISTINCT doc_id, array_to_string(list_slice(string_split(norm, ' '), i, i + {WORD_N - 1}), ' ') AS wshingle FROM w)
SELECT wshingle, count(*) AS n_docs FROM blocks GROUP BY wshingle HAVING count(*) > 1
""",
    "candidate_pairs": f"""
WITH n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
w AS (SELECT doc_id, norm, unnest(generate_series(1, greatest(len(string_split(norm,' ')) - {WORD_N - 1}, 0))) AS i FROM n),
blocks AS (SELECT DISTINCT doc_id, array_to_string(list_slice(string_split(norm, ' '), i, i + {WORD_N - 1}), ' ') AS wshingle FROM w),
sizes AS (SELECT wshingle, count(*) AS n FROM blocks GROUP BY wshingle),
elig AS (SELECT wshingle FROM sizes WHERE n > 1 AND n <= {BLOCK_CAP}),
pruned AS (SELECT b.doc_id, b.wshingle FROM blocks b JOIN elig e USING (wshingle))
SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
FROM pruned l JOIN pruned r USING (wshingle) WHERE l.doc_id < r.doc_id
""",
    "pair_jaccard_topk": f"""
WITH norm AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
toks AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS tok FROM norm),
tcnt AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id),
words AS (SELECT doc_id, norm, unnest(generate_series(1, greatest(len(string_split(norm,' ')) - {WORD_N - 1}, 0))) AS i FROM norm),
blocks AS (SELECT DISTINCT doc_id, array_to_string(list_slice(string_split(norm, ' '), i, i + {WORD_N - 1}), ' ') AS wshingle FROM words),
sizes AS (SELECT wshingle, count(*) AS n FROM blocks GROUP BY wshingle),
elig AS (SELECT wshingle FROM sizes WHERE n > 1 AND n <= {BLOCK_CAP}),
pruned AS (SELECT b.doc_id, b.wshingle FROM blocks b JOIN elig e USING (wshingle)),
cand AS (SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
         FROM pruned l JOIN pruned r USING (wshingle) WHERE l.doc_id < r.doc_id),
shared AS (SELECT c.id1, c.id2, count(*) AS shared
           FROM cand c JOIN toks t1 ON t1.doc_id = c.id1
                        JOIN toks t2 ON t2.doc_id = c.id2 AND t2.tok = t1.tok
           GROUP BY c.id1, c.id2)
SELECT s.id1, s.id2,
       round(s.shared * 1.0 / (c1.n_tok + c2.n_tok - s.shared), 6) AS jaccard
FROM shared s JOIN tcnt c1 ON c1.doc_id = s.id1 JOIN tcnt c2 ON c2.doc_id = s.id2
ORDER BY jaccard DESC, s.id1, s.id2 LIMIT 20
""",
    "exact_dedup": """
WITH doubled AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM documents)
SELECT md5(text) AS h, count(*) AS n_copies, min(doc_id) AS min_doc
FROM doubled GROUP BY md5(text) HAVING count(*) > 1
""",
    "lang_id_counts": f"""
WITH n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
r AS (SELECT doc_id,
        CASE WHEN len(string_split(norm,' ')) > 0 AND norm <> ''
             THEN len(list_filter(string_split(norm,' '), t -> t IN ({_EN}))) * 1.0 / len(string_split(norm,' '))
             ELSE 0.0 END AS en,
        CASE WHEN len(string_split(norm,' ')) > 0 AND norm <> ''
             THEN len(list_filter(string_split(norm,' '), t -> t IN ({_ES}))) * 1.0 / len(string_split(norm,' '))
             ELSE 0.0 END AS es
      FROM n)
SELECT CASE WHEN en >= es AND en > 0.05 THEN 'en'
            WHEN es > en AND es > 0.05 THEN 'es'
            ELSE 'unknown' END AS lang_guess,
       count(*) AS n_docs
FROM r GROUP BY 1
""",
    "quality_scores": f"""
WITH n AS (SELECT doc_id, text, {NORM_SQL} AS norm FROM documents),
parts AS (SELECT doc_id,
    length(text) AS n_chars,
    CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) * 1.0 / length(text) ELSE 0.0 END AS alpha_ratio,
    CASE WHEN norm <> '' THEN len(list_filter(string_split(norm,' '), t -> t IN ({_EN}))) * 1.0 / len(string_split(norm,' ')) ELSE 0.0 END AS sw
  FROM n)
SELECT doc_id,
  CAST(floor((0.4 * least(1.0, n_chars / 500.0) + 0.3 * alpha_ratio + 0.3 * least(1.0, sw * 5.0)) * 1e6) AS BIGINT) AS q
FROM parts
""",
    "token_counts": f"""
WITH n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents)
SELECT doc_id, CAST(len(string_split(norm, ' ')) AS INT) AS n_tokens FROM n
""",
    "doc_fingerprints": f"""
WITH n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
pos AS (SELECT doc_id, norm, unnest(generate_series(1, length(norm))) AS i FROM n),
s AS (SELECT doc_id, sum(CAST(ascii(substring(norm, i, 1)) AS BIGINT) * i) % {FP_MOD} AS fp FROM pos GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(s.fp, 0) AS BIGINT) AS fingerprint
FROM documents d LEFT JOIN s USING (doc_id)
""",
    "embedding_cosine_topk": """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 120),
u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v, generate_subscripts(embedding, 1) AS i FROM e),
dots AS (SELECT a.vec_id AS id1, b.vec_id AS id2, sum(a.v * b.v) AS dot
         FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
         GROUP BY a.vec_id, b.vec_id),
nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nv FROM u GROUP BY vec_id)
SELECT d.id1, d.id2, round(d.dot / (n1.nv * n2.nv), 6) AS cosine
FROM dots d JOIN nrm n1 ON n1.vec_id = d.id1 JOIN nrm n2 ON n2.vec_id = d.id2
ORDER BY cosine DESC, d.id1, d.id2 LIMIT 20
""",
    "events_type_agg": """
SELECT event_type, count(*) AS n_events, round(avg(value), 4) AS avg_value,
       round(min(value), 6) AS min_value, round(max(value), 6) AS max_value
FROM events GROUP BY event_type
""",
    "top_docs_per_lang": """
WITH r AS (SELECT lang, doc_id, n_chars,
           row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents)
SELECT lang, doc_id, n_chars, CAST(rn AS INT) AS rn FROM r WHERE rn <= 3
""",
    "ann_topk_per_query": """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 60),
u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v, generate_subscripts(embedding, 1) AS i FROM e),
nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nv FROM u GROUP BY vec_id),
dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
         FROM u a JOIN u b ON a.i = b.i AND a.vec_id <> b.vec_id
         GROUP BY a.vec_id, b.vec_id),
scored AS (SELECT d.query_id, d.neighbor_id, d.dot / (n1.nv * n2.nv) AS c
           FROM dots d JOIN nrm n1 ON n1.vec_id = d.query_id
                        JOIN nrm n2 ON n2.vec_id = d.neighbor_id),
ranked AS (SELECT query_id, neighbor_id, round(c, 6) AS cosine,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
           FROM scored)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
""",
    "sql_dedup_clusters": f"""
WITH RECURSIVE {_sql_edges_subquery().lstrip()},
keyed AS (SELECT lpad(CAST(id1 AS VARCHAR), 8, '0') AS id1,
                 lpad(CAST(id2 AS VARCHAR), 8, '0') AS id2 FROM edges),
sym AS (SELECT id1 AS src, id2 AS dst FROM keyed
        UNION SELECT id2, id1 FROM keyed),
nodes AS (SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS node FROM documents),
reach(node, lbl) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
)
SELECT node AS doc_key, min(lbl) AS cluster_key FROM reach GROUP BY node
""",
}


# ---------------------------------------------------------------------------
# rows-only queries (UDF/hash-family/iterative -- no cross-engine SQL)
# ---------------------------------------------------------------------------

def _docs_as_corpus(spark, sf_dir) -> DataFrame:
    """documents re-keyed to the clips contract (clip_id, transcript)."""
    return read_testdata(spark, sf_dir, "documents").select(
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("clip_id"),
        F.col("text").alias("transcript"),
    )


def q_minhash_signatures(spark, sf_dir):
    """O6: MinHash signatures over documents-as-corpus (rows-only)."""
    from locality_sensitive_hashing_spark.operators.minhash import with_signatures

    return with_signatures(_docs_as_corpus(spark, sf_dir), CFG).select(
        "clip_id", "sig"
    )


def q_minhash_candidates(spark, sf_dir):
    """O7-O10: banded-LSH candidate pairs over documents (rows-only)."""
    from locality_sensitive_hashing_spark.operators.candidates import pairs_from_blocks
    from locality_sensitive_hashing_spark.operators.minhash import (
        explode_bands,
        with_signatures,
    )

    sigs = with_signatures(_docs_as_corpus(spark, sf_dir), CFG)
    return pairs_from_blocks(
        explode_bands(sigs), ["band_id", "band_hash"], CFG.bucket_cap, "minhash"
    )


def q_simhash_fingerprints(spark, sf_dir):
    from locality_sensitive_hashing_spark.operators.simhash import with_fingerprint

    return with_fingerprint(_docs_as_corpus(spark, sf_dir))


def q_simhash_candidates(spark, sf_dir):
    from locality_sensitive_hashing_spark.operators.simhash import (
        simhash_candidates,
        with_fingerprint,
    )

    return simhash_candidates(with_fingerprint(_docs_as_corpus(spark, sf_dir)), CFG)


def q_sa_candidates(spark, sf_dir):
    from locality_sensitive_hashing_spark.operators.minhash import with_signatures
    from locality_sensitive_hashing_spark.operators.suffix_array import sa_candidates

    sigs = with_signatures(_docs_as_corpus(spark, sf_dir), CFG)
    return sa_candidates(sigs, CFG)


def q_full_pipeline_clusters(spark, sf_dir):
    """Flagship: full audio+transcript dedup pipeline (rows-only; the
    fixture-parity pytest suite is its bit-exact correctness gate)."""
    return run_flagship(spark, sf_dir)


def q_ann_topk_per_query(spark, sf_dir):
    """Exact cosine top-3 per query vector (brute-force ANN baseline) --
    SQL-checked against a DuckDB window-rank replica."""
    from locality_sensitive_hashing_spark.operators.ann import brute_force_topk

    emb = read_testdata(spark, sf_dir, "embeddings").where(F.col("vec_id") < 60)
    return brute_force_topk(emb, k=3)


def q_ann_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH approximate top-3 (rows-only: seeded hyperplanes
    aren't SQL-reproducible; recall-vs-brute-force is pytest-gated)."""
    from locality_sensitive_hashing_spark.operators.ann import lsh_ann_topk

    emb = read_testdata(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    return lsh_ann_topk(emb, k=3, n_planes=16, bands=4, seed=CFG.seed)


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs via LSH buckets (rows-only)."""
    from locality_sensitive_hashing_spark.operators.ann import (
        embedding_near_dup_pairs,
    )

    emb = read_testdata(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.9, seed=CFG.seed)


def q_audio_features(spark, sf_dir):
    """Real multimodal decode: per-clip audio features over clips derived
    from the documents table (rows-only -- audio synthesis + WAV decode
    are not SQL)."""
    from locality_sensitive_hashing_spark.fixtures import clips_from_documents
    from locality_sensitive_hashing_spark.operators.multimodal import audio_features
    from locality_sensitive_hashing_spark.sources.tables import CLIPS_SCHEMA

    docs = (
        read_testdata(spark, sf_dir, "documents")
        .select("doc_id", "text").limit(200).toPandas()
    )
    clips = spark.createDataFrame(
        clips_from_documents(docs, seed=CFG.seed), schema=CLIPS_SCHEMA
    )
    return audio_features(clips)


QUERIES_SQL_CHECKED = {
    "normalize_transcripts": q_normalize,
    "shingle_explode": q_shingle_explode,
    "shingle_counts": q_shingle_counts,
    "word_shingles": q_word_shingles,
    "bucket_sizes": q_bucket_sizes,
    "candidate_pairs": q_candidate_pairs,
    "pair_jaccard_topk": q_pair_jaccard_topk,
    "exact_dedup": q_exact_dedup,
    "lang_id_counts": q_lang_id_counts,
    "quality_scores": q_quality_scores,
    "token_counts": q_token_counts,
    "doc_fingerprints": q_doc_fingerprints,
    "embedding_cosine_topk": q_embedding_cosine_topk,
    "events_type_agg": q_events_type_agg,
    "top_docs_per_lang": q_top_docs_per_lang,
    "sql_dedup_clusters": q_sql_dedup_clusters,
    "ann_topk_per_query": q_ann_topk_per_query,
}

QUERIES_ROWS_ONLY = {
    "minhash_signatures": q_minhash_signatures,
    "minhash_candidates": q_minhash_candidates,
    "simhash_fingerprints": q_simhash_fingerprints,
    "simhash_candidates": q_simhash_candidates,
    "sa_substring_candidates": q_sa_candidates,
    "full_pipeline_clusters": q_full_pipeline_clusters,
    "ann_lsh_topk": q_ann_lsh_topk,
    "embedding_near_dups": q_embedding_near_dups,
    "audio_features": q_audio_features,
}


def all_queries():
    return {**QUERIES_SQL_CHECKED, **QUERIES_ROWS_ONLY}


# ---------------------------------------------------------------------------
# flagship entry
# ---------------------------------------------------------------------------

def run_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup pipeline over clips synthesized from the driver's
    documents table (audio tones + transcripts, deterministic planted
    variants), committed to a temp TableIO dir; returns cluster
    assignments."""
    from locality_sensitive_hashing_spark.fixtures import clips_from_documents
    from locality_sensitive_hashing_spark.plans.pipeline import DedupPipeline
    from locality_sensitive_hashing_spark.sources.tables import CLIPS_SCHEMA, TableIO

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    clips_pd = clips_from_documents(docs, seed=CFG.seed, plant_dups=True)
    clips = spark.createDataFrame(clips_pd, schema=CLIPS_SCHEMA)
    tmp = tempfile.mkdtemp(prefix="lsh_flagship_")
    io = TableIO(spark, tmp)
    pipe = DedupPipeline(spark, CFG, io, run_id="flagship")
    return pipe.run(clips)
