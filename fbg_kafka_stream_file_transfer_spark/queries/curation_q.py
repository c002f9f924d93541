"""Curation additions (rounds 5-6): semantic (SemDeDup-shaped) dedup,
PII redaction, split assignment, embedding QA, paragraph-level dedup.

Registry order is driver-contract (the gate certifies the first 50
entries) but is now computed from certification staleness in
queries/__init__.py — new queries here are never-certified and sort to
the front of the next round's window automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import dedup
from ..sources.tables import load_table
from .base import Q
from .similarity_q import COS_SQL, bucket_sql

QUERIES: dict[str, Q] = {}


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs with the blocking key derived from the
    embedding itself (LSH bucket) — no external label or cluster id.
    The 100 TB shape: one equi-join shuffle on the bucket key, pair
    work bounded per bucket."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.semantic_near_dup_pairs(emb, "vec_id", "embedding", 0.4, planes=4)


_cos_ab = COS_SQL.format(a="a.v", b="b.v")

QUERIES["dedup_semantic_lsh"] = Q(
    _q_semantic_dedup,
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {bucket_sql('v')} AS bucket FROM e)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_cos_ab}, 6) AS cosine_sim,
       a.bucket
FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({_cos_ab}, 6) >= 0.4
""",
    doc="SemDeDup-shaped semantic dedup: LSH-bucket blocking + in-bucket cosine",
)


#: deterministic PII salt appended to every document so the redaction
#: pass has guaranteed hits to scrub (the corpus itself is synthetic);
#: mirrored 1:1 in the oracle SQL below
def _salted(text, doc_id):
    return F.concat(
        text,
        F.lit(" contact user"),
        doc_id.cast("string"),
        F.lit("@example.com at 10.0."),
        (doc_id % 256).cast("string"),
        F.lit(".7 tel +1 555-123-4567"),
    )


def _q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: emails / IPv4s / phone-like runs →
    typed placeholders. Map-side regexp_replace chain, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    s = _salted(F.col("text"), F.col("doc_id"))
    r = TX.redact_pii(s)
    return d.select(
        "doc_id",
        F.md5(r).alias("redacted_md5"),
        (F.length(s) - F.length(r)).cast("bigint").alias("len_delta"),
    )


def _pii_sql(col: str) -> str:
    """DuckDB mirror of functions.text.redact_pii, generated from the
    SAME pattern list (replacement syntax translated $N -> \\N)."""
    out = col
    for pat, repl in TX.PII_PATTERNS:
        duck_repl = repl.replace("$", "\\")
        out = f"regexp_replace({out}, '{pat}', '{duck_repl}', 'g')"
    return out


def _q_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by doc_id hash, summarized
    per (split, lang) — the reproducible partition a training run and
    its eval harness must agree on."""
    from ..operators.sampling import assign_splits

    d = load_table(spark, sf_dir, "documents")
    return (
        assign_splits(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


_BUCKET = "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000)"

QUERIES["sample_split_assignment"] = Q(
    _q_splits,
    f"""
WITH b AS (
  SELECT lang, n_chars,
         CASE WHEN {_BUCKET} < 8000 THEN 'train'
              WHEN {_BUCKET} < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang, count(*) AS n_docs, sum(n_chars) AS total_chars
FROM b GROUP BY 1, 2
""",
    doc="deterministic 80/10/10 train/val/test split by portable key hash",
)


def _q_profile_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan embedding-table QA (dim consistency, norm stats,
    zero-norm count) — the gate before any ANN or semantic-dedup job."""
    from ..operators.profile import profile_embeddings

    return profile_embeddings(load_table(spark, sf_dir, "embeddings"), "embedding")


QUERIES["profile_embeddings"] = Q(
    _q_profile_emb,
    """
WITH per AS (
  SELECT len(embedding) AS dim,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT count(*) AS n_vectors,
       CAST(sum(CASE WHEN dim IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT dim) AS BIGINT) AS n_dims,
       CAST(min(dim) AS INTEGER) AS dim_min,
       CAST(max(dim) AS INTEGER) AS dim_max,
       CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
       round(min(nrm), 6) AS norm_min,
       round(avg(nrm), 6) AS norm_mean,
       round(max(nrm), 6) AS norm_max
FROM per
""",
    doc="embedding-table QA profile (one scan): dims, zero norms, norm stats",
)


QUERIES["text_redact_pii"] = Q(
    _q_redact_pii,
    f"""
WITH s AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com at 10.0.' ||
         (doc_id % 256) || '.7 tel +1 555-123-4567' AS salted
  FROM documents
), r AS (SELECT doc_id, salted, {_pii_sql('salted')} AS red FROM s)
SELECT doc_id, md5(red) AS redacted_md5,
       CAST(len(salted) - len(red) AS BIGINT) AS len_delta
FROM r
""",
    doc="PII redaction (email/IPv4/phone -> typed placeholders), pure regex chain",
)


def _q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity dedup roll-up (CCNet/Dolma-style): the
    synthetic corpus has no newline structure, so paragraphs are
    16-token non-overlapping windows over the normalized text."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.paragraph_dedup_stats(d, "doc_id", "text", window_tokens=16)


# norm/toks CTEs shared with the dedup oracles (dedup_q.NORM_CTE)
from .dedup_q import NORM_CTE  # noqa: E402

QUERIES["dedup_paragraph_rollup"] = Q(
    _q_paragraph_dedup,
    NORM_CTE
    + """, idx AS (
  SELECT doc_id, t,
         unnest(range(CAST(greatest(ceil(len(t) / 16.0), 1) AS BIGINT))) AS i
  FROM toks
), paras AS (
  SELECT doc_id,
         md5(array_to_string(t[(i*16+1):((i+1)*16)], ' ')) AS fp
  FROM idx
), fpc AS (
  SELECT fp, count(DISTINCT doc_id) AS ndocs FROM paras GROUP BY fp
)
SELECT p.doc_id,
       count(*) AS n_paragraphs,
       CAST(sum(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_paragraphs,
       round(CAST(sum(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS dup_paragraph_ratio
FROM paras p JOIN fpc f USING (fp)
GROUP BY p.doc_id
""",
    doc="paragraph-level dedup roll-up: dup-paragraph fraction per document",
)
