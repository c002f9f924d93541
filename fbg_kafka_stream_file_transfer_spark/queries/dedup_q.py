"""Deduplication queries (SURVEY §2.h): exact, fingerprint, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine — each oracle-checked.

The DuckDB oracles mirror the operators' md5-hex portable hashing, so
signatures and buckets match bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..operators.dedup import simhash_bit_contrib_sql
from ..sources.tables import load_table
from .base import Q

#: DuckDB mirror of functions.text.normalized_text → tokens → shingles(3).
NORM_CTE = """
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[.,!?;:''"()\\[\\]{}-]', '', 'g'), '\\s+', ' ', 'g')) AS nt
  FROM documents
), toks AS (
  SELECT doc_id, string_split(nt, ' ') AS t, nt FROM norm
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) - 2 <= 0 THEN [nt]
              ELSE list_distinct(list_transform(range(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS ss
  FROM toks
)
"""

_NUM_HASHES, _BANDS = 12, 4
_ROWS = _NUM_HASHES // _BANDS

_SIG_COLS = ",\n         ".join(
    f"list_min(list_transform(ss, s -> md5('{j}:' || s))) AS s{j}" for j in range(_NUM_HASHES)
)
_BAND_SELECTS = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band, md5("
    + " || '|' || ".join(f"s{b * _ROWS + r}" for r in range(_ROWS))
    + ") AS bucket FROM sig"
    for b in range(_BANDS)
)

LSH_CTE = (
    NORM_CTE
    + f""", sig AS (
  SELECT doc_id,
         {_SIG_COLS}
  FROM sh
), bands AS (
{_BAND_SELECTS}
)"""
)


def _q_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_groups(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.fingerprint_dedup_groups(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.7
    )


def _q_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidate_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, num_hashes=_NUM_HASHES, bands=_BANDS,
    )


def _q_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_dedup_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, num_hashes=_NUM_HASHES, bands=_BANDS, threshold=0.7,
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_table(load_table(spark, sf_dir, "documents"), "doc_id", "text", 16)


def _q_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS twin (applyInPandas GEMM per block): same round-6 contract
    as the Catalyst form, ~100× cheaper per pair — the sf1 stress run
    measured the interpreted fold at 280 s vs 3 s for this path; parity
    is unit-pinned (test_embedding_pairs_arrow_matches_catalyst)."""
    return dedup.embedding_near_dup_pairs_arrow(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        threshold=0.4, block_col="label",
    )


def _simhash_oracle(bits: int = 16) -> str:
    terms = []
    for b in range(bits):
        contrib = simhash_bit_contrib_sql("t", b)
        terms.append(
            f"(CASE WHEN list_sum(list_transform(td, t -> {contrib})) > 0 THEN 1 ELSE 0 END) * {2**b}"
        )
    total = "\n       + ".join(terms)
    return (
        NORM_CTE
        + f""", dtoks AS (
  SELECT doc_id, list_distinct(t) AS td FROM toks
)
SELECT doc_id,
       {total} AS simhash{bits}
FROM dtoks
"""
    )


QUERIES: dict[str, Q] = {
    "dedup_exact": Q(
        _q_exact,
        """
SELECT sha256(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS canonical_id
FROM documents GROUP BY 1
""",
        doc="exact content-hash dedup (reference SHA-256, goanywhere-config.md:160-165)",
    ),
    "dedup_fingerprint": Q(
        _q_fingerprint,
        NORM_CTE
        + """
SELECT md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fingerprint,
       count(*) AS n_docs, min(doc_id) AS canonical_id
FROM toks GROUP BY 1
""",
        doc="normalized token-set fingerprint dedup",
    ),
    "dedup_ngram_jaccard": Q(
        _q_jaccard,
        NORM_CTE
        + """
, ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
cnt AS (SELECT doc_id, len(ss) AS n_sh FROM sh),
pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter / (ca.n_sh + cb.n_sh - inter), 6) AS jaccard
FROM pair
JOIN cnt ca ON doc_a = ca.doc_id
JOIN cnt cb ON doc_b = cb.doc_id
WHERE inter / (ca.n_sh + cb.n_sh - inter) >= 0.7
""",
        doc="exact 3-gram shingle Jaccard pairs ≥ 0.7",
    ),
    "dedup_minhash_lsh_candidates": Q(
        _q_lsh,
        LSH_CTE
        + """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
""",
        doc="MinHash(12)+LSH(4 bands) candidate pairs — portable md5 hashing",
    ),
    "dedup_minhash_verified": Q(
        _q_minhash_verified,
        LSH_CTE
        + """
, cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
), verified AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.ss, sb.ss)) AS inter,
         len(sa.ss) + len(sb.ss) AS total
  FROM cands c
  JOIN sh sa ON c.doc_a = sa.doc_id
  JOIN sh sb ON c.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, round(inter / (total - inter), 6) AS jaccard
FROM verified WHERE inter / (total - inter) >= 0.7
""",
        doc="LSH candidates verified by exact Jaccard (the 100 TB near-dup path)",
    ),
    "dedup_simhash": Q(
        _q_simhash,
        _simhash_oracle(16),
        doc="16-bit SimHash signatures (portable md5-bit construction)",
    ),
    "dedup_embedding_cosine": Q(
        _q_embedding,
        """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
       AS cosine_sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) /
      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
""",
        doc="embedding-cosine near-dup pairs (label-blocked)",
    ),
}


def _q_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (MinHash verify ≥0.7) → transitive duplicate groups
    (connected components), summarized per component."""
    pairs = dedup.minhash_dedup_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, num_hashes=_NUM_HASHES, bands=_BANDS, threshold=0.7,
    )
    cc = dedup.duplicate_groups(pairs)
    return cc.groupBy("component").agg(
        F.count("*").alias("n_docs"),
        F.min("doc").alias("min_doc"),
        F.max("doc").alias("max_doc"),
    )


QUERIES["dedup_duplicate_groups"] = Q(
    _q_dup_groups,
    # the whole WITH chain must be declared RECURSIVE for the reach CTE
    LSH_CTE.replace("\nWITH norm AS", "\nWITH RECURSIVE norm AS", 1)
    + """
, cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
), verified AS (
  SELECT c.doc_a, c.doc_b
  FROM cands c
  JOIN sh sa ON c.doc_a = sa.doc_id
  JOIN sh sb ON c.doc_b = sb.doc_id
  WHERE len(list_intersect(sa.ss, sb.ss))
        / (len(sa.ss) + len(sb.ss) - len(list_intersect(sa.ss, sb.ss))) >= 0.7
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM verified
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM verified
), reach AS (
  SELECT DISTINCT src AS node, src AS label FROM edges
  UNION
  SELECT e.dst AS node, r.label
  FROM reach r JOIN edges e ON r.node = e.src
), cc AS (
  SELECT node, min(label) AS component FROM reach GROUP BY node
)
SELECT component, count(*) AS n_docs, min(node) AS min_doc, max(node) AS max_doc
FROM cc GROUP BY 1
""",
    doc="transitive dup groups: connected components over verified near-dup pairs",
)


def _q_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_dup_groups(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", 16
    )


# the group oracle wraps the signature oracle in a HAVING-count rollup
QUERIES["dedup_simhash_groups"] = Q(
    _q_simhash_groups,
    "WITH sigs AS (\n"
    + _simhash_oracle(16)
    + """
)
SELECT simhash16, count(*) AS n_docs, min(doc_id) AS canonical_id
FROM sigs GROUP BY 1 HAVING count(*) > 1
""",
    doc="SimHash near-dup buckets (groups sharing a 16-bit signature)",
)


def _q_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.prefix_dedup_groups(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=10
    )


QUERIES["dedup_prefix_groups"] = Q(
    _q_prefix_groups,
    NORM_CTE
    + """
SELECT md5(array_to_string(t[1:10], ' ')) AS prefix_hash,
       count(*) AS n_docs,
       array_to_string(list_transform(list_sort(list(doc_id)),
                       x -> CAST(x AS VARCHAR)), ',') AS doc_ids
FROM toks GROUP BY 1 HAVING count(*) > 1
""",
    doc="boilerplate-prefix duplicate families (first-10-token hash groups)",
)


def _q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy dedup: prefix-block equi-join + bounded-window
    Levenshtein. One shuffle on the block key; per-pair cost capped at
    O(window²); degenerate blocks dropped by the size guard."""
    return dedup.blocked_edit_distance_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        max_dist=60, prefix_tokens=5, window=200, max_block_size=50,
    )


QUERIES["dedup_edit_distance"] = Q(
    _q_edit_distance,
    NORM_CTE
    + """
, sides AS (
  SELECT doc_id AS doc, substring(nt, 1, 200) AS t,
         md5(array_to_string(tt[1:5], ' ')) AS block
  FROM (SELECT doc_id, nt, string_split(nt, ' ') AS tt FROM norm)
), guarded AS (
  SELECT * FROM sides WHERE block IN (
    SELECT block FROM sides GROUP BY block HAVING count(*) <= 50)
)
SELECT a.doc AS doc_a, b.doc AS doc_b,
       levenshtein(a.t, b.t)::BIGINT AS edit_dist, a.block AS block
FROM guarded a JOIN guarded b ON a.block = b.block AND a.doc < b.doc
WHERE levenshtein(a.t, b.t) <= 60
""",
    doc="blocked Levenshtein near-dup pairs (prefix blocking + bounded compare window)",
)


def _q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.containment_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold=0.8,
    )


QUERIES["dedup_containment"] = Q(
    _q_containment,
    LSH_CTE
    + """
, cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
), scored AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.ss, sb.ss)) AS inter,
         len(sa.ss) AS na, len(sb.ss) AS nb
  FROM cands c
  JOIN sh sa ON c.doc_a = sa.doc_id
  JOIN sh sb ON c.doc_b = sb.doc_id
)
SELECT CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS contained_id,
       CASE WHEN na <= nb THEN doc_b ELSE doc_a END AS container_id,
       round(inter / least(na, nb), 6) AS containment
FROM scored
WHERE least(na, nb) > 0 AND inter / least(na, nb) >= 0.8
""",
    doc="asymmetric containment pairs (|A∩B|/|min side| over LSH candidates)",
)


def _q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication report: how much of each source's volume
    is exact-duplicate content (sha256) — the table that decides which
    crawl/source gets the aggressive dedup budget. One shuffle on
    (source, hash) then a per-source roll-up."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy(
        "source", F.sha2(F.col("text"), 256).alias("_h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    return per.groupBy("source").agg(
        F.sum("_n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        F.round(
            (F.sum("_n") - F.count(F.lit(1))) / F.sum("_n").cast("double"), 6
        ).alias("dup_rate"),
    )


QUERIES["dedup_rate_by_source"] = Q(
    _q_dup_rate_by_source,
    """
WITH per AS (
  SELECT source, sha256(text) AS h, count(*)::BIGINT AS n
  FROM documents GROUP BY 1, 2
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_docs,
       count(*)::BIGINT AS n_unique,
       round((sum(n) - count(*)) / sum(n)::DOUBLE, 6) AS dup_rate
FROM per GROUP BY 1
""",
    doc="per-source exact-duplication rate (which source gets the dedup budget)",
)
