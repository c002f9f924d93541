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
from .base import Q, local_df
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
SELECT split, lang, count(*) AS n_docs,
       -- CAST: DuckDB sum(int) is HUGEINT -> pandas float64; Spark's is
       -- bigint. The registry-wide integer-sum convention (base.py).
       CAST(sum(n_chars) AS BIGINT) AS total_chars
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


# ---------------------------------------------------------------- round 6


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing QA: concatenate documents (id order within
    portable hash shards) into 512-token training sequences and report
    per-sequence fill. The layout is deterministic on any engine /
    partitioning — the property a reproducible pretraining data order
    needs (operators/packing.py)."""
    from ..functions import text as TX2
    from ..operators.packing import packed_sequence_stats

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", TX2.token_count(F.col("text")).alias("n_toks"))
    return packed_sequence_stats(toks, "doc_id", "n_toks", budget=512, n_shards=8)


from .text_q import NTOK_SQL, QUALITY_SQL  # noqa: E402

QUERIES["pack_sequences_stats"] = Q(
    _q_pack_sequences,
    f"""
WITH toks AS (
  SELECT doc_id, CAST({NTOK_SQL} AS BIGINT) AS nt,
         ({_BUCKET} % 8) AS shard
  FROM documents
), laid AS (
  SELECT doc_id, shard, nt,
         COALESCE(sum(nt) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS start_offset
  FROM toks
), cells AS (
  SELECT shard, start_offset, nt,
         unnest(range(CAST(start_offset // 512 AS BIGINT),
                      CAST((start_offset + nt - 1) // 512 AS BIGINT) + 1))
           AS seq_id
  FROM laid WHERE nt > 0
)
SELECT shard, seq_id,
       count(*) AS n_docs,
       CAST(sum(least(start_offset + nt, (seq_id + 1) * 512)
                - greatest(start_offset, seq_id * 512)) AS BIGINT)
         AS seq_tokens,
       CAST(sum(CASE WHEN start_offset + nt > (seq_id + 1) * 512
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning,
       round(sum(least(start_offset + nt, (seq_id + 1) * 512)
                 - greatest(start_offset, seq_id * 512)) / 512.0, 6)
         AS fill_ratio
FROM cells GROUP BY shard, seq_id
""",
    doc="sequence packing into 512-token training rows: per-sequence fill QA",
)


def _q_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs-per-source rate limiting: keep the top-20 documents of each
    source by quality score (rounded before ranking so membership is
    engine-stable), the standard guard against one crawl domain
    flooding the mixture."""
    from ..operators.sampling import cap_per_group

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.round(TX.quality_score(F.col("text")), 6).alias("quality_score"),
    )
    return cap_per_group(scored, "doc_id", "source", F.col("quality_score"), 20)


QUERIES["curation_source_caps"] = Q(
    _q_source_caps,
    f"""
WITH q AS (
  SELECT doc_id, source, round({QUALITY_SQL}, 6) AS quality_score
  FROM documents
), r AS (
  SELECT doc_id, source, quality_score,
         CAST(row_number() OVER (PARTITION BY source
              ORDER BY quality_score DESC, doc_id) AS INTEGER) AS rank_in_group
  FROM q
)
SELECT doc_id, source, quality_score, rank_in_group
FROM r WHERE rank_in_group <= 20
""",
    doc="per-source document cap: top-20 by quality per source (domain rate limit)",
)


def _q_dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection: per fingerprint group,
    keep the highest-quality member (not the arbitrary min-id) — what a
    curation pipeline actually ships after dedup."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.dedup_group_representatives(
        d, "doc_id", "text", F.round(TX.quality_score(F.col("text")), 6)
    )


QUERIES["dedup_representatives"] = Q(
    _q_dedup_representatives,
    NORM_CTE
    + f""", fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fingerprint
  FROM toks
), q AS (
  SELECT doc_id, round({QUALITY_SQL}, 6) AS q FROM documents
), j AS (
  SELECT f.fingerprint, f.doc_id, q.q,
         count(*) OVER (PARTITION BY f.fingerprint) AS n_docs,
         row_number() OVER (PARTITION BY f.fingerprint
                            ORDER BY q.q DESC, f.doc_id) AS rn
  FROM fp f JOIN q USING (doc_id)
)
SELECT fingerprint, CAST(n_docs AS BIGINT) AS n_docs,
       doc_id AS kept_id, q AS kept_score
FROM j WHERE rn = 1 AND n_docs > 1
""",
    doc="dedup survivor selection: highest-quality member represents each group",
)


def _q_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership gate: test every document's content key
    against a filter built over a 10% reference slice — the incremental
    -dedup shape when the prior corpus is too large to semi-join. The
    output keeps the exact truth column so the (bounded) false-positive
    behavior is visible; false negatives are impossible by
    construction."""
    from ..operators.decontam import bloom_membership_gate
    from ..operators.sampling import rate_bucket

    d = load_table(spark, sf_dir, "documents")
    keys = (
        d.select(
            F.md5(F.col("text")).alias("content_key"),
            (rate_bucket(F.col("doc_id")) < 1000).cast("int").alias("is_m"),
        )
        .groupBy("content_key")
        .agg(F.max("is_m").cast("int").alias("is_member"))
    )
    ref = keys.filter(F.col("is_member") == 1).select("content_key")
    gate = bloom_membership_gate(keys, ref, "content_key", m=2048, k=4)
    return gate.join(keys, "content_key").select(
        "content_key", "maybe_member", "is_member"
    )


QUERIES["decontam_bloom_gate"] = Q(
    _q_bloom_gate,
    f"""
WITH k AS (
  SELECT md5(text) AS ck, {_BUCKET} AS b FROM documents
), keys AS (
  SELECT ck, CAST(max(CASE WHEN b < 1000 THEN 1 ELSE 0 END) AS INTEGER)
           AS is_member
  FROM k GROUP BY ck
), pp AS (
  SELECT ck, (('0x' || substring(md5(i || ':' || ck), 1, 15))::BIGINT % 2048)
           AS p
  FROM keys, unnest([0, 1, 2, 3]) AS u(i)
), bits AS (
  SELECT DISTINCT p FROM pp JOIN keys USING (ck) WHERE keys.is_member = 1
), hits AS (
  SELECT pp.ck, count(bits.p) AS nhit
  FROM pp LEFT JOIN bits ON pp.p = bits.p
  GROUP BY pp.ck
)
SELECT hits.ck AS content_key,
       CAST(CASE WHEN nhit = 4 THEN 1 ELSE 0 END AS INTEGER) AS maybe_member,
       keys.is_member
FROM hits JOIN keys ON hits.ck = keys.ck
""",
    doc="portable Bloom membership gate vs a reference slice (no false negatives)",
)


def _q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup against a persistent LSH index
    (streaming/dedupe.py): an 80% "prior corpus" slice is indexed, then
    the 20% "new batch" slice is checked against it — the does-this-new
    -batch-duplicate-anything-already-ingested shape every continuously
    -fed training pipeline runs. Same banded-MinHash machinery as the
    batch path (n=3, 12 hashes, 4 bands, verify ≥ 0.7), so the DuckDB
    oracle reuses the LSH CTE with a new×prior join instead of the
    within-corpus a<b join."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..streaming.dedupe import dedup_against_index

    d = load_table(spark, sf_dir, "documents")
    b = rate_bucket(F.col("doc_id"))
    idx = tempfile.mkdtemp(prefix="dedup_idx_")
    try:
        # first call indexes the prior corpus (no pre-existing index ->
        # returns the typed empty frame)
        dedup_against_index(d.filter(b >= 2000), idx)
        out = dedup_against_index(
            d.filter(b < 2000), idx, update_index=False
        )
        rows = out.collect()  # materialize before removing the index
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


from .dedup_q import LSH_CTE  # noqa: E402

_BK = "(('0x' || substring(md5(CAST({k} AS VARCHAR)), 1, 15))::BIGINT % 10000)"

QUERIES["dedup_incremental_index"] = Q(
    _q_incremental_dedup,
    LSH_CTE
    + f"""
, cands AS (
  SELECT DISTINCT a.doc_id AS doc, b.doc_id AS dup_of
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE {_BK.format(k="a.doc_id")} < 2000
    AND {_BK.format(k="b.doc_id")} >= 2000
), verified AS (
  SELECT c.doc, c.dup_of,
         len(list_intersect(sa.ss, sb.ss)) AS inter,
         len(sa.ss) + len(sb.ss) AS total
  FROM cands c
  JOIN sh sa ON c.doc = sa.doc_id
  JOIN sh sb ON c.dup_of = sb.doc_id
)
SELECT doc, dup_of, round(inter / (total - inter), 6) AS jaccard
FROM verified WHERE round(inter / (total - inter), 6) >= 0.7
""",
    doc="incremental near-dup vs persistent LSH index (new batch × prior corpus)",
)


def _q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retriever/embedding training: per query
    vector, the top-3 most-similar vectors with a DIFFERENT label."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.hard_negative_topk(
        emb, "vec_id", "embedding", "label", F.col("vid") < 10, k=3
    )


_cos_hn = COS_SQL.format(a="q.v", b="c.v")

QUERIES["sim_hard_negatives"] = Q(
    _q_hard_negatives,
    f"""
WITH e AS (SELECT vec_id AS vid, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT q.vid AS query_id, c.vid AS neighbor_id,
         round({_cos_hn}, 6) AS cosine_sim,
         CAST(row_number() OVER (PARTITION BY q.vid
              ORDER BY round({_cos_hn}, 9) DESC, c.vid) AS INTEGER) AS rank
  FROM e q JOIN e c ON q.label != c.label
  WHERE q.vid < 10
) WHERE rank <= 3
""",
    doc="hard-negative mining: top-k nearest vectors with a different label",
)


def _q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality proxy (CCNet-style perplexity filter, engine-
    native form): mean negative logprob of each doc under the corpus's
    own unigram distribution."""
    d = load_table(spark, sf_dir, "documents")
    return TX.unigram_logprob_scores(d, "doc_id", "text")


QUERIES["text_unigram_logprob"] = Q(
    _q_unigram_logprob,
    NORM_CTE
    + """, tk AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
), vocab AS (
  SELECT tok, count(*) AS cnt FROM tk GROUP BY tok
), tot AS (SELECT sum(cnt) AS total FROM vocab)
SELECT tk.doc_id,
       count(*) AS n_tokens,
       round(avg(-(ln(cnt) - ln(total))), 6) AS avg_neg_logprob
FROM tk JOIN vocab USING (tok) CROSS JOIN tot
GROUP BY tk.doc_id
""",
    doc="per-doc mean negative unigram logprob (perplexity-filter proxy)",
)


def _q_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch mixture weighting (LLaMA-recipe shape): repeat
    each language slice to its epoch count, summarized per language."""
    from ..operators.sampling import upsample_epochs

    d = load_table(spark, sf_dir, "documents")
    epochs = {"en": 2.4, "de": 1.0, "fr": 0.6, "es": 1.5}
    out = upsample_epochs(d, "doc_id", "lang", epochs)
    return out.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.max("copy_idx").cast("bigint").alias("max_copy_idx"),
    )


QUERIES["corpus_epoch_upsample"] = Q(
    _q_epoch_upsample,
    f"""
WITH c AS (
  SELECT doc_id, lang,
         CASE lang
           WHEN 'en' THEN 2 + CASE WHEN {_BUCKET} < 4000 THEN 1 ELSE 0 END
           WHEN 'de' THEN 1
           WHEN 'fr' THEN 0 + CASE WHEN {_BUCKET} < 6000 THEN 1 ELSE 0 END
           WHEN 'es' THEN 1 + CASE WHEN {_BUCKET} < 5000 THEN 1 ELSE 0 END
           ELSE 0 END AS n_copies
  FROM documents
), exploded AS (
  SELECT doc_id, lang, unnest(range(n_copies)) AS copy_idx
  FROM c WHERE n_copies > 0
)
SELECT lang, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
       CAST(max(copy_idx) AS BIGINT) AS max_copy_idx
FROM exploded GROUP BY lang
""",
    doc="fractional-epoch corpus weighting: deterministic repeat-per-group",
)


def _q_quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality calibration (the FineWeb-style practice):
    rank each document's quality WITHIN its language via percent_rank,
    so a cross-language keep-threshold (here: top 60%) doesn't let one
    language's scorer bias starve another. One shuffle on lang; the
    rounded score + doc_id ordering keeps ranks engine-stable."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.round(TX.quality_score(F.col("text")), 6).alias("quality_score"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("quality_score").asc(), F.col("doc_id").asc()
    )
    pr = F.percent_rank().over(w)
    return scored.select(
        "doc_id",
        "lang",
        "quality_score",
        F.round(pr, 6).alias("lang_percentile"),
        (pr >= 0.4).cast("int").alias("keep_top60"),
    )


QUERIES["text_quality_calibrated"] = Q(
    _q_quality_calibrated,
    f"""
WITH q AS (
  SELECT doc_id, lang, round({QUALITY_SQL}, 6) AS quality_score
  FROM documents
)
SELECT doc_id, lang, quality_score,
       round(percent_rank() OVER (PARTITION BY lang
             ORDER BY quality_score ASC, doc_id ASC), 6) AS lang_percentile,
       CAST(CASE WHEN percent_rank() OVER (PARTITION BY lang
             ORDER BY quality_score ASC, doc_id ASC) >= 0.4
            THEN 1 ELSE 0 END AS INTEGER) AS keep_top60
FROM q
""",
    doc="per-language quality percentile calibration with a cross-lang keep gate",
)


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (the CDC/bookkeeping shape of incremental
    ingestion): full-outer join of two corpus versions on doc_id with a
    checksum compare -> added / removed / changed / unchanged. Snapshot
    B is derived deterministically from the fixture: a 10% hash slice
    is dropped (removals), a disjoint 10% slice gets edited text
    (changes), and a shifted id range stands in for new arrivals. One
    shuffle on the uniform id key; at 100 TB this is the pre-MERGE
    classification pass."""
    from ..operators.sampling import rate_bucket

    d = load_table(spark, sf_dir, "documents")
    b = rate_bucket(F.col("doc_id"))
    old = d.select("doc_id", F.md5(F.col("text")).alias("cks"))
    new_txt = F.when(
        (b >= 1000) & (b < 2000), F.concat(F.col("text"), F.lit(" [edited v2]"))
    ).otherwise(F.col("text"))
    survived = d.filter(b >= 1000).select(
        "doc_id", F.md5(new_txt).alias("cks")
    )
    arrivals = d.filter(b < 500).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.md5(F.concat(F.col("text"), F.lit(" [new]"))).alias("cks"),
    )
    new = survived.unionByName(arrivals)
    j = old.alias("o").join(
        new.alias("n"), F.col("o.doc_id") == F.col("n.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("o.doc_id").isNull(), F.lit("added"))
        .when(F.col("n.doc_id").isNull(), F.lit("removed"))
        .when(F.col("o.cks") != F.col("n.cks"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"))
    )


QUERIES["corpus_snapshot_diff"] = Q(
    _q_snapshot_diff,
    f"""
WITH old AS (
  SELECT doc_id, md5(text) AS cks FROM documents
), b AS (
  SELECT doc_id, text, {_BUCKET} AS bk FROM documents
), new AS (
  SELECT doc_id,
         md5(CASE WHEN bk >= 1000 AND bk < 2000
                  THEN text || ' [edited v2]' ELSE text END) AS cks
  FROM b WHERE bk >= 1000
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, md5(text || ' [new]') AS cks
  FROM b WHERE bk < 500
), j AS (
  SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.cks != n.cks THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT status, count(*) AS n_docs FROM j GROUP BY status
""",
    doc="corpus snapshot diff: added/removed/changed/unchanged via checksum join",
)


def _q_ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk hard-negative mining: LSH-bucket-blocked different-label
    top-k — the |Q| = |corpus| production shape."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_hard_negative_topk(
        emb, "vec_id", "embedding", "label", F.col("vid") < 10, k=3
    )


QUERIES["sim_hard_negatives_ann"] = Q(
    _q_ann_hard_negatives,
    f"""
WITH e AS (SELECT vec_id AS vid, label, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vid, label, v, {bucket_sql('v')} AS bucket FROM e)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT q.vid AS query_id, c.vid AS neighbor_id,
         round({_cos_hn}, 6) AS cosine_sim,
         CAST(row_number() OVER (PARTITION BY q.vid
              ORDER BY round({_cos_hn}, 9) DESC, c.vid) AS INTEGER) AS rank
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.label != c.label
  WHERE q.vid < 10
) WHERE rank <= 3
""",
    doc="LSH-bucket-blocked hard-negative mining (bulk/production shape)",
)


def _q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-blocklist gate (content half of the FineWeb/Dolma URL+
    keyword filter). The synthetic corpus is clean, so a deterministic
    slice is salted with blocklist terms — same pattern as the PII
    query — to give the gate guaranteed hits; mirrored 1:1 in SQL."""
    d = load_table(spark, sf_dir, "documents")
    salted = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" casino jackpot xxx spam")).otherwise(
            F.lit("")
        ),
    )
    n_blocked, ratio = TX.blocklist_stats(salted)
    r = F.round(ratio, 6)
    return d.select(
        "doc_id",
        n_blocked.alias("n_blocked"),
        r.alias("blocked_ratio"),
        (r > 0.05).cast("int").alias("flagged"),
    )


_BL_IN = ", ".join(f"'{w}'" for w in (
    "casino", "viagra", "lottery", "jackpot", "xxx", "porn",
    "free-money", "clickbait", "spamlink",
))

QUERIES["text_blocklist_gate"] = Q(
    _q_blocklist,
    f"""
WITH s AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
                      THEN ' casino jackpot xxx spam' ELSE '' END AS st
  FROM documents
), n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(st),
              '[.,!?;:''"()\\[\\]{{}}-]', '', 'g'), '\\s+', ' ', 'g')) AS nt
  FROM s
), t AS (
  SELECT doc_id, string_split(nt, ' ') AS tk FROM n
), h AS (
  SELECT doc_id,
         len(list_filter(tk, x -> x IN ({_BL_IN}))) AS nb,
         greatest(len(tk), 1) AS ntk
  FROM t
)
SELECT doc_id,
       CAST(nb AS INTEGER) AS n_blocked,
       round(nb / ntk, 6) AS blocked_ratio,
       CAST(CASE WHEN round(nb / ntk, 6) > 0.05 THEN 1 ELSE 0 END AS INTEGER)
         AS flagged
FROM h
""",
    doc="keyword-blocklist density gate (content half of URL+keyword filtering)",
)


# ------------------------------------------------------- round 6 (cont.)


def _q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate REMOVAL (CCNet/RefinedWeb line-dedup shape): drop
    every 16-token window shared by >= 2 documents and rewrite the
    text; reported as md5 of the cleaned text plus drop accounting.
    Unlike ``dedup_paragraph_rollup`` this changes the corpus, not just
    the QA columns (operators/dedup.py remove_boilerplate_windows)."""
    d = load_table(spark, sf_dir, "documents")
    r = dedup.remove_boilerplate_windows(
        d, "doc_id", "text", window_tokens=16, min_docs=2
    )
    return r.select(
        "doc_id",
        F.md5(F.col("clean_text")).alias("clean_md5"),
        "n_windows",
        "n_dropped",
        "dropped_ratio",
    )


QUERIES["text_boilerplate_removal"] = Q(
    _q_boilerplate_removal,
    NORM_CTE
    + """, idx AS (
  SELECT doc_id, t,
         unnest(range(CAST(greatest(ceil(len(t) / 16.0), 1) AS BIGINT))) AS i
  FROM toks
), wins AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[(i*16+1):((i+1)*16)], ' ') AS win,
         md5(array_to_string(t[(i*16+1):((i+1)*16)], ' ')) AS fp
  FROM idx
), freq AS (
  SELECT fp, 1 AS dup FROM wins GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
)
SELECT w.doc_id,
       md5(coalesce(string_agg(CASE WHEN f.dup IS NULL THEN w.win END,
                               ' ' ORDER BY w.pos), '')) AS clean_md5,
       count(*) AS n_windows,
       CAST(sum(CASE WHEN f.dup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       round(CAST(sum(CASE WHEN f.dup IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS dropped_ratio
FROM wins w LEFT JOIN freq f USING (fp)
GROUP BY w.doc_id
""",
    doc="corpus-level boilerplate-window removal: rewrites text, drop accounting",
)


def _q_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sample: exactly ceil(20% of every lang)
    by portable hash rank (operators/sampling.py
    stratified_sample_exact) — per-stratum size guaranteed, unlike the
    expectation-exact rate_bucket sampler."""
    from ..operators import sampling

    d = load_table(spark, sf_dir, "documents")
    return sampling.stratified_sample_exact(d, "doc_id", "lang", 0.2).select(
        "doc_id", "lang", "sample_rank"
    )


QUERIES["sample_stratified_exact"] = Q(
    _q_stratified_exact,
    """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM documents
)
SELECT doc_id, lang, CAST(rn AS INTEGER) AS sample_rank
FROM ranked
WHERE rn <= ceil(round(0.2 * cnt, 9))
""",
    doc="exact-quota stratified sampling: ceil(frac*|stratum|) rows per group",
)


def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: top-25 corpus unigrams with cumulative
    token-mass share (functions/text.py vocab_coverage) — the tokenizer
    vocab-size sizing read."""
    d = load_table(spark, sf_dir, "documents")
    return TX.vocab_coverage(d, "text", top_v=25)


QUERIES["text_vocab_coverage"] = Q(
    _q_vocab_coverage,
    NORM_CTE
    + """, tk AS (
  SELECT unnest(t) AS tok FROM toks
), vocab AS (
  SELECT tok, count(*) AS cnt FROM tk GROUP BY tok
), total AS (
  SELECT CAST(sum(cnt) AS DOUBLE) AS tt FROM vocab
), ranked AS (
  SELECT tok, cnt,
         row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rank
  FROM vocab
)
SELECT CAST(rank AS INTEGER) AS rank, tok, CAST(cnt AS BIGINT) AS cnt,
       round(cnt / tt, 6) AS share,
       round(sum(cnt) OVER (ORDER BY rank
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tt, 6)
         AS cum_share
FROM ranked, total
WHERE rank <= 25
""",
    doc="top-25 unigram vocabulary coverage curve (cumulative token-mass share)",
)


def _q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waterfilling token-budget allocation across languages: cap level
    L with sum_g min(tokens_g, L) = 20000 (operators/sampling.py
    allocate_token_budget) — over-represented languages absorb the
    whole shortfall, small ones keep everything."""
    from ..operators import sampling

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", TX.token_count(F.col("text")).alias("nt"))
    return sampling.allocate_token_budget(toks, "lang", "nt", 20000.0)


QUERIES["curation_token_budget"] = Q(
    _q_token_budget,
    f"""
WITH tk AS (
  SELECT lang, CAST({NTOK_SQL} AS BIGINT) AS nt FROM documents
), g AS (
  SELECT lang, CAST(sum(nt) AS DOUBLE) AS gt FROM tk GROUP BY lang
), ranked AS (
  SELECT lang, gt,
         row_number() OVER (ORDER BY gt ASC, lang ASC) AS rn,
         sum(gt) OVER (ORDER BY gt ASC, lang ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         count(*) OVER () AS n
  FROM g
), lev AS (
  SELECT max(CASE WHEN cum + gt * (n - rn) >= 20000.0
                  THEN (20000.0 - (cum - gt)) / (n - rn + 1) END) AS L
  FROM ranked
), q AS (
  SELECT lang, gt, L,
         CASE WHEN L IS NULL THEN gt ELSE least(gt, L) END AS quota
  FROM ranked, lev
)
SELECT lang, gt AS group_tokens,
       round(L, 4) AS water_level,
       round(quota, 4) AS quota,
       round(quota / gt, 6) AS keep_rate,
       CAST(CASE WHEN gt > quota THEN 1 ELSE 0 END AS INTEGER) AS capped
FROM q
""",
    doc="waterfilling token-budget allocation: min(tokens_g, L) quotas per language",
)


def _q_semantic_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic cluster balancing (DDC/cluster-balanced-sampling shape):
    assign every embedding to its nearest coarse-quantizer cell
    (similarity.ivf_assign_cells, untrained deterministic centroids —
    the same quantizer the ANN path probes), then waterfill a 300-
    vector budget across cells (sampling.allocate_token_budget with one
    "token" per vector): over-dense semantic regions get capped keep
    rates, sparse ones keep everything — flattening the semantic
    distribution of the corpus."""
    from ..operators import sampling, similarity

    emb = load_table(spark, sf_dir, "embeddings")
    cells = similarity.ivf_assign_cells(
        emb, "vec_id", "embedding", n_centroids=16, n_probe=1
    )
    ones = cells.select("cid", F.lit(1).alias("one"))
    return sampling.allocate_token_budget(ones, "cid", "one", 300.0)


QUERIES["curation_semantic_balance"] = Q(
    _q_semantic_balance,
    """
WITH e AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vid, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
cent AS (SELECT vid AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY vid LIMIT 16),
aff AS (
  SELECT n.vid, c.cid,
         row_number() OVER (PARTITION BY n.vid
           ORDER BY round(list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm), 9)
                    DESC, c.cid) AS rn
  FROM n, cent c
), g AS (
  SELECT cid, CAST(count(*) AS DOUBLE) AS gt FROM aff WHERE rn = 1 GROUP BY cid
), ranked AS (
  SELECT cid, gt,
         row_number() OVER (ORDER BY gt ASC, cid ASC) AS rnn,
         sum(gt) OVER (ORDER BY gt ASC, cid ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         count(*) OVER () AS nn
  FROM g
), lev AS (
  SELECT max(CASE WHEN cum + gt * (nn - rnn) >= 300.0
                  THEN (300.0 - (cum - gt)) / (nn - rnn + 1) END) AS L
  FROM ranked
), q AS (
  SELECT cid, gt, L,
         CASE WHEN L IS NULL THEN gt ELSE least(gt, L) END AS quota
  FROM ranked, lev
)
SELECT cid, gt AS group_tokens,
       round(L, 4) AS water_level,
       round(quota, 4) AS quota,
       round(quota / gt, 6) AS keep_rate,
       CAST(CASE WHEN gt > quota THEN 1 ELSE 0 END AS INTEGER) AS capped
FROM q
""",
    doc="semantic cluster balancing: waterfilled keep rates over quantizer cells",
)


def _q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: max cosine from every corpus
    vector to the eval slice (vid < 10), flagged at 0.45
    (operators/similarity.py semantic_contamination). The fixture's
    vectors are synthetic, so the threshold sits inside their natural
    cosine range to exercise both branches; real pipelines with
    meaningful embeddings run ~0.9+."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_contamination(
        emb, "vec_id", "embedding", F.col("vid") < 10, threshold=0.45
    )


QUERIES["decontam_semantic_eval"] = Q(
    _q_semantic_decontam,
    """
WITH e AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vid, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
ev AS (SELECT vid AS eid, v AS evv, nrm AS enrm FROM n WHERE vid < 10),
c AS (SELECT vid, v, nrm FROM n WHERE NOT (vid < 10)),
s AS (
  SELECT c.vid, ev.eid,
         round(list_dot_product(c.v, ev.evv) / (c.nrm * ev.enrm), 9) AS r9
  FROM c, ev
), r AS (
  SELECT vid, eid, r9,
         row_number() OVER (PARTITION BY vid ORDER BY r9 DESC, eid ASC) AS rn
  FROM s
)
SELECT vid AS vec_id, CAST(eid AS BIGINT) AS nearest_eval_id,
       round(r9, 6) + 0.0 AS max_cos,
       CAST(CASE WHEN r9 >= 0.45 THEN 1 ELSE 0 END AS INTEGER) AS contaminated
FROM r WHERE rn = 1
""",
    doc="semantic eval-set decontamination: max cosine to any eval vector",
)


def _q_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier gate (FineWeb-Edu shape): sigmoid over
    Catalyst feature expressions with literal weights, keep decided on
    the pre-sigmoid margin (functions/text.py
    classifier_quality_score)."""
    d = load_table(spark, sf_dir, "documents")
    score, keep = TX.classifier_quality_score(F.col("text"))
    return d.select(
        "doc_id", F.round(score, 6).alias("edu_score"), keep.alias("keep")
    )


from .text_q import _MTL, _PUNCT, _STOP  # noqa: E402

_CLS_Z = (
    f"-1.0 + 1.5 * least({NTOK_SQL} / 100.0, 1.0)"
    f" + 0.2 * ({_MTL}) + -4.0 * ({_PUNCT}) + 2.0 * ({_STOP})"
)

QUERIES["text_classifier_gate"] = Q(
    _q_classifier_gate,
    f"""
SELECT doc_id,
       round(1.0 / (1.0 + exp(-({_CLS_Z}))), 6) AS edu_score,
       CAST(CASE WHEN round({_CLS_Z}, 9) >= 0 THEN 1 ELSE 0 END AS INTEGER)
         AS keep
FROM documents
""",
    doc="linear quality-classifier gate: sigmoid score + margin-decided keep",
)


def _q_global_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-25 corpus-wide sample by portable hash order
    (operators/sampling.py global_sample_exact) — distributed top-k
    plan, no global sort."""
    from ..operators import sampling

    d = load_table(spark, sf_dir, "documents")
    return sampling.global_sample_exact(d, "doc_id", 25).select(
        "doc_id", "lang", "sample_rank"
    )


QUERIES["sample_global_exact"] = Q(
    _q_global_sample,
    """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                            doc_id ASC) AS rn
  FROM documents
)
SELECT doc_id, lang, CAST(rn AS INTEGER) AS sample_rank
FROM ranked WHERE rn <= 25
""",
    doc="exactly-n global sample by portable hash order (human-eval slice)",
)


def _q_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold CV assignment by doc_id hash, summarized
    per (fold, lang) — reproducible on any engine, independent of the
    range-based train/val/test split over the same keys."""
    from ..operators.sampling import assign_kfold

    d = load_table(spark, sf_dir, "documents")
    return (
        assign_kfold(d, "doc_id", 5)
        .groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


QUERIES["sample_kfold_assignment"] = Q(
    _q_kfold,
    f"""
SELECT CAST({_BUCKET} % 5 AS INTEGER) AS fold, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
""",
    doc="deterministic k-fold CV assignment by portable key hash (fold = bucket mod k)",
)


def _q_delta_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental delta curation (round 8): a 100 TB pipeline re-runs
    on DELTAS, not full corpora. Composes the corpus_snapshot_diff
    construction (changed = edited 10% slice, added = shifted-id
    arrivals, of which the bk<250 half are re-crawled byte-identical
    re-posts) with exact content dedup AGAINST THE INDEXED BASE
    (checksum anti-join — the SQL-expressible twin of the persistent
    MinHash index path in streaming/dedupe.dedup_against_index,
    demonstrated on the real index in examples/run_curation.py --delta)
    and the standard quality gate. Output: the per-stage funnel.

    Scale shape: delta-sized scans + one hash anti-join against the
    base checksum set (shuffle on uniform md5 keys) — work is
    O(|delta|), never O(|corpus|)."""
    from ..functions.text import quality_score
    from ..operators.sampling import rate_bucket

    d = load_table(spark, sf_dir, "documents")
    b = rate_bucket(F.col("doc_id"))
    changed = d.filter((b >= 1000) & (b < 2000)).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" [edited v2]")).alias("text"),
        F.lit("changed").alias("status"),
    )
    added = d.filter(b < 500).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.when(b < 250, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" [new]")))
        .alias("text"),
        F.lit("added").alias("status"),
    )
    delta = changed.unionByName(added)
    base_cks = d.select(F.md5(F.col("text")).alias("cks")).distinct()
    novel = delta.join(
        base_cks, F.md5(F.col("text")) == F.col("cks"), "left_anti"
    )
    gated = novel.filter(F.round(quality_score(F.col("text")), 6) >= 0.3)

    def _stage(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")).select(
            F.lit(stage).alias("stage"), "n_docs"
        )

    return (
        _stage(changed, "delta_changed")
        .unionByName(_stage(added, "delta_added"))
        .unionByName(_stage(novel, "after_index_dedup"))
        .unionByName(_stage(gated, "after_quality"))
    )


QUERIES["curation_delta_pipeline"] = Q(
    _q_delta_pipeline,
    f"""
WITH b AS (
  SELECT doc_id, text, {_BUCKET} AS bk FROM documents
), delta AS (
  SELECT doc_id, text || ' [edited v2]' AS text, 'changed' AS status
  FROM b WHERE bk >= 1000 AND bk < 2000
  UNION ALL
  SELECT doc_id + 1000000,
         CASE WHEN bk < 250 THEN text ELSE text || ' [new]' END, 'added'
  FROM b WHERE bk < 500
), base AS (
  SELECT DISTINCT md5(text) AS cks FROM documents
), novel AS (
  SELECT d.* FROM delta d LEFT JOIN base o ON md5(d.text) = o.cks
  WHERE o.cks IS NULL
), gated AS (
  SELECT * FROM novel WHERE round({QUALITY_SQL}, 6) >= 0.3
)
SELECT 'delta_changed' AS stage, CAST(count(*) AS BIGINT) AS n_docs
FROM delta WHERE status = 'changed'
UNION ALL
SELECT 'delta_added', CAST(count(*) AS BIGINT) FROM delta WHERE status = 'added'
UNION ALL
SELECT 'after_index_dedup', CAST(count(*) AS BIGINT) FROM novel
UNION ALL
SELECT 'after_quality', CAST(count(*) AS BIGINT) FROM gated
""",
    doc="incremental delta curation funnel: snapshot delta -> dedup vs indexed base -> quality gate",
)


def _q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sharded export, certified end-to-end (round 8): write the
    corpus as deterministic JSONL shards (sources/jsonl.
    write_jsonl_shards — to_json struct lines, text sink partitioned by
    md5-bucket shard), read it BACK through the schema-enforcing
    read_jsonl source, and emit the per-shard manifest. The oracle
    recomputes the manifest arithmetically from the original table, so
    any serialization loss (escaping, nulls, shard routing, quarantined
    lines) hash-mismatches. total_text_chars certifies the text column
    survives the JSON round-trip with its full CHARACTER count (both
    engines measure characters — Spark length() and DuckDB length();
    DuckDB strlen() would count UTF-8 bytes and diverge on non-ASCII).

    Scale shape: one shuffle on the uniform shard key for the write;
    manifest is a grouped agg over O(n_shards) groups."""
    import shutil
    import tempfile

    from ..sources.jsonl import read_jsonl, shard_column, write_jsonl_shards

    d = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="jsonl_export_")
    try:
        write_jsonl_shards(d, f"{work}/corpus", "doc_id", n_shards=8)
        back = read_jsonl(spark, f"{work}/corpus", count=False).clean
        manifest = (
            back.groupBy(shard_column(F.col("doc_id"), 8).alias("shard"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(F.length("text")).cast("bigint").alias("total_text_chars"),
                F.min("doc_id").alias("min_doc_id"),
                F.max("doc_id").alias("max_doc_id"),
            )
            .collect()  # materialize before the temp export is removed
        )
        return local_df(
            spark,
            manifest,
            "shard int, n_docs bigint, total_text_chars bigint,"
            " min_doc_id bigint, max_doc_id bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["export_jsonl_roundtrip"] = Q(
    _q_jsonl_roundtrip,
    f"""
SELECT CAST({_BUCKET} % 8 AS INTEGER) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_text_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
GROUP BY 1
""",
    doc="JSONL sharded export -> schema-enforced re-read -> per-shard manifest == arithmetic oracle",
)


def _q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 4180 CSV sharded export, certified end-to-end (round 8) — the
    hostile-input twin of export_jsonl_roundtrip. Before exporting, the
    corpus is ADVERSARIALLY augmented (deterministically, on both
    engines): every md5-bucket<1000 doc gets a suffix containing an
    unquoted comma, an embedded double quote, and an embedded newline —
    the three characters that silently shear a naive CSV writer. The
    corpus is written as CSV shards (sources/csv.write_csv_shards,
    quote-doubling dialect), read BACK through the quarantining
    read_csv_corpus, and the per-shard manifest — including the shard
    id recovered from partition discovery, certifying shard ROUTING —
    must match the oracle's arithmetic recomputation from the original
    table. Any quoting loss changes total_text_chars or n_multiline;
    any routing loss changes the shard grouping; any parse failure
    drops n_docs (quarantine must stay empty).

    Scale shape: one shuffle on the uniform shard key for the write;
    manifest is a grouped agg over O(n_shards) groups. multiLine=true
    makes each FILE the parse unit — shards are the read parallelism,
    as with gzip JSONL (sources/csv.py module docstring)."""
    import shutil
    import tempfile

    from ..operators.sampling import rate_bucket
    from ..sources.csv import read_csv_corpus, write_csv_shards

    d = load_table(spark, sf_dir, "documents")
    b = rate_bucket(F.col("doc_id"))
    adv = d.withColumn(
        "text",
        F.when(
            b < 1000, F.concat(F.col("text"), F.lit(',"line\ntwo"'))
        ).otherwise(F.col("text")),
    )
    work = tempfile.mkdtemp(prefix="csv_export_")
    try:
        write_csv_shards(adv, f"{work}/corpus", "doc_id", n_shards=8)
        r = read_csv_corpus(spark, f"{work}/corpus")
        if r.n_corrupt:
            raise AssertionError(
                f"CSV roundtrip quarantined {r.n_corrupt} rows"
            )
        manifest = (
            r.clean.groupBy(F.col("shard").cast("int").alias("shard"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(F.length("text")).cast("bigint").alias("total_text_chars"),
                F.sum(F.col("text").contains("\n").cast("long"))
                .cast("bigint")
                .alias("n_multiline"),
                F.min("doc_id").alias("min_doc_id"),
                F.max("doc_id").alias("max_doc_id"),
            )
            .collect()  # materialize before the temp export is removed
        )
        return local_df(
            spark,
            manifest,
            "shard int, n_docs bigint, total_text_chars bigint,"
            " n_multiline bigint, min_doc_id bigint, max_doc_id bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["export_csv_roundtrip"] = Q(
    _q_csv_roundtrip,
    f"""
WITH adv AS (
  SELECT doc_id,
         CASE WHEN {_BUCKET} < 1000
              THEN text || ',"line' || chr(10) || 'two"'
              ELSE text END AS text
  FROM documents
)
SELECT CAST({_BUCKET} % 8 AS INTEGER) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_text_chars,
       CAST(count(*) FILTER (text LIKE '%' || chr(10) || '%') AS BIGINT)
         AS n_multiline,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM adv
GROUP BY 1
""",
    doc="adversarial CSV export (commas/quotes/newlines) -> quarantining re-read -> per-shard manifest == arithmetic oracle",
)
