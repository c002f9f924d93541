"""Similarity-search queries (SURVEY §2.h): brute-force cosine top-k,
LSH bucketing, and bucketed ANN top-k — oracle-checked against DuckDB.

Query set = vec_id < 10 (fixture columns, deterministic). Ranking is on
cosine rounded to 9 dp with neighbor id tie-break (base.py conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..sources.tables import load_table
from .base import Q, local_df

_PLANES = 4

#: DuckDB cosine between two DOUBLE[] expressions.
COS_SQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

#: DuckDB mirror of similarity.lsh_bucket — the same carry-mixing
#: spatial-hash sign (floor/%/± only, engine-portable):
#: s = (floor(((i*73856093 + (j+1)*19349663) % 65536) / 256) % 2)*2 - 1
def bucket_sql(vcol: str, planes: int = _PLANES) -> str:
    terms = []
    for j in range(planes):
        sign = (
            f"(CAST(floor((((i - 1) * 73856093 + {(j + 1) * 19349663}) % 65536)"
            f" / 256) AS BIGINT) % 2) * 2 - 1"
        )
        proj = (
            f"list_sum(list_transform(range(1, len({vcol}) + 1), "
            f"i -> {vcol}[i] * ({sign})))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {2**j} ELSE 0 END)")
    return " + ".join(terms)


def _q_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, "vec_id", "embedding", F.col("vid") < 10, k=5)


def _q_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_bucketize(emb, "vec_id", "embedding", planes=_PLANES)


def _q_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk(
        emb, "vec_id", "embedding", F.col("vid") < 10, k=3, planes=_PLANES
    )


_cos_qc = COS_SQL.format(a="q.v", b="c.v")

QUERIES: dict[str, Q] = {
    "sim_topk_bruteforce": Q(
        _q_bruteforce,
        f"""
WITH e AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT q.vid AS query_id, c.vid AS neighbor_id,
         round({_cos_qc}, 6) AS cosine_sim,
         CAST(row_number() OVER (PARTITION BY q.vid
              ORDER BY round({_cos_qc}, 9) DESC, c.vid) AS INTEGER) AS rank
  FROM e q JOIN e c ON q.vid != c.vid
  WHERE q.vid < 10
) WHERE rank <= 5
""",
        doc="exact cosine top-5 neighbors (brute-force ANN baseline)",
    ),
    "sim_lsh_buckets": Q(
        _q_buckets,
        f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id, {bucket_sql('v')} AS bucket FROM e
""",
        doc="random-hyperplane LSH bucket assignment (the ANN scale path)",
    ),
    "sim_ann_lsh_topk": Q(
        _q_ann,
        f"""
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
e AS (SELECT vid, v, {bucket_sql('v')} AS bucket FROM e0)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT q.vid AS query_id, c.vid AS neighbor_id,
         round({_cos_qc}, 6) AS cosine_sim,
         CAST(row_number() OVER (PARTITION BY q.vid
              ORDER BY round({_cos_qc}, 9) DESC, c.vid) AS INTEGER) AS rank
  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vid != c.vid
  WHERE q.vid < 10
) WHERE rank <= 3
""",
        doc="LSH-bucketed approximate top-3 neighbors",
    ),
}


def _q_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, "vec_id", "embedding", F.col("vid") < 10, k=3, n_centroids=16, n_probe=2
    )


QUERIES["sim_ann_ivf_topk"] = Q(
    _q_ivf,
    f"""
WITH e AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vid, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
cent AS (SELECT vid AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY vid LIMIT 16),
aff AS (
  SELECT n.vid, n.v, n.nrm, c.cid,
         row_number() OVER (PARTITION BY n.vid
           ORDER BY round(list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm), 9) DESC, c.cid) AS rn
  FROM n, cent c
),
corpus AS (SELECT vid, v, nrm, cid FROM aff WHERE rn = 1),
probes AS (SELECT vid AS qid, v AS qv, nrm AS qnrm, cid FROM aff WHERE rn <= 2 AND vid < 10),
cand AS (
  SELECT DISTINCT q.qid AS query_id, s.vid AS neighbor_id,
         round(list_dot_product(q.qv, s.v) / (q.qnrm * s.nrm), 9) AS r9,
         round(list_dot_product(q.qv, s.v) / (q.qnrm * s.nrm), 6) AS cosine_sim
  FROM probes q JOIN corpus s USING (cid)
  WHERE q.qid != s.vid
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT query_id, neighbor_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY r9 DESC, neighbor_id) AS INTEGER) AS rank
  FROM cand
) WHERE rank <= 3
""",
    doc="IVF-style ANN top-3 (deterministic coarse quantizer, n_probe=2)",
)


def _q_bruteforce_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk_arrow(
        emb, "vec_id", "embedding", F.col("vid") < 10, k=5
    )


# same oracle as the Catalyst twin: identical contract, different kernel
QUERIES["sim_topk_bruteforce_arrow"] = Q(
    _q_bruteforce_arrow,
    QUERIES["sim_topk_bruteforce"].oracle,
    doc="numpy/BLAS brute-force top-k (partition-local top-k + global re-rank)",
)


def _q_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-IVF path: build the partitioned index (untrained
    quantizer for oracle determinism), query it, clean up. Must return
    EXACTLY what inline ivf_topk returns — same oracle SQL."""
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="ivf_index_")
    try:
        similarity.build_ivf_index(
            emb, "vec_id", "embedding", idx, n_centroids=16, trained=False
        )
        out = similarity.query_ivf_index(
            emb.filter(F.col("vec_id") < 10), idx, "vec_id", "embedding",
            k=3, n_probe=2,
        )
        rows = out.collect()  # materialize before removing the index dir
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


QUERIES["sim_ann_ivf_index_topk"] = Q(
    _q_ivf_index,
    QUERIES["sim_ann_ivf_topk"].oracle,
    doc="persisted IVF index (build → partition-pruned query) ≡ inline IVF",
)


def _q_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 quantization round trip: per-vector reconstruction error of
    the 4x-smaller representation (must stay within half a quantization
    step = scale/2)."""
    from ..functions.vectors import as_double_array, dequantize_int8, quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    qs = v.select("vec_id", "v", quantize_int8(F.col("v")).alias("qs"))
    recon = qs.select(
        "vec_id", "v", "qs", dequantize_int8(F.col("qs")).alias("r")
    )
    err = F.array_max(F.zip_with(F.col("v"), F.col("r"), lambda a, b: F.abs(a - b)))
    return recon.select(
        "vec_id",
        F.round(F.col("qs.vmin"), 6).alias("vmin"),
        F.round(F.col("qs.scale"), 6).alias("scale"),
        F.round(err, 9).alias("max_abs_err"),
        (err <= F.col("qs.scale") * 0.5 + 1e-12).alias("within_half_step"),
    )


QUERIES["sim_quantize_int8_roundtrip"] = Q(
    _q_quantize,
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (
  SELECT vec_id, v,
         list_min(v) AS vmin,
         (list_max(v) - list_min(v)) / 255.0 AS scale
  FROM e
), qq AS (
  SELECT vec_id, v, vmin, scale,
         list_transform(v, x -> CASE WHEN scale = 0 THEN 0
                                     ELSE CAST(floor((x - vmin) / scale + 0.5) AS INTEGER) END) AS qv
  FROM q
), r AS (
  SELECT vec_id, vmin, scale,
         list_max(list_transform(range(1, len(v) + 1),
                  i -> abs(v[i] - (CAST(qv[i] AS DOUBLE) * scale + vmin)))) AS err
  FROM qq
)
SELECT vec_id, round(vmin, 6) AS vmin, round(scale, 6) AS scale,
       round(err, 9) AS max_abs_err,
       err <= scale * 0.5 + 1e-12 AS within_half_step
FROM r
""",
    doc="int8 embedding quantization round trip (4x storage; error ≤ half a step)",
)


def _q_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.centroid_outliers(emb, "vec_id", "embedding")


QUERIES["sim_centroid_outliers"] = Q(
    _q_centroid_outliers,
    """
WITH dims AS (
  SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings
), cent AS (
  SELECT d, avg(v) AS c FROM dims GROUP BY d
), scored AS (
  SELECT vec_id,
         -- + 0.0 canonicalizes IEEE -0.0 (round of a tiny negative
         -- cosine) to +0.0, matching the Spark side
         round(sum(v * c) / (sqrt(sum(v * v)) * sqrt(sum(c * c))), 4) + 0.0 AS cos_centroid
  FROM dims JOIN cent USING (d)
  GROUP BY vec_id
)
SELECT vec_id, cos_centroid, cos_centroid < -0.2 AS is_outlier
FROM scored
""",
    doc="embedding-to-centroid cosine quality gate (outlier = points away from corpus mass)",
)


def _q_sparse_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return similarity.sparse_cosine_pairs(
        docs, "doc_id", "text", threshold=0.3, max_df_frac=0.5
    )


QUERIES["sim_sparse_tfidf_pairs"] = Q(
    _q_sparse_pairs,
    """
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[.,!?;:''"()\\[\\]{}-]', '', 'g'), '\\s+', ' ', 'g')) AS nt
  FROM documents
), toksx AS (
  SELECT doc_id AS doc, unnest(string_split(nt, ' ')) AS term FROM norm
), toks2 AS (SELECT doc, term FROM toksx WHERE len(term) > 0),
tf AS (SELECT doc, term, count(*) AS tf FROM toks2 GROUP BY 1, 2),
nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
dfreq AS (
  SELECT term, count(*) AS df, nn.n FROM tf, nn GROUP BY term, nn.n
  HAVING count(*) <= nn.n * 0.5
),
-- weights quantized to exact decimal so the dot/norm sums are
-- summation-order independent (base.py money convention)
w AS (
  SELECT tf.doc, tf.term,
         CAST(round(tf.tf * ln(dfreq.n / dfreq.df), 6) AS DECIMAL(18,6)) AS w
  FROM tf JOIN dfreq USING (term)
),
norms AS (SELECT doc, sum(w * w) AS s FROM w GROUP BY doc),
pairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_shared,
         sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc < b.doc
  GROUP BY 1, 2
),
scored AS (
  SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
         round(CAST(dot AS DOUBLE) / sqrt(CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)), 9) AS r9
  FROM pairs
  JOIN norms sa ON sa.doc = doc_a
  JOIN norms sb ON sb.doc = doc_b
)
SELECT doc_a, doc_b, n_shared, round(r9, 6) + 0.0 AS cosine_sim
FROM scored WHERE r9 >= 0.3
""",
    doc="sparse all-pairs TF-IDF cosine via inverted-index join (df-capped)",
)


def _q_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-center + renormalize the embedding table (pre-ANN pass).

    The operator returns (vec_id, centered array<double>, norm); the
    QUERY explodes it to one (vec_id, dim_index, component) row per
    dimension because the driver gate's pandas canonicalizer cannot
    sort list cells (top-level ArrayType is uncertifiable — r6 ERR;
    the flat shape also value-checks every component individually).
    Zero-norm vectors (centered IS NULL) emit no component rows,
    mirrored by the oracle's ``nn > 0`` predicate.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    res = similarity.center_vectors(emb, "vec_id", "embedding")
    return res.select(
        "vec_id",
        F.posexplode("centered").alias("dim_index", "component"),
        "centered_norm",
    )


QUERIES["sim_center_vectors"] = Q(
    _q_center,
    """
WITH dims AS (
  SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings
), cent AS (
  SELECT d, avg(v) AS c FROM dims GROUP BY d
), diff AS (
  SELECT vec_id, dims.d, v - c AS dv FROM dims JOIN cent USING (d)
), norms AS (
  SELECT vec_id, sqrt(sum(dv * dv)) AS nn FROM diff GROUP BY vec_id
)
SELECT f.vec_id,
       CAST(f.d - 1 AS INT) AS dim_index,
       -- + 0.0 canonicalizes IEEE -0.0 per component (see operator)
       round(f.dv / n.nn, 6) + 0.0 AS component,
       round(n.nn, 6) AS centered_norm
FROM diff f JOIN norms n ON f.vec_id = n.vec_id
WHERE n.nn > 0
""",
    doc="mean-center + renormalize embeddings (O(dim) centroid exchange, map-side rewrite)",
)


def _q_group_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label mean pairwise cosine via the |Σu|² identity — the
    cluster-redundancy audit with NO pairwise join (O(n·d), one
    partial-aggregating shuffle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.group_diversity(emb, "label", "embedding")


QUERIES["sim_group_diversity"] = Q(
    _q_group_diversity,
    """
WITH base AS (
  SELECT label, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
), u AS (
  SELECT label, unnest(v) / nrm AS uc, generate_subscripts(v, 1) AS d
  FROM base WHERE nrm > 0
), q AS (
  -- quantize unit components at 9 dp; (28,9) holder forces DuckDB's
  -- int128 multiply (the profile_correlations width workaround) while
  -- the VALUE equals Spark's decimal(18,9) quantization exactly
  SELECT label, d, CAST(uc AS DECIMAL(28,9)) AS q FROM u
), per AS (
  SELECT label, d, sum(q) AS s1,
         sum(CAST(q * q AS DECIMAL(38,18))) AS s2
  FROM q GROUP BY 1, 2
), lab AS (
  SELECT label,
         sum(CAST(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS DECIMAL(28,10))) AS S,
         sum(s2) AS T
  FROM per GROUP BY 1
), nn AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_vectors
  FROM base WHERE nrm > 0 GROUP BY 1
)
SELECT l.label, nn.n_vectors,
       round((CAST(S AS DOUBLE) - CAST(T AS DOUBLE))
             / (nn.n_vectors * (nn.n_vectors - 1.0)), 6) + 0.0
         AS mean_pairwise_cosine
FROM lab l JOIN nn USING (label) WHERE nn.n_vectors >= 2
""",
    doc="within-label mean pairwise cosine via |sum(u)|^2 identity (no pairwise join)",
)
