"""Text-analysis queries (SURVEY §2.h): token counting, quality scoring,
language ID, fingerprinting, n-gram frequency — oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.text import LANG_MARKERS, STOPWORDS
from ..sources.tables import load_table
from .base import Q
from .dedup_q import NORM_CTE


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every text query is regex/tokenize-heavy map work over the doc
    # scan; the testdata files are single-row-group parquet (one task),
    # so spread the scan — a no-op at scale (sources/tables docstring)
    from ..sources.tables import ensure_parallelism

    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").cast("int").alias("n_chars_actual"),
    )


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        F.round(TX.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(TX.stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(TX.mean_token_length(t), 6).alias("mean_token_len"),
        F.round(TX.quality_score(t), 6).alias("quality_score"),
    )


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        TX.lang_id(F.col("text")).alias("lang_pred"),
    )


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select("doc_id", TX.fingerprint(F.col("text")).alias("fingerprint"))


def _q_ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 trigram shingles by document frequency."""
    d = _docs(spark, sf_dir)
    sh = d.select(F.explode(TX.shingles_arrow(F.col("text"), 3)).alias("gram"))
    return (
        sh.groupBy("gram")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("gram"))
        .limit(20)
    )


def _in_list(items: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in items)


_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_NTOK = f"CASE WHEN len(trim(text)) = 0 THEN 0 ELSE CAST(len({_TOKS}) AS INTEGER) END"
_PUNCT = (
    "(len(text) - len(regexp_replace(text, '[.,!?;:''\"()\\[\\]{}-]', '', 'g')))"
    " / greatest(len(text), 1)"
)
_STOP = (
    f"len(list_filter({_TOKS}, x -> x IN ({_in_list(STOPWORDS)})))"
    f" / greatest(len({_TOKS}), 1)"
)
_MTL = (
    f"CAST(list_sum(list_transform({_TOKS}, x -> len(x))) AS DOUBLE)"
    f" / greatest(len({_TOKS}), 1)"
)
_QUALITY = (
    f"(CASE WHEN {_NTOK} >= 10 THEN 1.0 ELSE {_NTOK} / 10.0 END"
    f" + CASE WHEN {_MTL} >= 3 AND {_MTL} <= 10 THEN 1.0 ELSE 0.5 END"
    f" + 1.0 - least({_PUNCT} * 5, 1.0)"
    f" + least({_STOP} * 4, 1.0)) / 4"
)

#: public: the DuckDB twin of functions.text.quality_score — curation
#: oracles (source caps, dedup survivor selection) rank on the same score
QUALITY_SQL = _QUALITY

#: public: the DuckDB twin of functions.text.token_count
NTOK_SQL = _NTOK

_HITS = {
    lang: f"len(list_filter({_TOKS}, x -> x IN ({_in_list(words)})))"
    for lang, words in LANG_MARKERS.items()
}
_BEST = "greatest(" + ", ".join(_HITS.values()) + ")"
# ELSE 'und' matters: on NULL text every hit count is NULL, no WHEN
# fires, and a bare END would yield NULL where the Spark lang_id's
# otherwise-chain bottoms out at 'und'.
_LANG_CASE = (
    f"CASE WHEN {_BEST} = 0 THEN 'und' "
    + " ".join(f"WHEN {_HITS[lang]} = {_BEST} THEN '{lang}'" for lang in LANG_MARKERS)
    + " ELSE 'und' END"
)


QUERIES: dict[str, Q] = {
    "text_token_counts": Q(
        _q_token_counts,
        f"""
SELECT doc_id,
       {_NTOK} AS n_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER)
         AS n_bpe_tokens,
       CAST(len(text) AS INTEGER) AS n_chars_actual
FROM documents
""",
        doc="whitespace + BPE-ish token counting",
    ),
    "text_quality_scores": Q(
        _q_quality,
        f"""
SELECT doc_id,
       {_NTOK} AS n_tokens,
       round({_PUNCT}, 6) AS punct_ratio,
       round({_STOP}, 6) AS stopword_ratio,
       round({_MTL}, 6) AS mean_token_len,
       round({_QUALITY}, 6) AS quality_score
FROM documents
""",
        doc="document quality scoring (length/punct/stopword heuristics)",
    ),
    "text_lang_id": Q(
        _q_lang_id,
        f"""
SELECT doc_id, lang AS lang_label, {_LANG_CASE} AS lang_pred
FROM documents
""",
        doc="marker-word language identification heuristic",
    ),
    "text_fingerprint": Q(
        _q_fingerprint,
        NORM_CTE
        + """
SELECT doc_id, md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fingerprint
FROM toks
""",
        doc="per-document rolling fingerprint (sorted token-set md5)",
    ),
    "text_ngram_top20": Q(
        _q_ngram_top,
        NORM_CTE
        + """
, ex AS (SELECT doc_id, unnest(ss) AS gram FROM sh)
SELECT gram, count(*) AS doc_freq
FROM ex GROUP BY gram
ORDER BY doc_freq DESC, gram
LIMIT 20
""",
        doc="corpus top-20 trigram shingles by document frequency",
    ),
}


def _q_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-rule quality gates + repetition ratio — the
    explainable curation filter (which rule dropped each document)."""
    d = _docs(spark, sf_dir)
    # staged form: each metric evaluated once (functions/text.py
    # with_quality_flags — measured 1.72 -> 0.94 s at sf0.1)
    return TX.with_quality_flags(d.select("doc_id", "text"), "text")


QUERIES["text_quality_flags"] = Q(
    _q_quality_flags,
    NORM_CTE
    + f"""
, rep AS (
  SELECT toks.doc_id,
         CASE WHEN d2.text IS NULL THEN NULL
              WHEN len(t) - 2 <= 0 THEN 0.0
              ELSE 1.0 - CAST(len(ss) AS DOUBLE) / (len(t) - 2) END AS rep
  FROM toks JOIN sh ON toks.doc_id = sh.doc_id
            JOIN documents d2 ON toks.doc_id = d2.doc_id
)
SELECT d.doc_id,
       coalesce({_NTOK} >= 10, FALSE) AS len_ok,
       coalesce({_MTL} >= 3 AND {_MTL} <= 10, FALSE) AS word_len_ok,
       coalesce({_PUNCT} <= 0.2, FALSE) AS punct_ok,
       coalesce({_STOP} >= 0.05, FALSE) AS stopword_ok,
       coalesce(rep <= 0.5, FALSE) AS repetition_ok,
       coalesce({_NTOK} >= 10 AND {_MTL} >= 3 AND {_MTL} <= 10 AND {_PUNCT} <= 0.2
        AND {_STOP} >= 0.05 AND rep <= 0.5, FALSE) AS keep,
       round(rep, 6) AS repetition
FROM documents d JOIN rep ON d.doc_id = rep.doc_id
""",
    doc="Gopher-style per-rule quality gates (explainable keep/drop) + repetition ratio",
)


def _q_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial (Karp-Rabin-style) rolling hash of the full document:
    h = fold_chars((acc*31 + codepoint) mod 1e9+7). Pure map pass —
    the per-document fingerprint used for cheap shard-local dedup."""
    d = _docs(spark, sf_dir)
    ints = F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c))
    h = F.aggregate(
        ints,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )
    return d.select("doc_id", h.alias("rolling_hash"))


QUERIES["text_rolling_hash"] = Q(
    _q_rolling_hash,
    """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 1000000007
       ) AS rolling_hash
FROM documents
""",
    doc="Karp-Rabin-style rolling-hash document fingerprint",
)


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    out = TX.tfidf_top_terms(d, "doc_id", "text", k=3)
    return out.withColumnRenamed("doc", "doc_id")


QUERIES["text_tfidf_top_terms"] = Q(
    _q_tfidf,
    NORM_CTE
    + """
, toksx AS (
  SELECT doc_id, unnest(t) AS term FROM toks
), toks2 AS (
  SELECT doc_id, term FROM toksx WHERE len(term) > 0
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
), nn AS (
  SELECT count(DISTINCT doc_id) AS n FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(nn.n / dfreq.df) AS tfidf
  FROM tf JOIN dfreq USING (term), nn
)
SELECT doc_id, term, round(tfidf, 6) AS tfidf, rank FROM (
  SELECT doc_id, term, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY round(tfidf, 9) DESC, term) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 3
""",
    doc="per-document top-3 TF-IDF terms (the readable HashingTF/IDF form)",
)


def _q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the documents corpus in one scan."""
    from ..operators.profile import profile_table

    return profile_table(_docs(spark, sf_dir), ["doc_id", "lang", "text"])


QUERIES["profile_documents"] = Q(
    _q_profile,
    """
SELECT 'doc_id' AS column_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       count(DISTINCT doc_id) AS n_distinct,
       CAST(min(doc_id) AS VARCHAR) AS min_value, CAST(max(doc_id) AS VARCHAR) AS max_value
FROM documents
UNION ALL
SELECT 'lang', count(*),
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT lang), min(lang), max(lang)
FROM documents
UNION ALL
SELECT 'text', count(*),
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT text), min(text), max(text)
FROM documents
""",
    doc="one-scan per-column corpus profile (counts, nulls, distinct, min/max)",
)


def _q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation — the end-use of the §2.h operators combined:
    exact-dedup survivors only (min doc per fingerprint), quality-scored,
    top-5 per language by quality, with a running token budget per
    language. One shuffle per stage, all partial-aggregatable."""
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir)
    t = F.col("text")
    scored = d.select(
        "doc_id",
        "lang",
        TX.fingerprint(t).alias("fp"),
        F.round(TX.quality_score(t), 6).alias("quality"),
        TX.token_count(t).alias("n_tokens"),
    )
    # survivor = min doc_id per fingerprint, as a min_by partial agg:
    # map-side aggregation ships one candidate row per (fp, map task)
    # across the exchange instead of every row + a full per-fp sort
    # (guide §2.3 aggregate-before-you-shuffle; results identical —
    # doc_id is unique)
    dedup = (
        scored.groupBy("fp")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "quality", "n_tokens"),
                F.col("doc_id"),
            ).alias("_s")
        )
        .select("_s.doc_id", "_s.lang", "_s.quality", "_s.n_tokens")
    )
    rank_w = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    budget_w = rank_w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        dedup.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= 5)
        .withColumn("cum_tokens", F.sum("n_tokens").over(budget_w))
        .select("lang", "rank", "doc_id", "quality", "n_tokens", "cum_tokens")
    )


QUERIES["corpus_curation_top_per_lang"] = Q(
    _q_curation,
    NORM_CTE
    + f"""
, scored AS (
  SELECT doc_id, lang,
         md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp,
         round({_QUALITY}, 6) AS quality,
         {_NTOK} AS n_tokens
  FROM documents JOIN toks USING (doc_id)
), surv AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM scored
  ) WHERE rn = 1
), ranked AS (
  SELECT lang, doc_id, quality, n_tokens,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS INTEGER)
           AS rank
  FROM surv
)
SELECT lang, rank, doc_id, quality, n_tokens,
       CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY rank
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
FROM ranked WHERE rank <= 5
""",
    doc="corpus curation: dedup survivors → quality top-5 per language + token budget",
)


def _q_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = TX.chunk_text(_docs(spark, sf_dir), "doc_id", "text", chunk_tokens=30, stride=20)
    return out.withColumnRenamed("doc", "doc_id")


QUERIES["text_chunking"] = Q(
    _q_chunks,
    NORM_CTE
    + """
, starts AS (
  SELECT doc_id, t, unnest(range(0, greatest(len(t) - (30 - 20) - 1, 0) + 1, 20)) AS s
  FROM toks
)
SELECT doc_id,
       CAST(s / 20 AS INTEGER) AS chunk_index,
       array_to_string(t[s + 1 : s + 30], ' ') AS chunk_text,
       CAST(len(t[s + 1 : s + 30]) AS INTEGER) AS n_chunk_tokens
FROM starts
""",
    doc="overlapping context-window chunking (30-token chunks, stride 20)",
)


_SAMPLE_BUCKET = (
    "(('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 15))::BIGINT % 10000)"
)


def _q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 20% corpus sample by doc_id hash — deterministic on
    any engine/partitioning (operators.sampling), unlike df.sample()."""
    from ..operators.sampling import deterministic_sample

    out = deterministic_sample(_docs(spark, sf_dir), "doc_id", 0.2)
    return out.groupBy("lang").agg(
        F.count("*").alias("n_sampled"), F.min("doc_id").alias("first_doc")
    )


QUERIES["sample_deterministic_20pct"] = Q(
    _q_sample,
    f"""
SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
FROM documents
WHERE {_SAMPLE_BUCKET.format(key="doc_id")} < 2000
GROUP BY 1
""",
    doc="reproducible hash-keyed 20% sample (portable across engines/partitionings)",
)


def _q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: per-language sampling rates."""
    from ..operators.sampling import mix_corpus

    rates = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.1}
    out = mix_corpus(_docs(spark, sf_dir), "doc_id", "lang", rates)
    return out.groupBy("lang").agg(F.count("*").alias("n_kept"))


QUERIES["corpus_mixture_rates"] = Q(
    _q_mixture,
    f"""
SELECT lang, count(*) AS n_kept
FROM documents
WHERE {_SAMPLE_BUCKET.format(key="doc_id")} <
      CASE lang WHEN 'en' THEN 10000 WHEN 'de' THEN 5000
                WHEN 'fr' THEN 2500 WHEN 'es' THEN 1000 END
GROUP BY 1
""",
    doc="per-language training-mixture rates via deterministic hash sampling",
)


def _q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any 5-gram with
    the (deterministically sampled, 2%) held-out eval set. The eval
    gram set is broadcast — the production shape (benchmarks ≪ corpus);
    the corpus side is map-side shingling + broadcast join, with one
    uniform-key shuffle of only the hit rows."""
    from ..operators.decontam import ngram_decontaminate
    from ..operators.sampling import rate_bucket

    d = _docs(spark, sf_dir)
    bucket = rate_bucket(F.col("doc_id"))
    return ngram_decontaminate(
        d.filter(bucket >= 200), d.filter(bucket < 200), n=5
    )


_SH5_CTE = """
, sh5 AS (
  SELECT doc_id,
         CASE WHEN len(t) - 4 <= 0 THEN [nt]
              ELSE list_distinct(list_transform(range(1, len(t) - 3),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                        t[i+3] || ' ' || t[i+4])) END AS ss
  FROM toks
)
"""

QUERIES["decontam_ngram_overlap"] = Q(
    _q_decontam,
    NORM_CTE
    + _SH5_CTE
    + f"""
, ev AS (SELECT DISTINCT unnest(ss) AS gram FROM sh5
         WHERE {_SAMPLE_BUCKET.format(key="doc_id")} < 200),
tr AS (SELECT doc_id, unnest(ss) AS gram FROM sh5
       WHERE {_SAMPLE_BUCKET.format(key="doc_id")} >= 200)
SELECT tr.doc_id, count(DISTINCT tr.gram) AS n_hit_grams
FROM tr JOIN ev USING (gram)
GROUP BY 1
""",
    doc="train/eval 5-gram decontamination (broadcast eval gram set)",
)


def _q_token_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length histogram in power-of-two buckets (bucket =
    bit length of the token count) — the one-pass length profile a
    curation run reads before choosing min/max-length gates. Map-side
    bucket derivation + one tiny shuffle (O(buckets) groups)."""
    d = _docs(spark, sf_dir)
    n = TX.token_count(F.col("text"))
    bucket = (
        F.when(n <= 0, F.lit(0))
        .otherwise(F.length(F.conv(n.cast("string"), 10, 2)))
        .cast("int")
    )
    return (
        d.select(n.alias("n"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
    )


QUERIES["text_token_histogram"] = Q(
    _q_token_hist,
    f"""
SELECT bucket, count(*) AS n_docs,
       min(n) AS min_tokens, max(n) AS max_tokens
FROM (
  SELECT {_NTOK} AS n,
         CASE WHEN {_NTOK} <= 0 THEN 0
              ELSE CAST(len(bin({_NTOK})) AS INTEGER) END AS bucket
  FROM documents
)
GROUP BY 1
""",
    doc="power-of-two token-length histogram (curation length-gate profile)",
)


def _q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha-sampling mixture solver: flatten per-language shares with
    temperature alpha=0.3, realized at the largest no-upsampling corpus
    size. Group-level windows only (one row per language)."""
    from ..operators.sampling import temperature_mixture_rates

    return temperature_mixture_rates(_docs(spark, sf_dir), "lang", alpha=0.3)


QUERIES["corpus_temperature_mixture"] = Q(
    _q_temperature_mixture,
    """
WITH g AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
s AS (SELECT lang, n_docs,
             n_docs::DOUBLE / sum(n_docs) OVER () AS p,
             pow(n_docs::DOUBLE / sum(n_docs) OVER (), 0.3) AS pa
      FROM g),
q AS (SELECT lang, n_docs, p, pa / sum(pa) OVER () AS q FROM s),
t AS (SELECT *, min(n_docs / q) OVER () AS tt FROM q)
SELECT lang, n_docs,
       round(p, 6) AS p_raw,
       round(q, 6) AS q_temp,
       round(q * tt / n_docs, 6) AS sample_rate,
       floor(round(q * tt, 9))::BIGINT AS expected_docs
FROM t
""",
    doc="temperature-scaled (alpha=0.3) mixture rates at the no-upsampling corpus size",
)


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted 25-doc sample (A-ES, seed-free): long documents
    proportionally likelier, membership engine-portable."""
    from ..operators.sampling import weighted_sample_topn

    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    return weighted_sample_topn(d, "doc_id", "n_chars", 25)


QUERIES["sample_weighted_topn"] = Q(
    _q_weighted_sample,
    f"""
WITH r AS (
  SELECT doc_id, lang, n_chars,
         round(ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   / CAST({float(16**15)} AS DOUBLE))) / n_chars, 12) AS rr
  FROM documents WHERE n_chars > 0
), t AS (
  SELECT *, row_number() OVER (ORDER BY rr DESC, doc_id ASC) AS sample_rank
  FROM r
)
SELECT doc_id, lang, n_chars, CAST(sample_rank AS INTEGER) AS sample_rank,
       round(rr, 6) AS es_rank
FROM t WHERE sample_rank <= 25
""",
    doc="weighted sampling without replacement (Efraimidis-Spirakis, portable-hash ranks)",
)


def _q_target_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to an explicit per-language target
    distribution at the largest no-upsampling size."""
    from ..operators.sampling import target_mixture_rates

    targets = {"en": 0.4, "de": 0.3, "fr": 0.2, "es": 0.1}
    return target_mixture_rates(_docs(spark, sf_dir), "lang", targets)


QUERIES["corpus_target_mixture"] = Q(
    _q_target_mixture,
    """
WITH g AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
q AS (SELECT lang, n_docs,
             CASE lang WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.3
                       WHEN 'fr' THEN 0.2 WHEN 'es' THEN 0.1
                       ELSE 0.0 END AS tq
      FROM g),
t AS (SELECT *, min(CASE WHEN tq > 0 THEN n_docs / tq END) OVER () AS tt FROM q)
SELECT lang, n_docs, round(tq::DOUBLE, 6) AS target_share,
       round(CASE WHEN tq > 0 THEN tq * tt / n_docs ELSE 0.0 END, 6) AS sample_rate,
       floor(round(tq * tt, 9))::BIGINT AS expected_docs
FROM t
""",
    doc="explicit target-distribution rebalancing at the no-upsampling corpus size",
)


def _q_categorical_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-distribution imbalance profile (entropy/gini/modal
    share) — the summary a rebalancing pass starts from."""
    from ..operators.profile import profile_categorical

    return profile_categorical(_docs(spark, sf_dir), "lang")


QUERIES["profile_lang_distribution"] = Q(
    _q_categorical_profile,
    """
WITH c AS (
  SELECT coalesce(CAST(lang AS VARCHAR), '<NULL>') AS cat,
         count(*)::BIGINT AS n
  FROM documents GROUP BY 1
), t AS (
  SELECT n,
         n::DOUBLE / (SELECT sum(n)::DOUBLE FROM c) AS p
  FROM c
), q AS (
  SELECT n, p,
         CAST(round(-p * ln(p), 12) AS DECIMAL(20,12)) AS h,
         CAST(round(p * p, 12) AS DECIMAL(20,12)) AS g
  FROM t
)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       count(*)::BIGINT AS n_categories,
       round(CAST(sum(h) AS DOUBLE), 6) AS entropy_nats,
       round(1.0 - CAST(sum(g) AS DOUBLE), 6) AS gini_impurity,
       round(max(p), 6) AS top_share
FROM q
""",
    doc="categorical imbalance profile: decimal-exact entropy/gini/modal share",
)


def _q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependence between language and source in the corpus (one-scan
    MI + normalized MI)."""
    from ..operators.profile import profile_mutual_information

    return profile_mutual_information(_docs(spark, sf_dir), "lang", "source")


QUERIES["profile_lang_source_mi"] = Q(
    _q_mutual_information,
    """
WITH j AS (
  SELECT coalesce(CAST(lang AS VARCHAR), '<NULL>') AS a,
         coalesce(CAST(source AS VARCHAR), '<NULL>') AS b,
         count(*)::BIGINT AS n
  FROM documents GROUP BY 1, 2
), p AS (
  SELECT n,
         n::DOUBLE / sum(n) OVER () AS pxy,
         sum(n) OVER (PARTITION BY a)::DOUBLE / sum(n) OVER () AS px,
         sum(n) OVER (PARTITION BY b)::DOUBLE / sum(n) OVER () AS py
  FROM j
), q AS (
  SELECT n,
         CAST(round(pxy * ln(pxy / (px * py)), 12) AS DECIMAL(20,12)) AS mi,
         CAST(round(-pxy * ln(px), 12) AS DECIMAL(20,12)) AS ha,
         CAST(round(-pxy * ln(py), 12) AS DECIMAL(20,12)) AS hb
  FROM p
), s AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*)::BIGINT AS n_cells,
         CAST(sum(mi) AS DOUBLE) AS mi_t,
         CAST(sum(ha) AS DOUBLE) AS ha_t,
         CAST(sum(hb) AS DOUBLE) AS hb_t
  FROM q
)
SELECT n_rows, n_cells,
       round(mi_t, 6) AS mi_nats,
       round(ha_t, 6) AS entropy_a,
       round(hb_t, 6) AS entropy_b,
       round(CASE WHEN least(ha_t, hb_t) > 0 THEN mi_t / least(ha_t, hb_t)
                  ELSE 0.0 END, 6) + 0.0 AS nmi
FROM s
""",
    doc="mutual information between two categoricals (decimal-exact cell terms, one scan)",
)


def _q_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length envelope (exact p10/p50/p90) — the
    length-filter calibration table."""
    d = _docs(spark, sf_dir)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.1)"), 3).alias("p10_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 3).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 3).alias("p90_chars"),
    )


QUERIES["profile_length_percentiles"] = Q(
    _q_length_percentiles,
    """
SELECT lang, count(*)::BIGINT AS n_docs,
       round(quantile_cont(n_chars, 0.1), 3) AS p10_chars,
       round(quantile_cont(n_chars, 0.5), 3) AS p50_chars,
       round(quantile_cont(n_chars, 0.9), 3) AS p90_chars
FROM documents GROUP BY 1
""",
    doc="per-language length percentiles (length-filter calibration)",
)


def _q_top_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2-gram dominance per document — the 'one phrase dominates'
    half of the Gopher repetition rules (text_quality_flags carries the
    distinct-ngram half)."""
    d = load_table(spark, sf_dir, "documents")
    return TX.top_ngram_stats(d, "doc_id", "text", n=2)


QUERIES["text_top_ngram_fraction"] = Q(
    _q_top_ngram,
    """
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[.,!?;:''"()\\[\\]{}-]', '', 'g'), '\\s+', ' ', 'g')) AS nt
  FROM documents
), toks AS (
  SELECT doc_id, string_split(nt, ' ') AS t, nt FROM norm
), grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
                        i -> t[i] || ' ' || t[i+1])) AS gram
  FROM toks WHERE len(nt) > 0 AND len(t) >= 2
), c AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
  FROM grams GROUP BY 1, 2
), r AS (
  SELECT doc_id, gram, c,
         sum(c) OVER (PARTITION BY doc_id) AS total,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
  FROM c
)
SELECT doc_id, CAST(total AS BIGINT) AS total_ngrams, gram AS top_ngram,
       c AS top_count, round(c / CAST(total AS DOUBLE), 6) AS top_frac
FROM r WHERE rn = 1
""",
    doc="top-2-gram dominance per doc (Gopher 'one phrase dominates' repetition rule)",
)


def _q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled vs detected language with
    counts and per-label share — the QA report that decides whether
    the lang-id heuristic is trustworthy enough to stratify on."""
    d = _docs(spark, sf_dir)
    from pyspark.sql.window import Window

    pred = d.select(
        F.col("lang").alias("lang_label"),
        TX.lang_id(F.col("text")).alias("lang_pred"),
    )
    w = Window.partitionBy("lang_label")
    return (
        pred.groupBy("lang_label", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn(
            "label_share",
            F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6),
        )
        .withColumn(
            # when().otherwise(0), not a bare ==.cast("int"): a NULL
            # lang_label must yield 0 (the oracle CASE's ELSE), not NULL
            "agree",
            F.when(F.col("lang_label") == F.col("lang_pred"), 1)
            .otherwise(0)
            .cast("int"),
        )
    )


QUERIES["text_lang_confusion"] = Q(
    _q_lang_confusion,
    f"""
WITH p AS (
  SELECT lang AS lang_label, {_LANG_CASE} AS lang_pred FROM documents
), c AS (
  SELECT lang_label, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
  FROM p GROUP BY 1, 2
)
SELECT lang_label, lang_pred, n_docs,
       round(n_docs / CAST(sum(n_docs) OVER (PARTITION BY lang_label) AS DOUBLE), 6)
         AS label_share,
       CAST(CASE WHEN lang_label = lang_pred THEN 1 ELSE 0 END AS INTEGER) AS agree
FROM c
""",
    doc="lang-id confusion matrix: labeled vs detected language, per-label shares",
)
