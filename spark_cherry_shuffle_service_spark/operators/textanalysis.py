"""Text analysis over `documents` (north-star extension; BASELINE.json).

Language-ID (stopword-overlap heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (md5 + polynomial
rolling hash). All JVM-side column expressions — no Python in the hot path;
at 100 TB these are embarrassingly parallel scans with small aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.functions.aggregates import davg, dsum, money
from spark_cherry_shuffle_service_spark.functions.text import bigrams, distinct_tokens, tokens
from spark_cherry_shuffle_service_spark.plans.oracle import dsum_sql
from spark_cherry_shuffle_service_spark.plans.oracle import davg_sql
from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import spread, table

# Tiny per-language marker lists (public stopwords). The fixture text is
# synthetic, so this exercises the *computation* (overlap-count argmax with
# deterministic tie-priority), which is what the oracle verifies.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "un"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "zh": ["de", "shi", "le", "bu", "wo", "ni", "ta"],
}

_SQL_TOKS = "string_split_regex(trim(text), ' +')"


def _sql_list(words: list[str]) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"[{inner}]"


def _langid_score_sql(lang: str) -> str:
    return f"len(list_intersect(list_distinct({_SQL_TOKS}), {_sql_list(LANG_MARKERS[lang])}))"


_LANG_ORDER = list(LANG_MARKERS)  # tie-priority = declaration order


# ---------------------------------------------------------------------------
# Language ID: argmax of marker-word overlap, ties broken by fixed priority.
# ---------------------------------------------------------------------------
@query(
    "text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT lang AS true_lang,
             { ", ".join(f"{_langid_score_sql(lg)} AS s_{lg}" for lg in _LANG_ORDER) },
             GREATEST({ ", ".join(f"s_{lg}" for lg in _LANG_ORDER) }) AS m
      FROM documents
    )
    SELECT true_lang,
           CASE { " ".join(f"WHEN s_{lg} = m THEN '{lg}'" for lg in _LANG_ORDER) } END AS pred_lang,
           COUNT(*) AS n
    FROM scored
    GROUP BY true_lang, CASE { " ".join(f"WHEN s_{lg} = m THEN '{lg}'" for lg in _LANG_ORDER) } END
    """,
    tags=("text", "langid"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = distinct_tokens(F.col("text"))
    scored = docs.select(
        F.col("lang").alias("true_lang"),
        *[
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_MARKERS[lg]]))).alias(
                f"s_{lg}"
            )
            for lg in _LANG_ORDER
        ],
    ).withColumn("m", F.greatest(*[F.col(f"s_{lg}") for lg in _LANG_ORDER]))
    expr = None
    for lg in _LANG_ORDER:
        cond = F.col(f"s_{lg}") == F.col("m")
        expr = F.when(cond, lg) if expr is None else expr.when(cond, lg)
    return (
        scored.withColumn("pred_lang", expr)
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Quality scoring: token count, chars/token, marker-word (stopword) ratio.
# ---------------------------------------------------------------------------
@query(
    "text_quality",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             len({_SQL_TOKS}) AS n_toks,
             length(replace(trim(text), ' ', ''))::DOUBLE / len({_SQL_TOKS}) AS chars_per_tok,
             len(list_filter({_SQL_TOKS},
                 t -> list_contains({_sql_list(LANG_MARKERS['en'])}, t)))::DOUBLE
               / len({_SQL_TOKS}) AS stop_ratio
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_toks,
           {davg_sql('chars_per_tok', 'avg_chars_per_tok')},
           {davg_sql('stop_ratio', 'avg_stop_ratio')},
           CAST(SUM(CASE WHEN n_toks BETWEEN 40 AND 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid_length
    FROM per_doc
    GROUP BY source
    """,
    tags=("text", "quality"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    en = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    per_doc = docs.select(
        "source",
        F.size(toks).alias("n_toks"),
        (
            F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("chars_per_tok"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(en, t))).cast("double") / F.size(toks)
        ).alias("stop_ratio"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_toks"),
        davg(F.col("chars_per_tok"), "avg_chars_per_tok"),
        davg(F.col("stop_ratio"), "avg_stop_ratio"),
        F.sum(F.when(F.col("n_toks").between(40, 80), 1).otherwise(0)).alias("n_mid_length"),
    )


# ---------------------------------------------------------------------------
# Token counting: whitespace tokens + BPE-ish regex tokens (common
# Java/RE2 regex dialect).
# ---------------------------------------------------------------------------
@query(
    "text_token_count",
    oracle="""
    SELECT lang,
           CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "tokens"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(F.size(tokens(F.col("text")))).alias("ws_tokens"),
        F.sum(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        ).alias("bpe_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: md5 of normalized text + polynomial rolling hash
# over tokens (mod 1e9+7; pure integer math → engine-independent).
# ---------------------------------------------------------------------------
@query(
    "text_top_terms",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS term
      FROM documents
    ), counted AS (
      SELECT lang, term, COUNT(*) AS n FROM tok GROUP BY lang, term
    )
    SELECT lang, term, n, rnk FROM (
      SELECT lang, term, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rnk
      FROM counted
    ) WHERE rnk <= 10
    """,
    tags=("text", "topk", "shuffle"),
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 terms per language: the classic explode→count→per-group-top-k
    shuffle pattern. At 100 TB the groupBy is map-side combined and the
    top-k is a bounded per-partition heap via the rank window."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    counted = (
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term"))
    return (
        counted.select("lang", "term", "n", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 10)
    )


@query(
    "text_approx_distinct",
    oracle=None,  # HLL sketches are engine-specific — rows-only check;
    # tests/test_scale_paths.py bounds the relative error vs exact counts.
    tags=("text", "approx", "scale"),
)
def text_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct: the 100 TB substitute for exact COUNT(DISTINCT)
    (single-pass HLL, no second shuffle). Not in the reference surface
    (SURVEY.md §2.4 'not present') — provided as the scale path."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.approx_count_distinct(F.md5(F.trim(F.col("text")))).alias("approx_unique_docs"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(trim(text)) AS fp_md5,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform({_SQL_TOKS},
                 t -> CAST(length(t) * 7 + ascii(substr(t, 1, 1)) AS BIGINT))),
             (acc, x) -> (acc * 131 + x) % 1000000007) AS fp_roll
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    token_codes = F.transform(
        toks, lambda t: (F.length(t) * 7 + F.ascii(F.substring(t, 1, 1))).cast("long")
    )
    rolling = F.aggregate(
        token_codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 131 + x) % 1000000007,
    )
    return docs.select(
        "doc_id",
        F.md5(F.trim(F.col("text"))).alias("fp_md5"),
        rolling.alias("fp_roll"),
    )


# ---------------------------------------------------------------------------
# Wordcount — the reference's example .py workload (spark-driver.sh:48-51,
# SURVEY.md §0.4: wordcount over a CSV). Same semantics over the documents
# corpus: full term → count table, one explode + one map-side-combined
# shuffle. Restricted to terms with n >= 5 to keep the result set bounded.
# ---------------------------------------------------------------------------
@query(
    "text_wordcount",
    oracle="""
    SELECT term, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split_regex(trim(text), ' +')) AS term
      FROM documents
    )
    GROUP BY term
    HAVING COUNT(*) >= 5
    """,
    tags=("text", "wordcount", "workload"),
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


# ---------------------------------------------------------------------------
# posexplode / LATERAL VIEW shape: tokens with positions — the generator-
# function form (Spark: posexplode; oracle: lateral generate_series join).
# Bounded to doc_id < 25 so the row fan-out stays test-sized.
# ---------------------------------------------------------------------------
@query(
    "text_posexplode",
    oracle=f"""
    SELECT doc_id, CAST(z[2] - 1 AS INT) AS pos, z[1] AS term
    FROM (
      SELECT doc_id, unnest(list_zip(t, generate_series(1, len(t)))) AS z
      FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents WHERE doc_id < 25)
    )
    """,
    tags=("text", "posexplode", "lateral"),
)
def text_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 25)
    return docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "term")
    )


# ---------------------------------------------------------------------------
# Data profiling: per-column null/distinct/extremes over documents in ONE
# aggregation pass (no per-column jobs) — the first step of any training-
# data ingest. At 100 TB this is a single scan + scalar agg; distincts are
# exact here for the oracle, approx_count_distinct in production.
# ---------------------------------------------------------------------------
@query(
    "table_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(text) AS text_nonnull,
           COUNT(DISTINCT lang) AS lang_distinct,
           COUNT(DISTINCT source) AS source_distinct,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id,
           MIN(length(text)) AS min_len,
           MAX(length(text)) AS max_len
    FROM documents
    """,
    tags=("profile", "agg", "pipeline"),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("text").alias("text_nonnull"),
        F.countDistinct("lang").alias("lang_distinct"),
        F.countDistinct("source").alias("source_distinct"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.min(F.length("text")).alias("min_len"),
        F.max(F.length("text")).alias("max_len"),
    )


# ---------------------------------------------------------------------------
# Higher-order array predicates: exists / forall over token arrays — the
# last HOF pair (transform/aggregate/zip_with/filter appear elsewhere).
# ---------------------------------------------------------------------------
@query(
    "text_hof_predicates",
    oracle=f"""
    SELECT lang,
           CAST(SUM(CASE WHEN list_bool_or(list_transform({_SQL_TOKS}, t -> length(t) >= 10))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_long_token,
           CAST(SUM(CASE WHEN list_bool_and(list_transform({_SQL_TOKS}, t -> length(t) <= 14))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_all_short,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "hof", "exists", "forall"),
)
def text_hof_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    has_long = F.exists(toks, lambda t: F.length(t) >= 10)
    all_short = F.forall(toks, lambda t: F.length(t) <= 14)
    return docs.groupBy("lang").agg(
        F.sum(F.when(has_long, 1).otherwise(0)).alias("n_with_long_token"),
        F.sum(F.when(all_short, 1).otherwise(0)).alias("n_all_short"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Repetition quality filters (the Gopher/C4-style signals a pretraining
# corpus is screened with): per-doc duplicate-token fraction and
# most-frequent-bigram fraction, rolled up per source. One explode shuffle
# keyed by (doc_id, gram) with map-side combine, then a per-source agg —
# embarrassingly parallel at 100 TB (no cross-doc state).
# ---------------------------------------------------------------------------
_SQL_BIGRAMS = (
    "list_transform(list_zip(t[1:len(t)-1], t[2:len(t)]), z -> z[1] || ' ' || z[2])"
)


@query(
    "text_repetition",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, {_SQL_TOKS} AS t FROM documents
    ), per_doc AS (
      SELECT doc_id, source, len(t) AS n_toks, len(list_distinct(t)) AS n_uniq,
             {_SQL_BIGRAMS} AS grams
      FROM tok
    ), top_gram AS (
      SELECT doc_id, MAX(c) AS top_c FROM (
        SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(grams) AS g FROM per_doc)
        GROUP BY doc_id, g
      ) GROUP BY doc_id
    ), scored AS (
      SELECT source,
             1.0 - n_uniq::DOUBLE / n_toks AS dup_frac,
             COALESCE(top_c, 0)::DOUBLE / GREATEST(n_toks - 1, 1) AS top_bigram_frac
      FROM per_doc LEFT JOIN top_gram USING (doc_id)
    )
    SELECT source,
           COUNT(*) AS n_docs,
           {davg_sql('dup_frac', 'avg_dup_frac')},
           {davg_sql('top_bigram_frac', 'avg_top_bigram_frac')},
           CAST(SUM(CASE WHEN dup_frac > 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
           CAST(SUM(CASE WHEN top_bigram_frac >= 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS n_gram_spam
    FROM scored
    GROUP BY source
    """,
    tags=("text", "quality", "repetition", "pipeline"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = tokens(F.col("text"))
    # Two branches over docs: keep the bigram construction ONLY in the
    # explode branch — carrying the gram array into the stats branch too
    # would compute it twice (once per union/join branch; the cacheManager
    # does not share subtrees across branches of one plan).
    stats = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )
    top_gram = (
        docs.select("doc_id", F.explode(bigrams(F.col("text"))).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    scored = stats.join(top_gram, "doc_id", "left").select(
        "source",
        (F.lit(1.0) - F.col("n_uniq").cast("double") / F.col("n_toks")).alias("dup_frac"),
        (
            F.coalesce(F.col("top_c"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_toks") - 1, F.lit(1))
        ).alias("top_bigram_frac"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg(F.col("dup_frac"), "avg_dup_frac"),
        davg(F.col("top_bigram_frac"), "avg_top_bigram_frac"),
        F.sum(F.when(F.col("dup_frac") > 0.6, 1).otherwise(0)).alias("n_repetitive"),
        F.sum(F.when(F.col("top_bigram_frac") >= 0.08, 1).otherwise(0)).alias("n_gram_spam"),
    )


# ---------------------------------------------------------------------------
# BM25 ranking against a FIXED query-term set (Okapi BM25, k1=1.2 b=0.75).
# The query vocabulary is SF-invariant, so its 4-row doc-frequency table and
# the 1-row (N, avgdl) corpus stats may be broadcast under the repo policy;
# the only SF-scaling shuffle is the (doc_id, term) tf aggregation. Per-term
# contributions round through the DECIMAL convention so the per-doc sum is
# parallelism-invariant; LIMIT is tiebroken by doc_id.
# ---------------------------------------------------------------------------
BM25_QUERY_TERMS = ("spark", "join", "vector", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_terms_sql() -> str:
    return ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)


@query(
    "text_bm25",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, len({_SQL_TOKS}) AS dl FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents)
      WHERE term IN ({_bm25_terms_sql()})
      GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), contrib AS (
      SELECT tf.doc_id,
             ROUND(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl)),
               6) AS c
      FROM tf JOIN df USING (term) JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    )
    SELECT doc_id, {dsum_sql('c', 'bm25')}, COUNT(*) AS n_terms
    FROM contrib
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 15
    """,
    tags=("text", "bm25", "ranking", "pipeline"),
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = tokens(F.col("text"))
    dl = docs.select("doc_id", F.size(toks).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # broadcast: fixed 4-term vocab + 1-row corpus stats (SF-invariant).
    joined = (
        tf.join(F.broadcast(df_tbl), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_norm = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    contrib = joined.select("doc_id", F.round(idf * tf_norm, 6).alias("c"))
    return (
        contrib.groupBy("doc_id")
        .agg(dsum(F.col("c"), "bm25"), F.count(F.lit(1)).alias("n_terms"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Inverted index: term -> doc frequency + the first 12 postings. The
# postings sample is bounded BEFORE any collection (row_number <= 12 per
# term), so per-term state never exceeds 12 rows regardless of corpus size —
# collect_list only ever sees the bounded sample. df is counted in a
# separate pre-filter aggregation over the same shuffle key.
# ---------------------------------------------------------------------------
@query(
    "text_inverted_index",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT term, doc_id
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
            FROM documents)
    ), df AS (
      SELECT term, COUNT(*) AS df FROM pairs GROUP BY term
    ), ranked AS (
      SELECT term, doc_id,
             ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM pairs
    ), sample AS (
      SELECT term, array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
      FROM ranked WHERE rn <= 12 GROUP BY term
    )
    SELECT term, df, postings
    FROM df JOIN sample USING (term)
    """,
    tags=("text", "index", "topk-per-group"),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    pairs = docs.select(
        F.explode(distinct_tokens(F.col("text"))).alias("term"), "doc_id"
    )
    df_tbl = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    sample = (
        pairs.select("term", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 12)
        .groupBy("term")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("postings")
        )
    )
    return df_tbl.join(sample, "term").select("term", "df", "postings")


# ---------------------------------------------------------------------------
# Unigram surprisal (perplexity proxy): fit a unigram LM on the corpus
# itself, score each document by mean -log2 p(token) bits/token, roll up
# per source. The standard cheap "how surprising is this text" quality
# signal between raw scrape and an actual LM scorer.
#
# Scale shape: one token-level shuffle builds the frequency table (map-side
# combined; vocab-sized output, sublinear in corpus), one scalar total, one
# join of the exploded tokens against the vocab table (AQE broadcasts it at
# any realistic vocab size — unhinted per the broadcast policy since vocab
# does grow with corpus), one per-doc agg, one per-source rollup. All
# JVM-side; linear in total tokens.
#
# Determinism: both engines see the identical double quotient, but log2
# is a LIBM call — Java and C disagree in the last ulp for some inputs,
# and a 6-dp ROUND of a transcendental occasionally lands on a .5
# boundary where that ulp flips the rounded value (observed once at
# sf0.1). Per-token bits are therefore pre-rounded to 4 dp — boundary
# density drops 100× (no observed ties at any fixture SF) — and all
# sums/averages go through the ROUND→DECIMAL(18,6) convention so
# aggregation order never matters. The exact-determinism paths in this
# engine avoid transcendentals entirely (see graph.py's fixed-point
# PageRank); surprisal keeps log2 because bits-per-token IS the metric.
# ---------------------------------------------------------------------------
@query(
    "text_surprisal",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({_SQL_TOKS}) AS term FROM documents
    ), freq AS (
      SELECT term, COUNT(*) AS tf FROM tok GROUP BY term
    ), tot AS (
      SELECT COUNT(*) AS n FROM tok
    ), per_doc AS (
      SELECT t.doc_id, t.source,
             {davg_sql('ROUND(log2(CAST(n AS DOUBLE) / tf), 4)', 'bits_per_tok')}
      FROM tok t JOIN freq USING (term) CROSS JOIN tot
      GROUP BY t.doc_id, t.source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           {davg_sql('bits_per_tok', 'avg_bits')},
           ROUND(MIN(bits_per_tok), 6) AS min_bits,
           ROUND(MAX(bits_per_tok), 6) AS max_bits
    FROM per_doc
    GROUP BY source
    """,
    tags=("text", "quality", "surprisal", "lm", "pipeline"),
)
def text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread on doc_id: tokenize+explode feed two consumers and would
    # otherwise run (twice) inside the lone single-row-group scan task
    # (guide §2); hashpartitioning(doc_id) also pre-satisfies the per-doc
    # groupBy's clustering, removing its exchange (guide §2.4).
    docs = spread(
        table(spark, sf_dir, "documents").select("doc_id", "source", "text"), "doc_id"
    )
    tok = docs.select("doc_id", "source", F.explode(tokens(F.col("text"))).alias("term"))
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    # Corpus token total = Σ tf over the vocab table: same value as a
    # COUNT(*) over tok, without a third tokenize pass (guide §2.3
    # "aggregate before you shuffle" — the oracle keeps the COUNT(*) form).
    # coalesce keeps the COUNT(*) contract exactly on an empty corpus
    # (SUM over zero rows is NULL where COUNT(*) is 0 — ADVICE r11).
    tot = freq.agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("n"))
    per_doc = (
        tok.join(freq, "term")
        .crossJoin(F.broadcast(tot))  # 1-row scalar: SF-invariant, hint allowed
        .groupBy("doc_id", "source")
        .agg(
            davg(
                F.round(F.log2(F.col("n").cast("double") / F.col("tf")), 4),
                "bits_per_tok",
            )
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg(F.col("bits_per_tok"), "avg_bits"),
        F.round(F.min("bits_per_tok"), 6).alias("min_bits"),
        F.round(F.max("bits_per_tok"), 6).alias("max_bits"),
    )


# ---------------------------------------------------------------------------
# Document chunking: fixed-size overlapping token windows (size 32, stride
# 24 → 8-token overlap) — the RAG/embedding-prep op between cleaned docs
# and the encoder. Chunk count and membership derive from the token array
# arithmetically (sequence + slice); chunk text leaves as an md5
# fingerprint to keep result width bounded. Embarrassingly parallel scan,
# fan-out ≈ n_tokens/stride per doc, no shuffle at all — the plan is a
# single projection+generate stage at any corpus size.
# ---------------------------------------------------------------------------
_CHUNK, _STRIDE = 32, 24


@query(
    "text_chunk",
    oracle=f"""
    SELECT doc_id,
           CAST(k AS BIGINT) AS chunk_id,
           CAST(len(t[k * {_STRIDE} + 1 : k * {_STRIDE} + {_CHUNK}]) AS BIGINT) AS n_toks,
           md5(array_to_string(t[k * {_STRIDE} + 1 : k * {_STRIDE} + {_CHUNK}], ' ')) AS chunk_hash
    FROM (
      SELECT doc_id, t,
             unnest(generate_series(0,
               CASE WHEN len(t) <= {_CHUNK} THEN 0
                    ELSE CAST(ceil((len(t) - {_CHUNK}) / {_STRIDE}.0) AS INT) END)) AS k
      FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents)
    )
    """,
    tags=("text", "chunking", "rag", "pipeline"),
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    n = F.size(t)
    last = F.when(n <= _CHUNK, F.lit(0)).otherwise(
        F.ceil((n - _CHUNK) / F.lit(float(_STRIDE))).cast("int")
    )
    chunk = F.slice(
        F.col("t"), F.col("k") * _STRIDE + 1, F.lit(_CHUNK)
    )
    return (
        docs.select("doc_id", t.alias("t"), F.explode(F.sequence(F.lit(0), last)).alias("k"))
        .select(
            "doc_id",
            F.col("k").cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_toks"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
    )


# ---------------------------------------------------------------------------
# Shannon entropy of the token distribution per language — the corpus
# diversity metric a training-data card reports. Two aggregation grains:
# (lang, token) counts shuffle once on the compound key with map-side
# combine; the per-lang entropy sum runs over the bounded vocabulary
# grain. -Σ p·ln p routes through the decimal-sum convention so the
# float reduction is order-independent cross-engine.
# ---------------------------------------------------------------------------
@query(
    "text_entropy",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS w
      FROM documents
    ), counts AS (
      SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY lang, w
    ), tot AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tok, COUNT(*) AS vocab FROM counts GROUP BY lang
    )
    SELECT counts.lang, n_tok, vocab,
           {dsum_sql('-(c / CAST(n_tok AS DOUBLE)) * ln(c / CAST(n_tok AS DOUBLE))', 'entropy_nats')}
    FROM counts JOIN tot ON counts.lang = tot.lang
    GROUP BY counts.lang, n_tok, vocab
    """,
    tags=("text", "entropy", "analytics", "pipeline"),
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = counts.groupBy(F.col("lang").alias("t_lang")).agg(
        F.sum("c").alias("n_tok"), F.count(F.lit(1)).alias("vocab")
    )
    p = F.col("c") / F.col("n_tok").cast("double")
    return (
        counts.join(tot, counts.lang == tot.t_lang)
        .groupBy("lang", "n_tok", "vocab")
        .agg(dsum(-p * F.log(p), "entropy_nats"))
    )


# ---------------------------------------------------------------------------
# Fuzzy lookup: nearest part name per canonical probe string by Levenshtein
# edit distance. The probe set is FIXED (SF-invariant → broadcast per the
# repo policy), so the scan is O(N·k); the per-probe argmin is
# min(struct(dist, key, name)) — lexicographic struct-min partial-
# aggregates map-side, so no single-partition window over the corpus
# (the scalable top-1 shape; the oracle uses ROW_NUMBER, which is fine
# for SQL-on-fixture). Unique p_partkey tiebreak keeps cross-engine ties
# deterministic.
# ---------------------------------------------------------------------------
_PROBES = ("goldenrod lavender spring", "midnight linen almond", "antique sky peru")


@query(
    "text_fuzzy_lookup",
    oracle=f"""
    WITH probes(probe) AS (VALUES {', '.join("('" + p + "')" for p in _PROBES)}),
    d AS (
      SELECT probe, p_partkey, p_name, levenshtein(p_name, probe) AS edit_dist
      FROM part CROSS JOIN probes
    ), r AS (
      SELECT probe, p_partkey, p_name, edit_dist,
             ROW_NUMBER() OVER (PARTITION BY probe ORDER BY edit_dist, p_partkey) AS rn
      FROM d
    )
    SELECT probe, edit_dist, p_partkey, p_name FROM r WHERE rn = 1
    """,
    tags=("text", "fuzzy", "levenshtein", "pipeline"),
)
def text_fuzzy_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    probes = spark.createDataFrame([(p,) for p in _PROBES], ["probe"])
    part = table(spark, sf_dir, "part")
    scored = part.crossJoin(F.broadcast(probes)).select(
        "probe",
        F.struct(
            F.levenshtein("p_name", "probe").alias("edit_dist"),
            F.col("p_partkey"),
            F.col("p_name"),
        ).alias("cand"),
    )
    best = scored.groupBy("probe").agg(F.min("cand").alias("best"))
    return best.select(
        "probe",
        F.col("best.edit_dist").alias("edit_dist"),
        F.col("best.p_partkey").alias("p_partkey"),
        F.col("best.p_name").alias("p_name"),
    )


# ---------------------------------------------------------------------------
# PII detection + redaction. The fixture corpus is synthetic word-soup, so
# the PII is INJECTED deterministically first (an md5-derived email on
# doc_id % 7 == 0, a 555- phone on doc_id % 11 == 0 — pure functions of
# doc_id, reproducible at any parallelism), then detected back with the
# regex tier of a real scrubber and redacted with regexp_replace. Patterns
# stay in the RE2 ∩ Java-regex dialect (character classes + quantifiers,
# no lookarounds) so Spark and DuckDB agree byte-for-byte. Everything is
# JVM-side string expressions — the shape that runs inside whole-stage
# codegen over 100 TB of scraped text, no Python in the loop.
# ---------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "555-[0-9]{4}"


@query(
    "text_pii_redact",
    oracle=f"""
    WITH injected AS (
      SELECT source,
             text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact ' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' call 555-' || lpad(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4))::BIGINT % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS t
      FROM documents
    ), scanned AS (
      SELECT source, t,
             len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_email,
             len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phone,
             regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'), '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
      FROM injected
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
           CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
           CAST(SUM(n_email + n_phone) AS BIGINT) AS n_pii_spans,
           CAST(SUM(len(t) - len(redacted)) AS BIGINT) AS chars_removed
    FROM scanned
    GROUP BY source
    """,
    tags=("text", "pii", "regex", "datapipe"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    key = F.md5(F.col("doc_id").cast("string"))
    email = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit(" contact "), F.substring(key, 1, 6), F.lit("@example.com")),
    ).otherwise("")
    phone = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad(
                (F.conv(F.substring(key, 9, 4), 16, 10).cast("long") % 10000).cast("string"),
                4,
                "0",
            ),
        ),
    ).otherwise("")
    t = F.concat(F.col("text"), email, phone)
    scanned = docs.select(
        "source",
        t.alias("t"),
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), F.lit(0))).alias("n_email"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), F.lit(0))).alias("n_phone"),
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )
    return scanned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_email") > 0, 1).otherwise(0)).cast("long").alias("docs_with_email"),
        F.sum(F.when(F.col("n_phone") > 0, 1).otherwise(0)).cast("long").alias("docs_with_phone"),
        F.sum(F.col("n_email") + F.col("n_phone")).cast("long").alias("n_pii_spans"),
        F.sum(F.length("t") - F.length("redacted")).cast("long").alias("chars_removed"),
    )


# ---------------------------------------------------------------------------
# Per-document keyword extraction WITHOUT logs: rank each doc's terms by
# (term frequency DESC, document frequency ASC, term) — "most frequent
# rare term", the integer-ordering surrogate for TF-IDF that two engines
# can never disagree on (log-based IDF sits on libm last-ulp ties,
# the CLAUDE.md surprisal lesson). Top 3 per document.
#
# Scale: explode → two hash aggregations (per-doc TF, corpus DF) → one
# vocab-bounded join → per-doc window. DF is |vocab| rows; vocab grows
# with the corpus, so no broadcast hint (AQE decides at runtime).
# ---------------------------------------------------------------------------
@query(
    "text_keywords",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS t FROM documents)
      WHERE t <> ''
    ), tf AS (
      SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t
    ), df AS (
      SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY t
    ), ranked AS (
      SELECT tf.doc_id, tf.t AS term, tf.tf, df.df,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.t) AS rnk
      FROM tf JOIN df ON tf.t = df.t
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY doc_id, rnk
    """,
    tags=("text", "keywords", "tfidf_surrogate"),
)
def text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " +")).alias("t")
    ).filter(F.col("t") != "")
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df = tok.groupBy("t").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), F.asc("t"))
    return (
        tf.join(df, "t")
        .select("doc_id", F.col("t").alias("term"), "tf", "df", F.row_number().over(w).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .orderBy("doc_id", "rnk")
    )


# ---------------------------------------------------------------------------
# Vocabulary growth at ingest checkpoints (the Heaps-law curve, measured
# not fitted — no transcendentals, so the output is engine-exact
# integers). Ownership = MIN(doc_id) per token (one map-side-combinable
# MIN over the token explode), then each checkpoint counts tokens first
# seen at-or-before it — a 6-row broadcast join, never a re-scan per
# checkpoint. Corpus curators read the flattening tail as "new data is
# mostly repeating the vocabulary we already have".
# ---------------------------------------------------------------------------
_VOCAB_CAPS = [50, 100, 200, 400, 1000, 2000]


@query(
    "corpus_vocab_growth",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({_SQL_TOKS})) AS token FROM documents
    ), own AS (
      SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token
    ), caps(cap) AS (
      VALUES {", ".join(f"({c})" for c in _VOCAB_CAPS)}
    )
    SELECT CAST(c.cap AS BIGINT) AS cap,
           CAST((SELECT COUNT(*) FROM documents d WHERE d.doc_id <= c.cap) AS BIGINT) AS n_docs,
           CAST(COUNT(o.token) AS BIGINT) AS vocab_size
    FROM caps c LEFT JOIN own o ON o.first_doc <= c.cap
    GROUP BY c.cap ORDER BY c.cap
    """,
    tags=("text", "vocabulary", "heaps", "curation"),
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The checkpoints are compile-time constants, so each count is a
    # conditional aggregate — one pass over `own`, one over doc ids, no
    # theta-join (a <=-join here would force a nested-loop build against
    # the vocabulary table, which at corpus scale is millions of rows).
    par = spark.sparkContext.defaultParallelism
    docs = table(spark, sf_dir, "documents").repartition(par, "doc_id")
    tok = docs.select("doc_id", F.explode(distinct_tokens(F.col("text"))).alias("token"))
    own = tok.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    vocab_wide = own.agg(
        *[
            F.sum(F.when(F.col("first_doc") <= c, 1).otherwise(0)).alias(f"v{c}")
            for c in _VOCAB_CAPS
        ]
    )
    docs_wide = docs.agg(
        *[
            F.sum(F.when(F.col("doc_id") <= c, 1).otherwise(0)).alias(f"d{c}")
            for c in _VOCAB_CAPS
        ]
    )
    stack_args = ", ".join(
        f"CAST({c} AS BIGINT), CAST(d{c} AS BIGINT), CAST(v{c} AS BIGINT)"
        for c in _VOCAB_CAPS
    )
    # stack() unpivots the single wide row into one row per checkpoint in
    # one projection — the aggregates compute exactly once.
    return (
        vocab_wide.join(docs_wide)
        .select(
            F.expr(
                f"stack({len(_VOCAB_CAPS)}, {stack_args}) AS (cap, n_docs, vocab_size)"
            )
        )
        .orderBy("cap")
    )


# ---------------------------------------------------------------------------
# Corpus length profile per source: the first curation chart anyone draws.
# Exact integer percentiles over n_chars (quantile_cont ≙ percentile,
# agg_percentile precedent), short-doc share in basis points. One
# map-side-combinable rollup per source; the per-source sort behind the
# exact percentile is bounded by source cardinality × docs-per-source —
# at 100 TB swap in a count-by-length histogram percentile (lengths are
# bounded integers) for the identical answer.
# ---------------------------------------------------------------------------
@query(
    "corpus_length_profile",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           quantile_cont(n_chars, 0.5) AS p50_chars,
           quantile_cont(n_chars, 0.9) AS p90_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT)
             AS short_bp
    FROM documents GROUP BY source ORDER BY source
    """,
    tags=("text", "curation", "profile", "percentile", "exact-unbounded"),
    scale_twin="agg_percentiles_histogram",
)
def corpus_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("percentile(n_chars, 0.5)").alias("p50_chars"),
            F.expr("percentile(n_chars, 0.9)").alias("p90_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum(F.when(F.col("n_chars") < 200, 1).otherwise(0)).alias("n_short"),
        )
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "p50_chars",
            "p90_chars",
            "max_chars",
            F.expr("CAST(n_short * 10000 DIV n_docs AS BIGINT)").alias("short_bp"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Tokenizer compression profile: characters per BPE-ish token per source
# — the fertility metric that decides whether a tokenizer suits a corpus
# (high chars/token = efficient; near 1 = byte-fallback thrash). Counts
# are integers; the ratio goes through the davg decimal path.
# ---------------------------------------------------------------------------
@query(
    "text_tokenizer_compression",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             length(text) AS n_chars_raw,
             len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars_raw) AS BIGINT) AS total_chars,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           {davg_sql('n_chars_raw::DOUBLE / n_bpe', 'avg_chars_per_token')}
    FROM per_doc GROUP BY source ORDER BY source
    """,
    tags=("text", "tokenizer", "fertility"),
)
def text_tokenizer_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.length("text").alias("n_chars_raw"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).alias(
            "n_bpe"
        ),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars_raw").alias("total_chars"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            davg(F.col("n_chars_raw").cast("double") / F.col("n_bpe"), "avg_chars_per_token"),
        )
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("total_chars").cast("bigint").alias("total_chars"),
            F.col("total_bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
            "avg_chars_per_token",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PII detection + redaction pass — the compliance stage every training-data
# pipeline runs before a corpus ships. The synthetic fixture text carries
# no natural PII, so the op first INJECTS deterministic PII-shaped spans
# (an email and a phone derived from doc_id — identical expressions in
# both engines), then detects with generic patterns (any email-shaped /
# +1-555 phone-shaped span, dialect-safe across Java regex and RE2),
# redacts via regexp_replace, and PROVES the redaction by re-scanning the
# scrubbed text (residual_hits must be 0 — and the oracle must agree).
#
# Scale: pure projection (regex per row, whole-stage codegen) + one
# map-side-combined groupBy(source) — scan-shaped; the single-file
# fixture is repartitioned before the regex work (repo convention).
# ---------------------------------------------------------------------------
_PII_EMAIL = r"[a-z0-9._]+@[a-z0-9.]+\.[a-z]+"
_PII_PHONE = r"\+1-555-[0-9]{4}"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH enriched AS (
      SELECT doc_id, source,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    ), scrubbed AS (
      SELECT source,
             len(regexp_extract_all(t, '{_PII_EMAIL}')) AS email_hits,
             len(regexp_extract_all(t, '{_PII_PHONE}')) AS phone_hits,
             regexp_replace(regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                            '{_PII_PHONE}', '<PHONE>', 'g') AS red
      FROM enriched
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(email_hits) AS BIGINT) AS email_hits,
           CAST(SUM(phone_hits) AS BIGINT) AS phone_hits,
           CAST(SUM(len(regexp_extract_all(red, '{_PII_EMAIL}'))
                    + len(regexp_extract_all(red, '{_PII_PHONE}'))) AS BIGINT)
             AS residual_hits
    FROM scrubbed
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "pii", "compliance", "datapipe"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(t, _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
    )
    per_doc = docs.select(
        "source",
        F.regexp_count(t, F.lit(_PII_EMAIL)).alias("email_hits"),
        F.regexp_count(t, F.lit(_PII_PHONE)).alias("phone_hits"),
        (
            F.regexp_count(red, F.lit(_PII_EMAIL)) + F.regexp_count(red, F.lit(_PII_PHONE))
        ).alias("residual"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("email_hits").cast("bigint").alias("email_hits"),
            F.sum("phone_hits").cast("bigint").alias("phone_hits"),
            F.sum("residual").cast("bigint").alias("residual_hits"),
        )
        .orderBy("source")
    )
