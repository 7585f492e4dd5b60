"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operators (SURVEY.md §2) as
(spark, sf_dir) -> DataFrame callables over the driver's parquet tables;
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each.

Cross-engine determinism rules used throughout:
  * gate queries run the engine in precision='f64' (the reference's f32
    idf/cosine math is pinned separately by tests/test_exact_vs_oracle.py
    against a pure-Python oracle);
  * every floating-point output is rounded to 6 decimals on BOTH sides,
    and every top-k orders by (rounded score desc, key asc) on BOTH
    sides, so the selected row SET is identical;
  * hashes (md5) are computed on UTF-8 bytes in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.functions import termfreq as TFops
from tf_idf_vectorizer_spark.operators import corpus_ops
from tf_idf_vectorizer_spark.operators.stats import corpus_stats
from tf_idf_vectorizer_spark.functions.tokenize import term_frequencies
from tf_idf_vectorizer_spark.query.ast import parse_sexpr
from tf_idf_vectorizer_spark.query.exact import ExactSearcher
from tf_idf_vectorizer_spark.sources import load_documents

# ---------------------------------------------------------------------------
# shared state (per sf_dir searcher cache)
# ---------------------------------------------------------------------------

_SEARCHERS: dict[str, ExactSearcher] = {}


def _searcher(spark: SparkSession, sf_dir: str) -> ExactSearcher:
    key = sf_dir
    if key not in _SEARCHERS:
        docs = load_documents(spark, sf_dir)
        _SEARCHERS[key] = ExactSearcher(
            spark, docs, key_col="doc_id", precision="f64"
        )
    return _SEARCHERS[key]


def _round_topk(hits: DataFrame, k: int, key: str = "doc_id") -> DataFrame:
    """Round score to 6dp and order/limit deterministically (gate rule)."""
    out = hits.withColumn("score", F.round(F.col("score"), 6))
    return out.orderBy(F.desc("score"), F.asc(key)).limit(k)


# ---------------------------------------------------------------------------
# shared DuckDB SQL prelude (tokenize -> tf -> stats), mirroring
# functions/tokenize.py + operators/stats.py exactly
# ---------------------------------------------------------------------------

SQL_PRELUDE = r"""
WITH tok AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
    FROM documents WHERE trim(text) <> ''
),
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term
),
stats AS (
    SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
idf AS (
    SELECT term, df,
           CAST((SELECT n_docs FROM n) AS DOUBLE) / (df + 1) AS idf
    FROM stats
),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS doc_len FROM tf GROUP BY doc_id),
avgdl AS (
    SELECT sum(doc_len)::DOUBLE / (SELECT n_docs FROM n) AS avg_len FROM dl
)
"""

_EPS = "2.220446049250313e-16"


def _bm25_sql(terms: list[str], k: int, filter_sql: str | None = None) -> str:
    """BM25 over candidates; default candidates = docs w/ >=1 query term.

    Mirrors query/exact.py exactly: per-term partial
    (ln(idf) * (tf*(k1+1))) / (tf + k1*(0.25 + (0.75*doc_len)/avg_len)).
    """
    tl = ", ".join(f"'{t}'" for t in dict.fromkeys(terms))
    cand = filter_sql or f"SELECT DISTINCT doc_id FROM tf WHERE term IN ({tl})"
    return f"""{SQL_PRELUDE},
cand AS ({cand}),
partials AS (
    SELECT tf.doc_id,
           sum((ln(idf) * (tf * 2.2::DOUBLE))
               / (tf + 1.2::DOUBLE * (0.25::DOUBLE
                   + (0.75::DOUBLE * dl.doc_len) / (SELECT avg_len FROM avgdl)))
           ) AS raw
    FROM tf JOIN idf USING(term) JOIN dl USING(doc_id)
    WHERE term IN ({tl})
    GROUP BY tf.doc_id
)
SELECT c.doc_id,
       round(coalesce(p.raw, 0.0), 6) AS score,
       coalesce(dl.doc_len, 0)::BIGINT AS doc_len
FROM cand c LEFT JOIN partials p USING(doc_id) LEFT JOIN dl USING(doc_id)
ORDER BY score DESC, c.doc_id ASC LIMIT {k}
"""


def _dot_sql(term_counts: list[tuple[str, int]], k: int) -> str:
    vals = ", ".join(f"('{t}', {c})" for t, c in term_counts)
    tl = ", ".join(f"'{t}'" for t, _ in term_counts)
    return f"""{SQL_PRELUDE},
q(term, qtf) AS (SELECT * FROM (VALUES {vals})),
partials AS (
    SELECT tf.doc_id, sum(((q.qtf * tf.tf) * idf.idf) * idf.idf) AS raw
    FROM tf JOIN q USING(term) JOIN idf USING(term)
    GROUP BY tf.doc_id
)
SELECT p.doc_id, round(p.raw, 6) AS score, dl.doc_len
FROM partials p JOIN dl USING(doc_id)
ORDER BY score DESC, p.doc_id ASC LIMIT {k}
"""


def _cosine_sql(term_counts: list[tuple[str, int]], k: int) -> str:
    vals = ", ".join(f"('{t}', {c})" for t, c in term_counts)
    return f"""{SQL_PRELUDE},
q(term, qtf) AS (SELECT * FROM (VALUES {vals})),
norms AS (
    SELECT doc_id, sqrt(sum((tf * idf) * (tf * idf))) AS norm
    FROM tf JOIN idf USING(term) GROUP BY doc_id
),
qnorm AS (
    SELECT sqrt(sum((qtf * idf) * (qtf * idf))) AS nq FROM q JOIN idf USING(term)
),
partials AS (
    SELECT tf.doc_id, sum(((q.qtf * tf.tf) * idf.idf) * idf.idf) AS raw
    FROM tf JOIN q USING(term) JOIN idf USING(term)
    GROUP BY tf.doc_id
)
SELECT p.doc_id,
       round(p.raw / ((SELECT nq FROM qnorm) * norms.norm + {_EPS}), 6) AS score,
       dl.doc_len
FROM partials p JOIN norms USING(doc_id) JOIN dl USING(doc_id)
ORDER BY score DESC, p.doc_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# query implementations (Spark side)
# ---------------------------------------------------------------------------

BM25_TERMS = ["spark", "join", "query"]
DOT_TERMS = [("join", 1), ("spark", 2)]     # duplicate 'spark' — multiplicity
COS_TERMS = [("join", 1), ("spark", 1)]
K = 20


def q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    return s.tf.filter(F.col("doc_id") < 50).select("doc_id", "term", "tf")


def q_df_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).df_stats.select("term", "df")


def q_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).idf.select("term", "df", "idf")


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    return s.doc_stats.select(
        "doc_id", "doc_len", F.round(F.col("norm"), 6).alias("norm")
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    return _round_topk(s.similarity("bm25", BM25_TERMS), K)


def q_bm25_head_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    return _round_topk(s.similarity("bm25", ["the"]), K)


def q_bm25_bool_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    q = parse_sexpr('(and "spark" "join")')
    return _round_topk(s.search("bm25", q), K)


def q_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    terms = [t for t, c in DOT_TERMS for _ in range(c)]
    return _round_topk(s.similarity("dot", terms), K)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    terms = [t for t, c in COS_TERMS for _ in range(c)]
    return _round_topk(s.similarity("cosine", terms), K)


def q_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    hits = s.similarity("contains", ["spark", "join"])
    return hits.select("doc_id", "score")


def _bool_q(expr: str):
    def impl(spark: SparkSession, sf_dir: str) -> DataFrame:
        s = _searcher(spark, sf_dir)
        return s.candidates(parse_sexpr(expr)).distinct()

    return impl


def q_most_frequent_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    return TFops.most_frequent_terms(s.tf.filter(F.col("doc_id") < 50))


def q_unique_term_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    out = TFops.unique_term_ratio(s.tf.filter(F.col("doc_id") < 100))
    return out.select("doc_id", F.round("ratio", 6).alias("ratio"))


def q_probability_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    out = TFops.probability_vector(s.tf.filter(F.col("doc_id") < 20))
    return out.select("doc_id", "term", F.round("p", 6).alias("p"))


def q_top_terms_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TFops.top_terms_global(_searcher(spark, sf_dir).tf, k=50)


def q_delta_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    a = corpus_stats(term_frequencies(docs.filter(F.col("lang") == "en")))
    b = corpus_stats(term_frequencies(docs.filter(F.col("lang") == "zh")))
    return corpus_ops.delta_corpus(a, b)


def q_merge_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    a = corpus_stats(term_frequencies(docs.filter(F.col("lang") == "en")))
    b = corpus_stats(term_frequencies(docs.filter(F.col("lang") == "zh")))
    return corpus_ops.merge_corpus(a, b)


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# driver surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the sf0.001 corpus."""
    s = _searcher(spark, "/root/testdata/sf0.001")
    return s.similarity("bm25", BM25_TERMS, k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_frequencies": q_term_frequencies,
        "corpus_df_stats": q_df_stats,
        "idf_table": q_idf,
        "doc_stats": q_doc_stats,
        "bm25_topk": q_bm25_topk,
        "bm25_head_term": q_bm25_head_term,
        "bm25_bool_search": q_bm25_bool_search,
        "dot_topk": q_dot_topk,
        "cosine_topk": q_cosine_topk,
        "contains_docs": q_contains,
        "bool_and": _bool_q('(and "spark" "join" "query")'),
        "bool_or": _bool_q('(or "spark" "join" "merge")'),
        "bool_not": _bool_q('(not "the")'),
        "bool_nested": _bool_q('(and "spark" (or "join" (not "slow")))'),
        "most_frequent_terms": q_most_frequent_terms,
        "unique_term_ratio": q_unique_term_ratio,
        "probability_vector": q_probability_vector,
        "top_terms_global": q_top_terms_global,
        "delta_corpus": q_delta_corpus,
        "merge_corpus": q_merge_corpus,
        "events_hourly": q_events_hourly,
    }


def oracle_sql() -> dict[str, str]:
    lang_tf = lambda lang: (  # noqa: E731
        f"SELECT doc_id, term, count(*)::BIGINT AS tf FROM ("
        f"SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
        f"FROM documents WHERE trim(text) <> '' AND lang = '{lang}') "
        f"GROUP BY doc_id, term"
    )
    stats_of = lambda sub: (  # noqa: E731
        f"SELECT term, count(*)::BIGINT AS df FROM ({sub}) GROUP BY term"
    )
    return {
        "term_frequencies": SQL_PRELUDE
        + "SELECT doc_id, term, tf FROM tf WHERE doc_id < 50",
        "corpus_df_stats": SQL_PRELUDE + "SELECT term, df FROM stats",
        "idf_table": SQL_PRELUDE + "SELECT term, df, idf FROM idf",
        "doc_stats": SQL_PRELUDE
        + """,
norms AS (
    SELECT doc_id, sqrt(sum((tf * idf) * (tf * idf))) AS norm
    FROM tf JOIN idf USING(term) GROUP BY doc_id
)
SELECT dl.doc_id, dl.doc_len, round(norms.norm, 6) AS norm
FROM dl JOIN norms USING(doc_id)""",
        "bm25_topk": _bm25_sql(BM25_TERMS, K),
        "bm25_head_term": _bm25_sql(["the"], K),
        "bm25_bool_search": _bm25_sql(
            ["spark", "join"],
            K,
            filter_sql=(
                "SELECT doc_id FROM tf WHERE term IN ('spark','join') "
                "GROUP BY doc_id HAVING count(DISTINCT term) = 2"
            ),
        ),
        "dot_topk": _dot_sql(DOT_TERMS, K),
        "cosine_topk": _cosine_sql(COS_TERMS, K),
        "contains_docs": SQL_PRELUDE
        + """SELECT DISTINCT doc_id, 1.0::DOUBLE AS score
FROM tf WHERE term IN ('spark','join')""",
        "bool_and": SQL_PRELUDE
        + """SELECT doc_id FROM tf WHERE term IN ('spark','join','query')
GROUP BY doc_id HAVING count(DISTINCT term) = 3""",
        "bool_or": SQL_PRELUDE
        + "SELECT DISTINCT doc_id FROM tf WHERE term IN ('spark','join','merge')",
        "bool_not": SQL_PRELUDE
        + """SELECT doc_id FROM documents
EXCEPT SELECT doc_id FROM tf WHERE term = 'the'""",
        "bool_nested": SQL_PRELUDE
        + """SELECT DISTINCT t.doc_id FROM tf t WHERE t.term = 'spark'
AND (EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = t.doc_id AND x.term = 'join')
     OR NOT EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = t.doc_id AND x.term = 'slow'))""",
        "most_frequent_terms": SQL_PRELUDE
        + """,
ranked AS (
    SELECT doc_id, term, tf, rank() OVER (PARTITION BY doc_id ORDER BY tf DESC) AS rnk
    FROM tf WHERE doc_id < 50
)
SELECT doc_id, term, tf FROM ranked WHERE rnk = 1""",
        "unique_term_ratio": SQL_PRELUDE
        + """SELECT doc_id,
round(count(*)::DOUBLE / sum(tf)::DOUBLE, 6) AS ratio
FROM tf WHERE doc_id < 100 GROUP BY doc_id""",
        "probability_vector": SQL_PRELUDE
        + """SELECT doc_id, term,
round(tf::DOUBLE / (sum(tf) OVER (PARTITION BY doc_id))::DOUBLE, 6) AS p
FROM tf WHERE doc_id < 20""",
        "top_terms_global": SQL_PRELUDE
        + """SELECT term, sum(tf)::BIGINT AS total_tf FROM tf
GROUP BY term ORDER BY total_tf DESC, term ASC LIMIT 50""",
        "delta_corpus": f"""
WITH a AS ({stats_of(lang_tf('en'))}), b AS ({stats_of(lang_tf('zh'))}),
d AS (
    SELECT coalesce(a.term, b.term) AS term,
           greatest(coalesce(a.df, 0) - coalesce(b.df, 0), 0)::BIGINT AS df
    FROM a FULL OUTER JOIN b ON a.term = b.term
)
SELECT term, df FROM d WHERE df > 0""",
        "merge_corpus": f"""
WITH a AS ({stats_of(lang_tf('en'))}), b AS ({stats_of(lang_tf('zh'))}),
u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
SELECT term, sum(df)::BIGINT AS df FROM u GROUP BY term""",
        "events_hourly": """
SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour, event_type,
       count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2""",
    }
