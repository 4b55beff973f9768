"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (tokenize -> inverted
index -> BM25 top-k for the reference query set) over a deterministic
synthetic Common-Crawl-style corpus plus the driver's sf0.001 tables.

``queries()`` / ``oracle_sql()`` expose the engine's operators over the
driver's parquet tables so DuckDB can verify them at sf0.01.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over a synthetic web-page
    corpus + the sf0.001 documents table, answer the reference CJK
    query set with BM25 top-10, return (query, rank, docid, score)."""
    from pg_cjk_parser_spark.index.build import build_index
    from pg_cjk_parser_spark.query.topk import search
    from pg_cjk_parser_spark.spark.corpus import synth_corpus

    index_dir = os.path.join(tempfile.gettempdir(), "pg_cjk_spark_entry_index")
    corpus = synth_corpus(spark, 500, seed=42, num_partitions=4)
    build_index(
        spark, corpus, index_dir, num_buckets=16, num_salts=2, block_size=64
    )
    from pyspark.sql.window import Window

    out = None
    for q in ("のび太", "野比大雄", "「大韩民国개인정보", "Doraemnon"):
        res = (
            search(spark, index_dir, q, k=10)
            .withColumn("query", F.lit(q))
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.orderBy(F.desc("score"), F.asc("docid"))
                ),
            )
            .select("query", "rank", "docid", "score")
        )
        out = res if out is None else out.unionAll(res)
    return out


# --------------------------------------------------------------------------
# queries + DuckDB oracles over the driver tables
# --------------------------------------------------------------------------

def _q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-driven term stats over documents (simple dictionary).

    The driver's documents.text is plain lowercase ASCII words, so the
    engine tokenizer's output equals whitespace splitting - which gives
    DuckDB an exact oracle for the tokenize->explode->aggregate path.
    """
    from pg_cjk_parser_spark.spark.udfs import lexemes_udf

    docs = _docs(spark, sf_dir)
    lex = docs.select(
        "doc_id", F.explode(lexemes_udf(F.col("text"))).alias("l")
    ).select("doc_id", F.col("l.term").alias("term"))
    return (
        lex.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("cf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(50)
        .select("term", "cf", "df")
    )


# The driver corpus has a closed 31-word vocabulary; its only stopwords
# are 'the'/'a' and only five words change under Porter2.  Encoding that
# mapping keeps the DuckDB oracle exact without a SQL stemmer.
_STEM_CASE = (
    "CASE t.term WHEN 'merge' THEN 'merg' WHEN 'query' THEN 'queri' "
    "WHEN 'table' THEN 'tabl' WHEN 'value' THEN 'valu' "
    "WHEN 'customer' THEN 'custom' ELSE t.term END"
)

_TOK_CTE = f"""
tok AS (
  SELECT d.doc_id, {_STEM_CASE} AS term
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(term)
  WHERE t.term <> '' AND t.term NOT IN ('the', 'a')
)
"""

_TERM_STATS_SQL = f"""
WITH {_TOK_CTE}
SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df
FROM tok GROUP BY term ORDER BY cf DESC, term ASC LIMIT 50
"""


def _docs_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (or resume) the documents-table index in a stable temp
    location keyed by corpus identity; safe across processes/rounds."""
    import hashlib
    import tempfile as _tf

    from pg_cjk_parser_spark.index.build import build_index

    docs = _docs(spark, sf_dir)
    n = docs.count()
    key = hashlib.md5(f"{sf_dir}|{n}".encode()).hexdigest()[:12]
    index_dir = os.path.join(_tf.gettempdir(), f"pg_cjk_spark_idx_{key}")
    build_index(
        spark,
        docs,
        index_dir,
        docid_col="doc_id",
        num_buckets=16,
        num_salts=2,
        block_size=64,
        resume=True,
        fingerprint=f"docs-{key}",
        n_docs=n,
    )
    return index_dir


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine path: index build + BM25 top-20 for 'spark merge'."""
    from pg_cjk_parser_spark.query.topk import search

    index_dir = _docs_index(spark, sf_dir)
    res = search(spark, index_dir, "spark merge", k=25).select(
        F.col("docid").alias("doc_id"),
        F.round("score", 4).alias("score"),
    )
    # compare on 4-decimal scores with docid tiebreak so ordering is
    # robust to last-ulp float differences between engines
    return res.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


_BM25_SQL = f"""
WITH {_TOK_CTE},
dl AS (
  SELECT doc_id, count(*) AS doclen FROM tok GROUP BY doc_id
), stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('spark', 'merg') GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT t.doc_id,
         sum( ln((s.n_docs - f.df + 0.5)/(f.df + 0.5) + 1.0)
              * t.tf / (t.tf + 1.2*(0.25 + 0.75*d.doclen/s.avgdl)) )
           AS score,
         count(*) AS nterms
  FROM tf t
  JOIN df f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY t.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored WHERE nterms = 2
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 20
"""


def _q_bm25_or_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive BM25 (WAND path): top-20 for 'spark' | 'vector'."""
    from pg_cjk_parser_spark.query.topk import search

    index_dir = _docs_index(spark, sf_dir)
    res = search(
        spark, index_dir, "'spark' | 'vector'", k=25, mode="tsquery"
    ).select(
        F.col("docid").alias("doc_id"),
        F.round("score", 4).alias("score"),
    )
    return res.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


_BM25_OR_SQL = f"""
WITH {_TOK_CTE},
dl AS (
  SELECT doc_id, count(*) AS doclen FROM tok GROUP BY doc_id
), stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('spark', 'vector') GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT t.doc_id,
         sum( ln((s.n_docs - f.df + 0.5)/(f.df + 0.5) + 1.0)
              * t.tf / (t.tf + 1.2*(0.25 + 0.75*d.doclen/s.avgdl)) )
           AS score
  FROM tf t
  JOIN df f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY t.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 20
"""


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (scale path; rows-only driver check, recall
    asserted vs brute force in pytest)."""
    from pg_cjk_parser_spark.ops.similarity import ann_cosine_topk

    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") == 0).collect()[0].embedding
    return ann_cosine_topk(
        emb.where(F.col("vec_id") != 0), list(q), k=20,
        n_planes=8, n_tables=8, probe_bits=1,
    )


def _q_zht2zhs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traditional->simplified normalization over documents.text."""
    from pg_cjk_parser_spark.spark.udfs import zht2zhs_udf

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", zht2zhs_udf(F.col("text")).alias("zhs")
    ).orderBy("doc_id")


def _zht2zhs_sql() -> str:
    from pg_cjk_parser_spark.functions.zht2zhs_table import (
        SIMPLIFIED,
        TRADITIONAL,
    )

    t = TRADITIONAL.replace("'", "''")
    s = SIMPLIFIED.replace("'", "''")
    return (
        "SELECT doc_id, translate(text, '" + t + "', '" + s + "') AS zhs "
        "FROM documents ORDER BY doc_id"
    )


def _q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc indexed-token counts (doclen) via the tsvector UDF."""
    from pg_cjk_parser_spark.spark.udfs import tsvector_udf

    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            "doc_id", tsvector_udf(F.col("text")).alias("tv")
        )
        .select("doc_id", F.col("tv.doclen").alias("doclen"))
        .orderBy("doc_id")
    )


def _doc_lengths_sql() -> str:
    # doclen counts non-stopword lexemes; the driver vocabulary's only
    # stopwords are 'the' and 'a'
    return """
    SELECT d.doc_id,
           (SELECT count(*) FROM unnest(string_split(d.text,' ')) AS t(w)
             WHERE w <> '' AND w NOT IN ('the','a')) AS doclen
    FROM documents d ORDER BY d.doc_id
    """


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by text hash (training-data dedup)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("n_dups") > 1)
        .orderBy("keep_doc_id")
        .select("text_md5", "n_dups", "keep_doc_id")
    )


_EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_md5, count(*) AS n_dups, min(doc_id) AS keep_doc_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1 ORDER BY keep_doc_id
"""


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality signals: length, word count, mean word length."""
    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        F.size(words).alias("n_words"),
        F.round(
            F.length(F.translate("text", " ", "")).cast("double")
            / F.size(words),
            4,
        ).alias("mean_word_len"),
    ).orderBy("doc_id")


_QUALITY_SQL = """
SELECT doc_id,
       length(text) AS n_chars_m,
       len(string_split(text, ' ')) AS n_words,
       round(length(replace(text, ' ', ''))::DOUBLE /
             len(string_split(text, ' ')), 4) AS mean_word_len
FROM documents ORDER BY doc_id
"""


def _q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 neighbours of vec_id 0 (ANN baseline)."""
    emb = _embeddings(spark, sf_dir)
    target = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    joined = emb.crossJoin(F.broadcast(target))
    dot = F.aggregate(
        F.zip_with(
            "embedding",
            "q",
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                c,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
    return (
        joined.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(
                dot / (norm(F.col("embedding")) * norm(F.col("q"))), 4
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(20)
    )


_ANN_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT e.vec_id,
         list_sum(list_transform(list_zip(e.embedding, q.qe),
                  x -> x[1]::DOUBLE * x[2]::DOUBLE)) AS dot,
         sqrt(list_sum(list_transform(e.embedding,
                  x -> x::DOUBLE * x::DOUBLE))) AS ne,
         sqrt(list_sum(list_transform(q.qe,
                  x -> x::DOUBLE * x::DOUBLE))) AS nq
  FROM embeddings e, q WHERE e.vec_id <> 0
)
SELECT vec_id, round(dot/(ne*nq), 4) AS cos
FROM pairs ORDER BY cos DESC, vec_id ASC LIMIT 20
"""


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-gram Jaccard over a small id slice (the
    verification oracle of the near-dup family)."""
    from pg_cjk_parser_spark.ops.dedup import ngram_jaccard_pairs

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 40)
    return ngram_jaccard_pairs(docs, n=3, min_jaccard=0.0).orderBy(
        "id_a", "id_b"
    )


_NGRAM_JACCARD_SQL = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
g AS (
  SELECT DISTINCT d.doc_id AS id, array_to_string(
           list_slice(string_split(d.text,' '), i.i, i.i+2), ' ') AS gram
  FROM d, (SELECT unnest(generate_series(1, 2000)) AS i) i
  WHERE i.i <= greatest(len(string_split(d.text,' ')) - 2, 1)
), sz AS (SELECT id, count(*) AS sz FROM g GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT i.id_a, i.id_b,
       round(i.inter::DOUBLE/(sa.sz + sb.sz - i.inter), 4) AS jaccard
FROM inter i JOIN sz sa ON sa.id = i.id_a JOIN sz sb ON sb.id = i.id_b
WHERE round(i.inter::DOUBLE/(sa.sz + sb.sz - i.inter), 4) > 0.0
ORDER BY id_a, id_b
"""


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_cjk_parser_spark.ops.textstats import token_counts

    return token_counts(_docs(spark, sf_dir)).orderBy("doc_id")


_TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_ish_tokens
FROM documents ORDER BY doc_id
"""


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_cjk_parser_spark.ops.textstats import char_window_fingerprint

    return (
        char_window_fingerprint(_docs(spark, sf_dir), k=8, n_mins=4)
        .select("doc_id", F.array_join("fingerprint", ",").alias("fp"))
        .orderBy("doc_id")
    )


_FINGERPRINT_SQL = """
WITH w AS (
  SELECT d.doc_id, md5(substr(d.text, i.i, 8)) AS h
  FROM documents d,
       (SELECT unnest(generate_series(1, 4000)) AS i) i
  WHERE i.i <= greatest(length(d.text) - 7, 1)
), ranked AS (
  SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
  FROM w
)
SELECT doc_id, string_agg(h, ',' ORDER BY h) AS fp
FROM ranked WHERE rn <= 4 GROUP BY doc_id ORDER BY doc_id
"""


def _q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates verified by exact Jaccard
    (probabilistic path: rows-only driver check; pytest compares it
    against the exact-Jaccard oracle on a synthetic corpus)."""
    from pg_cjk_parser_spark.ops.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard,
    )

    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(docs, n_hashes=64, shingle_k=5)
    pairs = lsh_candidate_pairs(sigs, bands=16, rows_per_band=4)
    return verify_jaccard(docs, pairs, threshold=0.5).orderBy("id_a", "id_b")


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_cjk_parser_spark.ops.dedup import simhash64

    return simhash64(_docs(spark, sf_dir)).orderBy("id")


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_cjk_parser_spark.ops.textstats import lang_id

    return lang_id(_docs(spark, sf_dir)).orderBy("id")


def _q_headline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_headline snippets for 'spark merge' over documents."""
    from pg_cjk_parser_spark.spark.udfs import make_headline_udf

    hl = make_headline_udf("spark merge", min_words=5, max_words=12)
    return (
        _docs(spark, sf_dir)
        .select("doc_id", hl(F.col("text")).alias("snippet"))
        .where(F.col("snippet").contains("<b>"))
        .orderBy("doc_id")
    )


def _q_ts_debug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ts_debug token stream for the first 30 documents."""
    from pg_cjk_parser_spark.spark.udfs import ts_debug_udf

    return (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 30)
        .select("doc_id", F.posexplode(ts_debug_udf(F.col("text"))).alias("i", "t"))
        .select(
            "doc_id", "i",
            F.col("t.alias").alias("alias"),
            F.col("t.token").alias("token"),
        )
        .orderBy("doc_id", "i")
    )


_TS_DEBUG_SQL = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE doc_id < 30
), words AS (
  SELECT d.doc_id, s.i, d.ws[s.i] AS w
  FROM d, (SELECT unnest(generate_series(1, 2000)) AS i) s
  WHERE s.i <= len(d.ws)
), toks AS (
  SELECT doc_id, (i-1)*2 AS idx,
         CASE WHEN w IN ('42','15') THEN 'uint' ELSE 'asciiword' END AS alias,
         w AS token
  FROM words
  UNION ALL
  SELECT doc_id, (i-1)*2 - 1 AS idx, 'blank' AS alias, ' ' AS token
  FROM words WHERE i > 1
)
SELECT doc_id, idx AS i, alias, token FROM toks ORDER BY doc_id, i
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_stats": _q_term_stats,
        "bm25_topk": _q_bm25_topk,
        "zht2zhs": _q_zht2zhs,
        "doc_lengths": _q_doc_lengths,
        "exact_dedup": _q_exact_dedup,
        "quality_signals": _q_quality,
        "ann_cosine_topk": _q_ann_cosine,
        "ngram_jaccard": _q_ngram_jaccard,
        "token_counts": _q_token_counts,
        "char_fingerprint": _q_fingerprint,
        "minhash_near_dups": _q_minhash_near_dups,
        "simhash": _q_simhash,
        "lang_id": _q_lang_id,
        "ts_headline": _q_headline,
        "ts_debug": _q_ts_debug,
        "bm25_or_topk": _q_bm25_or_topk,
        "ann_lsh_topk": _q_ann_lsh,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "term_stats": _TERM_STATS_SQL,
        "bm25_topk": _BM25_SQL,
        "zht2zhs": _zht2zhs_sql(),
        "doc_lengths": _doc_lengths_sql(),
        "exact_dedup": _EXACT_DEDUP_SQL,
        "quality_signals": _QUALITY_SQL,
        "ann_cosine_topk": _ANN_SQL,
        "ngram_jaccard": _NGRAM_JACCARD_SQL,
        "token_counts": _TOKEN_COUNTS_SQL,
        "char_fingerprint": _FINGERPRINT_SQL,
        "ts_debug": _TS_DEBUG_SQL,
        "bm25_or_topk": _BM25_OR_SQL,
        # minhash_near_dups / simhash / lang_id: probabilistic or
        # heuristic operators - rows-only driver check; pytest verifies
        # them against exact oracles on synthetic corpora.
    }
