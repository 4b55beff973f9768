"""Noop-sink isolation bench (guide §1.4) for the round-6 optimization
targets.  bench.py is the frozen driver-facing benchmark; this file
exists so numbers quoted in OPTIMIZATION_r06.md are reproducible:

- every section materializes EVERY column via the noop sink, so
  Catalyst cannot prune the work (bench.py's ``repetition_signals``
  section uses ``.count()``, which after the round-6 per-row rewrite
  legitimately prunes the per-row statistics - the honest full-compute
  number lives here);
- sections run on the same synthetic corpus recipe as bench.py
  (``SPARK_GRAFT_SYNTH_DOCS`` docs, default 200k).

Usage: SPARK_GRAFT_SYNTH_DOCS=2000000 python bench_extra.py
Prints one JSON line with per-section best-of-N seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time


def main() -> None:
    n_docs = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "200000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "2"))

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pg_cjk_parser_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_cjk_parser_spark.ops.dedup import duplicate_spans
    from pg_cjk_parser_spark.ops.multimodal import html_to_text
    from pg_cjk_parser_spark.ops.textstats import repetition_signals
    from pg_cjk_parser_spark.spark.corpus import synth_corpus
    from pg_cjk_parser_spark.spark.udfs import lexemes_udf, make_ts_rank_udf

    work = tempfile.mkdtemp(prefix="pg_cjk_bench_extra_")
    cpath = os.path.join(work, "corpus")
    synth_corpus(spark, n_docs, seed=42, num_partitions=cpus * 2).withColumn(
        "doc_seq", F.unix_timestamp("warc_ts").cast("long")
    ).write.mode("overwrite").parquet(cpath)
    corpus = spark.read.parquet(cpath)
    # warm the executor-side Python workers, as bench.py does
    corpus.limit(2000).select(lexemes_udf(F.col("text"))).agg(
        F.count(F.lit(1))
    ).collect()

    out: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)

    spark.sparkContext.setJobDescription("repetition_signals full (noop)")
    timed(
        "repetition_signals_full_noop",
        lambda: noop(repetition_signals(corpus, id_col="doc_seq")),
    )
    spark.sparkContext.setJobDescription("repetition_signals count")
    timed(
        "repetition_signals_count",
        lambda: repetition_signals(corpus, id_col="doc_seq").count(),
    )
    spark.sparkContext.setJobDescription("duplicate_spans full (noop)")
    timed(
        "duplicate_spans_full_noop",
        lambda: noop(duplicate_spans(corpus, k=8, id_col="doc_seq")),
    )
    rank_cd = make_ts_rank_udf("のび太", cd=True)
    spark.sparkContext.setJobDescription("ts_rank_cd scan (noop)")
    timed(
        "ts_rank_cd_scan_noop",
        lambda: noop(
            corpus.select(rank_cd(F.col("text")).alias("r")).where(
                F.col("r") > 0
            )
        ),
    )
    spark.sparkContext.setJobDescription("html_extract (noop-equivalent agg)")
    timed(
        "html_extract_agg",
        lambda: html_to_text(corpus.select("url", "html"))
        .agg(F.sum(F.length("text_extracted")))
        .collect(),
    )
    spark.sparkContext.setJobDescription(None)

    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "bench_extra_seconds",
                "n_docs": n_docs,
                "cpus": cpus,
                "sections": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
