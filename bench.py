"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
  SPARK_GRAFT_SF_DIR  input tables dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  SPARK_GRAFT_SYNTH_DOCS  synthetic web-corpus size (default 40x documents)

Covers the engine's headline paths: inverted-index build throughput
(driver documents table + CJK-heavy synthetic web corpus), BM25 top-k
query latency (reference CJK query set + ASCII queries), and the
auxiliary operators (term stats, zht2zhs, cosine ANN).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# The host VM suffers episodic hypervisor CPU steal (observed: the same
# code 2.3x slower between runs hours apart with steal accumulating in
# /proc/stat).  Absolute numbers are only defensible with the steal
# telemetry attached, so every timed section records the steal share of
# its window and reruns once (best-of-2) when steal is elevated.
_STEAL_RERUN_THRESHOLD = 0.02   # rerun the section above 2% steal share
_STEAL_REPORT_THRESHOLD = 0.005  # record any share above 0.5%
_STEAL_CONTAMINATED_THRESHOLD = 0.05  # kept attempt above this = flagged


def _cpu_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from the aggregate cpu line of /proc/stat."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 0


class _StealWindow:
    def __enter__(self):
        self.s0, self.t0 = _cpu_jiffies()
        return self

    def __exit__(self, *exc):
        s1, t1 = _cpu_jiffies()
        self.share = (s1 - self.s0) / max(1, t1 - self.t0)
        return False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pg_cjk_parser_spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_cjk_parser_spark.index.build import build_index
    from pg_cjk_parser_spark.query.topk import search
    from pg_cjk_parser_spark.spark.corpus import synth_corpus
    from pg_cjk_parser_spark.spark.udfs import lexemes_udf, zht2zhs_udf

    parts_sel = os.environ.get("SPARK_GRAFT_BENCH_PARTS", "all")

    # warm up the executor-side Python workers (JVM + pyspark + pandas
    # imports) so measurements reflect steady-state throughput, as on a
    # long-lived cluster, not interpreter cold start
    warm = synth_corpus(spark, cpus * 64, seed=1, num_partitions=cpus)
    warm.select(lexemes_udf(F.col("text"))).agg(F.count(F.lit(1))).collect()

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}
    t_all = time.time()
    work = tempfile.mkdtemp(prefix="pg_cjk_bench_")

    suite_steal = _StealWindow().__enter__()

    def _run_once(fn):
        with _StealWindow() as w:
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
        return out, dt, w.share

    def timed(name, fn, reset=None):
        """Time one section, steal-aware.  While the window's
        hypervisor steal share exceeds the rerun threshold and the
        section is rerunnable (``reset`` prepares a clean rerun; pass
        a no-op for stateless sections), run again - up to 3 attempts,
        keeping the fastest - with every attempt's time and steal
        share in extras.  The reported steal share (and the
        ``<name>_steal_contaminated`` flag, above 5%) is that of the
        KEPT attempt - the one whose time is published - so a flagged
        time is a lower bound on the hardware, not a code property,
        and an unflagged time really was measured on quiet CPU."""
        out, dt, share = _run_once(fn)
        attempts = [(dt, share)]
        while (
            share > _STEAL_RERUN_THRESHOLD
            and reset is not None
            and len(attempts) < 3
        ):
            reset()
            out2, dt2, share2 = _run_once(fn)
            attempts.append((dt2, share2))
            if dt2 < dt:
                out, dt, share = out2, dt2, share2
        if len(attempts) > 1:
            for i, (adt, ash) in enumerate(attempts, 1):
                extras[f"{name}_run{i}"] = round(adt, 3)
                extras[f"{name}_run{i}_steal_share"] = round(ash, 4)
        if share > _STEAL_REPORT_THRESHOLD:
            extras[f"{name}_steal_share"] = round(share, 4)
        if share > _STEAL_CONTAMINATED_THRESHOLD:
            extras[f"{name}_steal_contaminated"] = 1
        queries[name] = round(dt, 3)
        return out

    reps = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "5"))

    def timed_query(name, fn):
        """Same steal-aware policy as ``timed`` (query sections are
        stateless, so every one is rerunnable): up to 3 attempts while
        the kept attempt's window steal exceeds the rerun threshold,
        keep the attempt with the lowest median, and report/flag the
        KEPT attempt's steal share."""
        def _attempt():
            with _StealWindow() as w:
                times = []
                for _ in range(reps):
                    t0 = time.time()
                    fn()
                    times.append(time.time() - t0)
            times.sort()
            return times, w.share

        times, share = _attempt()
        attempts = [(times, share)]
        while share > _STEAL_RERUN_THRESHOLD and len(attempts) < 3:
            times2, share2 = _attempt()
            attempts.append((times2, share2))
            if times2[len(times2) // 2] < times[len(times) // 2]:
                times, share = times2, share2
        if len(attempts) > 1:
            for i, (at, ash) in enumerate(attempts, 1):
                extras[f"{name}_run{i}"] = round(at[len(at) // 2], 3)
                extras[f"{name}_run{i}_steal_share"] = round(ash, 4)
        if share > _STEAL_REPORT_THRESHOLD:
            extras[f"{name}_steal_share"] = round(share, 4)
        if share > _STEAL_CONTAMINATED_THRESHOLD:
            extras[f"{name}_steal_contaminated"] = 1
        queries[name] = round(times[len(times) // 2], 3)   # median
        extras[f"{name}_p95"] = round(times[-1] if reps < 20 else times[int(len(times) * 0.95)], 3)

    # -- 1. index build over the driver documents table ------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    if parts_sel in ("all", "docs"):
        idx_docs = os.path.join(work, "idx_docs")
        timed(
            "index_build_documents",
            lambda: build_index(
                spark, docs, idx_docs, docid_col="doc_id",
                num_buckets=32, num_salts=4, block_size=128,
                n_docs=n_docs,
            ),
            reset=lambda: shutil.rmtree(idx_docs, ignore_errors=True),
        )
        extras["documents_rows"] = n_docs
        extras["documents_docs_per_sec"] = round(
            n_docs / queries["index_build_documents"], 1
        )

        # -- 2. BM25 query latency on the documents index ----------------
        for name, q in (
            ("q_bm25_and2", "spark merge"),
            ("q_bm25_and3", "customer query window"),
            ("q_bm25_single", "vector"),
        ):
            timed_query(name, lambda q=q: search(spark, idx_docs, q, k=10).collect())

    # -- 3. CJK-heavy synthetic web corpus: the headline build ------------
    synth_n = int(
        os.environ.get("SPARK_GRAFT_SYNTH_DOCS", str(max(20000, 40 * n_docs)))
    )
    corpus = synth_corpus(spark, synth_n, seed=42, num_partitions=cpus * 2)
    # dense docids (derived from warc_ts, which the synthesizer assigns
    # sequentially): random hash ids make delta-varint docids ~7 bytes;
    # dense ids measured 2.4x smaller index and ~1.4x faster build
    corpus = corpus.withColumn(
        "doc_seq", F.unix_timestamp("warc_ts").cast("long")
    )
    # materialize the input table first (untimed): a real build reads
    # an existing parquet/Iceberg corpus - synthesizing rows is not
    # part of index-build throughput
    corpus_path = os.path.join(work, "webcorpus")
    corpus.write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    idx_web = os.path.join(work, "idx_web")
    timed(
        "index_build_webcorpus",
        lambda: build_index(
            spark, corpus, idx_web, docid_col="doc_seq",
            num_buckets=64, num_salts=4, block_size=128,
            n_docs=synth_n,
        ),
        reset=lambda: shutil.rmtree(idx_web, ignore_errors=True),
    )
    extras["webcorpus_rows"] = synth_n
    extras["webcorpus_docs_per_sec"] = round(
        synth_n / queries["index_build_webcorpus"], 1
    )

    # -- 4. reference CJK query set latency -------------------------------
    for name, q in (
        ("q_cjk_nobita", "のび太"),
        ("q_cjk_nobihero", "野比大雄"),
        ("q_cjk_korean", "「大韩民国개인정보"),
        ("q_mixed", "Nobita 牧場物語"),
        ("q_ascii_stem", "inverted indexes"),
        ("q_or_wand", "'野比' | 'doraemnon' | '개인'"),
    ):
        mode = "tsquery" if "|" in q else "plain"
        timed_query(name, lambda q=q, m=mode: search(spark, idx_web, q, k=10, mode=m).collect())

    # -- 4a. batched workload path: 4 queries in ONE Spark job -------------
    from pg_cjk_parser_spark.query.topk import search_many

    batch_qs = ["のび太", "野比大雄", "「大韩民国개인정보", "Nobita 牧場物語"]
    timed_query(
        "q_cjk_batch4",
        lambda: search_many(spark, idx_web, batch_qs, k=10).collect(),
    )
    singles = (
        queries["q_cjk_nobita"] + queries["q_cjk_nobihero"]
        + queries["q_cjk_korean"] + queries["q_mixed"]
    )
    extras["batch4_vs_singles_ratio"] = round(
        singles / queries["q_cjk_batch4"], 2
    )

    # -- 4a2. index-path cover-density ranking (ts_rank_cd from the
    # posting position lists; PG's ORDER BY ts_rank_cd ... LIMIT k)
    from pg_cjk_parser_spark.query.topk import search_rank_cd

    timed_query(
        "q_rank_cd_nobita",
        lambda: search_rank_cd(
            spark, idx_web, "のび太", k=10, mode="tsquery"
        ).collect(),
    )

    # -- 4b. serving-tier point queries (no Spark job) ---------------------
    from pg_cjk_parser_spark.query.topk import search_local

    for name, q, m in (
        ("q_local_nobita", "のび太", "plain"),
        ("q_local_korean", "「大韩民国개인정보", "plain"),
        ("q_local_or", "'野比' | 'doraemnon' | '개인'", "tsquery"),
    ):
        timed_query(
            name, lambda q=q, m=m: search_local(idx_web, q, k=10, mode=m)
        )

    from pg_cjk_parser_spark.query.topk import rank_local

    timed_query(
        "q_local_rank_cd",
        lambda: rank_local(idx_web, "のび太", k=10, cd=True),
    )

    # -- 4c. live-docs overhead: same query with 1% of docs tombstoned
    from pg_cjk_parser_spark.index.tombstones import (
        clear_tombstones,
        delete_docs,
    )

    # tombstone real docids (ids are xxhash64(url), so sample them
    # from the query's own candidate set - the filter's hot case)
    victims = [
        r.docid
        for r in search(spark, idx_web, "のび太", k=400).collect()
    ][::2]
    delete_docs(idx_web, victims)
    try:
        timed_query(
            "q_cjk_nobita_tombstoned",
            lambda: search(spark, idx_web, "のび太", k=10).collect(),
        )
        extras["tombstone_overhead_ratio"] = round(
            queries["q_cjk_nobita_tombstoned"]
            / max(queries["q_cjk_nobita"], 1e-9),
            2,
        )
    finally:
        clear_tombstones(idx_web)

    # -- 5. auxiliary operators -------------------------------------------
    if parts_sel == "web":
        total = round(time.time() - t_all, 3)
        suite_steal.__exit__(None, None, None)
        extras["suite_steal_share"] = round(suite_steal.share, 4)
        shutil.rmtree(work, ignore_errors=True)
        print(json.dumps({
            "metric": "headline_suite_seconds", "value": total,
            "unit": "sec", "queries": queries, "sf": sf, "cpus": cpus,
            "extras": extras,
        }))
        spark.stop()
        return

    _noop = lambda: None  # stateless sections: rerunnable as-is
    timed(
        "term_stats_documents",
        lambda: docs.select(
            F.explode(lexemes_udf(F.col("text"))).alias("l")
        )
        .groupBy("l.term")
        .count()
        .orderBy(F.desc("count"))
        .limit(20)
        .collect(),
        reset=_noop,
    )
    timed(
        "zht2zhs_webcorpus",
        lambda: corpus.select(
            F.sum(F.length(zht2zhs_udf(F.col("text")))).alias("n")
        ).collect(),
        reset=_noop,
    )
    # -- 6. streaming epoch append + compaction ----------------------------
    if parts_sel == "all":
        from pg_cjk_parser_spark.index.compact import compact_index
        from pg_cjk_parser_spark.index.streaming import append_index_batch

        idx_stream = os.path.join(work, "idx_stream")
        n_epochs = 4
        # materialize the micro-batches first (untimed): a streaming
        # source delivers each batch as its own dataset; re-filtering
        # the full corpus per epoch would bench the filter, not the append
        slice_paths = []
        for i in range(n_epochs):
            sp = os.path.join(work, f"slice_{i}")
            corpus.where(
                F.pmod(F.col("doc_seq"), F.lit(n_epochs)) == i
            ).write.mode("overwrite").parquet(sp)
            slice_paths.append(sp)
        # untimed warmup: the first append pays one-time costs (python
        # worker spin-up for this pipeline shape, JIT, committer class
        # load) that a long-running ingest amortizes away; measure the
        # steady state the ratio is meant to compare
        idx_warm = os.path.join(work, "idx_warm")
        append_index_batch(
            spark, spark.read.parquet(slice_paths[0]).limit(2000),
            idx_warm, epoch=0, docid_col="doc_seq",
            num_buckets=64, num_salts=4, block_size=128,
        )
        def _append_epochs():
            for i, sp in enumerate(slice_paths):
                append_index_batch(
                    spark, spark.read.parquet(sp), idx_stream, epoch=i,
                    docid_col="doc_seq",
                    num_buckets=64, num_salts=4, block_size=128,
                )

        timed(
            "stream_append_4epochs", _append_epochs,
            reset=lambda: shutil.rmtree(idx_stream, ignore_errors=True),
        )
        dt = queries["stream_append_4epochs"]
        extras["stream_append_docs_per_sec"] = round(synth_n / dt, 1)
        # small-batch ratio: dominated by per-epoch fixed job costs
        # (partitioned-write commits, termstats job) at this local scale
        extras["stream_vs_batch_ratio"] = round(
            (synth_n / dt) / extras["webcorpus_docs_per_sec"], 3
        )
        # batch-sized micro-batch: the packed-cell epoch path at the
        # same size as the batch build (the >=0.8x throughput bar)
        idx_stream1 = os.path.join(work, "idx_stream1")
        timed(
            "stream_append_1epoch",
            lambda: append_index_batch(
                spark, corpus, idx_stream1, epoch=0, docid_col="doc_seq",
                num_buckets=64, num_salts=4, block_size=128,
            ),
            reset=lambda: shutil.rmtree(idx_stream1, ignore_errors=True),
        )
        dt1 = queries["stream_append_1epoch"]
        extras["stream_single_vs_batch_ratio"] = round(
            (synth_n / dt1) / extras["webcorpus_docs_per_sec"], 3
        )
        timed("compact_index", lambda: compact_index(spark, idx_stream))
        # sanity: the compacted streaming index answers like the batch one
        r1 = [d for d, _ in search_local(idx_stream, "のび太", k=5)]
        r2 = [d for d, _ in search_local(idx_web, "のび太", k=5)]
        extras["stream_compact_matches_batch"] = int(r1 == r2)

    # -- 7. training-data pipeline ops at web-corpus scale ------------------
    if parts_sel == "all":
        from pg_cjk_parser_spark.ops.dedup import duplicate_spans
        from pg_cjk_parser_spark.ops.textstats import (
            hash_split,
            repetition_signals,
        )
        from pg_cjk_parser_spark.spark.udfs import make_ts_rank_udf

        rank_cd_udf = make_ts_rank_udf("のび太", cd=True)

        for name, fn in (
            (
                "ops_duplicate_spans",
                lambda: duplicate_spans(
                    corpus, k=8, id_col="doc_seq"
                ).count(),
            ),
            (
                "ops_repetition_signals",
                lambda: repetition_signals(
                    corpus, id_col="doc_seq"
                ).count(),
            ),
            (
                "ops_hash_split",
                lambda: hash_split(corpus, id_col="doc_seq").count(),
            ),
            (
                # scan-path cover-density ranking: tokenize + rank
                # every doc (the non-indexed ORDER BY ts_rank_cd)
                "ops_ts_rank_cd_scan",
                lambda: corpus.select(
                    rank_cd_udf(F.col("text")).alias("r")
                )
                .where(F.col("r") > 0)
                .count(),
            ),
        ):
            timed(name, fn, reset=_noop)
            extras[f"{name}_docs_per_sec"] = round(
                synth_n / queries[name], 1
            )

        # web-hygiene suite over the same corpus: PII scrub (3 chained
        # JVM regexp passes forced via aggregates - a bare count()
        # would let Catalyst prune the computed columns) + URL
        # canonicalize -> per-domain rollup on the corpus's real urls
        from pg_cjk_parser_spark.ops.web import (
            canonicalize_urls,
            domain_stats,
            pii_scrub,
        )

        timed(
            "ops_web_hygiene",
            lambda: (
                pii_scrub(corpus).agg(
                    F.sum("n_emails"),
                    F.sum("n_ips"),
                    F.sum("n_phones"),
                    F.sum(F.length("text_scrubbed")),
                ).collect(),
                domain_stats(
                    canonicalize_urls(corpus), url_col="canon_url"
                ).count(),
            ),
            reset=_noop,
        )
        extras["ops_web_hygiene_docs_per_sec"] = round(
            synth_n / queries["ops_web_hygiene"], 1
        )

        # real multimodal decode throughput: genuine PGM/PPM/BMP/WAV/
        # AVI payloads (materialized untimed, like the corpus) through
        # the pure-NumPy/stdlib decoders + Arrow feature extractors
        from pg_cjk_parser_spark.ops.multimodal import (
            audio_features,
            image_features,
            synth_media_real,
            video_frame_features,
        )

        media_n = 3000
        media_path = os.path.join(work, "media")
        synth_media_real(spark, media_n, seed=42).write.parquet(media_path)
        media = spark.read.parquet(media_path)
        timed(
            "ops_media_decode",
            lambda: (
                image_features(media).count()
                + audio_features(media).count()
                + video_frame_features(media, every_n=2).count()
            ),
            reset=_noop,
        )
        extras["ops_media_decode_rows_per_sec"] = round(
            media_n / queries["ops_media_decode"], 1
        )

        # web dedup + link graph over the corpus's REAL columns: the
        # synth pages carry deterministic outlink anchors (html), a
        # unique url, and sequential warc_ts.  Inputs that are derived
        # tables (boilerplate-lined text, the extracted edge list) are
        # materialized untimed, like the corpus itself - a real
        # pipeline reads them from parquet.
        from pg_cjk_parser_spark.ops.graph import link_graph, pagerank
        from pg_cjk_parser_spark.ops.web import line_dedup, url_dedup

        lined_path = os.path.join(work, "lined")
        corpus.select(
            "url",
            F.concat(
                F.lit("hdr "), F.abs(F.xxhash64("url")) % 1000,
                F.lit("\n"), F.col("text"),
                F.lit("\nfooter all rights reserved"),
            ).alias("text"),
        ).write.mode("overwrite").parquet(lined_path)
        lined = spark.read.parquet(lined_path)
        timed(
            "ops_line_dedup",
            lambda: line_dedup(lined, id_col="url")
            .agg(F.sum("n_kept"), F.sum(F.length("text_dedup")))
            .collect(),
            reset=_noop,
        )
        # aggregate over the WINNER ROWS, not count(): a bare count
        # lets Catalyst prune the max_by struct entirely and the
        # section would measure a key-distinct, not the dedup
        timed(
            "ops_url_dedup",
            lambda: url_dedup(corpus, ts_col="warc_ts", id_col="doc_seq")
            .agg(
                F.count(F.lit(1)),
                F.max("warc_ts"),
                F.sum(F.length("url")),
            )
            .collect(),
            reset=_noop,
        )
        timed(
            "ops_link_graph",
            lambda: link_graph(corpus).count(),
            reset=_noop,
        )
        for name in ("ops_line_dedup", "ops_url_dedup", "ops_link_graph"):
            extras[f"{name}_docs_per_sec"] = round(
                synth_n / queries[name], 1
            )
        # the north-rule invariant path: per-url text extraction from
        # the raw html bytes (FSM tag handling, script/style ignore)
        from pg_cjk_parser_spark.ops.multimodal import html_to_text

        # project first: html_to_text passes every input column through
        # the Arrow boundary, and the extraction metric should not pay
        # round-trip serialization of the unrelated text/metadata cols
        timed(
            "ops_html_extract",
            lambda: html_to_text(corpus.select("url", "html"))
            .agg(F.sum(F.length("text_extracted")))
            .collect(),
            reset=_noop,
        )
        extras["ops_html_extract_docs_per_sec"] = round(
            synth_n / queries["ops_html_extract"], 1
        )
        edges_path = os.path.join(work, "edges")
        link_graph(corpus).select(
            F.col("src_domain").alias("src"),
            F.col("dst_domain").alias("dst"),
        ).write.mode("overwrite").parquet(edges_path)
        edges = spark.read.parquet(edges_path)
        # the link_graph rollup is one row per (src, dst) by
        # construction - dedupe=False skips a pointless extra exchange
        # inside the per-iteration-overhead metric
        timed(
            "ops_pagerank3",
            lambda: pagerank(edges, iterations=3, dedupe=False)
            .agg(F.sum("pr"), F.count(F.lit(1)))
            .collect(),
            reset=_noop,
        )

    # -- 8. ANN honesty: measured recall@20 at probe budgets where the
    # approximate paths actually approximate.  The driver-SF oracles are
    # exact because at 2k vectors the probe budget covers the corpus;
    # here a 50k clustered corpus (32 Gaussian clusters) with reduced
    # budgets shows the real recall/latency trade.
    if parts_sel == "all":
        import numpy as np
        import pandas as pd

        from pg_cjk_parser_spark.ops.similarity import (
            ann_cosine_topk as lsh_topk,
            brute_force_cosine_topk,
            ivf_cosine_topk,
            train_ivf_centroids,
        )

        ann_n, dim, n_clust = 50_000, 64, 32
        rng = np.random.RandomState(7)
        centers = rng.standard_normal((n_clust, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        cl = rng.randint(0, n_clust, size=ann_n)
        # noise std 0.2/dim (norm ~1.6 vs unit centers): clusters overlap
        # enough that reduced probe budgets genuinely miss neighbors
        # (calibrated: IVF nprobe=2/32 ~0.7, LSH 4x10-bit 1-probe ~0.9)
        vecs = (
            centers[cl] + 0.2 * rng.standard_normal((ann_n, dim))
        ).astype(np.float32)
        ann_path = os.path.join(work, "ann_corpus")
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": np.arange(ann_n, dtype=np.int64),
                    "embedding": [v.tolist() for v in vecs],
                }
            ),
            schema="vec_id long, embedding array<float>",
        ).write.mode("overwrite").parquet(ann_path)
        emb_ann = spark.read.parquet(ann_path)
        qv = [float(x) for x in vecs[0]]
        rest = emb_ann.where(F.col("vec_id") != 0)

        truth = timed(
            "ann50k_brute",
            lambda: brute_force_cosine_topk(rest, qv, k=20).collect(),
            reset=_noop,
        )
        truth_ids = {r.vec_id for r in truth}
        lsh = timed(
            "ann50k_lsh",
            lambda: lsh_topk(
                rest, qv, k=20, n_planes=10, n_tables=4, probe_bits=1
            ).collect(),
            reset=_noop,
        )
        cents = train_ivf_centroids(emb_ann, n_clusters=n_clust, iters=5)
        ivf = timed(
            "ann50k_ivf",
            lambda: ivf_cosine_topk(
                rest, qv, cents, k=20, nprobe=2
            ).collect(),
            reset=_noop,
        )
        extras["ann50k_rows"] = ann_n
        extras["ann50k_lsh_recall_at20"] = round(
            len(truth_ids & {r.vec_id for r in lsh}) / 20, 3
        )
        extras["ann50k_ivf_recall_at20"] = round(
            len(truth_ids & {r.vec_id for r in ivf}) / 20, 3
        )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(emb_path):
        import __spark_entry__ as entry_mod

        timed(
            "ann_cosine_topk",
            lambda: entry_mod.queries()["ann_cosine_topk"](
                spark, sf_dir
            ).collect(),
            reset=lambda: None,
        )

    total = round(time.time() - t_all, 3)
    suite_steal.__exit__(None, None, None)
    extras["suite_steal_share"] = round(suite_steal.share, 4)
    shutil.rmtree(work, ignore_errors=True)
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "extras": extras,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
