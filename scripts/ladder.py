"""Scale-ladder rung runner: build the synthetic web corpus at a given
size, index it, and measure build throughput, index size, driver RSS,
and the reference query latencies.  Optionally (--epochs K) ingest the
corpus as K streaming epochs instead of one batch build and time a
maintain_index/merge_epochs pass - compaction at ladder scale.

Results are printed as one JSON line; paste durable numbers into
STATIC_TAIL in scripts/scaling.py (BENCH/BASELINE.md is generated).

Usage:
  python scripts/ladder.py --docs 32000000 --buckets 1024 --salts 64
  python scripts/ladder.py --docs 16000000 --buckets 512 --salts 32 --epochs 4
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def rss_mb() -> float:
    """Peak RSS of THIS (Py4J client) process only - Spark driver
    scheduler state lives in the JVM child, reported separately."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def jvm_rss_mb() -> float:
    """Current RSS of the local-mode JVM (java child processes of this
    process) - where driver scheduler/block-manager state actually
    lives.  0.0 if none found (e.g. /proc unavailable)."""
    me = os.getpid()
    total = 0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().split()
                # (2)=comm '(java)', (4)=ppid
                if "java" not in parts[1] or int(parts[3]) != me:
                    continue
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            total += int(line.split()[1])  # kB
                            break
            except (OSError, ValueError, IndexError):
                continue
    except OSError:
        pass
    return total / 1024.0


def steal_window():
    from bench import _cpu_jiffies  # REPO on sys.path; guarded reader
    return _cpu_jiffies()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--buckets", type=int, required=True)
    ap.add_argument("--salts", type=int, required=True)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=0,
                    help="ingest as K appended epochs, then time maintenance")
    ap.add_argument("--work", default="/tmp/pg_cjk_ladder")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName(f"ladder-{args.docs}")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_cjk_parser_spark.index.build import build_index
    from pg_cjk_parser_spark.index.compact import maintain_index
    from pg_cjk_parser_spark.index.streaming import append_index_batch
    from pg_cjk_parser_spark.query.topk import load_stats, search
    from pg_cjk_parser_spark.spark.corpus import synth_corpus

    out: dict = {
        "docs": args.docs, "buckets": args.buckets, "salts": args.salts,
        "block": args.block, "cpus": args.cpus, "epochs": args.epochs,
    }
    work = args.work
    corpus_path = os.path.join(work, "corpus")
    idx = os.path.join(work, "idx")
    reuse = os.path.exists(os.path.join(corpus_path, "_SUCCESS"))
    if reuse:
        # a --keep'd corpus from a DIFFERENT rung must not be silently
        # reused: validate row count (parquet-footer metadata only)
        if spark.read.parquet(corpus_path).count() != args.docs:
            reuse = False
    if reuse:
        shutil.rmtree(idx, ignore_errors=True)
    else:
        shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    # corpus materialization is untimed (a real build reads an
    # existing table); docids are dense sequence numbers
    if not reuse:
        c = synth_corpus(
            spark, args.docs, seed=42, num_partitions=args.cpus * 8
        ).withColumn("doc_seq", F.unix_timestamp("warc_ts").cast("long"))
        c.write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    if args.epochs:
        # doc_seq is epoch-seconds (base + sequential id), so split on
        # the id's contiguous range relative to the minimum.  Slice
        # materialization is UNTIMED like the corpus itself: re-filtering
        # the full corpus inside the timed window would bench the scan,
        # not the append path (same policy as bench.py's epoch section).
        base_seq = corpus.agg(F.min("doc_seq")).collect()[0][0]
        per = args.docs // args.epochs
        slice_paths = []
        for ep in range(args.epochs):
            lo = base_seq + ep * per
            hi = (
                base_seq + (ep + 1) * per
                if ep < args.epochs - 1
                else base_seq + args.docs
            )
            sp = os.path.join(work, f"slice_{ep}")
            corpus.where(
                (F.col("doc_seq") >= lo) & (F.col("doc_seq") < hi)
            ).write.mode("overwrite").parquet(sp)
            slice_paths.append(sp)

        s0, t0j = steal_window()
        t0 = time.perf_counter()
        for ep, sp in enumerate(slice_paths):
            append_index_batch(
                spark, spark.read.parquet(sp), idx, epoch=ep,
                docid_col="doc_seq", num_buckets=args.buckets,
                num_salts=args.salts, block_size=args.block,
            )
        build_s = time.perf_counter() - t0
        s1, t1j = steal_window()
        # maintenance pass at ladder scale: fold the K epochs
        # (its own steal window - merge steal must not pollute build's)
        m0, m0j = steal_window()
        t1 = time.perf_counter()
        maintain_index(spark, idx, max_epochs=1, merge_factor=args.epochs)
        out["merge_all_epochs_sec"] = round(time.perf_counter() - t1, 2)
        m1, m1j = steal_window()
        out["merge_steal_share"] = round((m1 - m0) / max(1, m1j - m0j), 4)
    else:
        s0, t0j = steal_window()
        t0 = time.perf_counter()
        build_index(
            spark, corpus, idx, docid_col="doc_seq",
            num_buckets=args.buckets, num_salts=args.salts,
            block_size=args.block, n_docs=args.docs,
        )
        build_s = time.perf_counter() - t0
        s1, t1j = steal_window()

    st = load_stats(idx)
    out.update(
        build_sec=round(build_s, 2),
        docs_per_sec=round(args.docs / build_s, 1),
        n_postings=st["n_postings"],
        index_gb=round(du(idx) / 1e9, 2),
        driver_rss_mb=round(rss_mb(), 1),
        driver_jvm_rss_mb=round(jvm_rss_mb(), 1),
        build_steal_share=round((s1 - s0) / max(1, t1j - t0j), 4),
    )

    # reference query latencies (median of 5)
    for name, q, mode in (
        ("q_nobita", "のび太", "plain"),
        ("q_conj8", "野比大雄牧場物語", "plain"),  # 8 head CJK 2-grams conj
    ):
        times = []
        for _ in range(5):
            tq = time.perf_counter()
            search(spark, idx, q, k=10, mode=mode).collect()
            times.append(time.perf_counter() - tq)
        times.sort()
        out[f"{name}_median_sec"] = round(times[len(times) // 2], 3)

    print(json.dumps(out))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
