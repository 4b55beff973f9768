"""Incremental / streaming index maintenance.

The batch layout was designed so appends compose:

* posting blocks are self-contained (docids+tfs+doclens+positions per
  block) and the query engine treats every block independently - a
  term may own many block sequences (salt shards, epochs) and the
  per-salt scorer merges them by docid;
* per-block score bounds are avgdl-free (max_tf, min_dl), so changing
  corpus stats never invalidates written blocks;
* term df is summed across shards at query time, so per-epoch
  termstats rows just add up.

So a micro-batch append = the same explode -> salt -> encode pipeline
written under ``epoch=N/bucket=M`` partitions (bucket pruning still
applies across epochs), plus a running-stats update and a per-epoch
manifest that makes re-delivered batches idempotent
(foreachBatch at-least-once -> exactly-once effect).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import (
    BLOCK_SCHEMA,
    DEFAULT_BLOCK,
    DEFAULT_BUCKETS,
    DEFAULT_SALTS,
    PACKED_SCHEMA,
    _bucket_dirs,
    _encode_cells,
    _packed_postings_gen,
    _with_docid,
)


def _stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats.json")


def _epoch_manifest(index_dir: str, epoch: int) -> str:
    return os.path.join(index_dir, "manifests", f"epoch={epoch}.json")


def _resolve_layout(
    index_dir: str,
    num_buckets,
    num_salts,
    block_size,
    k1,
    b,
    normalize_zht,
):
    """Resolve layout parameters against an existing index's
    stats.json: omitted values INHERIT, explicit values must MATCH -
    appending with a different bucket/salt count would write postings
    that query routing can never find (terms hash to different
    buckets), and a normalize_zht flip would change query-side
    normalization for the whole index.  Fail loudly instead."""
    stats = None
    try:
        with open(_stats_path(index_dir)) as f:
            stats = json.load(f)
    except OSError:
        pass
    resolved = {}
    for name, val, default in (
        ("num_buckets", num_buckets, DEFAULT_BUCKETS),
        ("num_salts", num_salts, DEFAULT_SALTS),
        ("block_size", block_size, DEFAULT_BLOCK),
        ("k1", k1, 1.2),
        ("b", b, 0.75),
        ("normalize_zht", normalize_zht, False),
    ):
        have = stats.get(name) if stats else None
        if val is None:
            resolved[name] = have if have is not None else default
        elif have is not None and val != have:
            raise ValueError(
                f"append/upsert {name}={val!r} conflicts with the "
                f"existing index's {name}={have!r} (stats.json); "
                "omit the parameter to inherit it"
            )
        else:
            resolved[name] = val
    return resolved


def append_index_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    epoch: int,
    docid_col: str | None = None,
    text_col: str = "text",
    num_buckets: int | None = None,
    num_salts: int | None = None,
    block_size: int | None = None,
    k1: float | None = None,
    b: float | None = None,
    normalize_zht: bool | None = None,
) -> dict:
    """Append one micro-batch to the index; idempotent per epoch.

    Appending onto a BATCH-built index works: its base postings count
    as epoch 0, and the base corpus totals are captured once into
    ``manifests/base.json`` so the manifest-derived stats keep
    counting them."""
    lay = _resolve_layout(
        index_dir, num_buckets, num_salts, block_size, k1, b,
        normalize_zht,
    )
    num_buckets = lay["num_buckets"]
    num_salts = lay["num_salts"]
    block_size = lay["block_size"]
    k1 = lay["k1"]
    b = lay["b"]
    normalize_zht = lay["normalize_zht"]
    mdir = os.path.join(index_dir, "manifests")
    os.makedirs(mdir, exist_ok=True)
    base_manifest = os.path.join(mdir, "base.json")
    spath = _stats_path(index_dir)
    if not os.path.exists(base_manifest) and os.path.exists(spath):
        with open(spath) as f:
            prev = json.load(f)
        # only a BATCH-built stats file (no "epochs" key) seeds the
        # base manifest; streaming/compacted stats already flow
        # through epoch manifests (and a crashed epoch append must
        # not be mistaken for a base corpus)
        if "epochs" not in prev and prev.get("n_docs"):
            _atomic_json(
                base_manifest,
                {
                    "n_docs": prev["n_docs"],
                    "total_tf": prev["total_tf"],
                    "n_postings": prev["n_postings"],
                },
            )
    mpath = _epoch_manifest(index_dir, epoch)
    if os.path.exists(mpath):
        # re-delivered batch: already applied; re-derive stats in case
        # a crash interrupted the previous stats refresh
        return _rebuild_stats(
            index_dir, num_buckets, num_salts, block_size, k1, b,
            normalize_zht,
        )

    # clean any partial files from a failed earlier attempt of this epoch
    for sub in ("postings", "termstats"):
        shutil.rmtree(
            os.path.join(index_dir, sub, f"epoch={epoch}"), ignore_errors=True
        )

    # Small epochs are dominated by per-job fixed costs (scheduling,
    # listing, commit renames), so they run exactly ONE Spark job: the
    # postings land FLAT in the epoch dir (a single file, bucket as a
    # data column - the dynamic bucket=N partition commit, ~2 rename
    # rounds per dir, was the measured per-epoch floor) and the
    # per-epoch termstats derive DRIVER-SIDE from that one file's
    # block metadata via a column-pruned pyarrow read (n/sum_tf only -
    # the fat binary columns never leave disk).  The source doc count
    # folds in as an observed metric - counted from the source, not
    # the postings, because docs with empty/stop-word-only text
    # produce no postings yet must count toward N for idf/avgdl
    # parity with a batch rebuild.
    #
    # Large epochs keep the two-job layout: (bucket, salt)-partitioned
    # reducers (memory bounded by the salt count - the documented
    # skew/scale lever), nested epoch=/bucket= dirs so query-time
    # bucket pruning stays directory-level, and a Spark termstats
    # aggregation over the persisted blocks.  The size estimate is
    # Catalyst's plan statistic - no extra job.
    from pyspark.sql import Observation

    obs_docs = Observation(f"epoch{epoch}-docs")

    # same packed-cell pipeline as the batch build's default path
    # (build.py:_packed_postings_gen/_encode_cells): the tokenizer pass
    # packs each (bucket, salt) cell into one fat binary row per map
    # chunk, the shuffle moves cells (not postings), and the reducer
    # lexsorts + block-encodes in numpy.  The row-per-posting epoch
    # path this replaces measured ~2x slower end-to-end.
    small = _estimated_small(batch)
    sel = (
        _with_docid(batch, docid_col)
        .select("docid", F.col(text_col).alias("text"))
        .observe(obs_docs, F.count(F.lit(1)).alias("n_docs"))
    )
    cells = sel.mapInPandas(
        lambda it: _packed_postings_gen(
            it, num_buckets, num_salts, normalize_zht=normalize_zht
        ),
        PACKED_SCHEMA,
    )
    edir = os.path.join(index_dir, "postings", f"epoch={epoch}")
    if small:
        # encode with a handful of parallel reducers, then funnel the
        # (tiny) encoded blocks into one output file; the extra
        # funnel shuffle moves kilobytes and replaces a 64-file
        # commit with a single rename
        blocks = (
            cells.repartition(max(1, num_buckets // 4), "bucket")
            .mapInPandas(
                lambda it: _encode_cells(it, block_size), BLOCK_SCHEMA
            )
            .repartition(1)
        )
        (
            blocks.write.mode("overwrite")
            .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
            .parquet(edir)
        )
        n_batch_docs = _obs_count(obs_docs, "n_docs")
        total_tf, n_postings = _write_termstats_local(index_dir, epoch)
    else:
        from pyspark import StorageLevel

        blocks = (
            cells.repartition(
                min(
                    num_buckets * num_salts,
                    spark.sparkContext.defaultParallelism * 2,
                ),
                "bucket",
                "salt",
            )
            .mapInPandas(
                lambda it: _encode_cells(it, block_size), BLOCK_SCHEMA
            )
            .withColumn("epoch", F.lit(epoch))
            # kept for the termstats derivation below: re-reading data
            # that was written milliseconds ago is pure fixed cost
            # here and a read-after-write round trip on real object
            # storage
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        (
            blocks.write.mode("append")
            # v2 commit (task output moves straight to the destination,
            # one rename round instead of two): safe here because epoch
            # atomicity comes from the manifest-last protocol - a
            # crashed epoch's partial files are swept by the rmtree
            # above on retry
            .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
            .partitionBy("epoch", "bucket")
            .parquet(os.path.join(index_dir, "postings"))
        )
        n_batch_docs = _obs_count(obs_docs, "n_docs")
        total_tf = n_postings = 0
        if _bucket_dirs(edir):
            obs_tot = Observation(f"epoch{epoch}-totals")
            (
                blocks.select("bucket", "term", "n", "sum_tf")
                .groupBy("bucket", "term")
                .agg(F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"))
                # FLAT per-epoch termstats: one plain directory with
                # bucket as a data column, one file per bucket
                # (bucket-clustered row groups, so the query-time
                # term/bucket filters still prune)
                .repartition(num_buckets, "bucket")
                .observe(
                    obs_tot,
                    F.sum("cf").alias("total_tf"),
                    F.sum("df").alias("n_postings"),
                )
                .write.mode("append")
                .option(
                    "mapreduce.fileoutputcommitter.algorithm.version", "2"
                )
                .parquet(
                    os.path.join(index_dir, "termstats", f"epoch={epoch}")
                )
            )
            total_tf = _obs_count(obs_tot, "total_tf")
            n_postings = _obs_count(obs_tot, "n_postings")
        blocks.unpersist()

    # exactly-once accounting: the epoch's deltas live in its manifest
    # (written atomically, LAST); global stats are *derived* by summing
    # all epoch manifests, so a crash at any point before the manifest
    # rename leaves no trace and redelivery cannot double-count.
    _atomic_json(
        mpath,
        {
            "epoch": epoch,
            "status": "complete",
            "n_docs": int(n_batch_docs),
            "total_tf": total_tf,
            "n_postings": n_postings,
            "applied_at": time.time(),
        },
    )
    return _rebuild_stats(
        index_dir, num_buckets, num_salts, block_size, k1, b, normalize_zht
    )


def _obs_count(obs, key) -> int:
    """Observed metric with an empty-plan fallback: Catalyst's
    PropagateEmptyRelation can optimize the CollectMetrics node out
    of a provably-empty plan (e.g. a literal empty micro-batch), in
    which case the metric row never materializes and reading it
    raises - the plan was empty, so the count is 0."""
    try:
        return int(obs.get[key] or 0)
    except Exception:
        return 0


def _write_termstats_local(index_dir: str, epoch: int):
    """Derive and write a SMALL epoch's termstats on the driver from
    the freshly-written flat postings file's block metadata - a
    column-pruned pyarrow read (bucket/term/n/sum_tf; the fat binary
    posting columns never leave disk) over one small file, replacing
    a whole second Spark job whose fixed cost dominated the per-epoch
    floor.  Returns (total_tf, n_postings) for the manifest."""
    import pyarrow as pa
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    edir = os.path.join(index_dir, "postings", f"epoch={epoch}")
    try:
        files = [
            os.path.join(edir, n)
            for n in sorted(os.listdir(edir))
            if n.endswith(".parquet")
        ]
    except FileNotFoundError:
        return 0, 0
    if not files:
        return 0, 0
    tbl = pds.dataset(files).to_table(
        columns=["bucket", "term", "n", "sum_tf"]
    )
    if tbl.num_rows == 0:
        return 0, 0
    pdf = (
        tbl.to_pandas()
        .groupby(["bucket", "term"], as_index=False)
        .agg(df=("n", "sum"), cf=("sum_tf", "sum"))
        .sort_values(["bucket", "term"], kind="stable")
    )
    tdir = os.path.join(index_dir, "termstats", f"epoch={epoch}")
    os.makedirs(tdir, exist_ok=True)
    out = os.path.join(tdir, "part-00000.parquet")
    tmp = out + ".tmp"
    pq.write_table(
        pa.Table.from_pandas(
            pdf[["bucket", "term", "df", "cf"]], preserve_index=False
        ),
        tmp,
    )
    os.replace(tmp, out)
    return int(pdf["cf"].sum()), int(pdf["df"].sum())


_SMALL_EPOCH_BYTES = 256 << 20


def _estimated_small(batch: DataFrame) -> bool:
    """True when Catalyst's size estimate for the micro-batch is under
    ~256 MB of source bytes - the regime where per-file commit costs
    dominate over reducer memory concerns.  Falls back to the
    conservative large-epoch layout when no estimate is available."""
    try:
        est = int(
            str(
                batch._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        )
        return 0 < est < _SMALL_EPOCH_BYTES
    except Exception:
        return False


def _atomic_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _rebuild_stats(
    index_dir, num_buckets, num_salts, block_size, k1, b,
    normalize_zht: bool = False, extra: dict | None = None,
) -> dict:
    mdir = os.path.join(index_dir, "manifests")
    epochs, n_docs, total_tf, n_postings = [], 0, 0, 0
    base = os.path.join(mdir, "base.json")
    if os.path.exists(base):
        with open(base) as f:
            m = json.load(f)
        n_docs += int(m.get("n_docs", 0))
        total_tf += int(m.get("total_tf", 0))
        n_postings += int(m.get("n_postings", 0))
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("epoch=") and name.endswith(".json")):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        epochs.append(int(m["epoch"]))
        n_docs += int(m.get("n_docs", 0))
        total_tf += int(m.get("total_tf", 0))
        n_postings += int(m.get("n_postings", 0))
    stats = {
        "n_docs": n_docs,
        "avgdl": total_tf / max(n_docs, 1),
        "total_tf": total_tf,
        "n_postings": n_postings,
        "num_buckets": num_buckets,
        "num_salts": num_salts,
        "block_size": block_size,
        "k1": k1,
        "b": b,
        "fingerprint": "streaming",
        "normalize_zht": bool(normalize_zht),
        "epochs": sorted(epochs),
    }
    # carry the tombstone-generation bookkeeping (see
    # tombstones.load_tombstones): appends must not reset it, or a
    # racing explicit-upto delete loses its clamp and a leftover
    # applied tombstone loses its skip entry
    try:
        with open(_stats_path(index_dir)) as f:
            old = json.load(f)
        for key in ("compact_gen", "applied_tombstones"):
            if key in old:
                stats[key] = old[key]
    except (OSError, ValueError):
        pass
    if extra:
        stats.update(extra)
    _atomic_json(_stats_path(index_dir), stats)
    return stats


def stream_index(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    **kwargs,
):
    """Structured Streaming sink: incremental index maintenance via
    foreachBatch (exactly-once per epoch through the manifest)."""

    def sink(batch: DataFrame, epoch: int) -> None:
        append_index_batch(
            batch.sparkSession, batch, index_dir, int(epoch), **kwargs
        )

    return (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def upsert_index_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    epoch: int,
    docid_col: str | None = None,
    **kwargs,
) -> dict:
    """UPDATE parity: re-index a batch of documents, replacing any
    existing versions.  Tombstones the batch's docids for every epoch
    BELOW ``epoch`` (batch-built base postings count as epoch 0),
    then appends the new versions as epoch ``epoch`` - queries see
    exactly one version per doc with no rewrite of existing data;
    ``compact_index`` later folds the masked versions out physically.

    Mixed inserts and updates in one batch are fine (tombstoning an
    id with no prior version is harmless); re-delivery is idempotent
    via the epoch manifest like ``append_index_batch``.

    Bounded costs, stated: the batch's docids collect to the driver
    for the tombstone write (micro-batch sized); corpus stats count
    BOTH versions of an updated doc until compaction (Lucene's
    maxDoc-vs-deletions behavior) - compaction restores exact
    counts."""
    from .tombstones import delete_docs

    if epoch <= 0:
        raise ValueError(
            "upsert_index_batch needs epoch >= 1: batch-built base "
            "postings count as epoch 0, so an epoch-0 upsert could "
            "never mask the versions it replaces (streaming sinks "
            "should use batchId + 1)"
        )
    mpath = _epoch_manifest(index_dir, epoch)
    if not os.path.exists(mpath):
        # the SAME docid derivation the indexing path uses (incl. its
        # cast to long), so tombstoned ids always equal indexed ids
        ids = [
            r[0]
            for r in _with_docid(batch, docid_col)
            .select("docid")
            .collect()
        ]
        delete_docs(index_dir, ids, upto_epoch=epoch - 1)
    return append_index_batch(
        spark, batch, index_dir, epoch, docid_col=docid_col, **kwargs
    )
