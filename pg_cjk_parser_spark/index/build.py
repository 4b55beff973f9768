"""Distributed inverted-index build.

Pipeline (all DataFrame/Arrow; designed for 1000-executor scale):

1. **Tokenize + explode** (the expensive pass, one tokenizer run per
   doc): ``tsvector_udf`` -> ``(docid, doclen, term, tf, positions)``.
   Doc length rides along with every posting so scoring never joins on
   docid.
2. **Stage** the exploded postings to parquet once, so the tokenizer
   pass is never repeated by downstream aggregations (corpus stats,
   term stats, block encode all read the staging area with column
   pruning).
3. **Salted repartition**: ``bucket = pmod(xxhash64(term), B)`` x
   ``salt = pmod(xxhash64(docid), S)``.  Head CJK bigrams are
   Zipf-heavy; the salt splits each term's postings into S
   docid-disjoint shards so no single reducer owns a head term.  The
   salt doubles as the query-time alignment unit: all terms' shard-s
   lists cover the same docid subset, so per-salt partitions can run
   local conjunctions/WAND without a docid shuffle.
4. **Block encode** (``mapInPandas``, streaming with carry-over, no
   whole-group materialization): per (bucket, salt, term), docid-sorted
   blocks of ``block_size`` postings; delta+varint docids, varint tfs &
   doclens, per-doc delta-varint positions, per-block
   ``(max_tf, min_doclen, min/max docid)`` for block-max pruning.
5. **Write** parquet partitioned by ``bucket`` (queries touch at most
   |q| buckets via partition pruning) + per-bucket ``_manifest.json``
   lineage enabling checkpoint resume: on resume, buckets with a valid
   manifest are skipped and the rest are rebuilt with dynamic
   partition overwrite.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .codec import delta_encode, encode_varints

BLOCK_SCHEMA = (
    "bucket int, salt int, term string, block_id int, n int, "
    "min_docid long, max_docid long, docids binary, tfs binary, "
    "doclens binary, positions binary, max_tf int, min_dl int, "
    "sum_tf long"
)

DEFAULT_BUCKETS = 64
DEFAULT_SALTS = 4
DEFAULT_BLOCK = 128


def _manifest_path(index_dir: str, bucket: int) -> str:
    return os.path.join(index_dir, "manifests", f"bucket={bucket}.json")


def _bucket_dirs(path: str) -> list[str]:
    """hive bucket= partition dirs under ``path`` ([] for an empty index)."""
    if not os.path.isdir(path):
        return []
    return [x for x in os.listdir(path) if x.startswith("bucket=")]


def _valid_buckets(index_dir: str, fingerprint: str) -> set[int]:
    mdir = os.path.join(index_dir, "manifests")
    if not os.path.isdir(mdir):
        return set()
    ok = set()
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            if m.get("fingerprint") == fingerprint and m.get("status") == "complete":
                ok.add(int(m["bucket"]))
        except Exception:
            continue
    return ok


POSTING_ROW_SCHEMA = (
    "docid long, doclen int, term string, tf int, positions binary"
)


def _enc_pos(ps: list[int]) -> bytes:
    """Per-(doc,term) positions blob: varint [npos, delta positions...].

    Same wire format as codec.encode_positions for a single doc, but
    built with a plain-Python loop - positions lists are tiny (tf is
    almost always 1-3) so this beats a NumPy round-trip per call.
    """
    out = bytearray()
    n = len(ps)
    while n >= 128:
        out.append((n & 127) | 128)
        n >>= 7
    out.append(n)
    prev = 0
    for p in ps:
        d = p - prev
        prev = p
        while d >= 128:
            out.append((d & 127) | 128)
            d >>= 7
        out.append(d)
    return bytes(out)


def _postings_gen(batches):
    """Per-doc tokenize + aggregate, emitting flat pre-exploded rows.

    Flat str/int/binary columns keep the Arrow python->JVM transfer on
    the fast path; nested array<struct<..array<int>>> output measured
    ~6x slower and degraded under high parallelism.
    """
    from ..kernel.tokenizer import lexemes

    docid_out: list[int] = []
    dl_out: list[int] = []
    term_out: list[str] = []
    tf_out: list[int] = []
    pos_out: list[bytes] = []

    def frame():
        return pd.DataFrame(
            {
                "docid": np.array(docid_out, dtype=np.int64),
                "doclen": np.array(dl_out, dtype=np.int32),
                "term": term_out,
                "tf": np.array(tf_out, dtype=np.int32),
                "positions": pos_out,
            }
        )

    for pdf in batches:
        for docid, text in zip(pdf["docid"].tolist(), pdf["text"].tolist()):
            lex = lexemes(text) if text is not None else []
            agg: dict[str, list[int]] = {}
            for term, pos in lex:
                l = agg.get(term)
                if l is None:
                    agg[term] = [pos]
                else:
                    l.append(pos)
            dl = len(lex)
            for term, ps in agg.items():
                docid_out.append(docid)
                dl_out.append(dl)
                term_out.append(term)
                tf_out.append(len(ps))
                pos_out.append(_enc_pos(ps))
        if len(docid_out) >= 200_000:
            yield frame()
            docid_out, dl_out, term_out, tf_out, pos_out = [], [], [], [], []
    if docid_out:
        yield frame()


def explode_postings(docs: DataFrame, docid_col: str | None, text_col: str) -> DataFrame:
    """(docid, doclen, term, tf, positions:binary) - one row per (doc, term).

    Doc-id density matters: delta-varint docid blocks are ~2.4x smaller
    (and build ~1.4x faster) with dense/clustered int64 ids than with
    random hash ids.  Pass a dense ``docid_col`` when the corpus has
    one (ingest sequence, crawl timestamp); ``xxhash64(url)`` is the
    fallback when only urls identify documents.
    """
    if docid_col is None:
        docs = docs.withColumn("docid", F.xxhash64(F.col("url")))
    else:
        docs = docs.withColumn("docid", F.col(docid_col).cast("long"))
    sel = docs.select("docid", F.col(text_col).alias("text"))
    return sel.mapInPandas(_postings_gen, POSTING_ROW_SCHEMA)


_BLOCK_COLS = [
    "bucket", "salt", "term", "block_id", "n", "min_docid", "max_docid",
    "docids", "tfs", "doclens", "positions", "max_tf", "min_dl", "sum_tf",
]


def _encode_partition(batches, block_size: int):
    """Streaming block encoder over (bucket,salt,term,docid)-sorted rows.

    Group boundaries are found vectorized per Arrow batch; per-group
    work is NumPy over slices (no per-row Python).  The trailing
    (possibly batch-spanning) group is carried over with its running
    block_id so a head term larger than a batch never materializes in
    full: full blocks are emitted as soon as they fill.
    """
    out_rows: list[tuple] = []
    # carried tail group: (key, block_id, [arrays...])
    ckey = None
    cblock = 0
    cd = ct = cdl = None
    cpos: list = []

    def emit(key, block_id0, d, t, dl, poss, final: bool):
        """Emit blocks; return (next_block_id, remainder arrays)."""
        nonlocal out_rows
        n_total = len(d)
        full_end = n_total if final else (n_total // block_size) * block_size
        bid = block_id0
        off = 0
        while off < full_end:
            end = min(off + block_size, full_end)
            dd, tt, ll = d[off:end], t[off:end], dl[off:end]
            out_rows.append(
                (
                    key[0], key[1], key[2], bid, end - off,
                    int(dd[0]), int(dd[-1]),
                    delta_encode(dd),
                    encode_varints(tt.view(np.uint64)),
                    encode_varints(ll.view(np.uint64)),
                    b"".join(poss[off:end]),
                    int(tt.max()), int(ll.min()), int(tt.sum()),
                )
            )
            bid += 1
            off = end
        return bid, d[off:], t[off:], dl[off:], poss[off:]

    for pdf in batches:
        if len(pdf) == 0:
            continue
        b = pdf["bucket"].to_numpy()
        s = pdf["salt"].to_numpy()
        term = pdf["term"].to_numpy()
        d = pdf["docid"].to_numpy().astype(np.int64, copy=False)
        t = pdf["tf"].to_numpy().astype(np.int64)
        dl = pdf["doclen"].to_numpy().astype(np.int64)
        poss = pdf["positions"].tolist()

        change = np.empty(len(pdf), dtype=bool)
        change[0] = True
        change[1:] = (term[1:] != term[:-1]) | (s[1:] != s[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(change)
        bounds = np.append(starts, len(pdf))

        for gi in range(len(starts)):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            key = (int(b[lo]), int(s[lo]), term[lo])
            gd, gt, gdl = d[lo:hi], t[lo:hi], dl[lo:hi]
            gpos = poss[lo:hi]
            if key == ckey:
                gd = np.concatenate((cd, gd))
                gt = np.concatenate((ct, gt))
                gdl = np.concatenate((cdl, gdl))
                gpos = cpos + gpos
                bid = cblock
            else:
                if ckey is not None:
                    # previous carried group ended at a batch boundary
                    cblock, cd, ct, cdl, cpos = emit(
                        ckey, cblock, cd, ct, cdl, cpos, final=True
                    )
                bid = 0
            last_in_batch = gi == len(starts) - 1
            if last_in_batch:
                ckey = key
                cblock, cd, ct, cdl, cpos = emit(
                    key, bid, gd, gt, gdl, gpos, final=False
                )
            else:
                emit(key, bid, gd, gt, gdl, gpos, final=True)
                ckey = None
        if len(out_rows) >= 2000:
            yield pd.DataFrame(out_rows, columns=_BLOCK_COLS)
            out_rows = []
    if ckey is not None:
        emit(ckey, cblock, cd, ct, cdl, cpos, final=True)
    if out_rows:
        yield pd.DataFrame(out_rows, columns=_BLOCK_COLS)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    docid_col: str | None = None,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    num_salts: int = DEFAULT_SALTS,
    block_size: int = DEFAULT_BLOCK,
    k1: float = 1.2,
    b: float = 0.75,
    resume: bool = False,
    fingerprint: str | None = None,
    num_partitions: int | None = None,
    keep_staging: bool = False,
    n_docs: int | None = None,
) -> dict:
    """Build (or resume) the inverted index for ``docs``; returns stats.

    ``keep_staging=True`` retains the exploded-postings staging parquet
    (skips re-tokenizing on resume at the cost of ~staged-corpus
    storage); by default it is deleted after a successful build.
    """
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    fingerprint = fingerprint or f"fp2-{num_buckets}-{num_salts}-{block_size}"
    done = _valid_buckets(index_dir, fingerprint) if resume else set()
    if resume and len(done) == num_buckets:
        with open(os.path.join(index_dir, "stats.json")) as f:
            return json.load(f)
    if not resume:
        # clean rebuild: dynamic partition overwrite would leave stale
        # partitions (old buckets / streaming epochs) behind otherwise
        for sub in ("postings", "termstats", "manifests"):
            shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)

    t0 = time.time()
    pdir = os.path.join(index_dir, "postings")
    ts_dir = os.path.join(index_dir, "termstats")
    staging = os.path.join(index_dir, "_staging_postings")

    def exploded():
        p = explode_postings(docs, docid_col, text_col)
        return p.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
        ).withColumn(
            "salt", F.pmod(F.xxhash64("docid"), F.lit(num_salts)).cast("int")
        )

    # The default path is fully fused: the tokenizer pass feeds the
    # (bucket, salt) shuffle directly and postings are never
    # materialized outside the shuffle files.  Staging to parquet is
    # only worth its extra corpus-sized write + re-read when a resume
    # needs to skip re-tokenizing completed buckets.
    if resume or keep_staging:
        if not (resume and os.path.exists(os.path.join(staging, "_SUCCESS"))):
            exploded().write.mode("overwrite").parquet(staging)
        src = spark.read.parquet(staging)
    else:
        src = exploded()

    if n_docs is None:
        n_docs = docs.count()

    todo = src
    if done:
        todo = src.where(~F.col("bucket").isin([int(x) for x in sorted(done)]))

    parts = num_partitions or min(
        num_buckets * num_salts, spark.sparkContext.defaultParallelism * 4
    )
    blocks = (
        todo.repartition(parts, "bucket", "salt")
        .sortWithinPartitions("bucket", "salt", "term", "docid")
        .mapInPandas(
            lambda it: _encode_partition(it, block_size), BLOCK_SCHEMA
        )
    )
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "dynamic")
    try:
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(pdir)

        # termstats + corpus totals derive from per-block metadata: a
        # column-pruned read of (bucket, term, n, sum_tf) over the
        # just-written blocks - ~1/block_size of the postings volume -
        # instead of a second full shuffle over raw postings.
        # df = sum(n) and cf = sum(sum_tf) are exact: every posting
        # lands in exactly one block.
        if _bucket_dirs(pdir):
            meta = spark.read.parquet(pdir).select(
                "bucket", "term", "n", "sum_tf"
            )
            termstats = meta.groupBy("bucket", "term").agg(
                F.sum("n").alias("df"), F.sum("sum_tf").alias("cf")
            )
            termstats.write.mode("overwrite").partitionBy("bucket").parquet(
                ts_dir
            )
    finally:
        if prev_mode is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev_mode)

    if _bucket_dirs(ts_dir):
        g = (
            spark.read.parquet(ts_dir)
            .agg(
                F.sum("cf").alias("total_tf"),
                F.sum("df").alias("n_postings"),
                F.count(F.lit(1)).alias("n_terms"),
            )
            .collect()[0]
        )
        total_tf, n_postings, n_terms = (
            int(g.total_tf or 0), int(g.n_postings or 0), int(g.n_terms)
        )
    else:
        os.makedirs(ts_dir, exist_ok=True)
        total_tf = n_postings = n_terms = 0
    avgdl = total_tf / max(n_docs, 1)

    stats = {
        "n_docs": int(n_docs),
        "avgdl": float(avgdl),
        "total_tf": total_tf,
        "n_postings": n_postings,
        "n_terms_approx": n_terms,
        "num_buckets": num_buckets,
        "num_salts": num_salts,
        "block_size": block_size,
        "k1": k1,
        "b": b,
        "fingerprint": fingerprint,
        "build_seconds": round(time.time() - t0, 3),
    }
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)

    os.makedirs(os.path.join(index_dir, "manifests"), exist_ok=True)
    for bucket in range(num_buckets):
        if bucket in done:
            continue
        with open(_manifest_path(index_dir, bucket), "w") as f:
            json.dump(
                {
                    "bucket": bucket,
                    "status": "complete",
                    "fingerprint": fingerprint,
                    "n_docs": int(n_docs),
                    "built_at": time.time(),
                },
                f,
            )
    if not keep_staging:
        shutil.rmtree(staging, ignore_errors=True)
    return stats
