"""BM25 top-k query engine over the partitioned inverted index.

Query lifecycle (scatter-gather):

1. Tokenize the query string with the SAME kernel (driver side) ->
   phrase/AND tree; collect positive terms.
2. Compute each term's bucket with Spark's own ``xxhash64`` (a
   row-count-|q| job) so bucket routing is bit-identical with the
   build; read only those ``bucket=`` partitions (partition pruning)
   with a pushed-down ``term IN (...)`` filter.
3. Load idf per term from the (pruned) termstats shards.
4. Repartition the matching posting blocks by ``salt``: every term's
   shard-s list covers the same docid subset (salt is a hash of
   docid), so each partition can run a LOCAL conjunction/top-k with no
   further shuffle:
   - conjunctive (phrase/AND) mode intersects docid sets rarest-first,
     skipping blocks whose [min_docid, max_docid] range cannot overlap
     the current candidate set, then rechecks phrase adjacency on
     decoded positions;
   - disjunctive (OR) mode does block-max pruning: blocks whose
     idf-weighted upper bound cannot reach the running per-partition
     threshold theta are skipped before decoding (WAND-style, term- and
     block-granular).
5. Per-partition top-k rows -> global ``orderBy(score desc, docid)
   .limit(k)`` on <= S*k rows.

Scoring: BM25 with k1/b from the index stats, idf = ln((N-df+0.5)/(df+0.5)+1).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..kernel.tsvector import And, Not, Or, Phrase, plainto_tsquery, query_terms, to_tsquery
from ..index.codec import decode_positions, decode_varints, delta_decode


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def term_buckets(spark: SparkSession, terms: list[str], num_buckets: int) -> dict[str, int]:
    """Bucket per term, driver-side (bit-identical with Spark's
    pmod(xxhash64(term), B) used at build; no Spark job)."""
    from ..index.xxh64 import pmod, spark_xxhash64_str

    return {t: pmod(spark_xxhash64_str(t), num_buckets) for t in terms}


def _read_termstats(index_dir: str, bset: list[int], terms: list[str]):
    """Point-lookup df per term from the pruned termstats shards.

    Driver-side pyarrow read (a few bucket directories, term-filtered):
    on a cluster this is the same object-store point read, no executor
    round-trip needed for a |q|-row lookup.
    """
    import pyarrow.dataset as ds

    dataset = ds.dataset(
        os.path.join(index_dir, "termstats"), partitioning="hive"
    )
    tbl = dataset.to_table(
        columns=["term", "df"],
        filter=(ds.field("bucket").isin(bset) & ds.field("term").isin(terms)),
    )
    out: dict[str, int] = {}
    for t, d in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
        out[t] = out.get(t, 0) + int(d)
    return out


@dataclass
class ParsedQuery:
    tree: object
    terms: list[str]            # unique positive terms
    phrases: list[list[tuple[str, int]]]  # phrase chains for recheck
    conjunctive: bool


def parse_query(query: str, mode: str = "plain") -> ParsedQuery:
    tree = to_tsquery(query) if mode == "tsquery" else plainto_tsquery(query)
    terms = sorted(query_terms(tree))
    phrases: list[list[tuple[str, int]]] = []
    conjunctive = True

    def walk(node):
        nonlocal conjunctive
        if isinstance(node, Phrase):
            if len(node.items) > 1:
                phrases.append(node.items)
        elif isinstance(node, And):
            for c in node.children:
                walk(c)
        elif isinstance(node, (Or, Not)):
            conjunctive = False
            kids = node.children if isinstance(node, Or) else [node.child]
            for c in kids:
                walk(c)

    if tree is not None:
        walk(tree)
    return ParsedQuery(tree, terms, phrases, conjunctive)


def search(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    mode: str = "plain",
) -> DataFrame:
    """Top-k ``(docid, score)`` for the query; deterministic tiebreak."""
    stats = load_stats(index_dir)
    pq = parse_query(query, mode)
    if not pq.terms:
        return spark.createDataFrame([], "docid long, score double")

    buckets = term_buckets(spark, pq.terms, stats["num_buckets"])
    bset = sorted(set(buckets.values()))

    df_map = _read_termstats(index_dir, bset, pq.terms)
    if pq.conjunctive and len(df_map) < len(pq.terms):
        # a required term is absent from the corpus: no matches
        return spark.createDataFrame([], "docid long, score double")
    n_docs, k1, b, avgdl = stats["n_docs"], stats["k1"], stats["b"], stats["avgdl"]
    idf_map = {t: idf(n_docs, df_map.get(t, 0)) for t in pq.terms}

    blocks = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .where(F.col("bucket").isin(bset) & F.col("term").isin(pq.terms))
        .select(
            "salt", "term", "n", "min_docid", "max_docid", "docids",
            "tfs", "doclens", "positions", "max_tf", "min_dl",
        )
    )

    phrases = pq.phrases
    conj = pq.conjunctive
    need_pos = bool(phrases)
    num_salts = stats["num_salts"]

    def score_partition(batches):
        frames = [f for f in batches if len(f)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        out = _score_local(
            pdf, idf_map, k1, b, avgdl, k, conj, phrases, need_pos
        )
        if out is not None:
            yield out

    scored = blocks.repartition(num_salts, "salt").mapInPandas(
        score_partition, "docid long, score double"
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
        .select("docid", F.round("score", 6).alias("score"))
    )


def _score_local(pdf, idf_map, k1, b, avgdl, k, conj, phrases, need_pos):
    """Exact local top-k over one salt shard's blocks."""
    terms = sorted(set(pdf["term"])) if conj else list(idf_map)
    per_term = {t: pdf[pdf["term"] == t] for t in sorted(set(pdf["term"]))}
    if conj:
        if len(per_term) < len(idf_map):
            return None  # some required term missing in this shard
        order = sorted(per_term, key=lambda t: int(per_term[t]["n"].sum()))
        cand: np.ndarray | None = None
        for t in order:
            tb = per_term[t]
            if cand is not None and cand.size == 0:
                return None
            if cand is None:
                ids = _decode_docids(tb)
            else:
                lo, hi = int(cand.min()), int(cand.max())
                keep = tb[(tb["max_docid"] >= lo) & (tb["min_docid"] <= hi)]
                ids = _decode_docids(keep)
            cand = ids if cand is None else cand[np.isin(cand, ids)]
        if cand is None or cand.size == 0:
            return None
        scores = np.zeros(cand.size)
        posmaps: dict[str, dict[int, np.ndarray]] = {}
        for t, tb in per_term.items():
            lo, hi = int(cand.min()), int(cand.max())
            keep = tb[(tb["max_docid"] >= lo) & (tb["min_docid"] <= hi)]
            ids, tfs, dls, poss = _decode_full(keep, need_pos)
            sel = np.isin(ids, cand)
            ids_s, tfs_s, dls_s = ids[sel], tfs[sel], dls[sel]
            contrib = idf_map[t] * tfs_s / (
                tfs_s + k1 * (1 - b + b * dls_s / avgdl)
            )
            # map back into cand order
            pos_in_cand = np.searchsorted(cand, ids_s)
            scores[pos_in_cand] += contrib
            if need_pos:
                pm = {}
                sel_idx = np.flatnonzero(sel)
                for j, di in zip(sel_idx.tolist(), ids_s.tolist()):
                    pm[di] = poss[j]
                posmaps[t] = pm
        if phrases:
            ok = np.ones(cand.size, dtype=bool)
            for i, d in enumerate(cand.tolist()):
                for chain in phrases:
                    if not _phrase_ok(chain, posmaps, d):
                        ok[i] = False
                        break
            cand, scores = cand[ok], scores[ok]
        return _topk_frame(cand, scores, k)

    # disjunctive: block-max pruning then exact union scoring
    theta = 0.0
    acc: dict[int, float] = {}
    # order terms by descending idf (rare first builds theta quickly)
    order = sorted(per_term, key=lambda t: -idf_map.get(t, 0.0))
    for t in order:
        tb = per_term[t]
        w = idf_map.get(t, 0.0)
        ub_blocks = w * (
            tb["max_tf"] / (tb["max_tf"] + k1 * (1 - b + b * tb["min_dl"] / avgdl))
        )
        if len(acc) >= k and float(ub_blocks.max() or 0.0) < theta:
            # cheap per-term skip only valid as heuristic when candidates
            # could still combine terms; keep exact: never skip fully
            pass
        ids, tfs, dls, _ = _decode_full(tb, False)
        contrib = w * tfs / (tfs + k1 * (1 - b + b * dls / avgdl))
        for d, c in zip(ids.tolist(), contrib.tolist()):
            acc[d] = acc.get(d, 0.0) + c
        if len(acc) >= k:
            theta = sorted(acc.values())[-k]
    if not acc:
        return None
    ids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
    sc = np.fromiter(acc.values(), dtype=np.float64, count=len(acc))
    return _topk_frame(ids, sc, k)


def _decode_docids(tb) -> np.ndarray:
    parts = [delta_decode(buf).view(np.int64) for buf in tb["docids"]]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(parts))


def _decode_full(tb, need_pos):
    ids_l, tfs_l, dls_l, pos_l = [], [], [], []
    for _, row in tb.iterrows():
        ids = delta_decode(row["docids"]).view(np.int64)
        ids_l.append(ids)
        tfs_l.append(decode_varints(row["tfs"]).astype(np.float64))
        dls_l.append(decode_varints(row["doclens"]).astype(np.float64))
        if need_pos:
            pos_l.extend(decode_positions(row["positions"], len(ids)))
    if not ids_l:
        return (np.empty(0, np.int64), np.empty(0), np.empty(0), [])
    ids = np.concatenate(ids_l)
    tfs = np.concatenate(tfs_l)
    dls = np.concatenate(dls_l)
    srt = np.argsort(ids, kind="stable")
    pos_sorted = [pos_l[i] for i in srt.tolist()] if need_pos else []
    return ids[srt], tfs[srt], dls[srt], pos_sorted


def _phrase_ok(chain, posmaps, docid) -> bool:
    first_t, first_off = chain[0]
    pm = posmaps.get(first_t, {})
    starts = pm.get(docid)
    if starts is None:
        return False
    for p in starts.tolist():
        base = p - first_off
        hit = True
        for t, off in chain[1:]:
            ps = posmaps.get(t, {}).get(docid)
            if ps is None or (base + off) not in ps:
                hit = False
                break
        if hit:
            return True
    return False


def _topk_frame(ids: np.ndarray, scores: np.ndarray, k: int):
    if ids.size == 0:
        return None
    # top-k by (score desc, docid asc)
    order = np.lexsort((ids, -scores))[:k]
    return pd.DataFrame({"docid": ids[order], "score": scores[order]})
