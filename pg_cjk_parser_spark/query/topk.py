"""BM25 top-k query engine over the partitioned inverted index.

Query lifecycle (scatter-gather):

1. Tokenize the query string with the SAME kernel (driver side) ->
   phrase/AND tree; collect positive terms.
2. Compute each term's bucket driver-side with a bit-identical
   pure-Python xxhash64 (no Spark job); read only those ``bucket=``
   partitions (partition pruning) with a pushed-down
   ``term IN (...)`` filter.
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

from ..kernel.tsvector import (
    And,
    Not,
    Or,
    Phrase,
    Prefix,
    plainto_tsquery,
    query_terms,
    query_terms_all,
    to_tsquery,
)
from ..index.codec import decode_varints
from ..index.xxh64 import salt_partition_count
from ..index.tombstones import (
    alive_mask,
    epoch_dir_layout,
    epoch_from_file_path,
    load_tombstones,
)


def _index_version(index_dir: str):
    """Version key for an index: the mtime_ns of stats.json and of
    the postings AND termstats dirs.  Every in-contract mutation
    (append, upsert epoch, compact, merge) rewrites stats.json last;
    the shard-dir mtimes additionally catch FOREIGN epoch dirs
    landing without a stats refresh (the crashed-append case
    _shard_paths's directory fallback serves) - creating epoch=N
    bumps the parent dir's mtime, and BOTH dirs are tracked so a
    postings-first landing cannot freeze a negative df entry taken
    before its termstats arrived.  Tombstones deliberately bump none
    of the three - the dictionary df stays frozen until compaction
    (live-docs semantics), so cached df values remain correct."""
    def mt(p):
        try:
            return os.stat(p).st_mtime_ns
        except OSError:
            return -1

    return (
        mt(os.path.join(index_dir, "stats.json")),
        mt(os.path.join(index_dir, "postings")),
        mt(os.path.join(index_dir, "termstats")),
    )


_STATS_CACHE: dict = {}
_DF_CACHE: dict = {}
_DF_CACHE_MAX_TERMS = 1 << 16


def load_stats(index_dir: str) -> dict:
    """stats.json, cached per index version - the serving tier reads
    it on every point query, and a real serving fleet would hold this
    catalog state resident (PG keeps it in shared catalogs)."""
    ver = _index_version(index_dir)
    hit = _STATS_CACHE.get(index_dir)
    if hit is not None and hit[0] == ver:
        return dict(hit[1])
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    if len(_STATS_CACHE) > 256:
        _STATS_CACHE.clear()
    _STATS_CACHE[index_dir] = (ver, stats)
    return dict(stats)


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def term_buckets(terms: list[str], num_buckets: int) -> dict[str, int]:
    """Bucket per term, driver-side (bit-identical with Spark's
    pmod(xxhash64(term), B) used at build; no Spark job)."""
    from ..index.xxh64 import pmod, spark_xxhash64_str

    return {t: pmod(spark_xxhash64_str(t), num_buckets) for t in terms}


def _shard_paths(index_dir: str, subdir: str, bset, stats) -> list[str]:
    """Scoped scan paths for the pruned bucket set under ``subdir``
    (postings or termstats).  Listing the whole tree per query would
    cost O(index size) directory discovery - prohibitive on object
    storage at corpus scale; instead paths are constructed from the
    routing result and the known epoch list, so per-query listing is
    O(|q| buckets x epochs)."""
    pdir = os.path.join(index_dir, subdir)
    epochs = stats.get("epochs")
    if epochs is None and os.path.isdir(pdir):
        # stats predate (or never learned about) epoch appends: trust
        # the directory over the stats so foreign-appended epochs are
        # not silently dropped
        found = sorted(
            int(n.split("=", 1)[1])
            for n in os.listdir(pdir)
            if n.startswith("epoch=")
            and n.split("=", 1)[1].isdigit()
        )
        epochs = found or None
    paths = []
    for b in bset:
        p = os.path.join(pdir, f"bucket={b}")
        if os.path.isdir(p):
            paths.append(p)
    for e in epochs or ():
        ebase = os.path.join(pdir, f"epoch={e}")
        found = False
        for b in bset:
            p = os.path.join(ebase, f"bucket={b}")
            if os.path.isdir(p):
                paths.append(p)
                found = True
        if not found and epoch_dir_layout(ebase) == "flat":
            # flat per-epoch shard (streaming appends write termstats
            # this way always, and SMALL postings epochs too): one
            # plain directory, bucket carried as a data column;
            # term/bucket filters prune at the row-group level
            # instead of by dir.  Directory-level bucket pruning is
            # deliberately traded away here - a small epoch is one
            # small file, and maintain_index folds it into the
            # nested layout
            paths.append(ebase)
    if not paths and os.path.isdir(pdir):
        # layout not derivable from stats (e.g. legacy index): scoped
        # glob over epoch dirs only, still restricted to bset
        import glob

        for b in bset:
            paths += glob.glob(os.path.join(pdir, "epoch=*", f"bucket={b}"))
        if not paths and subdir == "termstats":
            paths += [
                p
                for p in glob.glob(os.path.join(pdir, "epoch=*"))
                if os.path.isdir(p)
                and not any(
                    n.startswith("bucket=") for n in os.listdir(p)
                )
            ]
    return paths


def expand_prefix(
    index_dir: str, prefix: str, stats, max_terms: int = 1000
) -> list[str]:
    """Dictionary scan for ``'prefix':*``: every indexed lexeme
    starting with ``prefix``, from the metadata-only termstats shards.

    A prefix does not hash, so unlike exact terms this reads ALL
    buckets - but only their termstats (~1/block_size of postings
    volume) with a pushed-down range filter, the same dictionary walk
    PostgreSQL's GIN does over its term btree.  Bounded by
    ``max_terms`` so a one-letter prefix over a web-scale dictionary
    fails loudly instead of fanning out into a thousand-way OR."""
    import pyarrow.dataset as ds

    bset = list(range(stats["num_buckets"]))
    paths = _shard_paths(index_dir, "termstats", bset, stats)
    flt = ds.field("term") >= prefix
    nxt = ord(prefix[-1]) + 1
    if nxt == 0xD800:  # skip the surrogate block (unencodable)
        nxt = 0xE000
    if nxt <= 0x10FFFF:
        flt = flt & (ds.field("term") < prefix[:-1] + chr(nxt))
    out: set[str] = set()
    for p in paths:
        tbl = ds.dataset(p).to_table(columns=["term"], filter=flt)
        for t in tbl["term"].to_pylist():
            if t.startswith(prefix):
                out.add(t)
        if len(out) > max_terms:
            raise ValueError(
                f"prefix '{prefix}:*' matches more than {max_terms} "
                "indexed lexemes; narrow the prefix or raise max_terms"
            )
    return sorted(out)


def _read_termstats(
    index_dir: str, bset: list[int], terms: list[str], stats, ver=None
):
    """Point-lookup df per term from the pruned termstats shards,
    with a per-index-version dictionary cache (including negative
    entries): repeated or overlapping queries skip the parquet point
    reads entirely - the serving analog of PG keeping the GIN term
    btree's hot pages in shared_buffers.  Tombstones don't invalidate
    it (df is deliberately frozen until compaction); every structural
    mutation bumps the version key (stats.json rewrite or a new epoch
    dir).  ``ver`` must be the version snapshot taken BEFORE ``stats``
    was loaded (see _route) so a concurrent append landing in between
    caches its possibly-stale reads under the OLD key, which the next
    query's fresh version replaces - never under the new one.

    Driver-side pyarrow read on miss (a few bucket directories,
    term-filtered): on a cluster this is the same object-store point
    read, no executor round-trip needed for a |q|-row lookup.
    """
    import pyarrow.dataset as ds

    ver = (index_dir, ver if ver is not None else _index_version(index_dir))
    cached = _DF_CACHE.get(ver)
    if cached is None:
        if len(_DF_CACHE) > 8:
            _DF_CACHE.clear()
        cached = _DF_CACHE[ver] = {}
    missing = [t for t in terms if t not in cached]
    if missing:
        paths = _shard_paths(index_dir, "termstats", bset, stats)
        found: dict[str, int] = {}
        # per-path reads: bucket-dir shards (batch/compacted layout)
        # and flat epoch dirs (streaming layout, bucket as a column)
        # carry different physical schemas, so a unified dataset would
        # fail to merge them; each path is a tiny term-filtered point
        # read anyway
        for p in paths:
            tbl = ds.dataset(p).to_table(
                columns=["term", "df"],
                filter=ds.field("term").isin(missing),
            )
            for t, d in zip(
                tbl["term"].to_pylist(), tbl["df"].to_pylist()
            ):
                found[t] = found.get(t, 0) + int(d)
        if len(cached) + len(missing) > _DF_CACHE_MAX_TERMS:
            cached.clear()
        for t in missing:
            cached[t] = found.get(t, 0)  # 0 = negative entry
    return {t: cached[t] for t in terms if cached[t] > 0}


@dataclass
class ParsedQuery:
    tree: object
    terms: list[str]            # unique positive terms (scored)
    all_terms: list[str]        # incl. negated (fetched from the index)
    phrases: list[list[tuple[str, int]]]  # conjunctive phrase chains
    conjunctive: bool
    # PRE-expansion operand groups for calc_rank_or parity: one entry
    # per unique query item (a prefix counts as ONE item whose group
    # is its dictionary expansion; an exact term is a singleton),
    # sorted by operand text - tsrank.c divides the or-path rank by
    # the ITEM count, not the expanded-lexeme count
    or_groups: list[list[str]] | None = None


def _reduces_to_complement(node) -> bool:
    """True when the tree matches the COMPLEMENT of an enumerable doc
    set (mirrors _eval_tree's complement algebra: And is a complement
    iff every child is, Or iff any child is).  Such queries ('!a',
    'a | !b') match every document outside a set and need a full
    corpus scan, which the index path cannot do - reject them at
    parse time instead of failing inside the scoring job."""
    if isinstance(node, Not):
        return not _reduces_to_complement(node.child)
    if isinstance(node, And):
        return all(_reduces_to_complement(c) for c in node.children)
    if isinstance(node, Or):
        return any(_reduces_to_complement(c) for c in node.children)
    return False  # Phrase / term leaf


_IMPOSSIBLE_LEXEME = "\x00"  # the tokenizer can never emit NUL


def _expand_prefix_nodes(node, expand):
    """Replace every :pyclass:`Prefix` node with the OR of its
    dictionary expansion (PostgreSQL GIN does the same walk over its
    term btree; here the metadata-only termstats shards ARE the
    dictionary).  An empty expansion becomes an impossible lexeme so
    boolean evaluation stays structurally intact ('a | none:*' still
    matches docs with 'a')."""
    if node is None or isinstance(node, Phrase):
        return node
    if isinstance(node, Prefix):
        terms = expand(node.term)
        if not terms:
            return Phrase([(_IMPOSSIBLE_LEXEME, 0)])
        if len(terms) == 1:
            return Phrase([(terms[0], 0)])
        return Or([Phrase([(t, 0)]) for t in sorted(terms)])
    if isinstance(node, And):
        return And([_expand_prefix_nodes(c, expand) for c in node.children])
    if isinstance(node, Or):
        # splice nested Ors flat (Or is associative): 'a | b:*' stays
        # a flat OR after expansion, keeping it WAND/rank routable
        kids = []
        for c in node.children:
            ec = _expand_prefix_nodes(c, expand)
            if isinstance(ec, Or):
                kids.extend(ec.children)
            else:
                kids.append(ec)
        return Or(kids)
    if isinstance(node, Not):
        return Not(_expand_prefix_nodes(node.child, expand))
    return node


def _contains_prefix(node) -> bool:
    if isinstance(node, Prefix):
        return True
    if isinstance(node, (And, Or)):
        return any(_contains_prefix(c) for c in node.children)
    if isinstance(node, Not):
        return _contains_prefix(node.child)
    return False


def _or_groups_of(pre_tree, expansions: dict[str, list[str]]):
    """calc_rank_or item groups from the PRE-expansion tree: one
    group per distinct (text, is_prefix) operand in kernel
    ``_operands`` order - a prefix item's group is its dictionary
    expansion, an exact item's is itself.  'b' and 'b:*' in one query
    are TWO items (the kernel treats them so; tier parity is against
    the kernel), and an empty prefix expansion still counts as an
    item (the divisor includes it; it just contributes 0)."""
    from ..kernel.tsrank import _operands

    return [
        list(expansions.get(text, [])) if pre else [text]
        for text, pre in _operands(pre_tree)
    ]


def parse_query(query: str, mode: str = "plain", expand=None) -> ParsedQuery:
    """``mode``: 'plain' (plainto_tsquery), 'tsquery' (to_tsquery),
    or 'websearch' (websearch_to_tsquery) - the three PG query
    constructors users pair with a GIN index."""
    if mode == "tsquery":
        tree = to_tsquery(query)
    elif mode == "websearch":
        from ..kernel.tsvector import websearch_to_tsquery

        tree = websearch_to_tsquery(query)
    else:
        tree = plainto_tsquery(query)
    pre_tree = tree
    expansions: dict[str, list[str]] = {}
    if tree is not None and expand is not None:

        def expand_memo(p):
            if p not in expansions:
                expansions[p] = list(expand(p))
            return expansions[p]

        tree = _expand_prefix_nodes(tree, expand_memo)
    if tree is not None and _contains_prefix(tree):
        raise ValueError(
            "prefix queries (:*) on the index path require a dictionary "
            "expansion callback; the scan path (kernel ts_match) "
            "evaluates them directly"
        )
    if tree is not None and _reduces_to_complement(tree):
        raise ValueError(
            "query reduces to a pure negation (e.g. '!a', 'a | !b'): "
            "it matches every document outside a set, which requires a "
            "full corpus scan; not supported by the index path"
        )
    terms = sorted(query_terms(tree))
    all_terms = sorted(query_terms_all(tree))
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
    if not terms and all_terms:
        raise ValueError(
            "purely negative queries require a full corpus scan and are "
            "not supported by the index path"
        )
    return ParsedQuery(
        tree, terms, all_terms, phrases, conjunctive,
        _or_groups_of(pre_tree, expansions),
    )


def _route(index_dir: str, query: str, mode: str):
    """Shared query routing: stats, parsed query, pruned bucket set,
    term df lookup, idf map.  Returns None when no doc can match.

    The version snapshot is taken BEFORE loading stats so a mutation
    racing this query can only poison the df cache under the OLD
    version key (replaced on the next query), never the new one."""
    ver = _index_version(index_dir)
    stats = load_stats(index_dir)
    if stats.get("normalize_zht"):
        # the index was built traditional->simplified normalized; map
        # the query the same way (char-level translate: tsquery
        # operators/quotes are unaffected)
        from ..functions.zht2zhs import zht2zhs

        query = zht2zhs(query)
    pq = parse_query(
        query,
        mode,
        expand=lambda p: expand_prefix(index_dir, p, stats),
    )
    if not pq.terms:
        return None
    buckets = term_buckets(pq.all_terms, stats["num_buckets"])
    bset = sorted(set(buckets.values()))
    df_map = _read_termstats(index_dir, bset, pq.all_terms, stats, ver)
    if not df_map or (pq.conjunctive and any(t not in df_map for t in pq.terms)):
        return None  # required term (or every term) absent from the corpus
    idf_map = {t: idf(stats["n_docs"], df_map.get(t, 0)) for t in pq.terms}
    return stats, pq, bset, idf_map


_LOCAL_BLOCK_COLUMNS = [
    "salt", "term", "n", "min_docid", "max_docid", "docids",
    "tfs", "doclens", "positions", "max_tf", "min_dl",
]


def _read_blocks_local(
    ds, paths, terms, with_epoch: bool = True
) -> pd.DataFrame:
    """pyarrow block read for the serving tier.

    When per-block epochs are not needed (no tombstones loaded, or a
    batch-only layout where every block is epoch 0 - see
    ``_needs_epoch``) all shard paths read as ONE file-list dataset:
    no per-path epoch parse, one threaded scan instead of a
    sequential per-shard loop.  Epoch-relevant reads fall back to one
    frame per shard path with the block epoch parsed from the path
    (epoch=N dir, 0 for batch dirs) - the no-Spark twin of
    _epoch_from_path."""
    import re as _re

    flt = ds.field("term").isin(terms)
    if not with_epoch:
        files = [
            os.path.join(p, n)
            for p in paths
            for n in sorted(os.listdir(p))
            if n.endswith(".parquet")
        ]
        return (
            ds.dataset(files)
            .to_table(columns=_LOCAL_BLOCK_COLUMNS, filter=flt)
            .to_pandas()
        )
    frames = []
    for p in paths:
        m = _re.search(r"epoch=(\d+)", p)
        f = ds.dataset(p).to_table(
            columns=_LOCAL_BLOCK_COLUMNS, filter=flt
        ).to_pandas()
        f["epoch"] = int(m.group(1)) if m else 0
        frames.append(f)
    return pd.concat(frames, ignore_index=True)


def _epoch_from_path() -> F.Column:
    """Per-block epoch derived from the file path - shared layout
    convention (index/tombstones.epoch_from_file_path)."""
    return epoch_from_file_path()


_BLOCK_READ_SCHEMA = (
    "salt int, term string, n int, min_docid long, max_docid long, "
    "docids binary, tfs binary, doclens binary, positions binary, "
    "max_tf int, min_dl int"
)


def _read_blocks(
    spark: SparkSession, paths: list[str], terms, with_epoch: bool = True
) -> DataFrame:
    """The one shared postings-block read every query path uses.

    The explicit schema (the block columns the scorers need) skips
    per-query parquet footer inference and doubles as column pruning;
    leaf dirs are passed as ROOTS (no basePath) because partition-
    column discovery would conflict across mixed layouts (batch
    bucket= dirs + appended epoch=/bucket= dirs) - partition values
    are not needed, the block epoch derives from the file path.

    The epoch column only exists to bound tombstones per posting, so
    callers pass ``with_epoch=False`` when no tombstones are loaded
    or the layout is batch-only (every block epoch 0) - the regexp
    over input_file_name is pure overhead then."""
    df = (
        spark.read.schema(_BLOCK_READ_SCHEMA)
        .parquet(*paths)
        .where(F.col("term").isin(list(terms)))
    )
    return df.withColumn("epoch", _epoch_from_path()) if with_epoch else df


def _needs_epoch(stats, deleted, paths=()) -> bool:
    """Per-posting epochs matter only when tombstones exist AND the
    index actually holds epoch shards (else every block is epoch 0
    and the scalar default bounds correctly).  Epoch presence is
    judged from the RESOLVED scan paths, not stats.json alone -
    _shard_paths serves foreign-appended epoch dirs stats never
    learned about, and epoch-bounded tombstones must not mask those
    blocks as if they were epoch 0."""
    if deleted is None:
        return False
    if stats.get("epochs"):
        return True
    return any("epoch=" in p for p in paths)


def _postings_paths(index_dir: str, bset, stats) -> list[str]:
    return _shard_paths(index_dir, "postings", bset, stats)


def search(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    mode: str = "plain",
) -> DataFrame:
    """Top-k ``(docid, score)`` for the query; deterministic tiebreak."""
    routed = _route(index_dir, query, mode)
    if routed is None:
        return spark.createDataFrame([], "docid long, score double")
    stats, pq, bset, idf_map = routed
    k1, b, avgdl = stats["k1"], stats["b"], stats["avgdl"]

    paths = _postings_paths(index_dir, bset, stats)
    if not paths:
        return spark.createDataFrame([], "docid long, score double")
    deleted = load_tombstones(index_dir)
    blocks = _read_blocks(
        spark, paths, pq.all_terms, _needs_epoch(stats, deleted, paths)
    )

    phrases = pq.phrases
    conj = pq.conjunctive
    tree = pq.tree
    need_pos = bool(phrases)
    num_salts = stats["num_salts"]

    def score_partition(batches):
        frames = [f for f in batches if len(f)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        out = _score_local(
            pdf, idf_map, k1, b, avgdl, k, conj, phrases, need_pos, tree,
            deleted,
        )
        if out is not None:
            yield out

    scored = blocks.repartition(salt_partition_count(num_salts), "salt").mapInPandas(
        score_partition, "docid long, score double"
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
        .select("docid", "score")
    )


def search_rank_cd(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    mode: str = "tsquery",
    method: int = 0,
) -> DataFrame:
    """Index-path ``ORDER BY ts_rank_cd(...) DESC LIMIT k``: the PG
    cover-density rank served from the inverted index's per-posting
    position lists - no document rescan or re-tokenize.

    Candidates come from the conjunctive intersection (the same
    rarest-first, block-range-pruned machinery as BM25 ``search``);
    each candidate's restricted tsvector is assembled from lazily
    decoded position blocks and ranked with the exact tsrank.c cover
    fold (kernel/tsrank.py), so results are rank-identical to running
    ``ts_rank_cd`` over the raw text (tests assert it).

    Supported queries: conjunctive (AND / phrase) - the shapes whose
    candidate set the index enumerates cheaply.  Supported
    normalization ``method`` bits: 0 | 4 | 32 (bits 1/2/8/16 need
    whole-document statistics the index does not store per posting;
    use the scan path for those).
    """
    if method & ~(4 | 32):
        raise ValueError(
            "index-path ts_rank_cd supports normalization bits 4|32 only"
        )
    routed = _route(index_dir, query, mode)
    if routed is None:
        return spark.createDataFrame([], "docid long, rank double")
    stats, pq, bset, _idf = routed
    if not pq.conjunctive:
        raise ValueError(
            "index-path ts_rank_cd supports conjunctive queries only"
        )
    tree = pq.tree
    n_terms = len(pq.terms)

    paths = _postings_paths(index_dir, bset, stats)
    if not paths:
        return spark.createDataFrame([], "docid long, rank double")
    deleted = load_tombstones(index_dir)
    blocks = _read_blocks(
        spark, paths, pq.all_terms, _needs_epoch(stats, deleted, paths)
    )
    num_salts = stats["num_salts"]

    def rank_partition(batches):
        frames = [f for f in batches if len(f)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        out = _rank_cd_local(pdf, tree, n_terms, k, method, deleted)
        if out is not None:
            yield out

    ranked = blocks.repartition(salt_partition_count(num_salts), "salt").mapInPandas(
        rank_partition, "docid long, rank double"
    )
    return (
        ranked.orderBy(F.desc("rank"), F.asc("docid"))
        .limit(k)
        .select("docid", "rank")
    )


_KEYOFF = 1 << 15  # keeps pos - chain_offset positive inside 16 bits

# sentinel: a bulk ranker detected (candidate, position) key
# collisions - distinct lexemes clamped to the same position - and
# the caller must re-rank those docs through the generic kernel path
_COLLIDED = object()


def _rank_cd_phrase_bulk(lists, cand, items, k, method):
    """Vectorized cover-density ranking for a pure phrase-chain query
    (the CJK-critical shape: every multi-token CJK lexeme is a chain).

    For a phrase, tsrank.c's greedy Cover enumeration reduces to a
    closed form: all matches have the same width, so the up-scan's
    first-satisfied window always ends at the earliest chain end and
    the down-scan's begin is that same chain's start - every chain
    match is exactly one cover.  Match starts are found with sorted
    intersections over (candidate, position-offset) keys across ALL
    candidates at once; per-cover noise counts come from two
    searchsorteds against the merged query-term position array.  Only
    the final per-doc accumulation stays a Python loop (a handful of
    float adds per doc) so the summation order - and therefore the
    bits - match kernel ts_rank_cd exactly (tests assert identity).
    """
    base = items[0][1]
    offsets = [(t, off - base) for t, off in items]
    width = offsets[-1][1]
    keybases: dict[str, np.ndarray] = {}
    for t in {t for t, _ in offsets}:
        cidx, pos = lists[t].positions_bulk(cand)
        keybases[t] = (cidx << 16) + pos + _KEYOFF
    allk = np.concatenate(list(keybases.values()))
    if np.unique(allk).size != allk.size:
        return _COLLIDED  # clamped-position collision: exact path
    starts = None
    for t, off in offsets:
        kb = keybases[t] - off
        starts = kb if starts is None else np.intersect1d(
            starts, kb, assume_unique=True
        )
        if not starts.size:
            return None
    merged = np.sort(allk)
    cnt = np.searchsorted(merged, starts + width, "right") - np.searchsorted(
        merged, starts, "left"
    )
    contrib = 0.1 / (1.0 + (width - (cnt - 1)))
    spos = (starts & 0xFFFF) - _KEYOFF
    exts = (2 * spos + width) / 2.0 if method & 4 else None
    return _emit_rank_rows(cand, starts >> 16, contrib, exts, k, method)


def _rank_cd_and2_bulk(lists, cand, ta, tb, k, method):
    """Vectorized cover-density ranking for a two-distinct-term AND
    query: the greedy Cover fold reduces to every consecutive
    OPPOSITE-term pair in the per-doc merged occurrence stream (the
    up-scan satisfies at the partner's next occurrence, the down-scan
    walks back to the nearest preceding occurrence of the other term,
    and the restart lands one item past the begin).  Each such cover
    holds exactly its two endpoints, so nNoise = q - p - 1."""
    ia, pa = lists[ta].positions_bulk(cand)
    ib, pb = lists[tb].positions_bulk(cand)
    keys = np.concatenate(
        [(ia << 16) + pa + _KEYOFF, (ib << 16) + pb + _KEYOFF]
    )
    lab = np.concatenate(
        [np.zeros(ia.size, np.int8), np.ones(ib.size, np.int8)]
    )
    srt = np.argsort(keys)
    keys = keys[srt]
    lab = lab[srt]
    if keys.size < 2:
        return None
    if np.any(keys[1:] == keys[:-1]):
        return _COLLIDED  # clamped-position collision: exact path
    sel = np.flatnonzero(
        ((keys[1:] >> 16) == (keys[:-1] >> 16)) & (lab[1:] != lab[:-1])
    )
    if not sel.size:
        return None
    p = (keys[sel] & 0xFFFF) - _KEYOFF
    q = (keys[sel + 1] & 0xFFFF) - _KEYOFF
    contrib = 0.1 / (1.0 + (q - p - 1))
    exts = (q + p) / 2.0 if method & 4 else None
    return _emit_rank_rows(cand, keys[sel] >> 16, contrib, exts, k, method)


def _emit_rank_rows(cand, dci, contrib, exts, k, method):
    """Shared tail of the bulk rankers: per-doc SEQUENTIAL float
    accumulation (bit-compatible with kernel ts_rank_cd), method 4/32
    normalization, positive-rank filter, per-partition top-k."""
    seg = np.concatenate(
        ([0], np.flatnonzero(np.diff(dci)) + 1, [dci.size])
    )
    out_ids: list[int] = []
    out_ranks: list[float] = []
    cl = contrib.tolist()
    for si in range(seg.size - 1):
        s, e = int(seg[si]), int(seg[si + 1])
        wdoc = 0.0
        for v in cl[s:e]:
            wdoc += v
        if exts is not None:
            sd = 0.0
            prev = 0.0
            n_ext = 0
            for j in range(s, e):
                cur = float(exts[j])
                if n_ext > 0 and cur > prev:
                    sd += 1.0 / (cur - prev)
                prev = cur
                n_ext += 1
            if n_ext > 0 and sd > 0:
                wdoc /= float(n_ext) / sd
        if method & 32:
            wdoc /= wdoc + 1
        if wdoc > 0.0:
            out_ids.append(int(cand[int(dci[s])]))
            out_ranks.append(wdoc)
    if not out_ids:
        return None
    ids = np.asarray(out_ids, np.int64)
    ranks = np.asarray(out_ranks, np.float64)
    sel = np.lexsort((ids, -ranks))[:k]
    return pd.DataFrame({"docid": ids[sel], "rank": ranks[sel]})


def search_rank(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    mode: str = "tsquery",
    method: int = 0,
) -> DataFrame:
    """Index-path ``WHERE tsv @@ q ORDER BY ts_rank(tsv, q) DESC
    LIMIT k`` (tsrank.c calc_rank_or / calc_rank_and semantics).

    * **or-path** (top node not AND/phrase, or a single lexeme): the
      rank depends only on each term's capped occurrence count, so it
      is computed fully vectorized from the posting tf streams - no
      position decode at all.  Candidates are the @@ match set (the
      union for a flat OR).
    * **and-path** (top AND or multi-lexeme phrase): the
      word_distance proximity fold over decoded positions
      (:meth:`_TermList.positions_bulk`), with curw values taken from
      an exact precomputed table and the per-doc fold kept
      sequential, so results are bit-identical to scan-path
      ``ts_rank`` (tests assert it).  Phrase chains additionally
      filter candidates to true adjacency matches, matching ``@@``.

    Supported query shapes: conjunctive (AND / phrase) and flat OR.
    Supported normalization bits: 1 | 2 | 32 (cnt_length is the
    indexed doclen); bits 8/16 need per-doc distinct-lexeme counts
    the index does not store - use the scan path."""
    if method & ~(1 | 2 | 32):
        raise ValueError(
            "index-path ts_rank supports normalization bits 1|2|32 only"
        )
    routed = _route(index_dir, query, mode)
    if routed is None:
        return spark.createDataFrame([], "docid long, rank double")
    stats, pq, bset, _idf = routed
    tree = pq.tree
    if not pq.conjunctive and not _is_flat_or(tree):
        raise ValueError(
            "index-path ts_rank supports conjunctive or flat-OR "
            "queries only"
        )

    paths = _postings_paths(index_dir, bset, stats)
    if not paths:
        return spark.createDataFrame([], "docid long, rank double")
    deleted = load_tombstones(index_dir)
    blocks = _read_blocks(
        spark, paths, pq.all_terms, _needs_epoch(stats, deleted, paths)
    )
    num_salts = stats["num_salts"]
    conj = pq.conjunctive
    phrases = pq.phrases
    n_terms = len(pq.terms)
    or_groups = pq.or_groups

    def rank_partition(batches):
        frames = [f for f in batches if len(f)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        out = _rank_ts_local(
            pdf, tree, conj, phrases, n_terms, k, method, deleted,
            or_groups,
        )
        if out is not None:
            yield out

    ranked = blocks.repartition(salt_partition_count(num_salts), "salt").mapInPandas(
        rank_partition, "docid long, rank double"
    )
    return (
        ranked.orderBy(F.desc("rank"), F.asc("docid"))
        .limit(k)
        .select("docid", "rank")
    )


_PI2_6 = 1.64493406685
_MAXNUMPOS = 256


def _rank_or_contrib_table() -> list[float]:
    """calc_rank_or per-term contribution for an all-weight-D term
    with n stored positions, n = 0..256 - the exact FP shapes of
    kernel _rank_or (wjm = 0.1, jm = 0)."""
    out = [0.0]
    resj = 0.0
    for j in range(_MAXNUMPOS):
        resj = resj + 0.1 / ((j + 1) * (j + 1))
        out.append((0.1 + resj - 0.1 / 1) / _PI2_6)
    return out


def _curw_table() -> np.ndarray:
    """curw(dist) for all-D weights, dist clipped at 101 for the
    >100 floor - python-math exact so lookups are bit-identical to
    kernel _rank_and."""
    t = np.empty(102, np.float64)
    t[0] = 0.0  # dist 0 never contributes (distinct positions)
    for d in range(1, 101):
        t[d] = math.sqrt(
            (0.1 * 0.1) * (1.0 / (1.005 + 0.05 * math.exp(d / 1.5 - 2)))
        )
    t[101] = math.sqrt((0.1 * 0.1) * 1e-30)
    return t


_RANK_OR_CONTRIB = _rank_or_contrib_table()
_CURW = _curw_table()


def _rank_and2_positions_bulk(lists, cand, terms):
    """Vectorized calc_rank_and for the two-distinct-term case (the
    dominant and-path shape; every CJK bigram phrase ranks through
    it): curw values for ALL cross-position pairs of ALL candidates
    are computed in one pass from the exact CURW lookup table, with
    the kernel's pair order (term-1 positions outer, term-0 inner)
    preserved by segment arithmetic.  Only the final per-doc
    1-(1-res)(1-curw) fold stays a Python loop (a handful of
    multiplies per doc) so the bits match kernel ts_rank.  Position
    lists clip at
    MAXNUMPOS (a defensive cap: index-built postings can never
    exceed it - the builder stores tf = len(to_tsvector positions),
    which to_tsvector caps at 256)."""
    (ia, pa) = lists[terms[0]].positions_bulk(cand)
    (ib, pb) = lists[terms[1]].positions_bulk(cand)
    n = cand.size
    grid = np.arange(n)
    a_start = np.searchsorted(ia, grid, "left")
    a_end = np.searchsorted(ia, grid, "right")
    b_start = np.searchsorted(ib, grid, "left")
    b_end = np.searchsorted(ib, grid, "right")
    na = a_end - a_start
    nb = b_end - b_start
    if (na > _MAXNUMPOS).any() or (nb > _MAXNUMPOS).any():
        na = np.minimum(na, _MAXNUMPOS)
        nb = np.minimum(nb, _MAXNUMPOS)
    sizes = na * nb
    tot = int(sizes.sum())
    cum = np.cumsum(sizes)
    within = np.arange(tot) - np.repeat(cum - sizes, sizes)
    na_rep = np.repeat(na, sizes)
    # pair order per doc: l outer over term-1 (sorted-second) wait -
    # kernel pairs (i=1, k=0): l over terms[1] positions, p inner
    # over terms[0] positions
    l_idx = np.repeat(b_start, sizes) + within // na_rep
    p_idx = np.repeat(a_start, sizes) + within % na_rep
    d = np.abs(pb[l_idx] - pa[p_idx])
    curw = _CURW[np.minimum(d, 101)]
    ranks = np.empty(n, np.float64)
    cl = curw.tolist()
    seg_ends = cum.tolist()
    s = 0
    for di in range(n):
        e = seg_ends[di]
        res = -1.0
        for j in range(s, e):
            if cl[j] > 0.0:  # dist==0 pairs contribute nothing
                v = cl[j]
                res = v if res < 0 else 1.0 - (1.0 - res) * (1.0 - v)
        ranks[di] = 1e-20 if res < 0 else res
        s = e
    return ranks


def _phrase_start_docs(lists, cand, items):
    """Candidate indices (into ``cand``) having at least one chain
    match - the @@ adjacency recheck, batched."""
    base = items[0][1]
    starts = None
    for t, off in items:
        cidx, pos = lists[t].positions_bulk(cand)
        kb = (cidx << 16) + pos + _KEYOFF - (off - base)
        starts = kb if starts is None else np.intersect1d(
            starts, kb, assume_unique=True
        )
        if not starts.size:
            return np.empty(0, np.int64)
    return np.unique(starts >> 16)


def _rank_ts_local(
    pdf, tree, conj, phrases, n_terms, k, method, deleted=None,
    or_groups=None,
):
    """Per-salt-partition ts_rank: candidates from the @@ match set,
    ranks bit-identical to kernel ts_rank.

    ``or_groups`` carries the PRE-expansion calc_rank_or items (one
    group per query item, a prefix's group being its dictionary
    expansion) so the or-path divides by the ITEM count - without it
    a prefix query's rank would shrink by its expansion size vs the
    scan path."""
    from ..kernel.tsrank import _operand_lexemes

    terms = _operand_lexemes(tree)
    and_path = (
        isinstance(tree, And)
        or (isinstance(tree, Phrase) and len(tree.items) > 1)
    ) and len(terms) >= 2
    per_term = {t: g for t, g in pdf.groupby("term", sort=True)}

    if conj:
        if len(per_term) < n_terms:
            return None
        order = sorted(per_term, key=lambda t: int(per_term[t]["n"].sum()))
        lists: dict[str, _TermList] = {}
        cand: np.ndarray | None = None
        for t in order:
            tb = per_term[t]
            if cand is not None:
                if cand.size == 0:
                    return None
                lo, hi = int(cand[0]), int(cand[-1])
                tb = tb[(tb["max_docid"] >= lo) & (tb["min_docid"] <= hi)]
            tl = _TermList(tb, and_path or bool(phrases), deleted)
            lists[t] = tl
            cand = tl.ids if cand is None else cand[
                _isin_sorted(cand, tl.ids)
            ]
        if cand is None or cand.size == 0:
            return None
        for chain in phrases:
            keep = _phrase_start_docs(lists, cand, chain)
            if not keep.size:
                return None
            cand = cand[keep]
    else:  # flat OR
        lists = {
            t: _TermList(tb, False, deleted) for t, tb in per_term.items()
        }
        cand = np.unique(np.concatenate([tl.ids for tl in lists.values()]))
        if not cand.size:
            return None

    nq = len(terms)
    if not and_path:
        # vectorized or-path: contribution is a pure function of the
        # capped tf; accumulate per doc in item order (the kernel's
        # SortAndUniqItems iteration, each prefix item summing over
        # its matched dictionary entries) and divide by the ITEM
        # count - a lexeme repeated across items contributes once
        # per item, exactly like repeated find_wordentry hits
        groups = (
            or_groups if or_groups is not None else [[t] for t in terms]
        )
        ranks = np.zeros(cand.size, np.float64)
        for group in groups:
            for t in group:
                tl = lists.get(t)
                if tl is None:
                    continue
                sel = _isin_sorted(tl.ids, cand)
                n_eff = np.minimum(
                    tl.tfs[sel].astype(np.int64), _MAXNUMPOS
                )
                idxs = np.searchsorted(cand, tl.ids[sel])
                ranks[idxs] = ranks[idxs] + np.asarray(
                    _RANK_OR_CONTRIB, np.float64
                )[n_eff]
        ranks = ranks / float(len(groups))
    elif nq == 2:
        ranks = _rank_and2_positions_bulk(lists, cand, terms)
    else:
        found = []
        for t in terms:
            tl = lists[t]
            cidx, pos = tl.positions_bulk(cand)
            found.append((cidx, pos))
        ranks = np.empty(cand.size, np.float64)
        curw_l = _CURW.tolist()
        # per-candidate slices per term (docs sorted in cidx order)
        slicers = []
        for cidx, pos in found:
            starts = np.searchsorted(cidx, np.arange(cand.size), "left")
            ends = np.searchsorted(cidx, np.arange(cand.size), "right")
            slicers.append((pos, starts, ends))
        for di in range(cand.size):
            res = -1.0
            for i in range(nq):
                pos_i, s_i, e_i = slicers[i]
                pi = pos_i[s_i[di] : e_i[di]][:_MAXNUMPOS]
                if not pi.size:
                    continue
                for kk in range(i):
                    pos_k, s_k, e_k = slicers[kk]
                    pk = pos_k[s_k[di] : e_k[di]][:_MAXNUMPOS]
                    if not pk.size:
                        continue
                    d = np.abs(pi[:, None] - pk[None, :]).ravel()
                    cw = np.minimum(d, 101)
                    for j, dist in enumerate(d.tolist()):
                        if dist:
                            curw = curw_l[int(cw[j])]
                            res = (
                                curw
                                if res < 0
                                else 1.0 - (1.0 - res) * (1.0 - curw)
                            )
            ranks[di] = 1e-20 if res < 0 else res

    if method & (1 | 2):
        dls = np.zeros(cand.size, np.int64)
        for tl in lists.values():
            sel = _isin_sorted(tl.ids, cand)
            dls[np.searchsorted(cand, tl.ids[sel])] = tl.dls[sel].astype(
                np.int64
            )
        if method & 1:
            norm = {
                int(d): math.log(int(d) + 1) / math.log(2.0)
                for d in np.unique(dls)
            }
            ranks = ranks / np.asarray(
                [norm[int(d)] for d in dls], np.float64
            )
        if method & 2:
            pos_dl = dls > 0
            ranks[pos_dl] = ranks[pos_dl] / dls[pos_dl].astype(np.float64)
    if method & 32:
        ranks = ranks / (ranks + 1)

    keep = ranks > 0.0
    return _topk_frame_rank(cand[keep], ranks[keep], k)


def _isin_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Membership mask of ``a`` in ``b`` for SORTED unique int64
    arrays.  Binary search beats np.isin's concatenate+argsort when
    the sides are comparable or ``b`` dominates (measured: 2.7 ->
    1.95 ms at 50k/50k, 0.41 ms -> 13 us at 200/50k); np.isin stays
    faster when ``b`` is much the smaller side (its sort cost
    collapses), so route on the ratio."""
    if not b.size or not a.size:
        return np.zeros(a.size, bool)
    if a.size > 8 * b.size:
        return np.isin(a, b, assume_unique=True)
    j = np.searchsorted(b, a)
    jc = np.minimum(j, b.size - 1)
    return (j < b.size) & (b[jc] == a)


def _topk_frame_rank(ids: np.ndarray, ranks: np.ndarray, k: int):
    if not ids.size:
        return None
    sel = np.lexsort((ids, -ranks))[:k]
    return pd.DataFrame({"docid": ids[sel], "rank": ranks[sel]})


def rank_local(
    index_dir: str,
    query: str,
    k: int = 10,
    mode: str = "tsquery",
    method: int = 0,
    cd: bool = True,
) -> list[tuple[int, float]]:
    """Serving-tier ``ORDER BY ts_rank_cd/ts_rank LIMIT k`` - no
    Spark session, no job; the pyarrow twin of :func:`search_local`
    for the rank paths.  Results are identical to
    :func:`search_rank_cd` / :func:`search_rank` (tests assert it);
    the same supported-shape/method rules apply."""
    import pyarrow.dataset as ds

    if cd:
        if method & ~(4 | 32):
            raise ValueError(
                "index-path ts_rank_cd supports normalization bits "
                "4|32 only"
            )
    elif method & ~(1 | 2 | 32):
        raise ValueError(
            "index-path ts_rank supports normalization bits 1|2|32 only"
        )
    routed = _route(index_dir, query, mode)
    if routed is None:
        return []
    stats, pq, bset, _idf = routed
    if cd and not pq.conjunctive:
        raise ValueError(
            "index-path ts_rank_cd supports conjunctive queries only"
        )
    if not cd and not pq.conjunctive and not _is_flat_or(pq.tree):
        raise ValueError(
            "index-path ts_rank supports conjunctive or flat-OR "
            "queries only"
        )
    paths = _shard_paths(index_dir, "postings", bset, stats)
    if not paths:
        return []
    deleted = load_tombstones(index_dir)
    pdf = _read_blocks_local(
        ds, paths, pq.all_terms, _needs_epoch(stats, deleted, paths)
    )
    if len(pdf) == 0:
        return []
    frames = []
    for _, grp in pdf.groupby("salt", sort=False):
        g = grp.reset_index(drop=True)
        out = (
            _rank_cd_local(g, pq.tree, len(pq.terms), k, method, deleted)
            if cd
            else _rank_ts_local(
                g, pq.tree, pq.conjunctive, pq.phrases,
                len(pq.terms), k, method, deleted, pq.or_groups,
            )
        )
        if out is not None:
            frames.append(out)
    if not frames:
        return []
    allf = pd.concat(frames, ignore_index=True)
    order = np.lexsort(
        (allf["docid"].to_numpy(), -allf["rank"].to_numpy())
    )[:k]
    return [
        (int(allf["docid"].iloc[i]), float(allf["rank"].iloc[i]))
        for i in order
    ]


def search_many_rank(
    spark: SparkSession,
    index_dir: str,
    queries: list[str],
    k: int = 10,
    mode: str = "tsquery",
    method: int = 0,
    cd: bool = True,
) -> DataFrame:
    """Batched rank workload: every query's ``ORDER BY
    ts_rank_cd/ts_rank LIMIT k`` answered in ONE Spark job -
    ``(query, rank, docid, score)`` per-query identical to
    :func:`search_rank_cd` / :func:`search_rank` (tests assert it).
    Same unioned-routing strategy as :func:`search_many`; the same
    per-query shape/method restrictions apply and invalid queries
    raise up front."""
    if cd and method & ~(4 | 32):
        raise ValueError(
            "index-path ts_rank_cd supports normalization bits 4|32 only"
        )
    if not cd and method & ~(1 | 2 | 32):
        raise ValueError(
            "index-path ts_rank supports normalization bits 1|2|32 only"
        )
    routed = []
    seen: set[str] = set()
    for q in queries:
        if q in seen:
            continue
        seen.add(q)
        r = _route(index_dir, q, mode)
        if r is None:
            continue
        _stats, pq, _bs, _idf = r
        if cd:
            if not pq.conjunctive:
                raise ValueError(
                    f"query {q!r}: index-path ts_rank_cd supports "
                    "conjunctive queries only"
                )
        else:
            if not pq.conjunctive and not _is_flat_or(pq.tree):
                raise ValueError(
                    f"query {q!r}: index-path ts_rank supports "
                    "conjunctive or flat-OR queries only"
                )
        routed.append((q, r))
    empty_schema = "query string, rank int, docid long, score double"
    if not routed:
        return spark.createDataFrame([], empty_schema)
    stats = routed[0][1][0]
    num_salts = stats["num_salts"]
    union_terms = sorted(
        {t for _, (_, pq, _, _) in routed for t in pq.all_terms}
    )
    union_bset = sorted({bk for _, (_, _, bs, _) in routed for bk in bs})
    paths = _postings_paths(index_dir, union_bset, stats)
    if not paths:
        return spark.createDataFrame([], empty_schema)
    deleted = load_tombstones(index_dir)
    blocks = _read_blocks(
        spark, paths, union_terms, _needs_epoch(stats, deleted, paths)
    )
    qspecs = [
        (q, list(pq.all_terms), pq.conjunctive, pq.phrases,
         len(pq.terms), pq.tree, pq.or_groups)
        for q, (_, pq, _, _) in routed
    ]

    def rank_partition(batches):
        frames = [f for f in batches if len(f)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        outs = []
        for q, all_t, conj, phrases, n_terms, tree, ogs in qspecs:
            sub = pdf[pdf["term"].isin(all_t)]
            if not len(sub):
                continue
            g = sub.reset_index(drop=True)
            out = (
                _rank_cd_local(g, tree, n_terms, k, method, deleted)
                if cd
                else _rank_ts_local(
                    g, tree, conj, phrases, n_terms, k, method, deleted,
                    ogs,
                )
            )
            if out is not None and len(out):
                out.insert(0, "query", q)
                outs.append(out)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    ranked = blocks.repartition(salt_partition_count(num_salts), "salt").mapInPandas(
        rank_partition, "query string, docid long, rank double"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query").orderBy(
        F.desc("rank"), F.asc("docid")
    )
    return (
        ranked.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query",
            F.col("rk").alias("rank"),
            "docid",
            F.col("rank").alias("score"),
        )
    )


def _rank_cd_local(pdf, tree, n_terms, k, method, deleted=None):
    """Per-salt-partition candidate intersection + exact kernel
    cover-density ranking from decoded positions."""
    from ..kernel.tsrank import ts_rank_cd

    per_term = {t: g for t, g in pdf.groupby("term", sort=True)}
    if len(per_term) < n_terms:
        return None
    order = sorted(per_term, key=lambda t: int(per_term[t]["n"].sum()))
    lists: dict[str, _TermList] = {}
    cand: np.ndarray | None = None
    for t in order:
        tb = per_term[t]
        if cand is not None:
            if cand.size == 0:
                return None
            lo, hi = int(cand[0]), int(cand[-1])
            tb = tb[(tb["max_docid"] >= lo) & (tb["min_docid"] <= hi)]
        tl = _TermList(tb, True, deleted)
        lists[t] = tl
        cand = tl.ids if cand is None else cand[
            _isin_sorted(cand, tl.ids)
        ]
    if cand is None or cand.size == 0:
        return None
    if isinstance(tree, Phrase):
        out = _rank_cd_phrase_bulk(lists, cand, tree.items, k, method)
        if out is not _COLLIDED:
            return out
    elif (
        isinstance(tree, And)
        and len(tree.children) == 2
        and all(
            isinstance(c, Phrase) and len(c.items) == 1
            for c in tree.children
        )
        and tree.children[0].items[0][0] != tree.children[1].items[0][0]
    ):
        out = _rank_cd_and2_bulk(
            lists,
            cand,
            tree.children[0].items[0][0],
            tree.children[1].items[0][0],
            k,
            method,
        )
        if out is not _COLLIDED:
            return out
    return _rank_cd_generic(lists, cand, tree, k, method)


def _rank_cd_generic(lists, cand, tree, k, method):
    """Per-candidate kernel ranking - the reference path for
    arbitrary trees, and the fallback the bulk paths take when
    position-clamp collisions (distinct lexemes sharing MAXENTRYPOS
    in >16383-token docs) break their unique-key assumptions."""
    from ..kernel.tsrank import ts_rank_cd

    out_ids: list[int] = []
    out_ranks: list[float] = []
    for d in cand.tolist():
        v = {t: tl.positions_of(d) for t, tl in lists.items()}
        r = ts_rank_cd(v, tree, method=method)
        if r > 0.0:
            out_ids.append(int(d))
            out_ranks.append(r)
    if not out_ids:
        return None
    ids = np.asarray(out_ids, np.int64)
    ranks = np.asarray(out_ranks, np.float64)
    sel = np.lexsort((ids, -ranks))[:k]
    return pd.DataFrame({"docid": ids[sel], "rank": ranks[sel]})


def search_many(
    spark: SparkSession,
    index_dir: str,
    queries: list[str],
    k: int = 10,
    mode: str = "plain",
) -> DataFrame:
    """Batched top-k: ALL queries answered in ONE Spark job -
    ``(query, rank, docid, score)``, rank-/score-identical per query to
    :func:`search`.

    A production workload runs queries in batches, and per-query jobs
    pay scheduling + scan setup B times; here the routed bucket paths
    and the term IN-filter are unioned, the postings scan happens once,
    and each salt partition scores every query against its own term
    subset (queries stay independent - conjunction semantics are
    per-query on the filtered frame).  Driver-side routing stays
    O(total query terms); queries that cannot match any doc are simply
    absent from the result."""
    routed = []
    seen: set[str] = set()
    for q in queries:
        if q in seen:  # a duplicate would double-score and skew ranks
            continue
        seen.add(q)
        r = _route(index_dir, q, mode)
        if r is not None:
            routed.append((q, r))
    empty_schema = "query string, rank int, docid long, score double"
    if not routed:
        return spark.createDataFrame([], empty_schema)
    stats = routed[0][1][0]
    k1, b, avgdl = stats["k1"], stats["b"], stats["avgdl"]
    num_salts = stats["num_salts"]
    union_terms = sorted({t for _, (_, pq, _, _) in routed for t in pq.all_terms})
    union_bset = sorted({bk for _, (_, _, bs, _) in routed for bk in bs})
    paths = _postings_paths(index_dir, union_bset, stats)
    if not paths:
        return spark.createDataFrame([], empty_schema)
    deleted = load_tombstones(index_dir)
    blocks = _read_blocks(
        spark, paths, union_terms, _needs_epoch(stats, deleted, paths)
    )
    qspecs = [
        (
            q, list(pq.all_terms), idf_map, pq.conjunctive, pq.phrases,
            bool(pq.phrases), pq.tree,
        )
        for q, (_, pq, _, idf_map) in routed
    ]

    def score_partition(batches):
        frames = [f for f in batches if len(f)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        outs = []
        for q, all_t, idf_map, conj, phrases, need_pos, tree in qspecs:
            sub = pdf[pdf["term"].isin(all_t)]
            if not len(sub):
                continue
            out = _score_local(
                sub.reset_index(drop=True), idf_map, k1, b, avgdl, k,
                conj, phrases, need_pos, tree, deleted,
            )
            if out is not None and len(out):
                out.insert(0, "query", q)
                outs.append(out)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    scored = blocks.repartition(salt_partition_count(num_salts), "salt").mapInPandas(
        score_partition, "query string, docid long, score double"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query").orderBy(
        F.desc("score"), F.asc("docid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query", "rank", "docid", "score")
    )


class _TermList:
    """Decoded posting list for one term in one partition, with lazy
    per-block position decoding for phrase rechecks."""

    __slots__ = (
        "ids", "tfs", "dls", "blk_ids", "blk_pos", "blk_n",
        "blk_tf", "blk_lo", "blk_hi", "blk_ep", "_poscache", "_deleted",
    )

    def __init__(self, tb, decode_pos_blobs: bool, deleted=None):
        # batch-decode docids across ALL blocks in one varint pass:
        # concatenated per-block delta streams -> global cumsum minus a
        # per-block correction (each block's first delta is absolute)
        ns = tb["n"].to_numpy().astype(np.int64)
        bufs_d = list(tb["docids"])
        deltas = decode_varints(b"".join(bufs_d))
        if deltas.size:
            ends = np.cumsum(ns)
            starts = ends - ns
            g = np.cumsum(deltas, dtype=np.uint64)
            prev_end = np.concatenate(
                ([np.uint64(0)], g[ends[:-1] - 1])
            ).astype(np.uint64)
            corr = np.repeat(prev_end, ns)
            ids = (g - corr).view(np.int64)
        else:
            ids = np.empty(0, np.int64)
            starts = ends = np.empty(0, np.int64)
        blk_eps = (
            tb["epoch"].to_numpy().astype(np.int64)
            if "epoch" in tb.columns
            else np.zeros(len(tb), np.int64)
        )
        tfs = decode_varints(b"".join(tb["tfs"])).astype(np.float64)
        blk_ids, blk_pos, blk_n, blk_tf, blk_ep = [], [], [], [], []
        if decode_pos_blobs:
            for i, (buf_p, n) in enumerate(zip(tb["positions"], ns.tolist())):
                blk_ids.append(ids[starts[i] : ends[i]])
                blk_pos.append(buf_p)
                blk_n.append(n)
                # physical-order per-posting tf slice: npos == stored
                # tf by construction, which lets _decode_block lay out
                # the position stream without walking it
                blk_tf.append(tfs[starts[i] : ends[i]])
                blk_ep.append(int(blk_eps[i]))
        dls = decode_varints(b"".join(tb["doclens"])).astype(np.float64)
        srt = np.argsort(ids, kind="stable")
        self.ids = ids[srt]
        self.tfs = tfs[srt]
        self.dls = dls[srt]
        # tombstones: deleted postings (docid tombstoned at an epoch
        # bound >= the posting's epoch) drop out of the SCORING arrays
        # - they can't match or take top-k slots - while the block
        # arrays keep their physical layout for position decoding,
        # re-checking the tombstone per block there.  The per-posting
        # epoch expansion only happens when tombstones exist - it is
        # pure overhead on the (common) tombstone-free query.
        self._deleted = deleted
        if deleted is not None:
            alive = alive_mask(
                self.ids, deleted, np.repeat(blk_eps, ns)[srt]
            )
            if alive is not None:
                self.ids = self.ids[alive]
                self.tfs = self.tfs[alive]
                self.dls = self.dls[alive]
        self.blk_ids = blk_ids
        self.blk_pos = blk_pos
        self.blk_n = blk_n
        self.blk_tf = blk_tf
        self.blk_ep = blk_ep
        if blk_ids:
            self.blk_lo = np.array([int(x[0]) for x in blk_ids])
            self.blk_hi = np.array([int(x[-1]) for x in blk_ids])
        else:
            self.blk_lo = self.blk_hi = np.empty(0, np.int64)
        self._poscache: dict[int, list] = {}

    def _decode_block(self, bi: int):
        """Decode block ``bi``'s position stream once and cache
        (values, per-posting delta offsets, per-posting counts).

        The stream layout per posting is [npos, deltas...], and npos
        equals the posting's stored tf (both are len(positions) at
        build), so the offsets come from one cumsum over the block's
        tf slice instead of a sequential Python walk over the decoded
        values - the walk was the hot spot of phrase rechecks over
        head terms."""
        dec = self._poscache.get(bi)
        if dec is None:
            vals = decode_varints(self.blk_pos[bi])
            cnts = self.blk_tf[bi].astype(np.int64)
            ends = np.cumsum(cnts + 1)
            if ends.size and int(ends[-1]) != vals.size:
                raise ValueError(
                    "position stream length disagrees with stored tf"
                )
            offs = ends - cnts
            dec = (vals, offs, cnts)
            self._poscache[bi] = dec
        return dec

    def positions_of(self, docid: int):
        """Positions for one doc (None if absent).  The containing
        block's varint stream is decoded once (vectorized) and cached
        per block; only the REQUESTED posting's deltas are then
        prefix-summed - phrase rechecks touch a few docs per block, so
        materializing every posting's list (the old decode_positions
        call) wasted ~3/4 of the recheck time on the reference CJK
        phrase queries."""
        for bi in np.flatnonzero(
            (self.blk_lo <= docid) & (self.blk_hi >= docid)
        ).tolist():
            bids = self.blk_ids[bi]
            j = int(np.searchsorted(bids, docid))
            if j >= bids.size or bids[j] != docid:
                continue
            if self._deleted is not None and alive_mask(
                np.array([docid], np.int64),
                self._deleted,
                self.blk_ep[bi],
            ) is not None:
                continue  # this block holds a tombstoned version
            vals, offs, cnts = self._decode_block(bi)
            s = int(offs[j])
            return np.cumsum(vals[s : s + int(cnts[j])]).tolist()
        return None

    def positions_bulk(self, cand: np.ndarray):
        """Positions for EVERY candidate docid in one vectorized pass.

        ``cand`` must be sorted.  Returns ``(cand_idx, pos)`` int64
        arrays aligned per occurrence, ordered by (candidate,
        position) - the batched equivalent of calling
        :meth:`positions_of` per candidate, for rankers that touch
        every candidate (cover-density) rather than a few."""
        out_idx: list[np.ndarray] = []
        out_pos: list[np.ndarray] = []
        lo, hi = (int(cand[0]), int(cand[-1])) if cand.size else (0, -1)
        for bi in range(len(self.blk_ids)):
            if self.blk_lo[bi] > hi or self.blk_hi[bi] < lo:
                continue
            bids = self.blk_ids[bi]
            # sorted membership (np.isin would re-sort `cand` for
            # EVERY block, which dominated wall time at ~1k blocks x
            # 50k candidates)
            sel = np.flatnonzero(_isin_sorted(bids, cand))
            if not sel.size:
                continue
            if self._deleted is not None:
                alive = alive_mask(
                    bids[sel], self._deleted, self.blk_ep[bi]
                )
                if alive is not None:
                    sel = sel[alive]
                    if not sel.size:
                        continue
            vals, offs, cnts = self._decode_block(bi)
            n = cnts[sel]
            starts = offs[sel]
            tot = int(n.sum())
            cum = np.cumsum(n)
            gather = (
                np.repeat(starts, n)
                + np.arange(tot)
                - np.repeat(cum - n, n)
            )
            deltas = vals[gather].astype(np.int64)
            g = np.cumsum(deltas)
            prev_end = np.concatenate(([0], g[cum[:-1] - 1]))
            pos = g - np.repeat(prev_end, n)
            out_pos.append(pos)
            out_idx.append(
                np.repeat(np.searchsorted(cand, bids[sel]), n)
            )
        if not out_idx:
            e = np.empty(0, np.int64)
            return e, e
        idx = np.concatenate(out_idx)
        pos = np.concatenate(out_pos)
        # one doc lives in exactly one block per term, and positions
        # ascend within a posting: a stable sort on doc alone yields
        # (doc, position) order
        srt = np.argsort(idx, kind="stable")
        return idx[srt], pos[srt]


def search_local(
    index_dir: str, query: str, k: int = 10, mode: str = "plain"
) -> list[tuple[int, float]]:
    """Serving-tier point query: no Spark session, no job.

    The index is plain parquet, so a low-latency reader (here: pyarrow
    + NumPy in-process) can serve top-k directly from the pruned
    bucket shards - the same layout a real serving fleet would mmap.
    Results are identical to :func:`search` (tests assert it); use the
    Spark path for scatter-gather over very large per-term lists.
    """
    import pyarrow.dataset as ds

    routed = _route(index_dir, query, mode)
    if routed is None:
        return []
    stats, pq, bset, idf_map = routed
    k1, b, avgdl = stats["k1"], stats["b"], stats["avgdl"]

    paths = _shard_paths(index_dir, "postings", bset, stats)
    if not paths:
        return []
    deleted = load_tombstones(index_dir)
    pdf = _read_blocks_local(
        ds, paths, pq.all_terms, _needs_epoch(stats, deleted, paths)
    )
    if len(pdf) == 0:
        return []
    frames = []
    for _, grp in pdf.groupby("salt", sort=False):
        out = _score_local(
            grp.reset_index(drop=True), idf_map, k1, b, avgdl, k,
            pq.conjunctive, pq.phrases, bool(pq.phrases), pq.tree,
            deleted,
        )
        if out is not None:
            frames.append(out)
    if not frames:
        return []
    allf = pd.concat(frames, ignore_index=True)
    order = np.lexsort((allf["docid"].to_numpy(), -allf["score"].to_numpy()))[:k]
    return [
        (int(allf["docid"].iloc[i]), float(allf["score"].iloc[i]))
        for i in order
    ]


def _score_local(pdf, idf_map, k1, b, avgdl, k, conj, phrases, need_pos, tree=None, deleted=None):
    """Exact local top-k over one salt-partition's blocks."""
    per_term = {t: g for t, g in pdf.groupby("term", sort=True)}
    if conj:
        if len(per_term) < len(idf_map):
            return None  # some required term missing in this partition
        phrase_terms = {t for chain in phrases for t, _ in chain}
        # decode rarest term first; range-prune later terms' blocks
        order = sorted(per_term, key=lambda t: int(per_term[t]["n"].sum()))
        lists: dict[str, _TermList] = {}
        cand: np.ndarray | None = None
        for t in order:
            tb = per_term[t]
            if cand is not None:
                if cand.size == 0:
                    return None
                lo, hi = int(cand[0]), int(cand[-1])
                tb = tb[(tb["max_docid"] >= lo) & (tb["min_docid"] <= hi)]
            tl = _TermList(tb, need_pos and t in phrase_terms, deleted)
            lists[t] = tl
            cand = tl.ids if cand is None else cand[
                _isin_sorted(cand, tl.ids)
            ]
        if cand is None or cand.size == 0:
            return None
        scores = np.zeros(cand.size)
        for t, tl in lists.items():
            sel = _isin_sorted(tl.ids, cand)
            ids_s = tl.ids[sel]
            contrib = idf_map[t] * tl.tfs[sel] / (
                tl.tfs[sel] + k1 * (1 - b + b * tl.dls[sel] / avgdl)
            )
            scores[np.searchsorted(cand, ids_s)] += contrib
        if not phrases:
            return _topk_frame(cand, scores, k)
        # lazy phrase recheck: walk candidates in score order, decoding
        # positions only until k docs pass
        order_idx = np.lexsort((cand, -scores))
        out_ids: list[int] = []
        out_scores: list[float] = []
        for i in order_idx.tolist():
            d = int(cand[i])
            if all(_phrase_ok_lazy(chain, lists, d) for chain in phrases):
                out_ids.append(d)
                out_scores.append(float(scores[i]))
                if len(out_ids) >= k:
                    break
        if not out_ids:
            return None
        return pd.DataFrame({"docid": out_ids, "score": out_scores})

    # boolean (Or/Not) mode: decode every referenced term's list once,
    # evaluate the query tree set-theoretically over docid sets (with
    # lazy position checks for phrase nodes), then score the matching
    # docs over the positive terms they contain.  Block-max pruning
    # with a remaining-terms bound skips blocks that can neither
    # produce a fresh top-k doc nor improve a seen candidate - applied
    # only to terms not needed for tree evaluation correctness...
    # since every term IS needed for evaluation, pruning here applies
    # to scoring contributions of docs that cannot match; we keep it
    # simple and exact: decode all referenced lists (the bucket+term
    # pruned read already bounds this to |q| lists in this partition).
    if _is_flat_or(tree):
        return _score_wand_or(pdf, per_term, idf_map, k1, b, avgdl, k, deleted)
    phrase_terms = {t for chain in phrases for t, _ in chain}
    lists = {
        t: _TermList(tb, need_pos and t in phrase_terms, deleted)
        for t, tb in per_term.items()
    }
    matched = _eval_tree(tree, lists, phrases)
    if matched is None or not matched.size:
        return None
    scores = np.zeros(matched.size)
    for t, tl in lists.items():
        w = idf_map.get(t)
        if not w:
            continue  # negated-only term: contributes no score
        sel = _isin_sorted(tl.ids, matched)
        ids_s = tl.ids[sel]
        contrib = w * tl.tfs[sel] / (
            tl.tfs[sel] + k1 * (1 - b + b * tl.dls[sel] / avgdl)
        )
        scores[np.searchsorted(matched, ids_s)] += contrib
    keep = scores > 0
    return _topk_frame(matched[keep], scores[keep], k)


def _is_flat_or(tree) -> bool:
    """Or of single-lexeme phrases: the classic WAND-prunable shape."""
    return (
        isinstance(tree, Or)
        and all(
            isinstance(c, Phrase) and len(c.items) == 1
            for c in tree.children
        )
    )


def _score_wand_or(pdf, per_term, idf_map, k1, b, avgdl, k, deleted=None):
    """Union top-k with block-max (WAND-style) pruning.

    Terms are processed rarest-first (highest idf). Once k candidates
    exist, a block is skipped when (its idf-weighted upper bound from
    the stored max_tf/min_dl) + (the full idf mass of still-unseen
    terms) cannot lift a fresh doc above the current kth score AND the
    block's docid range contains no already-seen candidate (whose
    score the block could still improve). Both conditions keep the
    result exact; tests assert identity with the brute-force oracle.
    """
    acc: dict[int, float] = {}
    order = sorted(per_term, key=lambda t: -idf_map.get(t, 0.0))
    for n_seen, t in enumerate(order, start=1):
        tb = per_term[t]
        w = idf_map.get(t, 0.0)
        if w <= 0:
            continue
        remaining_ub = sum(idf_map.get(u, 0.0) for u in order[n_seen:])
        if len(acc) >= k:
            theta = np.partition(
                np.fromiter(acc.values(), dtype=np.float64), -k
            )[-k]
            mx = tb["max_tf"].to_numpy().astype(np.float64)
            ub = w * mx / (
                mx + k1 * (1 - b + b * tb["min_dl"].to_numpy() / avgdl)
            )
            keep_mask = (ub + remaining_ub) >= theta
            if not keep_mask.all():
                seen = np.fromiter(acc.keys(), dtype=np.int64)
                seen.sort()
                lo = tb["min_docid"].to_numpy()
                hi = tb["max_docid"].to_numpy()
                has_cand = (
                    np.searchsorted(seen, hi, "right")
                    - np.searchsorted(seen, lo, "left")
                ) > 0
                tb = tb[keep_mask | has_cand]
        tl = _TermList(tb, False, deleted)
        contrib = w * tl.tfs / (tl.tfs + k1 * (1 - b + b * tl.dls / avgdl))
        for d, c in zip(tl.ids.tolist(), contrib.tolist()):
            acc[d] = acc.get(d, 0.0) + c
    if not acc:
        return None
    ids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
    sc = np.fromiter(acc.values(), dtype=np.float64, count=len(acc))
    return _topk_frame(ids, sc, k)


def _eval_tree(tree, lists: dict[str, "_TermList"], phrases) -> np.ndarray | None:
    """Evaluate a tsquery tree to the sorted docid array it matches
    within this partition.  Negation is handled with complement
    algebra relative to sibling positive sets (top-level pure negation
    is rejected at parse time)."""

    def ev(node):
        # returns (ids ndarray, complemented: bool)
        if isinstance(node, Phrase):
            terms = [t for t, _ in node.items]
            ids = None
            for t in terms:
                tl = lists.get(t)
                if tl is None or tl.ids.size == 0:
                    return np.empty(0, np.int64), False
                ids = tl.ids if ids is None else ids[
                    _isin_sorted(ids, tl.ids)
                ]
            if len(node.items) > 1 and ids.size:
                ok = np.fromiter(
                    (
                        _phrase_ok_lazy(node.items, lists, int(d))
                        for d in ids
                    ),
                    dtype=bool,
                    count=ids.size,
                )
                ids = ids[ok]
            return ids, False
        if isinstance(node, Not):
            ids, comp = ev(node.child)
            return ids, not comp
        if isinstance(node, (And, Or)):
            is_and = isinstance(node, And)
            pos, neg = [], []
            for c in node.children:
                ids, comp = ev(c)
                (neg if comp else pos).append(ids)
            if is_and:
                if not pos:
                    # !a & !b == !(a | b): complement of the union
                    out = (
                        np.unique(np.concatenate(neg))
                        if neg
                        else np.empty(0, np.int64)
                    )
                    return out, True
                out = pos[0]
                for p in pos[1:]:
                    out = out[_isin_sorted(out, p)]
                for ng in neg:
                    out = out[~_isin_sorted(out, ng)]
                return out, False
            # Or: union of positives; a complemented child makes the
            # whole Or a complement: a | !b == !(b & !a)
            if neg:
                out = neg[0]
                for ng in neg[1:]:
                    out = out[_isin_sorted(out, ng)]
                for p in pos:
                    out = out[~_isin_sorted(out, p)]
                return out, True
            out = np.unique(np.concatenate(pos)) if pos else np.empty(0, np.int64)
            return out, False
        raise AssertionError(type(node))

    ids, comp = ev(tree)
    if comp:
        raise ValueError("query reduces to a pure negation")
    return np.sort(ids)


def _phrase_ok_lazy(chain, lists: dict[str, "_TermList"], docid: int) -> bool:
    first_t, first_off = chain[0]
    starts = lists[first_t].positions_of(docid)
    if starts is None:
        return False
    possets = {}
    for t, _ in chain[1:]:
        ps = lists[t].positions_of(docid)
        if ps is None:
            return False
        possets[t] = set(ps)
    for p in starts:
        base = p - first_off
        if all(base + off in possets[t] for t, off in chain[1:]):
            return True
    return False


def _topk_frame(ids: np.ndarray, scores: np.ndarray, k: int):
    if ids.size == 0:
        return None
    # top-k by (score desc, docid asc)
    order = np.lexsort((ids, -scores))[:k]
    return pd.DataFrame({"docid": ids[order], "score": scores[order]})
