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

from .codec import encode_varints_offsets

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


def _postings_gen(batches, normalize_zht: bool = False):
    """Per-doc tokenize + aggregate, emitting flat pre-exploded rows.

    Flat str/int/binary columns keep the Arrow python->JVM transfer on
    the fast path; nested array<struct<..array<int>>> output measured
    ~6x slower and degraded under high parallelism.
    """
    from ..kernel.tokenizer import lexemes

    norm = None
    if normalize_zht:
        from ..functions.zht2zhs import zht2zhs as norm

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
            if norm is not None and text is not None:
                text = norm(text)
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


PACKED_SCHEMA = "bucket int, salt int, payload binary"


def _pack_cell_idx(
    uterms_b, tidx, docids, tfs, dls, plens, pos_blob
) -> bytes:
    """Pack one (bucket, salt) cell's postings into a single blob,
    with the term VOCABULARY stored once and an int32 index per
    posting (head CJK terms repeat across thousands of postings -
    per-posting term bytes measured ~30% of the cell shuffle volume,
    and re-ranking them cost a dict lookup per posting on the reduce
    side):

    [i64 n][i32 nuniq][docids 8n][tf 4n][doclen 4n][poslen 4n]
    [termidx 4n][utermlen 4nu][uterm utf8 blob][positions blob]
    """
    import struct

    return b"".join(
        (
            struct.pack("<qi", len(tidx), len(uterms_b)),
            np.ascontiguousarray(docids, np.int64).tobytes(),
            np.ascontiguousarray(tfs, np.int32).tobytes(),
            np.ascontiguousarray(dls, np.int32).tobytes(),
            np.ascontiguousarray(plens, np.int32).tobytes(),
            np.ascontiguousarray(tidx, np.int32).tobytes(),
            np.fromiter(
                map(len, uterms_b), np.int32, len(uterms_b)
            ).tobytes(),
            b"".join(uterms_b),
            pos_blob,
        )
    )


def _pack_cell(terms_b, docids, tfs, dls, poss) -> bytes:
    """Per-posting-terms convenience packer (tests / small callers):
    dedupes the term list in first-occurrence order and emits the
    same wire format as :func:`_pack_cell_idx`."""
    seen: dict[bytes, int] = {}
    tidx = np.empty(len(terms_b), np.int32)
    for i, t in enumerate(terms_b):
        j = seen.get(t)
        if j is None:
            j = len(seen)
            seen[t] = j
        tidx[i] = j
    return _pack_cell_idx(
        list(seen),
        tidx,
        np.array(docids, np.int64),
        np.array(tfs, np.int32),
        np.array(dls, np.int32),
        np.fromiter(map(len, poss), np.int32, len(poss)),
        b"".join(poss),
    )


def _unpack_cell(buf: bytes):
    """Inverse of :func:`_pack_cell_idx`:
    (docids, tfs, doclens, plens, tidx, utermlens, uterm_blob,
    pos_blob)."""
    n = int(np.frombuffer(buf, np.int64, 1)[0])
    nu = int(np.frombuffer(buf, np.int32, 1, 8)[0])
    o = 12
    d = np.frombuffer(buf, np.int64, n, o); o += 8 * n
    t = np.frombuffer(buf, np.int32, n, o); o += 4 * n
    dl = np.frombuffer(buf, np.int32, n, o); o += 4 * n
    plen = np.frombuffer(buf, np.int32, n, o); o += 4 * n
    tidx = np.frombuffer(buf, np.int32, n, o); o += 4 * n
    utlen = np.frombuffer(buf, np.int32, nu, o); o += 4 * nu
    tb_end = o + int(utlen.sum())
    return d, t, dl, plen, tidx, utlen, buf[o:tb_end], buf[tb_end:]


def _blob_slices(blob: bytes, lens: np.ndarray) -> list[bytes]:
    offs = np.empty(len(lens) + 1, np.int64)
    offs[0] = 0
    np.cumsum(lens, out=offs[1:])
    ol = offs.tolist()
    return [blob[ol[i]:ol[i + 1]] for i in range(len(lens))]


def _packed_postings_gen(batches, num_buckets, num_salts, flush_at=500_000,
                         normalize_zht: bool = False):
    """Map side of the packed shuffle: tokenize docs and emit ONE fat
    binary row per (bucket, salt) cell per ~flush_at postings, instead
    of one row per posting.  The Python<->JVM Arrow boundary is paid
    per *cell* (~B*S rows per flush), not per posting - at 10M postings
    the per-row boundary cost dominated the whole build.

    bucket/salt use the pure-Python spark-xxhash64 port
    (bit-identical to F.xxhash64; tests/test_xxh64.py), so packed and
    staged builds address the same shards.

    The post-tokenize aggregation is vectorized per Arrow batch: the
    batch's (term, position) pairs factorize to integer codes (C
    hash), one stable argsort on a (doc, code) key yields the per-doc
    term groups with positions in emission (= ascending) order, salts
    come from the vectorized xxh64 lane, buckets from a vocabulary-
    sized cache, and one more stable argsort groups postings by cell.
    The per-posting dict/append loop this replaces measured 72% of
    map-side time once the tokenizer had its own fast paths; only
    vocabulary-sized loops remain in Python.

    Positions accumulate per cell as interleaved ``[npos, p1, ...]``
    int streams (built with a head-slot scatter, no per-posting
    work), and flush time delta-encodes + LEB128-encodes EVERY cell's
    stream in one vectorized pass (codec.encode_varints_offsets),
    slicing the shared byte buffer back into per-cell blobs by offset
    - same wire format as the per-doc loop produced (differential
    test: identical final index blocks)."""
    from ..kernel.tokenizer import lexemes
    from .codec import encode_varints_offsets
    from .xxh64 import pmod, spark_xxhash64_long_vec, spark_xxhash64_str

    norm = None
    if normalize_zht:
        from ..functions.zht2zhs import zht2zhs as norm

    ncells = num_buckets * num_salts
    uterms: list[list] = [[] for _ in range(ncells)]  # cell vocabulary
    udicts: list[dict] = [{} for _ in range(ncells)]  # bytes -> vocab idx
    tidx: list[list] = [[] for _ in range(ncells)]    # int32 array chunks
    docids: list[list] = [[] for _ in range(ncells)]  # int64 array chunks
    tfs: list[list] = [[] for _ in range(ncells)]     # int64 array chunks
    dls: list[list] = [[] for _ in range(ncells)]     # int64 array chunks
    posv: list[list] = [[] for _ in range(ncells)]    # stream array chunks
    bucket_cache: dict[str, tuple] = {}  # term -> (bucket, utf8 bytes)
    count = 0

    def flush():
        live = [c for c in range(ncells) if tfs[c]]
        if not live:
            return pd.DataFrame(
                {
                    "bucket": np.array([], np.int32),
                    "salt": np.array([], np.int32),
                    "payload": [],
                }
            )
        # one delta+varint pass over every live cell's position stream
        tf_cells = [
            tfs[c][0] if len(tfs[c]) == 1 else np.concatenate(tfs[c])
            for c in live
        ]
        tf_cat = np.concatenate(tf_cells)
        vals = np.concatenate(
            [
                posv[c][0] if len(posv[c]) == 1 else np.concatenate(posv[c])
                for c in live
            ]
        )
        seg = tf_cat + 1  # values per posting: npos + positions
        ends_v = np.cumsum(seg)
        starts_v = ends_v - seg
        pos_mask = np.ones(vals.size, bool)
        pos_mask[starts_v] = False
        pos_idx = np.flatnonzero(pos_mask)
        pos_vals = vals[pos_idx]
        d = np.diff(pos_vals, prepend=np.int64(0))
        first = np.concatenate(
            ([0], np.cumsum(tf_cat[:-1]))
        )  # each posting's first position: absolute, not a delta
        d[first] = pos_vals[first]
        enc = vals.copy()
        enc[pos_idx] = d
        buf, ends_b = encode_varints_offsets(enc.astype(np.uint64))
        blob_all = buf.tobytes()
        post_ends = ends_b[ends_v - 1]
        plens = np.diff(post_ends, prepend=np.int64(0))
        cell_counts = np.asarray([x.size for x in tf_cells], np.int64)
        cell_post_ends = np.cumsum(cell_counts)
        cell_b_ends = post_ends[cell_post_ends - 1]
        cell_b_starts = np.concatenate(([0], cell_b_ends[:-1]))

        rb, rs, rp = [], [], []
        pe = 0
        for i, c in enumerate(live):
            n = int(cell_counts[i])
            rp.append(
                _pack_cell_idx(
                    uterms[c],
                    tidx[c][0]
                    if len(tidx[c]) == 1
                    else np.concatenate(tidx[c]),
                    docids[c][0]
                    if len(docids[c]) == 1
                    else np.concatenate(docids[c]),
                    tf_cells[i],
                    dls[c][0]
                    if len(dls[c]) == 1
                    else np.concatenate(dls[c]),
                    plens[pe : pe + n],
                    blob_all[int(cell_b_starts[i]) : int(cell_b_ends[i])],
                )
            )
            rb.append(c // num_salts)
            rs.append(c % num_salts)
            pe += n
            uterms[c] = []
            udicts[c] = {}
            tidx[c] = []
            docids[c] = []
            tfs[c] = []
            dls[c] = []
            posv[c] = []
        return pd.DataFrame(
            {
                "bucket": np.array(rb, np.int32),
                "salt": np.array(rs, np.int32),
                "payload": rp,
            }
        )

    for pdf in batches:
        texts = pdf["text"].tolist()
        nd = len(texts)
        if nd == 0:
            continue
        all_terms: list[str] = []
        all_pos: list[int] = []
        doc_lens = np.zeros(nd, np.int64)
        for i, text in enumerate(texts):
            if text is None:
                continue
            if norm is not None:
                text = norm(text)
            lex = lexemes(text)
            if not lex:
                continue
            doc_lens[i] = len(lex)
            ts_, ps_ = zip(*lex)
            all_terms.extend(ts_)
            all_pos.extend(ps_)
        npost_all = len(all_terms)
        if npost_all == 0:
            continue
        codes, uniq = pd.factorize(np.asarray(all_terms, dtype=object))
        V = len(uniq)
        del all_terms
        pos_arr = np.asarray(all_pos, np.int64)
        del all_pos
        doc_idx = np.repeat(np.arange(nd, dtype=np.int64), doc_lens)
        codes = codes.astype(np.int64, copy=False)

        # group (doc, term) with positions in emission order (stable)
        key = doc_idx * np.int64(V) + codes
        order = np.argsort(key, kind="stable")
        ks = key[order]
        ps = pos_arr[order]
        change = np.empty(npost_all, bool)
        change[0] = True
        change[1:] = ks[1:] != ks[:-1]
        gstarts = np.flatnonzero(change)
        tf = np.diff(np.append(gstarts, npost_all))
        g_key = ks[gstarts]
        g_doc = g_key // V
        g_code = g_key - g_doc * V

        docid_arr = pdf["docid"].to_numpy().astype(np.int64, copy=False)
        # numpy % with a positive divisor matches pmod
        salts_doc = spark_xxhash64_long_vec(docid_arr) % num_salts

        bkt_u = np.empty(V, np.int64)
        ub: list[bytes] = [b""] * V
        for j, t in enumerate(uniq.tolist()):
            ent = bucket_cache.get(t)
            if ent is None:
                ent = (
                    pmod(spark_xxhash64_str(t), num_buckets),
                    t.encode("utf-8", "surrogatepass"),
                )
                if len(bucket_cache) < (1 << 20):
                    bucket_cache[t] = ent
            bkt_u[j] = ent[0]
            ub[j] = ent[1]

        # group postings by cell (stable keeps doc/term order inside)
        p_cell = bkt_u[g_code] * num_salts + salts_doc[g_doc]
        po = np.argsort(p_cell, kind="stable")
        cell_s = p_cell[po]
        tf_o = tf[po]
        g_doc_o = g_doc[po]
        did_o = docid_arr[g_doc_o]
        dl_o = doc_lens[g_doc_o]
        code_o = g_code[po]
        pstart_o = gstarts[po]

        # gather positions into cell-sorted posting order, then build
        # the interleaved [npos, positions...] stream with one scatter
        ng = tf_o.size
        cum = np.cumsum(tf_o)
        offs = cum - tf_o
        out_idx = np.repeat(pstart_o - offs, tf_o) + np.arange(
            npost_all, dtype=np.int64
        )
        pos_g = ps[out_idx]
        stream = np.empty(npost_all + ng, np.int64)
        heads = np.arange(ng, dtype=np.int64) + offs
        stream[heads] = tf_o
        msk = np.ones(stream.size, bool)
        msk[heads] = False
        stream[msk] = pos_g

        cchange = np.empty(ng, bool)
        cchange[0] = True
        cchange[1:] = cell_s[1:] != cell_s[:-1]
        cstarts = np.flatnonzero(cchange).tolist()
        cends = cstarts[1:] + [ng]
        heads_ext = np.append(heads, stream.size)
        for cs, cex in zip(cstarts, cends):
            c = int(cell_s[cs])
            # per-cell vocabulary: unique batch codes remap onto the
            # cell's running vocab (vocabulary-sized Python, not
            # posting-sized)
            lu, inv = np.unique(code_o[cs:cex], return_inverse=True)
            ud = udicts[c]
            ul = uterms[c]
            remap = np.empty(lu.size, np.int32)
            for k, j in enumerate(lu.tolist()):
                tb_ = ub[j]
                x = ud.get(tb_)
                if x is None:
                    x = len(ul)
                    ud[tb_] = x
                    ul.append(tb_)
                remap[k] = x
            tidx[c].append(remap[inv])
            docids[c].append(did_o[cs:cex])
            tfs[c].append(tf_o[cs:cex])
            dls[c].append(dl_o[cs:cex])
            posv[c].append(stream[heads_ext[cs] : heads_ext[cex]])
        count += ng
        if count >= flush_at:
            df = flush()
            if len(df):
                yield df
            count = 0
    df = flush()
    if len(df):
        yield df


def _encode_cells(batches, block_size: int):
    """Reduce side of the packed shuffle: gather each (bucket, salt)
    cell's payloads, unpack, sort by (term, docid) with integer term
    ranks (numpy lexsort; no wide-unicode arrays), and emit posting
    blocks via the same vectorized block slicer as the row path.

    Memory: one reduce partition's payloads live in RAM; size
    num_salts (docid-disjoint shards) so cells fit - the salt count is
    the scale lever, exactly as for head-term skew."""
    bs = block_size
    cells: dict[tuple[int, int], list[bytes]] = {}
    for pdf in batches:
        for b, s, payload in zip(
            pdf["bucket"].tolist(), pdf["salt"].tolist(), pdf["payload"].tolist()
        ):
            cells.setdefault((int(b), int(s)), []).append(payload)

    out_rows: list[tuple] = []
    for bkt, salt in sorted(cells):
        parts = [_unpack_cell(p) for p in cells[(bkt, salt)]]
        d = np.concatenate([x[0] for x in parts])
        t = np.concatenate([x[1] for x in parts]).astype(np.int64)
        dl = np.concatenate([x[2] for x in parts]).astype(np.int64)
        plen = np.concatenate([x[3] for x in parts]).astype(np.int64)
        # per-part vocab -> cell vocab (vocabulary-sized Python), then
        # one gather per part for the posting codes
        ud: dict[bytes, int] = {}
        code_parts = []
        for x in parts:
            utb = _blob_slices(x[6], x[5])
            lookup = np.empty(len(utb), np.int64)
            for k, u in enumerate(utb):
                j = ud.get(u)
                if j is None:
                    j = len(ud)
                    ud[u] = j
                lookup[k] = j
            code_parts.append(lookup[x[4]])
        codes = np.concatenate(code_parts)
        uniq_b = list(ud)
        order_u = sorted(range(len(uniq_b)), key=uniq_b.__getitem__)
        rank_arr = np.empty(len(uniq_b), np.int64)
        for r, i in enumerate(order_u):
            rank_arr[i] = r
        ranks = rank_arr[codes]
        idx = np.lexsort((d, ranks))
        rs_ = ranks[idx]
        ds = np.ascontiguousarray(d[idx])
        ts = np.ascontiguousarray(t[idx])
        dls_ = np.ascontiguousarray(dl[idx])
        # positions: byte-level gather into sorted posting order - no
        # per-posting bytes objects
        bigbuf = np.frombuffer(b"".join([x[7] for x in parts]), np.uint8)
        starts = np.cumsum(plen) - plen
        lens_o = plen[idx]
        starts_o = starts[idx]
        p_ends = np.cumsum(lens_o)
        total_pb = int(p_ends[-1]) if lens_o.size else 0
        out_i = np.repeat(starts_o - (p_ends - lens_o), lens_o) + np.arange(
            total_pb, dtype=np.int64
        )
        pos_bytes = bigbuf[out_i]

        n = len(rs_)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = rs_[1:] != rs_[:-1]
        gstarts = np.flatnonzero(change)
        gends = np.append(gstarts[1:], n)
        glens = gends - gstarts
        ofs = np.arange(n, dtype=np.int64) - np.repeat(gstarts, glens)
        bstarts = np.flatnonzero((ofs % bs) == 0)
        gid = np.searchsorted(gstarts, bstarts, side="right") - 1
        bends = np.minimum(bstarts + bs, gends[gid])
        bids = (bstarts - gstarts[gid]) // bs
        uniq_str = [
            uniq_b[i].decode("utf-8", "surrogatepass") for i in order_u
        ]
        gterm = [uniq_str[int(rs_[i])] for i in gstarts.tolist()]
        gl = gid.tolist()
        _slice_blocks(
            out_rows, lambda i: (bkt, salt, gterm[gl[i]]), bids,
            bstarts, bends, ds, ts, dls_, (pos_bytes, p_ends),
            ds.view(np.uint64), ts.view(np.uint64), dls_.view(np.uint64),
        )
        if len(out_rows) >= 2000:
            yield pd.DataFrame(out_rows, columns=_BLOCK_COLS)
            out_rows = []
    if out_rows:
        yield pd.DataFrame(out_rows, columns=_BLOCK_COLS)


def _with_docid(docs: DataFrame, docid_col: str | None) -> DataFrame:
    if docid_col is None:
        return docs.withColumn("docid", F.xxhash64(F.col("url")))
    return docs.withColumn("docid", F.col(docid_col).cast("long"))


def explode_postings(
    docs: DataFrame,
    docid_col: str | None,
    text_col: str,
    normalize_zht: bool = False,
) -> DataFrame:
    """(docid, doclen, term, tf, positions:binary) - one row per (doc, term).

    Doc-id density matters: delta-varint docid blocks are ~2.4x smaller
    (and build ~1.4x faster) with dense/clustered int64 ids than with
    random hash ids.  Pass a dense ``docid_col`` when the corpus has
    one (ingest sequence, crawl timestamp); ``xxhash64(url)`` is the
    fallback when only urls identify documents.
    """
    sel = _with_docid(docs, docid_col).select(
        "docid", F.col(text_col).alias("text")
    )
    return sel.mapInPandas(
        lambda it: _postings_gen(it, normalize_zht), POSTING_ROW_SCHEMA
    )


_BLOCK_COLS = [
    "bucket", "salt", "term", "block_id", "n", "min_docid", "max_docid",
    "docids", "tfs", "doclens", "positions", "max_tf", "min_dl", "sum_tf",
]


def _slice_blocks(
    out_rows, keys_of, bids, bstarts, bends, d, t, dl, poss, du, tu, lu
):
    """Assemble block rows: one vectorized varint encode per column for
    ALL blocks, then per-block byte-range slicing.  ``bstarts`` must
    partition [0, len(du)) contiguously (block starts include every
    group start), so ``reduceat`` segments == blocks.

    ``poss`` is either a list of per-posting position blobs (row
    path: joined per block) or a ``(uint8 array, int64 ends)`` pair of
    the already-ordered position byte stream plus per-posting end
    offsets (cell path: sliced per block, no per-posting objects)."""
    deltas = du.copy()
    deltas[1:] -= du[:-1]
    deltas[bstarts] = du[bstarts]  # first docid of each block is absolute
    dbuf, dend = encode_varints_offsets(deltas)
    tbuf, tend = encode_varints_offsets(tu)
    lbuf, lend = encode_varints_offsets(lu)
    max_tf = np.maximum.reduceat(tu, bstarts)
    min_dl = np.minimum.reduceat(lu, bstarts)
    sum_tf = np.add.reduceat(tu, bstarts)
    b0d = np.where(bstarts > 0, dend[bstarts - 1], 0)
    b1d = dend[bends - 1]
    b0t = np.where(bstarts > 0, tend[bstarts - 1], 0)
    b1t = tend[bends - 1]
    b0l = np.where(bstarts > 0, lend[bstarts - 1], 0)
    b1l = lend[bends - 1]
    ns = bends - bstarts
    dmin = d[bstarts]
    dmax = d[bends - 1]
    bl = bstarts.tolist()
    be = bends.tolist()
    if isinstance(poss, tuple):
        pb_arr, p_ends = poss
        pb0 = np.where(bstarts > 0, p_ends[bstarts - 1], 0).tolist()
        pb1 = p_ends[bends - 1].tolist()

        def get_pos(i):
            return pb_arr[pb0[i] : pb1[i]].tobytes()

    else:

        def get_pos(i):
            return b"".join(poss[bl[i] : be[i]])

    for i in range(len(bl)):
        key = keys_of(i)
        out_rows.append(
            (
                key[0], key[1], key[2], int(bids[i]), int(ns[i]),
                int(dmin[i]), int(dmax[i]),
                dbuf[b0d[i]:b1d[i]].tobytes(),
                tbuf[b0t[i]:b1t[i]].tobytes(),
                lbuf[b0l[i]:b1l[i]].tobytes(),
                get_pos(i),
                int(max_tf[i]), int(min_dl[i]), int(sum_tf[i]),
            )
        )


def _emit_final_group(out_rows, key, bid0, d, t, dl, poss, bs):
    """Flush one complete group (all blocks, incl. trailing partial)."""
    n = len(d)
    if n == 0:
        return
    d = np.ascontiguousarray(d)
    t = np.ascontiguousarray(t)
    dl = np.ascontiguousarray(dl)
    bstarts = np.arange(0, n, bs, dtype=np.int64)
    bends = np.minimum(bstarts + bs, n)
    bids = bstarts // bs + bid0
    _slice_blocks(
        out_rows, lambda i: key, bids, bstarts, bends,
        d, t, dl, poss,
        d.view(np.uint64), t.view(np.uint64), dl.view(np.uint64),
    )


def _encode_partition(batches, block_size: int):
    """Streaming block encoder over (bucket,salt,term,docid)-sorted rows.

    Vectorized per Arrow batch, not per block: group/block boundaries,
    per-block reductions (``reduceat``) and the three varint streams
    (docid deltas, tfs, doclens) are each computed ONCE per batch and
    sliced per block afterwards, so numpy call count is O(batches)
    rather than O(blocks).  The trailing (possibly batch-spanning)
    group is carried over with its running block_id so a head term
    larger than a batch never materializes in full."""
    bs = block_size
    out_rows: list[tuple] = []
    ckey = None     # carried tail group: key, next block_id, arrays
    cblock = 0
    cd = ct = cdl = None
    cpos: list = []

    for pdf in batches:
        nb_rows = len(pdf)
        if nb_rows == 0:
            continue
        b = pdf["bucket"].to_numpy()
        s = pdf["salt"].to_numpy()
        term = pdf["term"].to_numpy()
        d = pdf["docid"].to_numpy().astype(np.int64, copy=False)
        t = pdf["tf"].to_numpy().astype(np.int64)
        dl = pdf["doclen"].to_numpy().astype(np.int64)
        poss = pdf["positions"].tolist()

        change = np.empty(nb_rows, dtype=bool)
        change[0] = True
        change[1:] = (term[1:] != term[:-1]) | (s[1:] != s[:-1]) | (b[1:] != b[:-1])
        gstarts = np.flatnonzero(change)
        gkeys = [(int(b[i]), int(s[i]), term[i]) for i in gstarts.tolist()]

        base0 = 0       # block_id base for group 0 (continuing carry)
        carry_len = 0
        if ckey is not None:
            if gkeys[0] == ckey:
                base0 = cblock
                carry_len = len(cd)
                if carry_len:
                    d = np.concatenate((cd, d))
                    t = np.concatenate((ct, t))
                    dl = np.concatenate((cdl, dl))
                    poss = cpos + poss
            else:
                _emit_final_group(out_rows, ckey, cblock, cd, ct, cdl, cpos, bs)
            ckey = None

        n = nb_rows + carry_len
        gstarts = gstarts + carry_len
        if carry_len:
            gstarts[0] = 0
        gends = np.append(gstarts[1:], n)

        # emit region: everything except the last group's trailing
        # partial block (carried to the next batch)
        last_lo = int(gstarts[-1])
        E = last_lo + ((n - last_lo) // bs) * bs
        if E > 0:
            glens = gends - gstarts
            ofs = np.arange(n, dtype=np.int64) - np.repeat(gstarts, glens)
            bstart_all = np.flatnonzero((ofs % bs) == 0)
            bstarts = bstart_all[bstart_all < E]
            gid = np.searchsorted(gstarts, bstarts, side="right") - 1
            bends = np.minimum(np.minimum(bstarts + bs, gends[gid]), E)
            bids = (bstarts - gstarts[gid]) // bs
            if base0:
                bids = bids + np.where(gid == 0, base0, 0)
            gl = gid.tolist()
            _slice_blocks(
                out_rows, lambda i: gkeys[gl[i]], bids, bstarts, bends,
                d, t, dl, poss,
                d[:E].view(np.uint64), t[:E].view(np.uint64),
                dl[:E].view(np.uint64),
            )

        ckey = gkeys[-1]
        cblock = int((E - last_lo) // bs) + (base0 if len(gstarts) == 1 else 0)
        cd = d[E:].copy()
        ct = t[E:].copy()
        cdl = dl[E:].copy()
        cpos = poss[E:]

        if len(out_rows) >= 2000:
            yield pd.DataFrame(out_rows, columns=_BLOCK_COLS)
            out_rows = []
    if ckey is not None:
        _emit_final_group(out_rows, ckey, cblock, cd, ct, cdl, cpos, bs)
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
    normalize_zht: bool = False,
) -> dict:
    """Build (or resume) the inverted index for ``docs``; returns stats.

    ``normalize_zht=True`` maps traditional->simplified CJK
    (cjk_zht2zhs) inside the tokenizer pass, so traditional and
    simplified spellings index to the same terms; the flag is recorded
    in stats.json and query routing applies the same normalization to
    query text automatically.

    ``keep_staging=True`` retains the exploded-postings staging parquet
    (skips re-tokenizing on resume at the cost of ~staged-corpus
    storage); by default it is deleted after a successful build.
    """
    import hashlib
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    if fingerprint is None:
        # the fingerprint gates BOTH bucket-manifest resume and staging
        # reuse, so it must identify the corpus, not just the layout:
        # resuming after the input changed must invalidate everything
        # rather than silently mix old staged postings with new docs.
        if n_docs is None:
            n_docs = docs.count()
        try:
            srcs = sorted(docs.inputFiles())
        except Exception:
            srcs = []
        if srcs:
            src_h = hashlib.md5("|".join(srcs).encode()).hexdigest()[:10]
        else:
            # in-memory DataFrame: no input files to identify the corpus,
            # and doc count alone cannot distinguish two different
            # same-sized corpora - so never reuse prior staging/buckets
            # (a caller who wants resume for an in-memory source passes
            # an explicit content-derived ``fingerprint``)
            src_h = "mem"
            resume = False
        zs = "-z" if normalize_zht else ""
        fingerprint = (
            f"fp3-{num_buckets}-{num_salts}-{block_size}{zs}-n{n_docs}-{src_h}"
        )
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
        p = explode_postings(docs, docid_col, text_col, normalize_zht)
        return p.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
        ).withColumn(
            "salt", F.pmod(F.xxhash64("docid"), F.lit(num_salts)).cast("int")
        )

    if n_docs is None:
        n_docs = docs.count()
    parts = num_partitions or min(
        num_buckets * num_salts, spark.sparkContext.defaultParallelism * 4
    )

    # The default path is fully fused AND packed: the tokenizer pass
    # packs each (bucket, salt) cell's postings into one fat binary row
    # per map chunk, the shuffle moves ~B*S rows per map task instead
    # of one row per posting (the per-row Python<->JVM Arrow boundary
    # measured ~5s per direction at 10M postings), and the reducer
    # sorts + block-encodes in numpy.  The row-level staging path is
    # kept for resume (skip re-tokenizing completed buckets) and
    # keep_staging.
    if resume or keep_staging:
        # staging is only reusable if it was built from the SAME corpus:
        # _SUCCESS alone would happily resume onto stale postings after
        # the input changed (same layout, different docs)
        smeta_path = os.path.join(staging, "_staging_meta.json")

        def _staging_ok() -> bool:
            if not os.path.exists(os.path.join(staging, "_SUCCESS")):
                return False
            try:
                with open(smeta_path) as f:
                    return json.load(f).get("fingerprint") == fingerprint
            except Exception:
                return False

        if not (resume and _staging_ok()):
            exploded().write.mode("overwrite").parquet(staging)
            with open(smeta_path, "w") as f:
                json.dump({"fingerprint": fingerprint}, f)
        src = spark.read.parquet(staging)
        todo = src
        if done:
            todo = src.where(
                ~F.col("bucket").isin([int(x) for x in sorted(done)])
            )
        blocks = (
            todo.repartition(parts, "bucket", "salt")
            .sortWithinPartitions("bucket", "salt", "term", "docid")
            .mapInPandas(
                lambda it: _encode_partition(it, block_size), BLOCK_SCHEMA
            )
        )
    else:
        sel = _with_docid(docs, docid_col).select(
            "docid", F.col(text_col).alias("text")
        )
        cells = sel.mapInPandas(
            lambda it: _packed_postings_gen(
                it, num_buckets, num_salts, normalize_zht=normalize_zht
            ),
            PACKED_SCHEMA,
        )
        blocks = cells.repartition(parts, "bucket", "salt").mapInPandas(
            lambda it: _encode_cells(it, block_size), BLOCK_SCHEMA
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

    per_bucket: dict[int, dict] = {}
    if _bucket_dirs(ts_dir):
        # one small job over the (term, df, cf) shards yields BOTH the
        # per-bucket metrics for the lineage manifests and - summed
        # driver-side over <= num_buckets rows - the corpus totals
        rows = (
            spark.read.parquet(ts_dir)
            .groupBy("bucket")
            .agg(
                F.sum("cf").alias("cf"),
                F.sum("df").alias("df"),
                F.count(F.lit(1)).alias("n_terms"),
            )
            .collect()
        )
        per_bucket = {
            int(r.bucket): {
                "n_terms": int(r.n_terms),
                "n_postings": int(r.df or 0),
                "total_tf": int(r.cf or 0),
            }
            for r in rows
        }
        total_tf = sum(m["total_tf"] for m in per_bucket.values())
        n_postings = sum(m["n_postings"] for m in per_bucket.values())
        n_terms = sum(m["n_terms"] for m in per_bucket.values())
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
        "normalize_zht": bool(normalize_zht),
        "build_seconds": round(time.time() - t0, 3),
    }
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)

    os.makedirs(os.path.join(index_dir, "manifests"), exist_ok=True)
    for bucket in range(num_buckets):
        if bucket in done:
            continue
        m = per_bucket.get(bucket, {"n_terms": 0, "n_postings": 0, "total_tf": 0})
        with open(_manifest_path(index_dir, bucket), "w") as f:
            json.dump(
                {
                    "bucket": bucket,
                    "status": "complete",
                    "fingerprint": fingerprint,
                    "n_docs": int(n_docs),
                    "built_at": time.time(),
                    # per-partition metrics (lineage + sizing evidence)
                    "metrics": m,
                },
                f,
            )
    if not keep_staging:
        shutil.rmtree(staging, ignore_errors=True)
    return stats
