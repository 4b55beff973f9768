"""Focused differentials for the round-6 vectorized internals:

- spark_xxhash64_long_vec must be bit-identical to the scalar port;
- the vectorized _packed_postings_gen must emit the same postings as
  a straightforward per-doc reference aggregation;
- compaction's whole-batch fast decode must match the exact per-block
  path posting-for-posting (the ``n`` column gates the fast path, so
  dropping it forces the exact path on the same input).
"""

import random

import numpy as np
import pandas as pd
import pytest

from pg_cjk_parser_spark.index.build import (
    _blob_slices,
    _packed_postings_gen,
    _unpack_cell,
)
from pg_cjk_parser_spark.index.xxh64 import (
    pmod,
    salt_partition_count,
    spark_mmh3_int,
    spark_xxhash64_long,
    spark_xxhash64_long_vec,
    spark_xxhash64_str,
)


def test_xxh64_long_vec_bit_identity():
    rng = random.Random(7)
    vals = [0, 1, -1, 2**63 - 1, -(2**63), 42] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(2000)
    ]
    out = spark_xxhash64_long_vec(np.array(vals, np.int64))
    for i, v in enumerate(vals):
        assert int(out[i]) == spark_xxhash64_long(v)


def test_mmh3_int_matches_spark_hash(spark):
    from pyspark.sql import functions as F

    rows = spark.range(-50, 200).select(
        F.col("id").cast("int").alias("v"),
        F.hash(F.col("id").cast("int")).alias("h"),
    ).collect()
    for r in rows:
        assert spark_mmh3_int(r.v) == r.h


def test_salt_partition_count_is_collision_free():
    for s in (1, 2, 3, 4, 8, 16, 32, 64):
        p = salt_partition_count(s)
        assert p >= s
        mods = {pmod(spark_mmh3_int(x), p) for x in range(s)}
        assert len(mods) == s, (s, p)


def _cells_to_postings(frames):
    """(bucket, salt) -> sorted [(term, docid, tf, doclen, pos_blob)]."""
    out = {}
    for fr in frames:
        for b, s, p in zip(
            fr["bucket"].tolist(), fr["salt"].tolist(), fr["payload"].tolist()
        ):
            d, t, dl, plen, tidx, utlen, utb, pb = _unpack_cell(p)
            acc = out.setdefault((b, s), [])
            ut_sl = _blob_slices(utb, utlen)
            pb_sl = _blob_slices(pb, plen)
            for k in range(len(d)):
                acc.append(
                    (
                        ut_sl[int(tidx[k])],
                        int(d[k]),
                        int(t[k]),
                        int(dl[k]),
                        pb_sl[k],
                    )
                )
    return {k: sorted(v) for k, v in out.items()}


def _reference_postings(pdf, num_buckets, num_salts):
    """Per-doc dict aggregation, the shape the vectorized generator
    replaced: (bucket, salt) -> sorted postings with _enc_pos blobs."""
    from pg_cjk_parser_spark.index.build import _enc_pos
    from pg_cjk_parser_spark.kernel.tokenizer import lexemes

    out = {}
    for docid, text in zip(pdf["docid"].tolist(), pdf["text"].tolist()):
        lex = lexemes(text) if text is not None else []
        if not lex:
            continue
        salt = pmod(spark_xxhash64_long(docid), num_salts)
        agg = {}
        for term, p_ in lex:
            agg.setdefault(term, []).append(p_)
        for term, ps in agg.items():
            bkt = pmod(spark_xxhash64_str(term), num_buckets)
            out.setdefault((bkt, salt), []).append(
                (
                    term.encode("utf-8", "surrogatepass"),
                    docid,
                    len(ps),
                    len(lex),
                    _enc_pos(ps),
                )
            )
    return {k: sorted(v) for k, v in out.items()}


@pytest.fixture(scope="module")
def corpus_pdf():
    from pg_cjk_parser_spark.spark.corpus import _doc_fields

    rows = [(1728345600 + i, _doc_fields(i, 42)[0]) for i in range(1500)]
    rows[5] = (rows[5][0], None)
    rows[6] = (rows[6][0], "")
    rows[7] = (rows[7][0], "the of and")  # stopword-only doc
    # giant doc: positions clamp at MAXENTRYPOS, so the vectorized
    # grouping must keep non-strictly-ascending position runs intact
    rows[8] = (
        rows[8][0],
        " ".join(f"w{i % 97} 漢字" for i in range(9000)),
    )
    # negative docid (xxhash64(url) ids): exercises the uint64
    # wraparound path in the vectorized salt lane and delta codec
    rows[9] = (-rows[9][0], rows[9][1])
    return pd.DataFrame(
        {"docid": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )


def test_packed_gen_matches_reference(corpus_pdf):
    got = _cells_to_postings(
        _packed_postings_gen(iter([corpus_pdf]), 16, 4)
    )
    want = _reference_postings(corpus_pdf, 16, 4)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k]


def test_packed_gen_batch_split_invariant(corpus_pdf):
    """Postings must not depend on Arrow batch boundaries."""
    parts = [
        c.reset_index(drop=True) for c in np.array_split(corpus_pdf, 4)
    ]
    one = _cells_to_postings(_packed_postings_gen(iter([corpus_pdf]), 8, 2))
    many = _cells_to_postings(_packed_postings_gen(iter(parts), 8, 2))
    assert one == many


def test_compact_fast_decode_matches_exact(tmp_path, corpus_pdf):
    from pg_cjk_parser_spark.index.build import _encode_cells
    from pg_cjk_parser_spark.index.compact import _decode_to_cells

    cells = pd.concat(
        list(_packed_postings_gen(iter([corpus_pdf]), 8, 2)),
        ignore_index=True,
    )
    blocks = pd.concat(
        list(_encode_cells(iter([cells]), 32)), ignore_index=True
    )
    blocks["epoch"] = 0
    fast = _cells_to_postings(
        _decode_to_cells(iter([blocks]), deleted=None)
    )
    exact = _cells_to_postings(
        _decode_to_cells(iter([blocks.drop(columns=["n"])]), deleted=None)
    )
    assert fast == exact
    # and the decode inverts the encode
    assert fast == _cells_to_postings(iter([cells]))
