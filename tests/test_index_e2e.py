"""End-to-end: synth corpus -> index build -> BM25 top-k == brute-force
oracle (rank- and score-identical), plus checkpoint resume."""

import json
import os
import shutil

import pytest

from pg_cjk_parser_spark.index.build import build_index
from pg_cjk_parser_spark.query.oracle import brute_force_topk
from pg_cjk_parser_spark.query.topk import search
from pg_cjk_parser_spark.spark.corpus import synth_corpus

N_DOCS = 400
QUERIES = [
    "のび太",
    "野比大雄",
    "「大韩民国개인정보",
    "Doraemnon",
    "doraemon.com",
    "Nobita 牧場物語",
    "inverted indexes",
    "개인정보 보호법",
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index"))
    docs = synth_corpus(spark, N_DOCS, seed=42, num_partitions=4)
    stats = build_index(
        spark, docs, index_dir, num_buckets=16, num_salts=2, block_size=32
    )
    pdocs = [
        (r.docid, r.text)
        for r in docs.selectExpr("xxhash64(url) as docid", "text").collect()
    ]
    return index_dir, stats, pdocs


def test_stats_sane(built):
    _, stats, pdocs = built
    assert stats["n_docs"] == N_DOCS
    assert stats["avgdl"] > 5
    assert stats["n_postings"] > 1000


def test_rank_identical_vs_oracle(spark, built):
    index_dir, _, pdocs = built
    for q in QUERIES:
        got = [
            (r.docid, round(r.score, 6))
            for r in search(spark, index_dir, q, k=10).collect()
        ]
        want = brute_force_topk(pdocs, q, k=10)
        assert got == want, (q, got[:3], want[:3])
        assert got, f"query {q!r} matched nothing"


def test_empty_and_stopword_queries(spark, built):
    index_dir, _, _ = built
    assert search(spark, index_dir, "zzzznotaword9", k=5).count() == 0
    assert search(spark, index_dir, "the", k=5).count() == 0  # pure stopword
    assert search(spark, index_dir, "", k=5).count() == 0


def test_resume_from_checkpoint(spark, built, tmp_path):
    index_dir, stats, pdocs = built
    # simulate a failed build: remove 3 bucket partitions + manifests
    victims = [0, 5, 11]
    for b in victims:
        shutil.rmtree(os.path.join(index_dir, "postings", f"bucket={b}"),
                      ignore_errors=True)
        shutil.rmtree(os.path.join(index_dir, "termstats", f"bucket={b}"),
                      ignore_errors=True)
        os.remove(os.path.join(index_dir, "manifests", f"bucket={b}.json"))

    docs = synth_corpus(spark, N_DOCS, seed=42, num_partitions=4)
    build_index(
        spark, docs, index_dir, num_buckets=16, num_salts=2, block_size=32,
        resume=True,
    )
    manifests = os.listdir(os.path.join(index_dir, "manifests"))
    assert len(manifests) == 16
    for q in QUERIES[:4]:
        got = [(r.docid, round(r.score, 6)) for r in search(spark, index_dir, q, k=10).collect()]
        want = brute_force_topk(pdocs, q, k=10)
        assert got == want, q


BOOL_QUERIES = [
    "'doraemnon' | '野比大雄'",
    "'spark' | 'のび太'",
    "'doraemnon' & !'梦'",
    "( 'のび太' | '개인정보' ) & !'nobita'",
    "'牧場' <-> '場物' | 'fox'",
    "'doraemnon' & ( 'fox' | '梦' )",
    "'の牧' | '수집' | 'doraemnon'",
    "'fox' | 'nobita' | '개인' | '梦'",
]


def test_boolean_queries_vs_oracle(spark, built):
    index_dir, _, pdocs = built
    for q in BOOL_QUERIES:
        got = [
            (r.docid, round(r.score, 6))
            for r in search(spark, index_dir, q, k=10, mode="tsquery").collect()
        ]
        want = brute_force_topk(pdocs, q, k=10, mode="tsquery")
        assert got == want, (q, got[:3], want[:3])


def test_pure_negation_rejected(spark, built):
    import pytest

    index_dir, _, _ = built
    with pytest.raises(ValueError):
        search(spark, index_dir, "!'doraemnon'", k=5, mode="tsquery")


def test_complement_reduction_rejected_at_parse():
    """Queries with positive terms can still reduce to a complement
    ('a | !b' matches everything without b, plus a); they must fail
    fast at parse time with a clear error, not inside the scoring job."""
    import pytest

    from pg_cjk_parser_spark.query.topk import parse_query

    for q in ("'cat' | !'dog'", "!'cat'", "!'cat' & !'dog'", "!(!( !'cat' ))"):
        with pytest.raises(ValueError, match="negation"):
            parse_query(q, mode="tsquery")
    # positive-anchored negations remain legal
    for q in ("'cat' & !'dog'", "'cat' & ( !'dog' | 'fox' )"):
        parse_query(q, mode="tsquery")
    # double negation has no positive term for the scorer either; it
    # must also fail at parse time (different message, same contract)
    with pytest.raises(ValueError):
        parse_query("!(!'cat')", mode="tsquery")


def test_search_local_equals_spark_path(spark, built):
    from pg_cjk_parser_spark.query.topk import search_local

    index_dir, _, pdocs = built
    for q in QUERIES + ["missingterm zz"]:
        got = search_local(index_dir, q, k=10)
        got = [(d, round(s, 6)) for d, s in got]
        want = brute_force_topk(pdocs, q, k=10)
        assert got == want, q
    for q in BOOL_QUERIES:
        got = [(d, round(s, 6)) for d, s in search_local(index_dir, q, k=10, mode="tsquery")]
        want = brute_force_topk(pdocs, q, k=10, mode="tsquery")
        assert got == want, q


def test_search_local_latency(built):
    import time

    from pg_cjk_parser_spark.query.topk import search_local

    index_dir, _, _ = built
    search_local(index_dir, "のび太")  # warm file metadata
    t0 = time.perf_counter()
    for _ in range(5):
        search_local(index_dir, "のび太", k=10)
    dt = (time.perf_counter() - t0) / 5
    assert dt < 2.0, f"local query path too slow: {dt:.3f}s"


def test_empty_corpus_and_missing_terms(spark, tmp_path):
    from pg_cjk_parser_spark.query.topk import search_local
    from pg_cjk_parser_spark.spark.corpus import synth_corpus

    d = str(tmp_path / "idx_empty")
    empty = synth_corpus(spark, 0, seed=1, num_partitions=1)
    st = build_index(spark, empty, d, num_buckets=4, num_salts=2)
    assert st["n_docs"] == 0
    assert search(spark, d, "のび太", k=5).count() == 0
    assert search_local(d, "のび太", k=5) == []


def test_head_term_split_across_salts(spark, built):
    """Zipf-head defense: a frequent term's postings live in multiple
    docid-salt shards, so no single reducer owns it."""
    import pyarrow.dataset as ds

    index_dir, _, _ = built
    d = ds.dataset(os.path.join(index_dir, "postings"), partitioning="hive")
    tbl = d.to_table(columns=["term", "salt"])
    import collections

    salts = collections.defaultdict(set)
    for t, slt in zip(tbl["term"].to_pylist(), tbl["salt"].to_pylist()):
        salts[t].add(slt)
    # head 2-gram terms appear in every salt shard
    heads = [t for t, s in salts.items() if len(s) == 2]
    assert len(heads) > 50


def test_pure_negation_subtree(spark, built):
    """regression: (!a & !b) subtree must exclude a and b, not match all"""
    index_dir, _, pdocs = built
    q = "'doraemnon' & ( !'梦' & !'のび' )"
    got = [
        (r.docid, round(r.score, 6))
        for r in search(spark, index_dir, q, k=10, mode="tsquery").collect()
    ]
    want = brute_force_topk(pdocs, q, k=10, mode="tsquery")
    assert got == want


def test_clean_rebuild_drops_stale_buckets(spark, tmp_path):
    from pg_cjk_parser_spark.spark.corpus import synth_corpus
    from pg_cjk_parser_spark.query.topk import search_local

    d = str(tmp_path / "rebuild")
    big = synth_corpus(spark, 200, seed=42, num_partitions=2)
    build_index(spark, big, d, num_buckets=8, num_salts=2, block_size=16)
    before = search_local(d, "のび太", k=10)
    small = synth_corpus(spark, 50, seed=42, num_partitions=2)
    st = build_index(spark, small, d, num_buckets=8, num_salts=2, block_size=16)
    assert st["n_docs"] == 50
    after = search_local(d, "のび太", k=50)
    pdocs = [
        (r.docid, r.text)
        for r in small.selectExpr("xxhash64(url) as docid", "text").collect()
    ]
    valid_ids = {d_ for d_, _ in pdocs}
    assert all(d_ in valid_ids for d_, _ in after), "stale docids survived rebuild"
    # partitionOverwriteMode restored
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "STATIC"
    ).upper() == "STATIC"


def test_resume_invalidates_on_corpus_change(spark, tmp_path):
    """resume=True after the input corpus changed must NOT reuse stale
    staging/buckets: the default fingerprint folds in corpus identity
    (doc count + source files), so a changed corpus rebuilds."""
    from pg_cjk_parser_spark.spark.corpus import synth_corpus
    from pg_cjk_parser_spark.query.topk import search_local

    d = str(tmp_path / "resume_fp")
    big = synth_corpus(spark, 120, seed=42, num_partitions=2)
    build_index(
        spark, big, d, num_buckets=4, num_salts=2, block_size=16, resume=True
    )
    small = synth_corpus(spark, 40, seed=7, num_partitions=2)
    st = build_index(
        spark, small, d, num_buckets=4, num_salts=2, block_size=16, resume=True
    )
    assert st["n_docs"] == 40
    valid = {
        r.docid for r in small.selectExpr("xxhash64(url) as docid").collect()
    }
    after = search_local(d, "のび太", k=500)
    assert all(docid in valid for docid, _ in after), "stale docids resumed"


def test_randomized_queries_vs_oracle(spark, built):
    """Property test: random boolean/phrase queries over corpus terms
    must be rank- and score-identical to the oracle (serving path)."""
    import random

    from pg_cjk_parser_spark.kernel.tokenizer import lexemes
    from pg_cjk_parser_spark.query.topk import search_local

    index_dir, _, pdocs = built
    vocab = sorted({t for _, text in pdocs[:100] for t, _ in lexemes(text)})
    rng = random.Random(2024)

    def rand_query():
        kind = rng.random()
        terms = [rng.choice(vocab) for _ in range(rng.randint(1, 3))]
        terms = [t.replace("'", "") for t in terms if t.strip()]
        if not terms:
            return "'fallback'", "tsquery"
        if kind < 0.35:
            op = rng.choice([" & ", " | "])
            q = op.join(f"'{t}'" for t in terms)
            if rng.random() < 0.4 and len(terms) > 1:
                q += f" & !'{rng.choice(vocab)}'"
            return q, "tsquery"
        if kind < 0.55:
            a, b = rng.choice(vocab), rng.choice(vocab)
            return f"'{a}' <-> '{b}'", "tsquery"
        return " ".join(terms), "plain"

    checked = 0
    for _ in range(40):
        q, mode = rand_query()
        try:
            got = [
                (d, round(s, 6)) for d, s in search_local(index_dir, q, k=10, mode=mode)
            ]
        except ValueError:
            continue  # pure-negation forms
        want = brute_force_topk(pdocs, q, k=10, mode=mode)
        assert got == want, (q, mode, got[:3], want[:3])
        checked += 1
    assert checked >= 30


def test_normalize_zht_index_and_query(spark, tmp_path):
    """normalize_zht=True: traditional and simplified spellings index
    to the same terms, and query routing normalizes query text
    automatically (both spellings of the query match)."""
    from pg_cjk_parser_spark.functions.zht2zhs import zht2zhs
    from pg_cjk_parser_spark.query.topk import search_local

    trad = "大韓民國的歷史紀錄"          # traditional spelling
    simp = zht2zhs(trad)                  # 大韩民国的历史纪录
    assert simp != trad
    docs = spark.createDataFrame(
        [(1, trad), (2, simp), (3, "unrelated english text entirely")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "zht")
    build_index(
        spark, docs, d, docid_col="doc_id", num_buckets=4, num_salts=2,
        block_size=16, normalize_zht=True,
    )
    for q in (trad, simp):
        got = {docid for docid, _ in search_local(d, q, k=10)}
        assert got == {1, 2}, (q, got)
    # spark path agrees
    got = {r.docid for r in search(spark, d, trad, k=10).collect()}
    assert got == {1, 2}

    # without the flag, spellings don't cross-match
    d2 = str(tmp_path / "raw")
    build_index(
        spark, docs, d2, docid_col="doc_id", num_buckets=4, num_salts=2,
        block_size=16,
    )
    got = {docid for docid, _ in search_local(d2, trad, k=10)}
    assert got == {1}

    # streaming append + compaction preserve the flag
    from pg_cjk_parser_spark.index.compact import compact_index
    from pg_cjk_parser_spark.index.streaming import append_index_batch

    d3 = str(tmp_path / "zht_stream")
    append_index_batch(
        spark, docs, d3, epoch=0, docid_col="doc_id", num_buckets=4,
        num_salts=2, block_size=16, normalize_zht=True,
    )
    assert {docid for docid, _ in search_local(d3, trad, k=10)} == {1, 2}
    compact_index(spark, d3)
    assert {docid for docid, _ in search_local(d3, trad, k=10)} == {1, 2}


def test_search_many_matches_per_query_search(spark, built):
    """Batched workload path: one Spark job for the whole query set,
    rank- and score-identical per query to search(); unroutable
    queries are absent, not erroring."""
    from pg_cjk_parser_spark.query.topk import search_many

    batch = QUERIES + ["zzzunknownterm"]
    got = {}
    for r in search_many(spark, index_dir := built[0], batch, k=10).collect():
        got.setdefault(r.query, []).append((r.rank, r.docid, round(r.score, 6)))
    assert "zzzunknownterm" not in got
    for q in QUERIES:
        want = [
            (i + 1, r.docid, round(r.score, 6))
            for i, r in enumerate(search(spark, index_dir, q, k=10).collect())
        ]
        assert sorted(got[q]) == want, q


def test_search_many_tsquery_mode(spark, built):
    from pg_cjk_parser_spark.query.topk import search_many

    index_dir = built[0]
    q = "'野比' | 'doraemnon'"
    got = [
        (r.rank, r.docid, round(r.score, 6))
        for r in search_many(spark, index_dir, [q], k=10, mode="tsquery").collect()
    ]
    want = [
        (i + 1, r.docid, round(r.score, 6))
        for i, r in enumerate(
            search(spark, index_dir, q, k=10, mode="tsquery").collect()
        )
    ]
    assert sorted(got) == want


def test_search_many_randomized_batches(spark, built):
    """Randomized query batches (subsets of the reference query set,
    mixed known/unknown terms, duplicates allowed): search_many stays
    rank- and score-identical to per-query search()."""
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        import pytest

        pytest.skip("hypothesis unavailable")
    from pg_cjk_parser_spark.query.topk import search_many

    index_dir = built[0]
    pool = QUERIES + ["zzzmissing", "のび太 zzzmissing"]
    # precompute per-query reference answers once (hypothesis examples
    # then cost one Spark job each, not len(batch)+1)
    ref = {
        q: [
            (i + 1, r.docid, round(r.score, 6))
            for i, r in enumerate(search(spark, index_dir, q, k=10).collect())
        ]
        for q in pool
    }

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.sampled_from(pool), min_size=1, max_size=5))
    def check(batch):
        got = {}
        for r in search_many(spark, index_dir, batch, k=10).collect():
            got.setdefault(r.query, []).append(
                (r.rank, r.docid, round(r.score, 6))
            )
        for q in set(batch):
            assert sorted(got.get(q, [])) == ref[q], q

    check()


def test_distance_phrase_query_index_path(spark, built):
    """PG `<N>` distance phrases through the INDEX path: the lazy
    position recheck must honor non-adjacent offsets, rank- and
    score-identical to the brute-force oracle."""
    index_dir, _, pdocs = built
    # '野比' <2> '大雄' skips the intermediate 比大 bigram; '<5>' must
    # then match NOTHING (same terms, wrong distance) - proving the
    # recheck tests the offset, not mere co-occurrence
    for q, expect_hits in (
        ("'のび' <2> '太の'", True),
        ("'野比' <2> '大雄'", True),
        ("'野比' <5> '大雄'", False),
    ):
        got = [
            (r.docid, round(r.score, 6))
            for r in search(spark, index_dir, q, k=10, mode="tsquery").collect()
        ]
        want = brute_force_topk(pdocs, q, k=10, mode="tsquery")
        assert got == want, (q, got[:3], want[:3])
        assert bool(got) == expect_hits, q


def test_rank_cd_index_path_equals_scan_path(spark, built):
    """search_rank_cd (covers ranked from index position lists) must
    be rank- and value-identical to ts_rank_cd over the raw text."""
    from pg_cjk_parser_spark.kernel.tsrank import ts_rank_cd
    from pg_cjk_parser_spark.kernel.tsvector import to_tsquery, to_tsvector
    from pg_cjk_parser_spark.query.topk import search_rank_cd

    index_dir, _, pdocs = built
    cases = [
        ("のび太", 0),            # CJK bigram phrase chain
        ("doraemnon & nobita", 0),
        ("doraemnon & nobita", 4),
        ("のび太", 32),
    ]
    nonempty = 0
    for q, method in cases:
        node = to_tsquery(q)
        scan = [
            (docid, ts_rank_cd(to_tsvector(text), node, method=method))
            for docid, text in pdocs
        ]
        scan = sorted(
            [(d, r) for d, r in scan if r > 0],
            key=lambda x: (-x[1], x[0]),
        )[:10]
        got = [
            (r.docid, r.rank)
            for r in search_rank_cd(
                spark, index_dir, q, k=10, mode="tsquery", method=method
            ).collect()
        ]
        assert got == scan, (q, method)
        nonempty += bool(scan)
    assert nonempty >= 3  # the comparison must not be vacuous


def test_rank_cd_index_path_rejects_unsupported(spark, built):
    import pytest as _pytest

    from pg_cjk_parser_spark.query.topk import search_rank_cd

    index_dir, _, _ = built
    with _pytest.raises(ValueError, match="bits 4|32"):
        search_rank_cd(spark, index_dir, "doraemnon", method=1)
    with _pytest.raises(ValueError, match="conjunctive"):
        search_rank_cd(
            spark, index_dir, "doraemnon | nobita", mode="tsquery"
        )


def test_rank_cd_phrase_bulk_differential_dense_covers(spark, tmp_path):
    """The vectorized phrase-chain ranker must be bit-identical to
    kernel ts_rank_cd on adversarial texts: overlapping matches
    (のび太のび太...), repeated chain terms, distance gaps, and every
    supported normalization method."""
    from pg_cjk_parser_spark.kernel.tsrank import ts_rank_cd
    from pg_cjk_parser_spark.kernel.tsvector import to_tsquery, to_tsvector
    from pg_cjk_parser_spark.query.topk import search_rank_cd

    texts = [
        "fast table fast table fast table",
        "fast fast table table fast table",
        "fast row table fast table value fast",
        "fast value row table",
        "のび太のび太のび太",
        "のび太 のび のび太",
        "fast a table fast the row table fast value table",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    index_dir = str(tmp_path / "idx")
    build_index(
        spark, docs, index_dir, docid_col="doc_id",
        num_buckets=4, num_salts=2, block_size=4,
    )
    for q in ("fast <-> table", "fast <2> table", "のび太", "fast & table"):
        node = to_tsquery(q)
        for method in (0, 4, 32, 36):
            scan = sorted(
                [
                    (i, r)
                    for i, t in enumerate(texts)
                    if (r := ts_rank_cd(to_tsvector(t), node, method=method)) > 0
                ],
                key=lambda x: (-x[1], x[0]),
            )
            got = [
                (r.docid, r.rank)
                for r in search_rank_cd(
                    spark, index_dir, q, k=10, mode="tsquery", method=method
                ).collect()
            ]
            assert got == scan, (q, method)


def test_ts_rank_index_path_equals_scan_path(spark, built):
    """search_rank (or-path from tf streams, and-path from position
    folds) must be bit-identical to kernel ts_rank over raw text,
    with candidates equal to the @@ match set."""
    from pg_cjk_parser_spark.kernel.tsrank import ts_rank
    from pg_cjk_parser_spark.kernel.tsvector import (
        to_tsquery,
        to_tsvector,
        ts_match,
    )
    from pg_cjk_parser_spark.query.topk import search_rank

    index_dir, _, pdocs = built
    cases = [
        ("doraemnon | nobita", 0),   # flat OR -> or-path
        ("doraemnon | nobita", 1),
        ("doraemnon & nobita", 0),   # and-path proximity fold
        ("doraemnon & nobita", 2),
        ("のび太", 0),                # phrase -> and-path + @@ adjacency
        ("のび太", 32),
    ]
    nonempty = 0
    for q, method in cases:
        node = to_tsquery(q)
        scan = []
        for docid, text in pdocs:
            v = to_tsvector(text)
            if not ts_match(v, node):
                continue
            r = ts_rank(v, node, method=method)
            if r > 0:
                scan.append((docid, r))
        scan = sorted(scan, key=lambda x: (-x[1], x[0]))[:10]
        got = [
            (r.docid, r.rank)
            for r in search_rank(
                spark, index_dir, q, k=10, mode="tsquery", method=method
            ).collect()
        ]
        assert got == scan, (q, method)
        nonempty += bool(scan)
    assert nonempty >= 4


def test_ts_rank_index_path_rejects_unsupported(spark, built):
    import pytest as _pytest

    from pg_cjk_parser_spark.query.topk import search_rank

    index_dir, _, _ = built
    with _pytest.raises(ValueError, match="1|2|32"):
        search_rank(spark, index_dir, "doraemnon", method=8)
    with _pytest.raises(ValueError, match="flat-OR"):
        search_rank(
            spark, index_dir,
            "doraemnon | (nobita & doraemon)", mode="tsquery",
        )


def test_prefix_queries_index_path(spark, built):
    """Prefix expansion against the termstats dictionary must make
    the index path agree with scan-path ts_match + BM25 over the
    expanded OR, across search / search_local / search_rank."""
    from pg_cjk_parser_spark.kernel.tsvector import to_tsquery, to_tsvector, ts_match
    from pg_cjk_parser_spark.query.topk import (
        expand_prefix,
        load_stats,
        search,
        search_local,
        search_rank,
    )

    index_dir, stats, pdocs = built
    terms = expand_prefix(index_dir, "dora", load_stats(index_dir))
    assert "doraemnon" in terms
    node = to_tsquery("dora:*")
    expected_docs = {d for d, t in pdocs if ts_match(to_tsvector(t), node)}
    assert expected_docs  # not vacuous

    got = search(spark, index_dir, "dora:*", k=1000, mode="tsquery").collect()
    assert {r.docid for r in got} == expected_docs
    loc = search_local(index_dir, "dora:*", k=1000, mode="tsquery")
    assert [(r.docid, round(r.score, 9)) for r in got[:10]] == [
        (d, round(s, 9)) for d, s in loc[:10]
    ]
    # rank or-path over the expansion: VALUES must equal scan-path
    # kernel ts_rank, which counts the prefix as ONE calc_rank_or
    # item (dividing by the expansion size instead was a real bug)
    from pg_cjk_parser_spark.kernel.tsrank import ts_rank

    ranked = search_rank(
        spark, index_dir, "dora:*", k=5, mode="tsquery"
    ).collect()
    kern = sorted(
        (
            (d, ts_rank(to_tsvector(t), node))
            for d, t in pdocs
            if d in expected_docs
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert [(r.docid, r.rank) for r in ranked] == kern
    # mixed exact|prefix OR: the exact term is ALSO inside the
    # expansion, so its entry contributes once per item (twice) and
    # the divisor is the 2 pre-expansion items
    node_mixed = to_tsquery("doraemnon | dora:*")
    ranked_m = search_rank(
        spark, index_dir, "doraemnon | dora:*", k=5, mode="tsquery"
    ).collect()
    kern_m = sorted(
        (
            (d, ts_rank(to_tsvector(t), node_mixed))
            for d, t in pdocs
            if ts_match(to_tsvector(t), node_mixed)
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert [(r.docid, r.rank) for r in ranked_m] == kern_m
    # same TEXT as both exact term and prefix: the kernel treats them
    # as TWO items (the matched entry contributes via both, divisor
    # 2) - the index path must not dedupe them by text
    node_dup = to_tsquery("'doraemnon' | doraemnon:*")
    ranked_d = search_rank(
        spark, index_dir, "'doraemnon' | doraemnon:*", k=5, mode="tsquery"
    ).collect()
    kern_d = sorted(
        (
            (d, ts_rank(to_tsvector(t), node_dup))
            for d, t in pdocs
            if ts_match(to_tsvector(t), node_dup)
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert [(r.docid, r.rank) for r in ranked_d] == kern_d
    # no-match prefix under OR must not kill the other branch
    both = search(
        spark, index_dir, "zzzznope:* | doraemnon", k=10, mode="tsquery"
    ).collect()
    assert both


def test_prefix_expansion_cap(spark, built):
    import pytest as _pytest

    from pg_cjk_parser_spark.query.topk import expand_prefix, load_stats

    index_dir, _, _ = built
    with _pytest.raises(ValueError, match="more than 1"):
        expand_prefix(index_dir, "d", load_stats(index_dir), max_terms=1)


def test_rank_local_equals_spark_paths(spark, built):
    """Serving-tier rank_local (no Spark job) must equal the Spark
    rank paths for both ranking functions and all supported shapes."""
    from pg_cjk_parser_spark.query.topk import (
        rank_local,
        search_rank,
        search_rank_cd,
    )

    index_dir, _, _ = built
    cases = [
        ("のび太", True, 0),
        ("doraemnon & nobita", True, 4),
        ("doraemnon & nobita", False, 2),
        ("doraemnon | nobita", False, 0),
    ]
    nonempty = 0
    for q, cd, method in cases:
        fn = search_rank_cd if cd else search_rank
        spark_res = [
            (r.docid, r.rank)
            for r in fn(
                spark, index_dir, q, k=10, mode="tsquery", method=method
            ).collect()
        ]
        local_res = rank_local(
            index_dir, q, k=10, mode="tsquery", method=method, cd=cd
        )
        assert local_res == spark_res, (q, cd, method)
        nonempty += bool(spark_res)
    assert nonempty >= 3


def test_rank_over_streaming_epoch_index(spark, tmp_path):
    """Rank paths must read epoch-layout (streaming append) indexes
    identically to a batch rebuild of the same corpus."""
    from pg_cjk_parser_spark.index.streaming import append_index_batch
    from pg_cjk_parser_spark.query.topk import search_rank_cd

    texts = [
        (i, t)
        for i, t in enumerate(
            ["fast table merge", "fast row table", "fast table fast table",
             "merge value", "fast table merge fast table"] * 4
        )
    ]
    half = len(texts) // 2
    sdir = str(tmp_path / "stream")
    for ep, (lo, hi) in enumerate(((0, half), (half, len(texts)))):
        df = spark.createDataFrame(
            texts[lo:hi], "doc_id long, text string"
        )
        append_index_batch(
            spark, df, sdir, epoch=ep, docid_col="doc_id",
            num_buckets=4, num_salts=2, block_size=4,
        )
    bdir = str(tmp_path / "batch")
    build_index(
        spark,
        spark.createDataFrame(texts, "doc_id long, text string"),
        bdir, docid_col="doc_id",
        num_buckets=4, num_salts=2, block_size=4,
    )
    q = "fast <-> table"
    a = search_rank_cd(spark, sdir, q, k=20, mode="tsquery").collect()
    b = search_rank_cd(spark, bdir, q, k=20, mode="tsquery").collect()
    assert [(r.docid, r.rank) for r in a] == [(r.docid, r.rank) for r in b]
    assert a


def test_prefix_query_in_batched_search(spark, built):
    """search_many routes prefix queries through the same dictionary
    expansion - batched results equal per-query search."""
    from pg_cjk_parser_spark.query.topk import search, search_many

    index_dir, _, _ = built
    batch = search_many(
        spark, index_dir, ["dora:*", "のび太"], k=10, mode="tsquery"
    ).collect()
    per = {
        q: [
            (r.docid, round(r.score, 9))
            for r in search(spark, index_dir, q, k=10, mode="tsquery").collect()
        ]
        for q in ("dora:*", "のび太")
    }
    got = {}
    for r in batch:
        got.setdefault(r.query, []).append((r.docid, round(r.score, 9)))
    assert got == {q: v for q, v in per.items() if v}


def test_search_many_rank_matches_per_query(spark, built):
    from pg_cjk_parser_spark.query.topk import (
        search_many_rank,
        search_rank,
        search_rank_cd,
    )

    index_dir, _, _ = built
    qs = ["のび太", "doraemnon & nobita"]
    batch = search_many_rank(
        spark, index_dir, qs, k=10, mode="tsquery", cd=True
    ).collect()
    got = {}
    for r in batch:
        got.setdefault(r.query, []).append((r.docid, r.score))
    for q in qs:
        per = [
            (r.docid, r.rank)
            for r in search_rank_cd(
                spark, index_dir, q, k=10, mode="tsquery"
            ).collect()
        ]
        assert got.get(q, []) == per, q
    # or-path variant
    batch2 = search_many_rank(
        spark, index_dir, ["doraemnon | nobita"], k=10,
        mode="tsquery", cd=False,
    ).collect()
    per2 = [
        (r.docid, r.rank)
        for r in search_rank(
            spark, index_dir, "doraemnon | nobita", k=10, mode="tsquery"
        ).collect()
    ]
    assert [(r.docid, r.score) for r in batch2] == per2


def test_rank_cd_clamped_position_collision_falls_back(spark, tmp_path):
    """Docs longer than MAXENTRYPOS clamp tail positions to 16383, so
    distinct lexemes can share a position - the vectorized rank paths
    must detect the key collision and fall back to the exact kernel
    path instead of emitting infinite ranks."""
    import math

    from pg_cjk_parser_spark.kernel.tsrank import ts_rank_cd
    from pg_cjk_parser_spark.kernel.tsvector import to_tsquery, to_tsvector
    from pg_cjk_parser_spark.query.topk import search_rank_cd

    long_text = ("filler " * 16390) + "doraemnon nobita"
    texts = [(0, long_text), (1, "doraemnon row nobita")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    idx = str(tmp_path / "clamp")
    build_index(
        spark, docs, idx, docid_col="doc_id",
        num_buckets=4, num_salts=2, block_size=4,
    )
    for q in ("doraemnon & nobita", "doraemnon <-> nobita"):
        node = to_tsquery(q)
        scan = sorted(
            (
                (i, r)
                for i, t in texts
                if (r := ts_rank_cd(to_tsvector(t), node)) > 0
            ),
            key=lambda x: (-x[1], x[0]),
        )
        got = [
            (r.docid, r.rank)
            for r in search_rank_cd(
                spark, idx, q, k=10, mode="tsquery"
            ).collect()
        ]
        assert got == scan, q
        assert all(math.isfinite(r) for _, r in got)
