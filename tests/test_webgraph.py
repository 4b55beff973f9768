"""Unit tests for the web dedup (url_dedup / line_dedup) and link
graph (extract_links / link_graph / pagerank) operators."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from pg_cjk_parser_spark.ops.graph import (
    extract_anchor_texts,
    extract_links,
    incoming_anchors,
    link_graph,
    pagerank,
    resolve_href,
)
from pg_cjk_parser_spark.ops.web import line_dedup, url_dedup


# ---------------------------------------------------------------- url_dedup


def test_url_dedup_keeps_newest_capture(spark):
    df = spark.createDataFrame(
        [
            (1, "HTTP://A.com:80/x?utm_source=s", 100, "old"),
            (2, "http://a.com/x", 300, "new"),
            (3, "http://a.com/x?fbclid=1", 200, "mid"),
            (4, "https://b.net", 50, "only"),
        ],
        "doc_id long, url string, warc_ts long, payload string",
    )
    out = {
        r.canon_url: r for r in url_dedup(df, ts_col="warc_ts").collect()
    }
    # all three a.com variants share one canonical key; newest wins
    assert set(out) == {"http://a.com/x", "https://b.net/"}
    win = out["http://a.com/x"]
    assert (win.doc_id, win.warc_ts, win.payload) == (2, 300, "new")
    # every input column passes through, plus the canonical key
    assert set(win.asDict()) == {
        "doc_id", "url", "warc_ts", "payload", "canon_url",
    }


def test_url_dedup_string_ids_and_canon_col_reuse(spark):
    # WARC-style string record ids take the window fallback path
    df = spark.createDataFrame(
        [
            ("rec-b", "http://t.com/p", 100),
            ("rec-a", "http://T.COM/p", 100),
            ("rec-c", "http://t.com/p", 300),
        ],
        "doc_id string, url string, warc_ts long",
    )
    rows = url_dedup(df, ts_col="warc_ts").collect()
    assert len(rows) == 1 and rows[0].doc_id == "rec-c"
    rows = url_dedup(df).collect()  # no ts: lexicographically lowest id
    assert len(rows) == 1 and rows[0].doc_id == "rec-a"
    # a frame that already carries canon_url must not yield duplicate
    # columns when deduped again
    from pg_cjk_parser_spark.ops.web import canonicalize_urls

    pre = canonicalize_urls(df)
    out = url_dedup(pre)
    assert out.columns.count("canon_url") == 1
    assert out.count() == 1


def test_line_dedup_null_text_survives(spark):
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, None), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in line_dedup(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2].text_dedup == "" and out[2].n_lines == 1


def test_extract_links_strips_wrapped_href_whitespace(spark):
    df = spark.createDataFrame(
        [("https://h.com/x", '<a href="/long\n\tpath">t</a>')],
        "url string, html string",
    )
    rows = extract_links(df).collect()
    assert [r.link_url for r in rows] == ["https://h.com/longpath"]


def test_url_dedup_tiebreak_lowest_id(spark):
    df = spark.createDataFrame(
        [(7, "http://t.com/p", 100), (3, "http://T.COM/p", 100)],
        "doc_id long, url string, warc_ts long",
    )
    rows = url_dedup(df, ts_col="warc_ts").collect()
    assert len(rows) == 1 and rows[0].doc_id == 3
    # without a timestamp column the lowest id wins outright
    rows = url_dedup(df.drop("warc_ts")).collect()
    assert len(rows) == 1 and rows[0].doc_id == 3


# --------------------------------------------------------------- line_dedup


def _ld(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in line_dedup(df, **kw).collect()}


def test_line_dedup_drops_boilerplate_keeps_order(spark):
    out = _ld(
        spark,
        [
            (1, "alpha\nBOILER\n\nomega"),
            (2, "BOILER\nbeta"),
            (3, "BOILER\n\ngamma"),
        ],
    )
    assert out[1].text_dedup == "alpha\n\nomega"  # blank line survives
    assert out[2].text_dedup == "beta"
    assert out[3].text_dedup == "\ngamma"
    assert (out[1].n_lines, out[1].n_kept) == (4, 3)


def test_line_dedup_all_boilerplate_doc_survives_empty(spark):
    out = _ld(spark, [(1, "X\nY"), (2, "X\nY"), (3, "solo")])
    assert out[1].text_dedup == "" and out[1].n_kept == 0
    assert out[3].text_dedup == "solo"


def test_line_dedup_counts_within_doc_repeats(spark):
    # the same line twice in ONE doc exceeds max_occurrences=1
    out = _ld(spark, [(1, "dup\nmid\ndup")])
    assert out[1].text_dedup == "mid"
    out = _ld(spark, [(1, "dup\nmid\ndup")], max_occurrences=2)
    assert out[1].text_dedup == "dup\nmid\ndup"


def test_line_dedup_custom_separator_is_literal(spark):
    # '. ' must be escaped as a literal, not act as regex dot
    out = _ld(
        spark,
        [(1, "one two. boiler"), (2, "boiler. three")],
        sep=". ",
        max_occurrences=1,
    )
    assert out[1].text_dedup == "one two"
    assert out[2].text_dedup == "three"


# ------------------------------------------------------------ link extract


def test_extract_links_quotes_case_and_decoys(spark):
    html = (
        '<a href="https://ext.org/x">t</a>'
        "<A CLASS='c' HREF='/local'>u</A>"
        "<a href='//cdn.net/y'>v</a>"
        '<a href="mailto:a@b.c">w</a>'
        '<a href="rel/path.html">r</a>'
        '<a data-href="https://no.com/z">decoy</a>'
    )
    df = spark.createDataFrame(
        [("https://src.com/a/b", html)], "url string, html string"
    )
    got = {r.href: r.link_url for r in extract_links(df).collect()}
    assert got == {
        "https://ext.org/x": "https://ext.org/x",
        "/local": "https://src.com/local",
        "//cdn.net/y": "https://cdn.net/y",
    }


def test_resolve_href_without_absolute_base(spark):
    df = spark.createDataFrame(
        [("not-a-url", "abs", "https://x.org/p"), ("not-a-url", "rel", "/p")],
        "base string, tag string, href string",
    )
    out = {
        r.tag: r.resolved
        for r in df.select(
            "tag",
            resolve_href(F.col("href"), F.col("base")).alias("resolved"),
        ).collect()
    }
    # absolute targets survive a junk base; relative ones cannot resolve
    assert out == {"abs": "https://x.org/p", "rel": None}


def test_link_graph_rollup_and_self_edges(spark):
    html = (
        '<a href="https://a.ext.org/1">x</a>'
        '<a href="https://ext.org/2">y</a>'
        '<a href="/self">z</a>'
    )
    df = spark.createDataFrame(
        [("https://www.src.com/p", html)], "url string, html string"
    )
    full = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in link_graph(df).collect()
    }
    # subdomain collapses onto the registrable domain; self edge kept
    assert full == {("src.com", "ext.org"): 2, ("src.com", "src.com"): 1}
    cross = link_graph(df, keep_self=False).collect()
    assert {(r.src_domain, r.dst_domain) for r in cross} == {
        ("src.com", "ext.org")
    }


# ------------------------------------------------------------- anchor text


def test_extract_anchor_texts_alignment_and_contract(spark):
    html = (
        '<a href="https://a.org/1">first</a>'
        "<a class='c' href='/two' rel='x'>  second  </a>"
        '<a href="https://b.org/3"><b>nested</b></a>'  # not plain text
        '<a href="https://c.org/4"></a>'  # empty anchor
        '<a href="mailto:x@y.z">mail</a>'  # unresolvable
    )
    df = spark.createDataFrame(
        [("https://src.com/p", html)], "url string, html string"
    )
    got = {r.link_url: r.anchor for r in extract_anchor_texts(df).collect()}
    assert got == {
        "https://a.org/1": "first",
        "https://src.com/two": "second",  # trimmed, sq quote style
    }


def test_incoming_anchors_rollup_and_cap(spark):
    rows = [
        ("https://s1.com/a", '<a href="https://t.org/x">alpha</a>'),
        ("https://s2.com/b", '<a href="https://www.t.org/y">beta</a>'),
        ("https://s3.com/c", '<a href="https://t.org/z">alpha</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = incoming_anchors(df).collect()
    assert len(out) == 1
    r = out[0]
    # www. collapses onto the registrable domain; duplicates counted
    # in n_anchors but deduped + sorted in the vocabulary
    assert (r.dst_domain, r.n_anchors, r.anchor_terms) == (
        "t.org", 3, "alpha beta"
    )
    capped = incoming_anchors(df, max_terms=1).collect()[0]
    assert capped.anchor_terms == "alpha"  # deterministic truncation


def test_incoming_anchors_excludes_self_description(spark):
    rows = [
        ("https://evil.com/a", '<a href="/">best deals online</a>'),
        ("https://other.org/b", '<a href="https://evil.com/">scam</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {r.dst_domain: r for r in incoming_anchors(df).collect()}
    # a page cannot describe itself; only the external anchor counts
    assert set(out) == {"evil.com"}
    assert out["evil.com"].anchor_terms == "scam"
    raw = {r.dst_domain: r for r in incoming_anchors(df, keep_self=True).collect()}
    assert raw["evil.com"].n_anchors == 2


# ----------------------------------------------------------------- pagerank


def _pr_reference(edges, iterations, damping=0.85):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {s: [] for s, _ in edges}
    for s, d in edges:
        out[s].append(d)
    pr = np.full(n, 1.0 / n)
    for _ in range(iterations):
        new = np.full(n, (1.0 - damping) / n)
        dangling = sum(pr[idx[v]] for v in nodes if v not in out)
        new += damping * dangling / n
        for s, targets in out.items():
            share = pr[idx[s]] / len(targets)
            for d in targets:
                new[idx[d]] += damping * share
        pr = new
    return dict(zip(nodes, pr))


def test_pagerank_two_cycle_is_uniform(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r.node: r.pr for r in pagerank(e, iterations=4).collect()}
    assert got == {"a": pytest.approx(0.5), "b": pytest.approx(0.5)}


def test_pagerank_dangling_mass_matches_reference(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")]
    # c is dangling, d is a source-only root
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.pr for r in pagerank(e, iterations=3).collect()}
    want = _pr_reference(edges, iterations=3)
    assert set(got) == set(want)
    for node, val in want.items():
        assert got[node] == pytest.approx(val, abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_multi_edge_weighting(spark):
    edges = [("a", "b"), ("a", "b"), ("a", "c")]
    e = spark.createDataFrame(edges, "src string, dst string")
    dd = {r.node: r.pr for r in pagerank(e, iterations=1).collect()}
    ww = {
        r.node: r.pr
        for r in pagerank(e, iterations=1, dedupe=False).collect()
    }
    # deduped: b and c each get half of a's rank; weighted: b gets 2/3
    assert dd["b"] == pytest.approx(dd["c"])
    assert ww["b"] > ww["c"]
    want = _pr_reference([("a", "b"), ("a", "c")], iterations=1)
    assert dd["b"] == pytest.approx(want["b"], abs=1e-12)


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank(e).collect() == []


# ------------------------------------------------- end-to-end integration


def test_anchor_terms_make_pages_searchable(spark, tmp_path):
    """The north-star integration: the anchor-text profile feeds
    build_index as an auxiliary field, so a page becomes findable by
    what OTHER sites call it even when its own text never says so."""
    from pg_cjk_parser_spark.index.build import build_index
    from pg_cjk_parser_spark.query.topk import search

    pages = spark.createDataFrame(
        [
            (1, "https://shop.example/catalog",
             "widget catalog with many products", ""),
            (2, "https://blog.org/review",
             "my favorite store reviewed",
             '<a href="https://shop.example/catalog">cheap doraemon '
             "merchandise</a>"),
            (3, "https://news.net/story",
             "unrelated news story",
             '<a href="https://shop.example/">doraemon deals</a>'),
        ],
        "doc_id long, url string, text string, html string",
    )
    profiles = incoming_anchors(pages)
    from pg_cjk_parser_spark.ops.web import registrable_domain

    enriched = (
        pages.withColumn("domain", registrable_domain(F.col("url")))
        .join(
            profiles.withColumnRenamed("dst_domain", "domain"),
            "domain",
            "left",
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.col("text"), F.coalesce("anchor_terms", F.lit(""))
            ).alias("text"),
        )
    )
    idx = str(tmp_path / "anchor_idx")
    build_index(
        spark, enriched, idx, docid_col="doc_id",
        num_buckets=4, num_salts=2,
    )
    # the shop page never says "doraemon" itself - only its incoming
    # anchors do; it must now be retrievable by that term
    hits = [r.docid for r in search(spark, idx, "doraemon", k=5).collect()]
    assert 1 in hits
