"""Web link-graph operators: href extraction, domain-level link
graph, and PageRank.

The link graph is the other half of a Common-Crawl-style corpus: the
HTML that the text was extracted from carries the edges, and
domain-level authority scores (PageRank over the registrable-domain
graph) are a standard quality prior for corpus curation (OPT/CCNet
lineage: "pages linked from many domains are less likely spam").

Extraction is pure JVM regexp over one scan; the graph rollup
shuffles on domain pairs with map-side combine; PageRank is the
classic fixed-iteration power method expressed as DataFrame joins
with lineage truncated per iteration.

Patterns are written to the Java-regex/RE2 common subset so the
DuckDB oracles use the same strings verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pg_cjk_parser_spark.ops.web import (
    _URL_AUTH_RE,
    _URL_SCHEME_RE,
    _url_preparse,
    registrable_domain,
)

# href="..." / href='...' inside an <a> tag, case-insensitive.  The
# attribute name must sit after whitespace (directly after '<a' or
# after earlier attributes) so data-href= cannot match; the capture
# group is 2.  Two patterns, one per quote style - RE2 has no
# backreferences to unify them.
HREF_DQ_RE = r"""(?i)<a\s([^>]*\s)?href\s*=\s*"([^"]*)\""""
HREF_SQ_RE = r"(?i)<a\s([^>]*\s)?href\s*=\s*'([^']*)'"

# same anchors WITH their plain-text link text: group 2 = href,
# group 3 = anchor text.  `[^<]*` deliberately limits capture to
# plain-text anchors (an anchor wrapping nested markup simply doesn't
# match - use extract_links for coverage); anchor text is a relevance
# signal, not an inventory.
ANCHOR_DQ_RE = HREF_DQ_RE + r"[^>]*>([^<]*)</a>"
ANCHOR_SQ_RE = HREF_SQ_RE + r"[^>]*>([^<]*)</a>"


def resolve_href(href: Column, base_url: Column) -> Column:
    """Resolve an extracted href against its page URL into an
    absolute URL, NULL when not resolvable without path arithmetic:

    - ``scheme://...`` absolute: kept as-is,
    - ``//host/...`` protocol-relative: base scheme prepended,
    - ``/path`` root-relative: base origin (scheme://authority)
      prepended,
    - anything else (relative paths, ``mailto:``, ``javascript:``,
      fragment-only, empty): NULL.  Dotted relative resolution needs
      the RFC 3986 merge algorithm; for corpus-scale link statistics
      the root-relative + absolute set is the standard approximation
      (same-page relative links stay within the page's own domain
      anyway, and domain-level rollups key on the origin this
      operator already resolves exactly).

    Both sides get the WHATWG pre-parse (tab/CR/LF stripped, then
    trimmed) - pretty-printed HTML wraps long hrefs across lines, and
    a resolved URL must never carry an embedded newline.
    """
    h = _url_preparse(href)
    base = _url_preparse(base_url)
    scheme = F.lower(F.regexp_extract(base, _URL_SCHEME_RE, 1))
    auth = F.regexp_extract(base, _URL_AUTH_RE, 1)
    has_base = scheme != ""
    return (
        F.when(h.rlike(_URL_SCHEME_RE), h)
        .when(h.startswith("//") & has_base, F.concat(scheme, F.lit(":"), h))
        .when(
            h.startswith("/") & ~h.startswith("//") & has_base,
            F.concat(scheme, F.lit("://"), auth, h),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Explode the anchor links of each page:
    one output row per resolvable ``<a href>`` occurrence, columns
    ``(url_col, href, link_url)`` with ``href`` the raw attribute
    value and ``link_url`` the resolved absolute target (see
    :func:`resolve_href`; unresolvable hrefs are dropped).

    Both quote styles are extracted in one projection
    (``regexp_extract_all`` twice, arrays concatenated), then one
    explode - JVM end to end, no Python, no shuffle; downstream
    rollups decide the partitioning.  Extraction order (all
    double-quoted then all single-quoted hrefs of a page) is
    documented API: per-page link ORDER is not graph data.
    """
    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    hrefs = F.concat(
        F.regexp_extract_all(h, F.lit(HREF_DQ_RE), F.lit(2)),
        F.regexp_extract_all(h, F.lit(HREF_SQ_RE), F.lit(2)),
    )
    out = df.select(
        F.col(url_col), F.explode(hrefs).alias("href")
    ).withColumn("link_url", resolve_href(F.col("href"), F.col(url_col)))
    return out.filter(F.col("link_url").isNotNull())


def extract_anchor_texts(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Explode each page's plain-text anchors:
    one row per resolvable ``<a href>...</a>`` whose link text is
    plain text, columns ``(url_col, link_url, anchor)`` with
    ``anchor`` the whitespace-trimmed link text (empty anchors and
    unresolvable hrefs dropped; anchors wrapping nested markup do not
    match - see ``ANCHOR_DQ_RE``).

    The two capture groups of one pattern are extracted by two
    aligned ``regexp_extract_all`` calls and zipped - Spark evaluates
    the same pattern over the same string, so the arrays index the
    same matches.  All JVM, one narrow projection + explode.
    """
    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))

    def _zip_arm(pat: str) -> Column:
        return F.arrays_zip(
            F.regexp_extract_all(h, F.lit(pat), F.lit(2)).alias("href"),
            F.regexp_extract_all(h, F.lit(pat), F.lit(3)).alias("anchor"),
        )

    pairs = F.concat(_zip_arm(ANCHOR_DQ_RE), _zip_arm(ANCHOR_SQ_RE))
    out = (
        df.select(F.col(url_col), F.explode(pairs).alias("p"))
        .select(
            F.col(url_col),
            resolve_href(F.col("p.href"), F.col(url_col)).alias(
                "link_url"
            ),
            F.trim(F.col("p.anchor")).alias("anchor"),
        )
        .filter(F.col("link_url").isNotNull() & (F.col("anchor") != ""))
    )
    return out


def incoming_anchors(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_terms: int = 1024,
    keep_self: bool = False,
) -> DataFrame:
    """Anchor-text profile of each link TARGET - the classic web
    relevance signal (text other pages use to link to a page
    describes it better than the page itself; search engines index it
    with the target):
    ``(dst_domain, n_anchors, anchor_terms)`` where ``anchor_terms``
    is the sorted, deduplicated anchor vocabulary (first ``max_terms``
    entries in sort order, so truncation is deterministic) joined by
    spaces, ready to feed ``to_tsvector`` / ``build_index`` as an
    auxiliary field.

    Same-domain anchors are EXCLUDED by default: the signal's trust
    property comes from other sites' words, and counting a page's own
    nav/self links would let it describe itself (``keep_self=True``
    restores the raw rollup).

    Scale shape: occurrences first collapse onto distinct
    (dst_domain, anchor) pairs via a map-side-combined groupBy (nav
    boilerplate - the common case - dedups in the mapper), then a
    per-domain rank caps the vocabulary BEFORE the final
    aggregation, so no executor ever materializes a celebrity
    domain's unbounded distinct-anchor set; the final collect_list
    receives at most ``max_terms`` rows per domain while ``n_anchors``
    still sums every occurrence.
    """
    from pyspark.sql.window import Window

    a = extract_anchor_texts(df, html_col, url_col).select(
        registrable_domain(F.col(url_col)).alias("src_domain"),
        registrable_domain(F.col("link_url")).alias("dst_domain"),
        "anchor",
    )
    if not keep_self:
        a = a.filter(F.col("src_domain") != F.col("dst_domain"))
    per = a.groupBy("dst_domain", "anchor").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rn = F.row_number().over(
        Window.partitionBy("dst_domain").orderBy("anchor")
    )
    return (
        per.withColumn("_rn", rn)
        .groupBy("dst_domain")
        .agg(
            F.sum("cnt").alias("n_anchors"),
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_rn") <= max_terms, F.col("anchor"))
                    )
                ),
                " ",
            ).alias("anchor_terms"),
        )
    )


def link_graph(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    keep_self: bool = True,
) -> DataFrame:
    """Domain-level link graph:
    ``(src_domain, dst_domain, n_links)`` aggregated over every
    resolvable anchor of every page, keyed by registrable domain
    (same heuristic as ``domain_stats`` so the two rollups join).
    ``keep_self=False`` drops intra-domain edges (site navigation
    dominates raw counts; authority signals usually want the
    cross-domain graph).

    Scale shape: extraction explode is narrow, then ONE exchange on
    (src_domain, dst_domain) with map-side combine - a page's own
    repeated links collapse in the mapper.  Domain-pair cardinality
    bounds the shuffle, not link count.
    """
    edges = extract_links(df, html_col, url_col).select(
        registrable_domain(F.col(url_col)).alias("src_domain"),
        registrable_domain(F.col("link_url")).alias("dst_domain"),
    )
    if not keep_self:
        edges = edges.filter(F.col("src_domain") != F.col("dst_domain"))
    return edges.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    dedupe: bool = True,
) -> DataFrame:
    """PageRank over an edge list by fixed-iteration power method,
    returning ``(node, pr)`` for every node that appears as source or
    target.  Classic formulation with dangling-mass redistribution:

        pr_{k+1}(n) = (1-d)/N
                      + d * ( sum_{(s,n) in E} pr_k(s)/outdeg(s)
                              + S_k/N )

    where ``S_k`` is the total rank held by dangling nodes (no
    out-edges) - without that term the scores of a crawl-frontier
    graph (many pages linked but never fetched) leak mass every
    iteration and stop summing to 1.  ``dedupe=True`` collapses
    multi-edges first (unweighted PageRank); pass ``dedupe=False``
    to weight by edge multiplicity implicitly.

    Scale shape: nodes/out-degrees are computed once and cached; each
    iteration is (edges ⋈ ranks on src, shuffle on dst with map-side
    partial sum) plus a left join back onto the cached node set, and
    the new ranks are ``localCheckpoint``-ed so the plan stays one
    iteration deep instead of growing a 3k-node DAG (the
    near_dup_clusters label-propagation discipline).  The dangling
    sum stays declarative: a 1-row aggregate broadcast-crossed into
    the update, never collected per iteration.  N (one scalar fixing
    the teleport constant in every expression) is the only
    driver-side value.  Join skew on celebrity in-degree hubs is AQE
    skew-split; ranks/edges co-partition on the join key across
    iterations because both sides hash on the same column.
    """
    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    )
    if dedupe:
        e = e.distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    outdeg = (
        e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).cache()
    )
    e_out = e.join(outdeg, "src").cache()
    n = nodes.count()  # the one driver-side scalar (teleport constant)
    if n == 0:
        out = nodes.withColumn("pr", F.lit(0.0))
        for cached in (nodes, outdeg, e_out):
            cached.unpersist()
        return out
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(iterations):
        ranks = ranks.cache()
        contribs = (
            e_out.join(ranks, e_out["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("in_sum"))
        )
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("s"))
        )
        new_ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("s") / F.lit(float(n))
                    )
                ).alias("pr"),
            )
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks.unpersist()
        ranks = new_ranks
    if iterations <= 0:
        # materialize before dropping the caches the plan depends on
        ranks = ranks.localCheckpoint(eager=True)
    # the returned ranks are checkpointed - release the scaffolding so
    # repeated calls don't pin edge-list-sized caches in executor
    # storage for the application's lifetime
    for cached in (nodes, outdeg, e_out):
        cached.unpersist()
    return ranks
