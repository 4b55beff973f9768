"""Web-corpus hygiene operators: PII scrubbing, URL canonicalization,
canonical-URL dedup, and cross-document line dedup.

All are standard steps in large-scale web-text curation (CCNet /
Dolma / FineWeb / MassiveText-style pipelines).  The per-document
operators stay entirely JVM-side - single narrow projection per
document, no shuffle, no Python in the hot path - so they run at scan
speed on a 100 TB corpus; the corpus-wide dedup operators shuffle
only on their natural keys (canonical URL, line text) with map-side
partial aggregation.

The regex patterns are written to the common subset of Java regex
(Spark) and RE2 (DuckDB) semantics so the same pattern string is used
verbatim in the SQL oracles.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame, functions as F

# Patterns valid with identical semantics in Java regex and RE2.
# Order of application matters: emails first (they contain digit runs
# and dots), then IPs (dotted digit runs), then phones (any remaining
# +-prefixed digit run); masks contain no digits so later patterns
# cannot match inside earlier replacements.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
# Unbounded tail on purpose: E.164 caps at 15 digits, but a bounded
# quantifier would HALF-mask a longer run ('+1 234...678' ->
# '<PHONE>678', leaking the tail next to the mask) and RE2 has no
# lookahead to forbid a trailing digit - over-masking the whole run
# is the safe failure mode for a scrubber.
PII_PHONE_RE = r"\+\d([ -]?\d){7,}"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and mask common PII (emails, IPv4 addresses,
    international-format phone numbers) in a text column, APPENDING
    n_emails / n_ips / n_phones / text_scrubbed to the input frame
    (all other columns pass through, so chaining with other hygiene
    operators is order-independent).

    All three passes are JVM regexp built-ins over one scan - the
    plan is a narrow projection with no exchange, so at cluster scale
    this runs at parquet-scan speed with full predicate/column
    pruning upstream.
    """
    t = F.col(text_col)
    no_email = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, PII_IPV4_RE, "<IP>")
    clean = F.regexp_replace(no_ip, PII_PHONE_RE, "<PHONE>")
    return docs.withColumns(
        {
            "n_emails": F.regexp_count(t, F.lit(PII_EMAIL_RE)),
            "n_ips": F.regexp_count(no_email, F.lit(PII_IPV4_RE)),
            "n_phones": F.regexp_count(no_ip, F.lit(PII_PHONE_RE)),
            "text_scrubbed": clean,
        }
    )


# -- shared URL-parsing pieces (single source of truth: the three
# operators and their DuckDB oracle twins must not drift apart) --
# WHATWG pre-parse: tab/CR/LF stripped anywhere, then trim
_URL_WS_RE = r"[\t\r\n]"
_URL_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_URL_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_URL_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# authority with userinfo dropped: host[:port], or [v6literal][:port]
_URL_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)"
_IPV4_HOST_RE = r"^(\d{1,3}\.){3}\d{1,3}$"


def _url_preparse(col: Column) -> Column:
    """NULL-safe WHATWG pre-parse (strip tab/CR/LF, trim)."""
    return F.trim(F.regexp_replace(F.coalesce(col, F.lit("")), _URL_WS_RE, ""))


# tracking parameters dropped during canonicalization (anchored,
# case-insensitive match against one 'key=value' query element -
# UTM_SOURCE= must not escape dedup just by casing)
URL_TRACKING_PARAM_RE = r"(?i)^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)"


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canon_url",
) -> DataFrame:
    """Append a canonicalized form of a URL column:

    - scheme and host lowercased (userinfo/path/query case preserved
      - RFC 3986 makes only scheme and host case-insensitive),
    - fragment removed,
    - default ports stripped (http:80, https:443),
    - tracking query parameters removed (utm_*, fbclid, gclid,
      msclkid, case-insensitively), dropping the '?' when none
      survive,
    - empty path normalized to '/'.

    URLs without a ``scheme://`` prefix (schemeless, protocol-
    relative, mailto:, malformed) pass through unchanged (modulo the
    whitespace strip below) - collapsing them to a shared garbage key
    would wrongly merge unrelated documents in canonical-key dedup.

    Composition of JVM regexp/higher-order-function built-ins - one
    narrow projection, no shuffle, whole-stage-codegen friendly - so
    canonical-URL dedup at corpus scale stays a scan + one groupBy on
    the canonical key.

    Per the WHATWG URL parsing rule, ASCII tab/CR/LF are stripped and
    the URL trimmed before parsing (scraped URLs carry them; they are
    never valid URL codepoints).  This also keeps the '$'-anchored
    patterns in the Java-regex/RE2 common subset: Java '$' matches
    before a final newline, RE2 '$' only at end of text, so the
    anchors only agree once no newline can reach the match window.
    """
    u = _url_preparse(F.col(url_col))
    scheme = F.lower(F.regexp_extract(u, _URL_SCHEME_RE, 1))
    auth = F.regexp_extract(u, _URL_AUTH_RE, 1)
    userinfo = F.regexp_extract(auth, r"^(.*@)", 1)  # case-SENSITIVE
    hostport = F.lower(F.regexp_extract(auth, r"([^@]*)$", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(u, _URL_PATH_RE, 1)
    query = F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(URL_TRACKING_PARAM_RE) & (p != ""),
    )
    clean_q = F.array_join(kept, "&")
    canon = F.when(scheme == "", u).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            userinfo,
            host,
            F.when(path == "", F.lit("/")).otherwise(path),
            F.when(clean_q == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), clean_q)
            ),
        )
    )
    return df.withColumn(out_col, canon)


# second-level labels that act like public suffixes under 2-letter
# ccTLDs (example.co.uk -> example.co.uk, not co.uk).  The full
# public-suffix list is external data; this closed generic-SLD set is
# the standard offline approximation.
_GENERIC_SLDS = ("co", "com", "net", "org", "gov", "ac", "edu")


def registrable_domain(url: Column) -> Column:
    """Registrable-domain heuristic from an absolute URL column:
    WHATWG-stripped, lowercased host (userinfo/port stripped,
    trailing FQDN dot and leading 'www.' dropped), reduced to its
    last two labels - or three when the TLD is a 2-letter country
    code and the label before it is a generic SLD
    (co/com/net/org/gov/ac/edu), so 'a.example.co.uk' ->
    'example.co.uk'.

    IP-literal hosts (IPv4 dotted quads, bracketed IPv6) are their
    OWN keys - label-splitting an IP would merge unrelated servers
    that share trailing octets under one garbage domain.
    Non-absolute and NULL URLs yield ''."""
    u = _url_preparse(url)
    hp = F.regexp_extract(u, _URL_HOSTPORT_RE, 1)
    bracketed = hp.startswith("[")
    host = F.when(
        bracketed, F.lower(F.regexp_extract(hp, r"^(\[[^\]]*\])", 1))
    ).otherwise(
        # strip :port, lower, drop trailing FQDN dot, drop www.
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.regexp_replace(hp, r":\d*$", "")), r"\.$", ""
            ),
            r"^www\.",
            "",
        )
    )
    lab = F.split(host, r"\.")
    n = F.size(lab)
    last = F.element_at(lab, -1)
    dom3 = F.concat_ws(
        ".", F.element_at(lab, -3), F.element_at(lab, -2), last
    )
    dom2 = F.concat_ws(".", F.element_at(lab, -2), last)
    return (
        F.when(bracketed | host.rlike(_IPV4_HOST_RE), host)
        .when(
            (n >= 3)
            & (F.length(last) == 2)
            & F.element_at(lab, -2).isin(*_GENERIC_SLDS),
            dom3,
        )
        .when(n >= 2, dom2)
        .otherwise(host)
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    chars_col: str | None = None,
    approx_paths: bool = False,
) -> DataFrame:
    """Per-domain corpus rollup - the aggregation behind domain-level
    quality filtering (FineWeb/RefinedWeb-style allow/deny decisions
    are made per registrable domain, not per page):
    (domain, n_docs[, n_paths, sum_chars, avg_chars]).

    Scale contract, honestly: n_docs/sum_chars aggregate with
    map-side combine, so that exchange is domain-cardinality.  The
    EXACT n_paths distinct count, however, shuffles one row per
    distinct (domain, path) pair - at web scale that is roughly one
    per URL, i.e. corpus-sized.  Pass ``approx_paths=True`` to use
    approx_count_distinct (HLL) instead, which folds n_paths into the
    same single domain-cardinality exchange; the exact default exists
    for the oracle-checked driver row at test scale.
    """
    u = _url_preparse(F.col(url_col))
    path = F.regexp_extract(u, _URL_PATH_RE, 1)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if chars_col is not None:
        paths_agg = (
            F.approx_count_distinct(path.alias("p"))
            if approx_paths
            else F.countDistinct(path.alias("p"))
        )
        aggs += [
            paths_agg.alias("n_paths"),
            F.sum(F.col(chars_col)).alias("sum_chars"),
            F.round(F.avg(F.col(chars_col)), 4).alias("avg_chars"),
        ]
    return (
        df.groupBy(registrable_domain(F.col(url_col)).alias("domain"))
        .agg(*aggs)
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str | None = None,
    id_col: str = "doc_id",
    canon_col: str = "canon_url",
) -> DataFrame:
    """Keep exactly ONE page per canonical URL - the re-crawl dedup
    every Common-Crawl-style pipeline runs before content dedup (the
    same page is captured many times across fetches; CCNet/Dolma keep
    the newest capture).

    Winner per canonical key: highest ``ts_col`` (capture timestamp)
    when given, ties (and the no-timestamp case) broken by LOWEST
    ``id_col`` so the result is deterministic.  All input columns
    pass through, plus ``canon_col`` (the dedup key, from
    ``canonicalize_urls``; a pre-existing column of that name is
    treated as the key rather than duplicated).

    Scale shape: canonicalization is a narrow projection, then ONE
    exchange hash-partitioned on the canonical key.  With a numeric
    ``id_col`` the winner is a map-side partial ``max_by`` (each
    mapper's local key group collapses before the shuffle, so the
    exchange carries at most one row per (mapper, key) - re-crawl
    duplicates collapse early instead of colocating raw; no window
    sort, no join-back).  Non-numeric ids (WARC record IDs, UUIDs)
    cannot ride an ascending field inside ``max_by``'s descending
    struct comparator, so that case falls back to a row_number
    window - still one exchange, plus a per-key sort.
    """
    from pyspark.sql.types import NumericType

    cols = [c for c in df.columns if c != canon_col]
    d = canonicalize_urls(df, url_col, canon_col)
    order = [F.col(ts_col)] if ts_col is not None else []
    if isinstance(df.schema[id_col].dataType, NumericType):
        # lowest id wins ties: maximize its negation
        order.append(-F.col(id_col))
        best = d.groupBy(canon_col).agg(
            F.max_by(F.struct(*cols), F.struct(*order)).alias("_best")
        )
        return best.select(
            *[F.col(f"_best.{c}").alias(c) for c in cols],
            F.col(canon_col),
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy(canon_col).orderBy(
        *[c.desc() for c in order], F.col(id_col).asc()
    )
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*cols, canon_col)
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    max_occurrences: int = 1,
) -> DataFrame:
    """Cross-document exact line dedup (MassiveText / RefinedWeb
    style): remove every line whose exact text occurs more than
    ``max_occurrences`` times across the WHOLE corpus - the standard
    boilerplate killer (nav bars, cookie banners, license footers
    repeat verbatim across millions of pages; prose does not).
    Whitespace-only lines are always kept: they carry paragraph
    structure, and at corpus scale every blank line is "duplicated".

    Returns one row per input document:
    ``(id_col, n_lines, n_kept, text_dedup)`` with surviving lines
    rejoined by ``sep`` in original order (documents whose every line
    is boilerplate survive with ``text_dedup = ''``).

    Scale shape: lines are exploded once, then the banned-line set is
    built with a map-side-combined groupBy (duplicate lines collapse
    to (line, count) per mapper BEFORE the shuffle, so the
    line-cardinality exchange carries distinct lines, not
    occurrences) and filtered to counts above the threshold - at web
    scale that surviving banned set is the boilerplate tail, orders
    of magnitude smaller than the corpus.  Tagging is a left join of
    the exploded lines against the banned set: AQE both broadcasts
    the banned side when it fits and skew-splits the hot boilerplate
    keys when it does not (a window-function formulation would
    instead pin every copy of a hot line into one unsplittable
    partition).  Reassembly is one doc-cardinality exchange.  The
    document text is scanned twice (count pass + tag pass), the
    textbook trade for not materializing the exploded corpus.
    """
    pat = _re.escape(sep)
    lines = docs.select(
        F.col(id_col),
        # NULL text must still yield its one (empty) line: posexplode
        # of a NULL array emits no rows and would silently DELETE the
        # document from the output.
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), pat)
        ).alias("pos", "line"),
    )
    banned = (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(
            (F.col("n_occ") > max_occurrences)
            & (F.trim(F.col("line")) != "")
        )
        .withColumn("_banned", F.lit(True))
    )
    keep = F.col("_banned").isNull()
    return (
        lines.join(banned.select("line", "_banned"), "line", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct("pos", "line"))
                        )
                    ),
                    lambda x: x.getField("line"),
                ),
                sep,
            ).alias("text_dedup"),
        )
    )
