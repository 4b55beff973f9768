"""pg_trgm-style trigram similarity, JVM-side end to end.

PostgreSQL FTS deployments pair the parser with the ``pg_trgm``
extension for fuzzy matching (typo-tolerant lookup, fuzzy dedup);
this module reproduces its core semantics - ``show_trgm``,
``similarity`` and the ``%`` threshold operator - as pure Spark
column expressions (split/transform/flatten/array_distinct), so
trigram extraction and pair scoring stay inside whole-stage codegen
with no Python boundary.

Semantics (pg_trgm trgm_op.c / generate_trgm):

* the string is lowercased and split into words on non-alphanumeric
  runs;
* each word is padded with TWO leading spaces and ONE trailing space
  and every 3-char window becomes a trigram;
* the string's trigram SET is the dedup of all words' trigrams;
* ``similarity(a, b) = |A ∩ B| / |A ∪ B|``.

``word_similarity`` (extent-limited) is not implemented - it needs
per-extent scans that don't decompose into set algebra; the plain
similarity operator is what fuzzy dedup uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# non-alphanumeric separator class; the Unicode-class variant
# "[^\\p{L}\\p{N}]+" matches PG's wchar path, the ASCII default
# mirrors pg_trgm's C locale behavior
ASCII_SEP = "[^a-z0-9]+"
UNICODE_SEP = "[^\\p{L}\\p{N}]+"


def trgm_col(col: Column, sep: str = ASCII_SEP) -> Column:
    """``show_trgm``: the deduplicated trigram array of a string
    column, sorted (pg_trgm returns a sorted set)."""
    words = F.filter(
        F.split(F.lower(col), sep), lambda w: w != F.lit("")
    )
    padded = F.transform(
        words, lambda w: F.concat(F.lit("  "), w, F.lit(" "))
    )
    trgms = F.flatten(
        F.transform(
            padded,
            lambda p: F.transform(
                F.sequence(F.lit(1), F.length(p) - 2),
                lambda i: p.substr(i, F.lit(3)),
            ),
        )
    )
    return F.array_sort(F.array_distinct(trgms))


def trgm_similarity(a: Column, b: Column) -> Column:
    """``similarity(text, text)`` over two PRE-EXTRACTED trigram
    array columns: |intersection| / |union| as a double."""
    inter = F.size(F.array_intersect(a, b))
    denom = (F.size(a) + F.size(b) - inter).cast("double")
    # two empty sets: pg_trgm returns 0, not a division error
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(inter / denom)


def trgm_similar_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = ASCII_SEP,
    round_digits: int | None = None,
) -> DataFrame:
    """All document pairs with trigram similarity >= threshold (the
    ``%`` operator, default threshold 0.3): ``(id_a, id_b, sim)``.

    Scale shape: trigrams extract once per doc (projection), then the
    pair join; at corpus scale, prefilter with an inverted
    trigram->doc index or MinHash over trigram sets before the exact
    join - the existing LSH machinery (ops/dedup.py) composes, since
    a trigram set is just another shingle set."""
    t = docs.select(
        F.col(id_col).alias("id"), trgm_col(F.col(text_col), sep).alias("t")
    )
    a = t.alias("a")
    b = t.alias("b")
    raw = trgm_similarity(F.col("a.t"), F.col("b.t"))
    out = raw if round_digits is None else F.round(raw, round_digits)
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            raw.alias("_raw"),
            out.alias("sim"),
        )
        # the % threshold applies to the UNROUNDED similarity
        # (pg_trgm semantics); rounding is presentation only
        .where(F.col("_raw") >= threshold)
        .drop("_raw")
        .orderBy("id_a", "id_b")
    )


def _edit_distance_at_most(a: str, b: str, k: int) -> bool:
    """Codepoint Levenshtein distance <= k, same metric as Spark's
    ``F.levenshtein`` (unit-cost insert/delete/substitute).  Banded DP
    with an early abort when a full row exceeds k."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo, hi = max(1, i - k), min(len(b), i + k)
        if lo > 1:
            cur[lo - 1] = k + 1  # left of the band: unreachable
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        if hi < len(b):
            cur[hi + 1 :] = [k + 1] * (len(b) - hi)
        if min(cur[lo - 1 : hi + 1]) > k:
            return False
        prev = cur
    return prev[len(b)] <= k


def suggest_terms(
    spark,
    index_dir: str,
    word: str,
    k: int = 5,
    max_dist: int = 2,
    sep: str = ASCII_SEP,
) -> DataFrame:
    """"Did you mean": spell-correction candidates for a query word
    from the INDEX'S OWN dictionary - the metadata-only termstats
    shards (the same dictionary prefix queries expand against), so no
    corpus rescan.  Candidates within ``max_dist`` edits rank by
    trigram similarity, then document frequency, then term
    (pg_trgm's similarity ordering with a Levenshtein guard).
    Returns (term, df, sim)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from ..query.topk import _shard_paths, load_stats

    stats = load_stats(index_dir)
    paths = _shard_paths(
        index_dir, "termstats", list(range(stats["num_buckets"])), stats
    )
    # per-path pyarrow reads, no basePath: bucket-dir shards and flat
    # epoch dirs carry different physical schemas/partition levels
    # (same reason as topk._read_termstats), and an empty index has
    # no shards at all.  A Levenshtein edit changes the codepoint
    # length by at most 1 per edit, so the length band
    # |len(term) - len(word)| <= max_dist is a sound prefilter -
    # pushed into the scan so the driver only ever materializes the
    # band, not the whole web-scale dictionary
    tlen = pc.utf8_length(ds.field("term"))
    band = (tlen >= len(word) - max_dist) & (
        tlen <= len(word) + max_dist
    )
    # Driver memory is bounded by (one Arrow batch) + (true candidate
    # set): batches stream through a driver-side edit-distance filter
    # identical to the F.levenshtein predicate below, so only terms
    # within max_dist edits - a tiny set for any real dictionary -
    # ever accumulate, never the whole length band (at web-scale
    # vocabulary a +-max_dist band of a short word is still huge).
    # A term lives in exactly one bucket but may span salt/epoch
    # shards, so df still sums across batches per term.
    agg: dict[str, int] = {}
    for p in paths:
        scanner = ds.dataset(p).scanner(
            columns=["term", "df"], filter=band
        )
        for batch in scanner.to_batches():
            for term, d in zip(
                batch["term"].to_pylist(), batch["df"].to_pylist()
            ):
                if _edit_distance_at_most(term, word, max_dist):
                    agg[term] = agg.get(term, 0) + int(d)
    if not agg:
        return spark.createDataFrame(
            [], "term string, df long, sim double"
        )
    dic = spark.createDataFrame(
        list(agg.items()), "term string, df long"
    )
    sim = trgm_similarity(
        trgm_col(F.col("term"), sep), trgm_col(F.lit(word), sep)
    )
    return (
        dic.where(F.levenshtein(F.col("term"), F.lit(word)) <= max_dist)
        .select("term", "df", F.round(sim, 6).alias("sim"))
        .orderBy(F.desc("sim"), F.desc("df"), F.asc("term"))
        .limit(k)
    )
