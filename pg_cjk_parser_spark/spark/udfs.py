"""Spark-facing vectorized (Arrow/pandas) UDFs over the tokenizer kernel.

All heavy lifting is Arrow-batched pandas UDFs (never row-at-a-time
Python UDFs), per the engine's design target: the reference's
tokenizer semantics as a vectorized UDF feeding DataFrame pipelines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

TOKEN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("alias", StringType()),
            StructField("token", StringType()),
            StructField("type", IntegerType()),
        ]
    )
)

LEXEME_SCHEMA = ArrayType(
    StructType(
        [
            StructField("term", StringType()),
            StructField("pos", IntegerType()),
        ]
    )
)

TSVECTOR_SCHEMA = StructType(
    [
        StructField("doclen", IntegerType()),
        StructField(
            "postings",
            ArrayType(
                StructType(
                    [
                        StructField("term", StringType()),
                        StructField("tf", IntegerType()),
                        StructField("positions", ArrayType(IntegerType())),
                    ]
                )
            ),
        ),
    ]
)


@pandas_udf(TOKEN_SCHEMA)
def ts_debug_udf(texts: pd.Series) -> pd.Series:
    """Full token stream incl. blanks: ts_debug parity."""
    from ..kernel.fsm import TOKEN_ALIASES
    from ..kernel.tokenizer import tokenize

    def one(t):
        if t is None:
            return []
        return [
            (TOKEN_ALIASES[tt], t[st : st + ln], tt)
            for st, ln, tt in tokenize(t)
        ]

    return texts.map(one)


@pandas_udf(LEXEME_SCHEMA)
def lexemes_udf(texts: pd.Series) -> pd.Series:
    """(lexeme, position) pairs after dictionary normalization."""
    from ..kernel.tokenizer import lexemes

    return texts.map(lambda t: lexemes(t) if t is not None else [])


def make_ts_lexize_udf(dictionary: str = "english_stem"):
    """Arrow UDF for PG ``ts_lexize(dict, token)`` over a token
    column: the lexeme array of each bare token (no parsing), with a
    stopword's empty array preserved (distinct from NULL input)."""
    from ..kernel.tsvector import ts_lexize

    @pandas_udf("array<string>")
    def lexize_col(tokens: pd.Series) -> pd.Series:
        return tokens.map(
            lambda w: ts_lexize(dictionary, w) if w is not None else None
        )

    return lexize_col


@pandas_udf(TSVECTOR_SCHEMA)
def tsvector_udf(texts: pd.Series) -> pd.DataFrame:
    """Per-doc tsvector: doclen + per-term (tf, positions).

    One kernel pass per document; doclen rides along so BM25 scoring
    never needs a docid join (a deliberate scale decision: doc length
    is duplicated into postings instead of shuffled in later).
    """
    from ..kernel.tokenizer import lexemes

    doclens = []
    postings = []
    for t in texts:
        if t is None:
            doclens.append(0)
            postings.append([])
            continue
        lex = lexemes(t)
        d: dict[str, list[int]] = {}
        for term, pos in lex:
            d.setdefault(term, []).append(pos)
        doclens.append(len(lex))
        postings.append([(term, len(ps), ps) for term, ps in d.items()])
    return pd.DataFrame({"doclen": doclens, "postings": postings})


@pandas_udf(StringType())
def zht2zhs_udf(texts: pd.Series) -> pd.Series:
    """Traditional->simplified CJK normalization (cjk_zht2zhs)."""
    from ..functions.zht2zhs import zht2zhs

    return texts.map(lambda t: zht2zhs(t) if t is not None else None)


def _parse_query(query: str, websearch: bool):
    from ..kernel.tsvector import to_tsquery, websearch_to_tsquery

    return websearch_to_tsquery(query) if websearch else to_tsquery(query)


def _cd_required_substrings(node):
    """Terms that must appear VERBATIM in the source text for
    ``ts_rank_cd`` to be nonzero, or None when no such set is provable.

    Valid only for And/Phrase-only trees whose leaves are all pure-CJK
    lexemes: cover-density rank is 0 unless some window matches the
    whole query, which needs every And/Phrase leaf in the tsvector;
    and a CJK lexeme (2-gram or unigram, identity under lowercasing,
    never stemmed) can only enter a tsvector as a literal slice of the
    text, so "substring absent => term absent => rank 0" is exact.
    ASCII leaves (stemmed), prefix, Or and Not operands all bail to
    None - the caller then ranks every row, as before."""
    from ..kernel.charclass import CJK
    from ..kernel.fsm import CLS_LIST
    from ..kernel.tsvector import And, Phrase

    terms: list[str] = []
    ncp = len(CLS_LIST)

    def walk(nd) -> bool:
        if isinstance(nd, Phrase):
            for t, _ in nd.items:
                if not t or any(
                    ord(c) >= ncp or not (CLS_LIST[ord(c)] & CJK)
                    for c in t
                ):
                    return False
                terms.append(t)
            return True
        if isinstance(nd, And):
            return all(walk(c) for c in nd.children)
        return False

    if node is None or not walk(node):
        return None
    return terms or None


def make_ts_rank_udf(
    query: str,
    weights=None,
    method: int = 0,
    cd: bool = False,
    websearch: bool = False,
):
    """``ts_rank`` / ``ts_rank_cd`` (``cd=True``) over a text column
    for a fixed query, returning the raw float64 rank (round in the
    caller if comparing against an oracle).  The query is parsed once
    on the driver; per-row work is tokenize + rank inside one Arrow
    batch.

    Scan-path fast path: for cover-density queries whose terms are all
    CJK n-grams (see :func:`_cd_required_substrings`), two vectorized
    ``str.contains`` passes skip the tokenize+rank kernel for every
    row that provably ranks 0.0 - most of a web corpus for a typical
    query - leaving the Python kernel to the candidate rows only."""
    from ..kernel import tsrank
    from ..kernel.tsvector import to_tsvector

    node = _parse_query(query, websearch)
    w = tuple(weights) if weights is not None else tsrank.DEF_WEIGHTS
    fn = tsrank.ts_rank_cd if cd else tsrank.ts_rank
    req = _cd_required_substrings(node) if cd else None

    @pandas_udf(DoubleType())
    def rank_udf(texts: pd.Series) -> pd.Series:
        if req is not None:
            mask = pd.Series(True, index=texts.index)
            for rt in req:
                mask &= texts.str.contains(rt, regex=False).fillna(False)
            ml = mask.tolist()
            return pd.Series(
                [
                    None
                    if t is None
                    else (
                        fn(to_tsvector(t), node, w, method) if m else 0.0
                    )
                    for t, m in zip(texts, ml)
                ]
            )
        return texts.map(
            lambda t: fn(to_tsvector(t), node, w, method)
            if t is not None
            else None
        )

    return rank_udf


def make_weighted_rank_udf(
    query: str,
    weights=None,
    method: int = 0,
    cd: bool = False,
    title_label: str = "A",
):
    """Rank ``setweight(to_tsvector(title), label) ||
    to_tsvector(body)`` - the canonical PG title/body weighting -
    over two string columns."""
    from ..kernel import tsrank
    from ..kernel.tsvector import to_tsvector

    node = _parse_query(query, websearch=False)
    w = tuple(weights) if weights is not None else tsrank.DEF_WEIGHTS
    fn = tsrank.ts_rank_cd if cd else tsrank.ts_rank

    @pandas_udf(DoubleType())
    def weighted_rank_udf(titles: pd.Series, bodies: pd.Series) -> pd.Series:
        def one(title, body):
            if title is None or body is None:
                return None
            v = tsrank.tsvector_concat(
                tsrank.setweight(to_tsvector(title), title_label),
                to_tsvector(body),
            )
            return fn(v, node, w, method)

        return pd.Series(
            [one(t, b) for t, b in zip(titles, bodies)], dtype="float64"
        )

    return weighted_rank_udf


def make_filtered_rank_udf(
    query: str,
    keep_weights: list[str],
    weights=None,
    method: int = 0,
    title_label: str = "A",
):
    """Rank ``ts_filter(setweight(to_tsvector(title), label) ||
    to_tsvector(body), keep_weights)`` over two string columns - the
    utility-function pipeline (setweight -> concat -> ts_filter ->
    ts_rank) as one Arrow batch."""
    from ..kernel import tsrank
    from ..kernel.tsvector import to_tsvector

    node = _parse_query(query, websearch=False)
    w = tuple(weights) if weights is not None else tsrank.DEF_WEIGHTS

    @pandas_udf(DoubleType())
    def filtered_rank_udf(titles: pd.Series, bodies: pd.Series) -> pd.Series:
        def one(title, body):
            if title is None or body is None:
                return None
            v = tsrank.tsvector_concat(
                tsrank.setweight(to_tsvector(title), title_label),
                to_tsvector(body),
            )
            return tsrank.ts_rank(
                tsrank.ts_filter(v, keep_weights), node, w, method
            )

        return pd.Series(
            [one(t, b) for t, b in zip(titles, bodies)], dtype="float64"
        )

    return filtered_rank_udf


def make_ts_match_udf(query: str, websearch: bool = False):
    """The ``@@`` operator over a text column for a fixed query
    (scan path; the index path lives in query/topk.py)."""
    from ..kernel.tsvector import to_tsvector, ts_match

    node = _parse_query(query, websearch)

    @pandas_udf(BooleanType())
    def match_udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: ts_match(to_tsvector(t), node)
            if t is not None
            else None
        )

    return match_udf


def make_headline_udf(query: str, **opts):
    """ts_headline over a text column for a fixed query string; the
    query parses ONCE on the driver (like the rank/match factories),
    not per document inside the Arrow batches."""
    from ..functions.headline import headline, parse_headline_query

    parsed = parse_headline_query(query, opts.get("mode", "plain"))

    @pandas_udf(StringType())
    def headline_udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: headline(t, query, parsed=parsed, **opts)
            if t is not None
            else None
        )

    return headline_udf
