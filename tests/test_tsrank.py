"""Kernel tests for ts_rank / ts_rank_cd / weighted tsvectors /
websearch_to_tsquery, plus the FP-parity premises their DuckDB
oracles rely on (bit-identical exp/sqrt and fold order)."""

import math
import random

import duckdb
import pytest

from pg_cjk_parser_spark.kernel.tsrank import (
    DEF_WEIGHTS,
    cnt_length,
    setweight,
    strip_weights,
    ts_rank,
    ts_rank_cd,
    tsvector_concat,
    tsvector_maxpos,
    wep_pos,
    wep_weight,
)
from pg_cjk_parser_spark.kernel.tsvector import (
    to_tsquery,
    to_tsvector,
    ts_match,
    tsquery_str,
    websearch_to_tsquery,
)

PI2_6 = 1.64493406685


# --- websearch_to_tsquery goldens (PG documentation examples) ----------


@pytest.mark.parametrize(
    "q,expected",
    [
        ("The fat rats", "'fat' & 'rat'"),
        ('"supernovae stars" -crab', "'supernova' <-> 'star' & !'crab'"),
        ('"sad cat" or "fat rat"', "'sad' <-> 'cat' | 'fat' <-> 'rat'"),
        ("signal -“segmentation fault”".replace("“", '"').replace("”", '"'),
         "'signal' & !'segment' <-> 'fault'"),
        ("-cat", "!'cat'"),
        ("cat or", "'cat'"),
        ("or cat", "'cat'"),
        ("fat-cat", "'fat-cat' <-> 'fat' <-> 'cat'"),
    ],
)
def test_websearch_goldens(q, expected):
    assert tsquery_str(websearch_to_tsquery(q)) == expected


def test_websearch_never_raises_and_empty_is_none():
    assert websearch_to_tsquery("") is None
    assert websearch_to_tsquery('"') is None
    assert websearch_to_tsquery("the a or the") is None
    assert websearch_to_tsquery('&|!()<->:*') is None
    # unbalanced quote runs to end of string
    assert (
        tsquery_str(websearch_to_tsquery('"fat rat'))
        == "'fat' <-> 'rat'"
    )


def test_websearch_fuzz_never_raises():
    rng = random.Random(7)
    alphabet = 'ab "-or()&|!<>: の'
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        websearch_to_tsquery(s)  # must not raise


# --- weighted tsvector mechanics ---------------------------------------


def test_setweight_and_concat():
    t = setweight(to_tsvector("fast table"), "A")
    assert all(wep_weight(x) == 3 for ps in t.values() for x in ps)
    assert tsvector_maxpos(t) == 2
    b = to_tsvector("merge fast value")
    v = tsvector_concat(t, b)
    # body positions shift by the title's max stored position (2)
    assert [wep_pos(x) for x in v["fast"]] == [1, 4]
    assert [wep_weight(x) for x in v["fast"]] == [3, 0]
    assert [wep_pos(x) for x in v["merg"]] == [3]
    assert strip_weights(v)["fast"] == [1, 4]
    assert cnt_length(v) == 5


def test_concat_shift_ignores_trailing_stopword():
    # 'the' consumes position 3 but stores nothing, so maxpos is 2
    t = to_tsvector("fast table the")
    assert tsvector_maxpos(t) == 2
    v = tsvector_concat(t, to_tsvector("merge"))
    assert v["merg"] == [3]


# --- ts_rank hand-verified values (tsrank.c arithmetic) ----------------


def test_rank_or_single_occurrence():
    v = to_tsvector("spark line")
    # one term, n=1: ((0.1 + 0.1/1) - 0.1) / (pi^2/6) / size(=1)
    expected = ((0.1 + 0.1) - 0.1) / PI2_6
    assert ts_rank(v, to_tsquery("spark")) == expected


def test_rank_or_position_decay_and_size_division():
    v = to_tsvector("spark spark spark")
    h3 = 0.1 / 1 + 0.1 / 4 + 0.1 / 9
    expected = ((0.1 + h3) - 0.1) / PI2_6
    assert ts_rank(v, to_tsquery("spark")) == pytest.approx(expected, rel=0, abs=0)
    # 'merge | spark': size 2, merge absent
    assert ts_rank(v, to_tsquery("merge | spark")) == expected / 2


def test_rank_and_proximity():
    v = to_tsvector("merge row spark")  # dist 2
    wd = 1.0 / (1.005 + 0.05 * math.exp(2 / 1.5 - 2))
    curw = math.sqrt((0.1 * 0.1) * wd)
    assert ts_rank(v, to_tsquery("spark & merge")) == curw
    # missing term -> 1e-20 floor
    assert ts_rank(v, to_tsquery("spark & vector")) == 1e-20
    # top-level OR routes through the or-path even with 2 terms
    assert ts_rank(v, to_tsquery("spark | merge")) != curw


def test_rank_and_distance_cap():
    v = {"spark": [1], "merg": [150]}
    assert ts_rank(v, to_tsquery("spark & merge")) == math.sqrt(
        (0.1 * 0.1) * 1e-30
    )


def test_rank_phrase_routes_to_and_path():
    v = to_tsvector("fast table")
    q_ph = to_tsquery("fast <-> table")
    q_and = to_tsquery("fast & table")
    assert ts_rank(v, q_ph) == ts_rank(v, q_and) > 0


def test_rank_weighted_title_boost():
    title = setweight(to_tsvector("spark"), "A")
    v = tsvector_concat(title, to_tsvector("line spark"))
    # weight list for spark: [1.0, 0.1] -> resj = 1.0/1 + 0.1/4
    expected = ((1.0 + (1.0 + 0.1 / 4)) - 1.0) / PI2_6
    assert ts_rank(v, to_tsquery("spark")) == expected


def test_rank_normalization_methods():
    v = to_tsvector("spark spark merge line")
    q = to_tsquery("spark")
    r0 = ts_rank(v, q, DEF_WEIGHTS, 0)
    assert ts_rank(v, q, DEF_WEIGHTS, 1) == r0 / (
        math.log(cnt_length(v) + 1) / math.log(2.0)
    )
    assert ts_rank(v, q, DEF_WEIGHTS, 2) == r0 / cnt_length(v)
    assert ts_rank(v, q, DEF_WEIGHTS, 8) == r0 / len(v)
    assert ts_rank(v, q, DEF_WEIGHTS, 16) == r0 / (
        math.log(len(v) + 1) / math.log(2.0)
    )
    assert ts_rank(v, q, DEF_WEIGHTS, 32) == r0 / (r0 + 1)


# --- ts_rank_cd --------------------------------------------------------


def test_rank_cd_single_term_counts_covers():
    v = to_tsvector("fast line fast")
    assert ts_rank_cd(v, to_tsquery("fast")) == pytest.approx(0.2)


def test_rank_cd_and_cover_noise():
    # one cover [1,3] with 2 items, 1 noise word between
    v = to_tsvector("spark row merge")
    assert ts_rank_cd(v, to_tsquery("spark & merge")) == 0.1 / 2
    # adjacent cover: no noise
    v2 = to_tsvector("spark merge")
    assert ts_rank_cd(v2, to_tsquery("spark & merge")) == 0.1
    # missing term: no covers
    assert ts_rank_cd(v2, to_tsquery("spark & vector")) == 0.0


def test_rank_cd_greedy_cover_sequence():
    # 'spark merge spark': covers [1,2] then [2,3]
    v = to_tsvector("spark merge spark")
    assert ts_rank_cd(v, to_tsquery("spark & merge")) == pytest.approx(0.2)


def test_rank_cd_phrase_covers_are_adjacent_pairs():
    v = to_tsvector("fast table row fast row table fast table")
    assert ts_rank_cd(v, to_tsquery("fast <-> table")) == pytest.approx(0.2)
    # terms present but never adjacent -> 0
    v2 = to_tsvector("fast row table")
    assert ts_rank_cd(v2, to_tsquery("fast <-> table")) == 0.0


def test_rank_cd_extdist_normalization():
    v = to_tsvector("spark merge line row spark merge")
    q = to_tsquery("spark & merge")
    r0 = ts_rank_cd(v, q, DEF_WEIGHTS, 0)
    # greedy covers [1,2], [2,5], [5,6] (the down-scan restarts one
    # ITEM past each cover's begin, so overlapping covers emerge):
    # extents 1.5, 3.5, 5.5 -> SumDist = 1/2 + 1/2 = 1, NExtent = 3
    assert r0 == pytest.approx(0.1 + 0.1 / 3 + 0.1)
    r4 = ts_rank_cd(v, q, DEF_WEIGHTS, 4)
    assert r4 == r0 / (3.0 / 1.0)


def test_rank_cd_weighted_inverse_weight_sum():
    # all-A cover of 2 items: Cpos = 2 / (2 * (1/1.0)) = 1.0
    v = setweight(to_tsvector("spark merge"), "A")
    assert ts_rank_cd(v, to_tsquery("spark & merge")) == 1.0


# --- oracle FP-parity premises (DuckDB == Python bit-for-bit) ----------


def test_duckdb_curw_and_folds_bit_identical():
    con = duckdb.connect()
    rows = con.execute(
        "select list_transform(generate_series(1,120), d -> "
        "sqrt((0.1::DOUBLE*0.1::DOUBLE) * (case when d > 100 then 1e-30 "
        "else 1.0::DOUBLE/(1.005::DOUBLE + 0.05::DOUBLE*"
        "exp(d/1.5::DOUBLE - 2)) end)))"
    ).fetchone()[0]
    for d in range(1, 121):
        wd = 1e-30 if d > 100 else 1.0 / (1.005 + 0.05 * math.exp(d / 1.5 - 2))
        assert rows[d - 1] == math.sqrt((0.1 * 0.1) * wd)

    # list_reduce fold order == kernel's sequential 1-(1-res)(1-curw)
    rng = random.Random(3)
    vals = [rows[rng.randint(0, 99)] for _ in range(25)]
    res = vals[0]
    for v in vals[1:]:
        res = 1.0 - (1.0 - res) * (1.0 - v)
    lit = "[" + ",".join(f"CAST({v!r} AS DOUBLE)" for v in vals) + "]"
    got = con.execute(
        f"select list_reduce({lit}, (a,b) -> "
        "1.0::DOUBLE-(1.0::DOUBLE-a)*(1.0::DOUBLE-b))"
    ).fetchone()[0]
    assert got == res

    # list_sum == ascending += fold from 0.0 (H2 sums and 0.1-chains)
    for n in (1, 2, 3, 4, 7, 37, 256):
        py = 0.0
        for j in range(1, n + 1):
            py += 0.1 / (j * j)
        dd = con.execute(
            f"select list_sum(list_transform(generate_series(1,{n}),"
            " j -> 0.1::DOUBLE/(j*j)))"
        ).fetchone()[0]
        assert dd == py
        py = 0.0
        for j in range(n):
            py += 0.1
        dd = con.execute(
            f"select list_sum(list_transform(generate_series(1,{n}),"
            " j -> 0.1::DOUBLE))"
        ).fetchone()[0]
        assert dd == py


# --- prefix operands ---------------------------------------------------


def test_prefix_parse_match_and_rank():
    from pg_cjk_parser_spark.kernel.tsvector import Prefix

    q = to_tsquery("b:* & merge")
    assert tsquery_str(q) == "'b':* & 'merg'"
    # the prefix operand passes through the dictionary (stemming)
    assert tsquery_str(to_tsquery("'running':*")) == "'run':*"
    assert ts_match(to_tsvector("big merge value"), q)
    assert not ts_match(to_tsvector("value merge"), q)
    assert ts_match(to_tsvector("batch table"), to_tsquery("b:*"))

    # or-path rank: one entry per matched lexeme, divided by operand
    # count (find_wordentry's multi-entry prefix behavior)
    v = to_tsvector("big batch big table")
    h1 = ((0.1 + 0.1 / 1) - 0.1) / PI2_6
    h2 = ((0.1 + (0.1 / 1 + 0.1 / 4)) - 0.1) / PI2_6
    assert ts_rank(v, to_tsquery("b:*")) == h1 + h2
    # cover-density: each matched occurrence is a cover
    assert ts_rank_cd(v, to_tsquery("b:*")) == pytest.approx(0.3)
    assert ts_rank_cd(
        to_tsvector("big table"), to_tsquery("b:* & table")
    ) == 0.1
    # and-path with a prefix operand (calc_rank_and via
    # find_wordentry's multi-entry walk): entries iterate in sorted
    # order and each OVERWRITES the item's position slot, so 'b:*'
    # over ('batch','big') leaves 'big' [1,3] as the slot 'tabl' [4]
    # pairs against - the C quirk, mirrored
    import math as _m

    def _wd(d):
        return 1.0 / (1.005 + 0.05 * _m.exp(d / 1.5 - 2))

    c3 = _m.sqrt((0.1 * 0.1) * _wd(3))  # |4-1|
    c1 = _m.sqrt((0.1 * 0.1) * _wd(1))  # |4-3|
    assert ts_rank(v, to_tsquery("b:* & table")) == (
        1.0 - (1.0 - c3) * (1.0 - c1)
    )
    with pytest.raises(ValueError, match="phrase"):
        to_tsquery("のび太:*")  # multi-lexeme operand cannot be a prefix


# --- FTS utility functions ---------------------------------------------


def test_strip_and_stripped_matching():
    from pg_cjk_parser_spark.kernel.tsrank import strip

    v = strip(to_tsvector("fast table merge"))
    assert all(ps == [] for ps in v.values())
    assert ts_match(v, to_tsquery("fast"))
    assert ts_match(v, to_tsquery("fast & merge"))
    assert not ts_match(v, to_tsquery("fast <-> table"))  # no positions
    assert ts_rank_cd(v, to_tsquery("fast")) == 0.0


def test_setweight_selective():
    v = setweight(to_tsvector("fast table"), "A", ["tabl"])
    assert [wep_weight(x) for x in v["fast"]] == [0]
    assert [wep_weight(x) for x in v["tabl"]] == [3]


def test_ts_delete_and_filter():
    from pg_cjk_parser_spark.kernel.tsrank import ts_delete, ts_filter

    v = to_tsvector("fast table merge")
    assert set(ts_delete(v, "tabl")) == {"fast", "merg"}
    assert set(ts_delete(v, ["tabl", "merg"])) == {"fast"}
    w = setweight(v, "A", ["fast"])
    assert set(ts_filter(w, ["A"])) == {"fast"}
    assert ts_filter(w, ["A"])["fast"] == w["fast"]
    assert set(ts_filter(w, ["A", "D"])) == {"fast", "tabl", "merg"}


def test_length_and_arrays():
    from pg_cjk_parser_spark.kernel.tsrank import (
        array_to_tsvector,
        tsvector_length,
        tsvector_to_array,
    )

    v = to_tsvector("fast table fast")
    assert tsvector_length(v) == 2
    assert tsvector_to_array(v) == ["fast", "tabl"]
    back = array_to_tsvector(["xx", "yy", "xx"])
    assert set(back) == {"xx", "yy"}
    assert ts_match(back, to_tsquery("xx & yy"))


def test_numnode():
    from pg_cjk_parser_spark.kernel.tsvector import numnode

    assert numnode(to_tsquery("fast")) == 1
    assert numnode(to_tsquery("fast & table")) == 3
    assert numnode(to_tsquery("(fast | table) & !merge")) == 6
    assert numnode(to_tsquery("fast <-> table")) == 3
    assert numnode(to_tsquery("b:*")) == 1


def test_querytree():
    from pg_cjk_parser_spark.kernel.tsvector import querytree

    assert querytree(to_tsquery("fast & !table")) == "'fast'"
    assert querytree(to_tsquery("!fast")) == "T"
    assert querytree(to_tsquery("fast | !table")) == "T"
    assert querytree(to_tsquery("fast & table")) == "'fast' & 'tabl'"
    assert (
        querytree(to_tsquery("(fast & !merge) | table"))
        == "'fast' | 'tabl'"
    )


def test_tsquery_composition():
    from pg_cjk_parser_spark.kernel.tsvector import (
        tsquery_and,
        tsquery_not,
        tsquery_or,
        tsquery_phrase,
    )

    a = to_tsquery("fast")
    b = to_tsquery("table")
    assert tsquery_str(tsquery_and(a, b)) == "'fast' & 'tabl'"
    assert tsquery_str(tsquery_or(a, b)) == "'fast' | 'tabl'"
    assert tsquery_str(tsquery_not(a)) == "!'fast'"
    assert tsquery_str(tsquery_phrase(a, b)) == "'fast' <-> 'tabl'"
    assert tsquery_str(tsquery_phrase(a, b, 3)) == "'fast' <3> 'tabl'"
    # None (empty query) identities
    assert tsquery_and(None, a) is a
    assert tsquery_or(a, None) is a
    assert tsquery_not(None) is None
    # composed phrase matches like the parsed equivalent
    v = to_tsvector("fast row row table")
    assert ts_match(v, tsquery_phrase(a, b, 3))
    assert not ts_match(v, tsquery_phrase(a, b))


def test_ts_rewrite():
    from pg_cjk_parser_spark.kernel.tsvector import _qtn_key, ts_rewrite

    def eq(a, b):
        return _qtn_key(a) == _qtn_key(b)

    q = to_tsquery("xx & yy")
    # leaf substitution (PG docs: ts_rewrite('a & b', 'a', 'c'))
    assert eq(ts_rewrite(q, to_tsquery("xx"), to_tsquery("zz")),
              to_tsquery("zz & yy"))
    # commutative whole-tree match
    assert eq(ts_rewrite(q, to_tsquery("yy & xx"), to_tsquery("zz")),
              to_tsquery("zz"))
    # subset match inside a wider AND (synonym-table semantics)
    assert eq(ts_rewrite(to_tsquery("xx & yy & zz"),
                         to_tsquery("zz & xx"), to_tsquery("ww")),
              to_tsquery("yy & ww"))
    # substitution by a subtree (expansion)
    assert eq(ts_rewrite(to_tsquery("xx"), to_tsquery("xx"),
                         to_tsquery("xx | vv")),
              to_tsquery("xx | vv"))
    # no match -> unchanged
    assert eq(ts_rewrite(q, to_tsquery("vv"), to_tsquery("zz")), q)
    # phrase targets match exactly, not commutatively
    p = to_tsquery("xx <-> yy")
    assert eq(ts_rewrite(p, to_tsquery("xx <-> yy"), to_tsquery("zz")),
              to_tsquery("zz"))
    assert eq(ts_rewrite(p, to_tsquery("yy <-> xx"), to_tsquery("zz")), p)
    # rewrite under NOT
    assert eq(ts_rewrite(to_tsquery("vv & !xx"), to_tsquery("xx"),
                         to_tsquery("zz")),
              to_tsquery("vv & !zz"))


def test_maxstrlen_boundary():
    """PG parsetext drops lexemes >= MAXSTRLEN (2047 bytes): a
    2046-byte token indexes and consumes a position, a 2047-byte one
    does neither."""
    ok = "a" * 2046
    toolong = "a" * 2047
    v = to_tsvector(f"{ok} fast")
    assert ok in v and v["fast"] == [2]
    v2 = to_tsvector(f"{toolong} fast")
    assert toolong not in v2 and v2["fast"] == [1]


def test_ts_lexize():
    """PG ts_lexize: one dictionary on a bare token, no parsing."""
    import pytest as _pytest

    from pg_cjk_parser_spark.kernel.tsvector import ts_lexize

    assert ts_lexize("english_stem", "Tables") == ["tabl"]
    assert ts_lexize("pg_catalog.english_stem", "running") == ["run"]
    assert ts_lexize("english_stem", "the") == []  # stopword: empty
    assert ts_lexize("simple", "The") == ["the"]  # simple keeps it
    assert ts_lexize("simple", "Doraemnon") == ["doraemnon"]
    with _pytest.raises(ValueError, match="dictionary"):
        ts_lexize("french_stem", "table")
