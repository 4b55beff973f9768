"""PostgreSQL ``ts_rank`` / ``ts_rank_cd`` ranking, plus weighted
tsvectors (``setweight`` / ``||`` concatenation), over the kernel
tsvector produced by :mod:`.tsvector`.

The reference extension ships no ranking code of its own - a
pg_cjk_parser user ranks matches through PostgreSQL core's
``src/backend/utils/adt/tsrank.c`` (``calc_rank_or`` /
``calc_rank_and`` / ``calc_rank_cd``), fed by the reference parser's
token stream.  This module reimplements those semantics so ranked
retrieval works without a PostgreSQL instance.

Semantics notes (all mirrored by the DuckDB oracles in
``__spark_entry__``):

* Weight classes pack into the position word exactly like PG's
  ``WordEntryPos`` (2 weight bits above 14 position bits); an
  unweighted ``to_tsvector`` output is weight D.
* ``ts_rank`` routes to the AND path iff the query's top node is an
  AND or a multi-lexeme phrase, else the OR path; both iterate the
  query's *distinct* operand lexemes in sorted order (PG's
  ``SortAndUniqItems``), including lexemes under NOT (tsrank.c's
  "XXX: What about NOT?" behavior is preserved).
* ``ts_rank_cd`` enumerates minimal covers with the same greedy
  fold as tsrank.c's ``Cover()``: scan up from the current start
  until the query first matches within the seen window, scan down
  from there until it matches again, emit ``[p, q]``, restart one
  item past ``p``.  Phrase operators participate in the match, so
  covers of a phrase query are genuine phrase matches.
* One deliberate deviation: PG accumulates ranks in ``float4``;
  this implementation and its oracles use float64 throughout - the
  same algorithm with a wider accumulator.  Rank *ordering* is
  preserved; absolute values can differ from PG in the 7th+
  significant digit.
"""

from __future__ import annotations

import math

from .tsvector import And, Not, Or, Phrase, Prefix, ts_match

DEF_WEIGHTS = (0.1, 0.2, 0.4, 1.0)  # weight classes D, C, B, A

_WCLASS = {"D": 0, "C": 1, "B": 2, "A": 3}

_POSMASK = (1 << 14) - 1

# 1.64493406685 ~ pi^2/6, the limit of sum(1/j^2) (tsrank.c comment)
_PI2_6 = 1.64493406685


def wep_pos(x: int) -> int:
    return x & _POSMASK


def wep_weight(x: int) -> int:
    return (x >> 14) & 3


def setweight(
    v: dict[str, list[int]],
    label: str,
    lexemes: list[str] | None = None,
) -> dict[str, list[int]]:
    """PG ``setweight(vector, 'A'|'B'|'C'|'D' [, lexemes])``: stamp
    every position's weight class - of every lexeme, or only the
    listed ones (the selective 3-arg form)."""
    wc = _WCLASS[label.upper()] << 14
    if lexemes is None:
        return {t: [wc | wep_pos(x) for x in ps] for t, ps in v.items()}
    sel = set(lexemes)
    return {
        t: [wc | wep_pos(x) for x in ps] if t in sel else list(ps)
        for t, ps in v.items()
    }


def strip(v: dict[str, list[int]]) -> dict[str, list[int]]:
    """PG ``strip(tsvector)``: drop all positions/weights.  A
    stripped entry still matches plain lexeme queries but never
    phrases, and ranks as if absent (PG POSNULL aside - tsrank's
    stripped-entry pseudo-position is not reproduced; rank stripped
    vectors at 0)."""
    return {t: [] for t in v}


def tsvector_length(v: dict[str, list[int]]) -> int:
    """PG ``length(tsvector)``: number of distinct lexemes."""
    return len(v)


def ts_delete(
    v: dict[str, list[int]], lexemes: str | list[str]
) -> dict[str, list[int]]:
    """PG ``ts_delete(vector, lexeme | lexemes[])``."""
    sel = {lexemes} if isinstance(lexemes, str) else set(lexemes)
    return {t: list(ps) for t, ps in v.items() if t not in sel}


def ts_filter(
    v: dict[str, list[int]], weights: list[str]
) -> dict[str, list[int]]:
    """PG ``ts_filter(vector, weights)``: keep only positions whose
    weight class is listed; lexemes left with no positions drop out."""
    keep = {_WCLASS[w.upper()] for w in weights}
    out = {}
    for t, ps in v.items():
        kept = [x for x in ps if wep_weight(x) in keep]
        if kept:
            out[t] = kept
    return out


def tsvector_to_array(v: dict[str, list[int]]) -> list[str]:
    """PG ``tsvector_to_array``: sorted distinct lexemes."""
    return sorted(v)


def array_to_tsvector(lexemes: list[str]) -> dict[str, list[int]]:
    """PG ``array_to_tsvector``: position-less entries."""
    return {t: [] for t in set(lexemes)}


def strip_weights(v: dict[str, list[int]]) -> dict[str, list[int]]:
    """Drop weight bits (positions only), e.g. to feed ``ts_match``."""
    return {t: [wep_pos(x) for x in ps] for t, ps in v.items()}


def tsvector_maxpos(v: dict[str, list[int]]) -> int:
    return max((wep_pos(x) for ps in v.values() for x in ps), default=0)


def tsvector_concat(
    a: dict[str, list[int]], b: dict[str, list[int]], max_npos: int = 256
) -> dict[str, list[int]]:
    """PG ``tsvector || tsvector``: positions of the second operand
    are shifted by the largest *stored* position of the first (so a
    trailing stopword in the first operand, which stores nothing,
    does not widen the gap), per-lexeme lists concatenated and capped
    at ``MAXNUMPOS``."""
    shift = tsvector_maxpos(a)
    out = {t: list(ps) for t, ps in a.items()}
    for t, ps in b.items():
        lst = out.setdefault(t, [])
        for x in ps:
            p = wep_pos(x) + shift
            if p > _POSMASK:
                p = _POSMASK
            lst.append((x & ~_POSMASK) | p)
    return {t: ps[:max_npos] for t, ps in out.items()}


def cnt_length(v: dict[str, list[int]]) -> int:
    """tsrank.c ``cnt_length``: total lexeme occurrences."""
    return sum(len(ps) for ps in v.values())


def _operands(node) -> list[tuple[str, bool]]:
    """Distinct (operand_text, is_prefix) in sorted order
    (SortAndUniqItems), including operands under NOT."""
    out: set[tuple[str, bool]] = set()

    def walk(n):
        if n is None:
            return
        if isinstance(n, Phrase):
            out.update((t, False) for t, _ in n.items)
        elif isinstance(n, Prefix):
            out.add((n.term, True))
        elif isinstance(n, (And, Or)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Not):
            walk(n.child)

    walk(node)
    return sorted(out)


def _operand_lexemes(node) -> list[str]:
    """Distinct exact operand lexemes in sorted order (prefix
    operands excluded - expand them first on the index path)."""
    return [t for t, pre in _operands(node) if not pre]


def _matching_lexemes(v, op: str, pre: bool) -> list[str]:
    """tsvector entries matched by one operand, in entry (sorted
    lexeme) order - PG find_wordentry, incl. its prefix variant."""
    if not pre:
        return [op] if op in v else []
    return sorted(t for t in v if t.startswith(op))


def _rank_or(weights, v, operands) -> float:
    res = 0.0
    for op, pre in operands:
        for t in _matching_lexemes(v, op, pre):
            ps = v[t]
            resj = 0.0
            wjm = -1.0
            jm = 0
            for j, x in enumerate(ps):
                w = weights[wep_weight(x)]
                resj = resj + w / ((j + 1) * (j + 1))
                if w > wjm:
                    wjm = w
                    jm = j
            res = res + (wjm + resj - wjm / ((jm + 1) * (jm + 1))) / _PI2_6
    if operands:
        res = res / len(operands)
    return res


def _word_distance(d: int) -> float:
    if d > 100:
        return 1e-30
    return 1.0 / (1.005 + 0.05 * math.exp(d / 1.5 - 2))


def _rank_and(weights, v, operands) -> float:
    """tsrank.c ``calc_rank_and`` over (text, is_prefix) operands.

    A prefix operand walks every matched entry (find_wordentry's
    multi-entry return): each entry's positions pair against the
    LAST-SET position list of every earlier item - pos[k] is
    overwritten per entry in C, so an earlier prefix item's slot ends
    up holding its final matched entry; that quirk is mirrored, not
    corrected.  Entries with no stored positions are skipped (this
    module's documented stripped-vector deviation from POSNULL)."""
    res = -1.0
    pos: list[list[int] | None] = [None] * len(operands)
    for i, (op, pre) in enumerate(operands):
        for t in _matching_lexemes(v, op, pre):
            post = v[t]
            if not post:
                continue
            pos[i] = post
            for k in range(i):
                ct = pos[k]
                if not ct:
                    continue
                for xl in post:
                    pl = wep_pos(xl)
                    for xp in ct:
                        pp = wep_pos(xp)
                        dist = abs(pl - pp)
                        if dist:
                            curw = math.sqrt(
                                (
                                    weights[wep_weight(xl)]
                                    * weights[wep_weight(xp)]
                                )
                                * _word_distance(dist)
                            )
                            res = (
                                curw
                                if res < 0
                                else 1.0 - (1.0 - res) * (1.0 - curw)
                            )
    return res


def ts_rank(
    v: dict[str, list[int]],
    node,
    weights: tuple[float, float, float, float] = DEF_WEIGHTS,
    method: int = 0,
) -> float:
    """PG ``ts_rank([weights], vector, query [, normalization])``."""
    if not v or node is None:
        return 0.0
    ops = _operands(node)
    if not ops:
        return 0.0
    and_path = isinstance(node, And) or (
        isinstance(node, Phrase) and len(node.items) > 1
    )
    if and_path and len(ops) >= 2:
        res = _rank_and(weights, v, ops)
    else:
        res = _rank_or(weights, v, ops)
    if res < 0:
        res = 1e-20
    size = len(v)
    if (method & 1) and size > 0:
        res /= math.log(cnt_length(v) + 1) / math.log(2.0)
    if method & 2:
        ln = cnt_length(v)
        if ln > 0:
            res /= float(ln)
    if (method & 8) and size > 0:
        res /= float(size)
    if (method & 16) and size > 0:
        res /= math.log(size + 1) / math.log(2.0)
    if method & 32:
        res /= res + 1
    return res


def _docrep(v, operands):
    """tsrank.c ``get_docrep``: one item per (position of a lexeme
    matched by some operand, incl. prefix matches), sorted by
    position: (pos, lexeme, weight_class)."""
    seen: set[str] = set()
    for op, pre in operands:
        seen.update(_matching_lexemes(v, op, pre))
    items = []
    for t in seen:
        for x in v[t]:
            items.append((wep_pos(x), t, wep_weight(x)))
    items.sort()
    return items


def _restricted_match(items, lo, hi, node) -> bool:
    sub: dict[str, list[int]] = {}
    for p, t, _ in items[lo : hi + 1]:
        sub.setdefault(t, []).append(p)
    return ts_match(sub, node)


def _covers(items, node):
    """Greedy minimal-cover enumeration (tsrank.c ``Cover``): yields
    (begin_idx, end_idx) into ``items``."""
    n = len(items)
    i0 = 0
    while i0 < n:
        q_idx = -1
        for j in range(i0, n):
            if _restricted_match(items, i0, j, node):
                q_idx = j
                break
        if q_idx < 0:
            return
        p_idx = -1
        for k in range(q_idx, i0 - 1, -1):
            if _restricted_match(items, k, q_idx, node):
                p_idx = k
                break
        yield p_idx, q_idx
        i0 = p_idx + 1


def ts_rank_cd(
    v: dict[str, list[int]],
    node,
    weights: tuple[float, float, float, float] = DEF_WEIGHTS,
    method: int = 0,
) -> float:
    """PG ``ts_rank_cd([weights], vector, query [, normalization])``
    - cover-density ranking.  Note the PG quirk that normalization
    bit 1 divides by the *natural* log here (tsrank.c calc_rank_cd)
    while ``ts_rank`` divides by log2; both are reproduced."""
    if not v or node is None:
        return 0.0
    items = _docrep(v, _operands(node))
    if not items:
        return 0.0
    # PG accepts weight 0.0 (C: 1.0f/0.0f = inf -> zero Cpos share)
    invws = [1.0 / w if w > 0 else float("inf") for w in weights]
    wdoc = 0.0
    sum_dist = 0.0
    prev_ext = 0.0
    n_extent = 0
    for b, e in _covers(items, node):
        inv_sum = 0.0
        for _, _, wc in items[b : e + 1]:
            inv_sum += invws[wc]
        cpos = float(e - b + 1) / inv_sum
        p = items[b][0]
        q = items[e][0]
        n_noise = (q - p) - (e - b)
        if n_noise < 0:
            n_noise = (e - b) // 2
        wdoc += cpos / float(1 + n_noise)
        cur_ext = (q + p) / 2.0
        if n_extent > 0 and cur_ext > prev_ext:
            sum_dist += 1.0 / (cur_ext - prev_ext)
        prev_ext = cur_ext
        n_extent += 1
    size = len(v)
    if (method & 1) and size > 0:
        wdoc /= math.log(cnt_length(v) + 1)
    if method & 2:
        ln = cnt_length(v)
        if ln > 0:
            wdoc /= float(ln)
    if (method & 4) and n_extent > 0 and sum_dist > 0:
        wdoc /= float(n_extent) / sum_dist
    if (method & 8) and size > 0:
        wdoc /= float(size)
    if (method & 16) and size > 0:
        wdoc /= math.log(size + 1) / math.log(2.0)
    if method & 32:
        wdoc /= wdoc + 1
    return wdoc
