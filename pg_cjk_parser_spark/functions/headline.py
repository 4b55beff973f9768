"""ts_headline: query-aware snippet selection + highlighting.

Reimplements the reference's headline generator semantics
(/root/reference/pg_cjk_parser.c:2399-2956): cover search (hlCover),
best-cover selection with short-word/end-token rules (mark_hl_words,
:2722-2866), multi-fragment selection (mark_hl_fragments, :2551-2720),
default options MaxWords=35 MinWords=15 ShortWord=3 MaxFragments=0
StartSel=<b> StopSel=</b> FragmentDelimiter=" ... " (:2876-2950), and
the token-class behavior macros (:2325-2334): blanks don't count
toward word budgets, tags are replaced by a space, url/hword
composites are skipped in output.

Simplification vs PG internals: a word links to at most one query
term (PG duplicates words matching several operands with a
``repeated`` flag; tsquery operand dedup makes that unreachable for
our query trees).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..kernel.fsm import (
    ASCIIHWORD,
    DECIMAL_T,
    HWORD,
    NUMHWORD,
    PROTOCOL,
    SCIENTIFIC,
    SIGNEDINT,
    SPACE_T,
    TAG_T,
    UNSIGNEDINT,
    URL_T,
    VERSIONNUMBER,
    XMLENTITY,
)
from ..kernel.tokenizer import tokenize
from ..kernel.tsvector import (
    And,
    Not,
    Or,
    Phrase,
    Prefix,
    lexize,
    plainto_tsquery,
    to_tsquery,
    ts_match,
    websearch_to_tsquery,
)


def _nonword(t: int) -> bool:
    return t in (SPACE_T, TAG_T, URL_T, NUMHWORD, ASCIIHWORD, HWORD)


def _noend(t: int) -> bool:
    return _nonword(t) or t in (
        SCIENTIFIC, VERSIONNUMBER, DECIMAL_T, SIGNEDINT, UNSIGNEDINT,
        PROTOCOL, XMLENTITY,
    )


@dataclass
class _Word:
    text: str
    type: int
    len: int
    item: str | None = None
    pos: int = 0
    selected: bool = False
    in_: bool = False
    replace: bool = False
    skip: bool = False
    repeated: bool = False


def _query_operands(tree) -> list[tuple[str, bool]]:
    """Sorted (operand_text, is_prefix) pairs over ALL operands -
    including negated ones, like PG's hlfinditem item marking: a
    negated term's occurrences get items too, so hlCover's
    per-operand scans see them and the TS_execute window recheck can
    REJECT windows that contain them (a 'foo & !bar' cover must not
    hold a bar)."""
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

    walk(tree)
    return sorted(out)


def _op_match(item: str | None, op: tuple[str, bool]) -> bool:
    if item is None:
        return False
    text, pre = op
    return item.startswith(text) if pre else item == text


def _build_words(text: str, operands: list[tuple[str, bool]]) -> list[_Word]:
    words = []
    pos = 0
    for start, ln, tt in tokenize(text):
        w = _Word(text[start : start + ln], tt, ln)
        lex = lexize(w.text, tt)
        if lex is not None:
            pos += 1
            w.pos = pos
            for term in lex:
                if any(_op_match(term, op) for op in operands):
                    w.item = term
                    break
        words.append(w)
    return words


def _window_match(words, p, q, tree) -> bool:
    v: dict[str, list[int]] = {}
    for w in words[p : q + 1]:
        if w.item is not None:
            v.setdefault(w.item, []).append(w.pos)
    return ts_match(v, tree)


def _hl_cover(words, tree, terms, p0):
    """Find the next minimal window [p,q] >= p0 containing the query
    (reference hlCover, pg_cjk_parser.c:2399-2468)."""
    n = len(words)
    pos = p0
    while True:
        q = -1
        for op in terms:
            for i in range(pos, n):
                if _op_match(words[i].item, op):
                    if i > q:
                        q = i
                    break
        if q < 0:
            return None
        p = n
        for op in terms:
            for i in range(q, pos - 1, -1):
                if _op_match(words[i].item, op):
                    if i < p:
                        p = i
                    break
        if p <= q:
            if _window_match(words, p, q, tree):
                return p, q
            pos = p + 1
        else:
            return None


def _mark(words, i_from, i_to, highlight: bool):
    for i in range(i_from, i_to + 1):
        w = words[i]
        if w.item:
            w.selected = True
        if not highlight:
            if w.type == TAG_T:
                w.replace = True
            elif w.type in (URL_T, NUMHWORD, ASCIIHWORD, HWORD):
                w.skip = True
        else:
            if w.type in (URL_T, NUMHWORD, ASCIIHWORD, HWORD):
                w.skip = True
        w.in_ = not w.repeated


def _mark_hl_words(words, tree, terms, highlight, shortword, min_words, max_words):
    """reference mark_hl_words (pg_cjk_parser.c:2722-2866)."""
    n = len(words)
    bestb = beste = -1
    bestlen = -1
    pose = 0
    p = 0
    if not highlight:
        while True:
            cov = _hl_cover(words, tree, terms, p)
            if cov is None:
                break
            p, q = cov
            curlen = 0
            poslen = 0
            i = p
            while i <= q and curlen < max_words:
                if not _nonword(words[i].type):
                    curlen += 1
                if words[i].item and not words[i].repeated:
                    poslen += 1
                pose = i
                i += 1

            if poslen < bestlen and not (
                _noend(words[beste].type) or words[beste].len <= shortword
            ):
                p += 1
                continue

            posb = p
            if curlen < max_words:
                i -= 1
                while i < n and curlen < max_words:
                    if i != q:
                        if not _nonword(words[i].type):
                            curlen += 1
                        if words[i].item and not words[i].repeated:
                            poslen += 1
                    pose = i
                    if not (
                        _noend(words[i].type) or words[i].len <= shortword
                    ):
                        if curlen >= min_words:
                            break
                    i += 1
                if curlen < min_words and i >= n:
                    i = p - 1
                    while i >= 0:
                        if not _nonword(words[i].type):
                            curlen += 1
                        if words[i].item and not words[i].repeated:
                            poslen += 1
                        if curlen >= max_words:
                            break
                        if not (
                            _noend(words[i].type)
                            or words[i].len <= shortword
                        ):
                            if curlen >= min_words:
                                break
                        i -= 1
                    posb = i if i >= 0 else 0
            else:
                if i > q:
                    i = q
                while curlen > min_words:
                    if not _nonword(words[i].type):
                        curlen -= 1
                    if words[i].item and not words[i].repeated:
                        poslen -= 1
                    pose = i
                    i -= 1
                    if not (
                        _noend(words[i + 1].type)
                        or words[i + 1].len <= shortword
                    ):
                        break

            pose_ok = not (
                _noend(words[pose].type) or words[pose].len <= shortword
            )
            beste_bad = beste < 0 or (
                _noend(words[beste].type) or words[beste].len <= shortword
            )
            if (
                bestlen < 0
                or (poslen > bestlen and pose_ok)
                or (bestlen >= 0 and pose_ok and beste_bad)
            ):
                bestb = posb
                beste = pose
                bestlen = poslen
            p += 1

        if bestlen < 0:
            curlen = 0
            pose = 0
            i = 0
            while i < n and curlen < min_words:
                if not _nonword(words[i].type):
                    curlen += 1
                pose = i
                i += 1
            bestb = 0
            beste = pose
    else:
        bestb = 0
        beste = n - 1
    if n:
        _mark(words, bestb, max(beste, 0), highlight)


def _mark_hl_fragments(
    words, tree, terms, highlight, shortword, min_words, max_words, max_fragments
):
    """reference mark_hl_fragments (pg_cjk_parser.c:2551-2720)."""
    n = len(words)
    covers = []  # [startpos, endpos, poslen, curlen, in, excluded]
    p = 0
    while True:
        cov = _hl_cover(words, tree, terms, p)
        if cov is None:
            break
        p, q = cov
        startpos, endpos = p, q
        while startpos <= endpos:
            startpos, e2, curlen, poslen = _next_fragment(
                words, startpos, endpos, max_words
            )
            covers.append([startpos, e2, poslen, curlen, False, False])
            startpos = e2 + 1
            endpos = q
        p += 1

    num_f = 0
    for _ in range(max_fragments):
        maxitems = 0
        minwords = 1 << 31
        min_i = -1
        for i, c in enumerate(covers):
            if not c[4] and not c[5] and (
                maxitems < c[2] or (maxitems == c[2] and minwords > c[3])
            ):
                maxitems = c[2]
                minwords = c[3]
                min_i = i
        if min_i < 0:
            break
        c = covers[min_i]
        c[4] = True
        startpos, endpos, curlen = c[0], c[1], c[3]
        if curlen < max_words:
            maxstretch = (max_words - curlen) // 2
            stretch = 0
            posmarker = startpos
            i = startpos - 1
            while i >= 0 and stretch < maxstretch and not words[i].in_:
                if not _nonword(words[i].type):
                    curlen += 1
                    stretch += 1
                posmarker = i
                i -= 1
            i = posmarker
            while i < startpos and (
                _noend(words[i].type) or words[i].len <= shortword
            ):
                if not _nonword(words[i].type):
                    curlen -= 1
                i += 1
            startpos = i
            posmarker = endpos
            i = endpos + 1
            while i < n and curlen < max_words and not words[i].in_:
                if not _nonword(words[i].type):
                    curlen += 1
                posmarker = i
                i += 1
            i = posmarker
            while i > endpos and (
                _noend(words[i].type) or words[i].len <= shortword
            ):
                if not _nonword(words[i].type):
                    curlen -= 1
                i -= 1
            endpos = i
        c[0], c[1], c[3] = startpos, endpos, curlen
        _mark(words, startpos, endpos, highlight)
        num_f += 1
        for i, o in enumerate(covers):
            if i != min_i and (
                (c[0] <= o[0] <= c[1]) or (c[0] <= o[1] <= c[1])
            ):
                o[5] = True

    if num_f <= 0:
        curlen = 0
        endpos = 0
        i = 0
        while i < n and curlen < min_words:
            if not _nonword(words[i].type):
                curlen += 1
            endpos = i
            i += 1
        if n:
            _mark(words, 0, endpos, highlight)


def _next_fragment(words, startpos, endpos, max_words):
    """reference get_next_fragment (pg_cjk_parser.c:2506-2549)."""
    for i in range(startpos, endpos + 1):
        startpos = i
        if words[i].item and not words[i].repeated:
            break
    curlen = 0
    poslen = 0
    i = startpos
    while i <= endpos and curlen < max_words:
        if not _nonword(words[i].type):
            curlen += 1
        if words[i].item and not words[i].repeated:
            poslen += 1
        i += 1
    if endpos > i:
        endpos = i
        for i in range(endpos, startpos - 1, -1):
            endpos = i
            if words[i].item and not words[i].repeated:
                break
            if not _nonword(words[i].type):
                curlen -= 1
    return startpos, endpos, curlen, poslen


def parse_headline_query(query: str, mode: str = "plain"):
    """Parse a headline query once (driver side) for reuse across
    many documents: returns the (tree, operands) pair ``headline``
    otherwise rebuilds per call."""
    if mode == "tsquery":
        tree = to_tsquery(query)
    elif mode == "websearch":
        tree = websearch_to_tsquery(query)
    else:
        tree = plainto_tsquery(query)
    return tree, _query_operands(tree)


def headline(
    text: str,
    query: str,
    *,
    mode: str = "plain",
    max_words: int = 35,
    min_words: int = 15,
    short_word: int = 3,
    max_fragments: int = 0,
    start_sel: str = "<b>",
    stop_sel: str = "</b>",
    fragment_delimiter: str = " ... ",
    highlight_all: bool = False,
    parsed=None,
) -> str:
    if not highlight_all:
        if min_words >= max_words:
            raise ValueError("MinWords should be less than MaxWords")
        if min_words <= 0:
            raise ValueError("MinWords should be positive")
        if short_word < 0:
            raise ValueError("ShortWord should be >= 0")
        if max_fragments < 0:
            raise ValueError("MaxFragments should be >= 0")
    if parsed is None:
        parsed = parse_headline_query(query, mode)
    tree, terms = parsed
    words = _build_words(text, terms)
    if max_fragments == 0:
        _mark_hl_words(
            words, tree, terms, highlight_all, short_word, min_words, max_words
        )
    else:
        _mark_hl_fragments(
            words, tree, terms, highlight_all, short_word, min_words,
            max_words, max_fragments,
        )
    return _render(words, start_sel, stop_sel, fragment_delimiter)


def _render(words, start_sel, stop_sel, frag_delim) -> str:
    out: list[str] = []
    infrag = False
    first = True
    insel = False
    for w in words:
        if w.in_:
            if not infrag:
                infrag = True
                if not first:
                    out.append(frag_delim)
                first = False
            if w.selected and not insel:
                out.append(start_sel)
                insel = True
            elif not w.selected and insel:
                out.append(stop_sel)
                insel = False
            if w.replace:
                out.append(" ")
            elif not w.skip:
                out.append(w.text)
        else:
            if insel:
                out.append(stop_sel)
                insel = False
            infrag = False
    if insel:
        out.append(stop_sel)
    return "".join(out)
