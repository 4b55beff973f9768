"""Hybrid tokenizer: vectorized fast path + exact-FSM fallback.

The FSM in :mod:`fsm` is the semantics oracle (reference parity).  This
module adds a fast path that handles the overwhelmingly common cases of
web text with C-speed primitives and falls back to the FSM for anything
that could behave differently:

* **CJK runs** - a maximal run of CJK characters is widened to
  overlapping 2-grams / unigrams / swallowed blanks with NumPy, which
  is exactly the per-char FSM outcome because ``TPS_InCJK`` consumes
  one char at a time from ``TPS_Base`` and the widening decision only
  depends on the previous/next code point.
* **Safe ASCII words** - ``[A-Za-z]+`` followed by a character that
  unconditionally ends ``TPS_InAsciiWord`` (no '.', '-', '_', '@',
  ':', '/', digit, letter, or non-ASCII follows).
* **Safe unsigned ints** - same idea for ``TPS_InUnsignedInt``.
* **Blank runs** - characters that reach ``TPS_InSpace`` from
  ``TPS_Base`` and the chars that keep it there.

Everything else (tags, URLs, emails, numbers with dots, hyphenated
words, entities, files, special chars, <script> ignore regions) runs
through the exact FSM until it re-synchronises at ``TPS_Base`` with an
empty stack and clear flags.  Differential tests assert hybrid == FSM.
"""

from __future__ import annotations

import re

import numpy as np

from .charclass import (
    ALNUM,
    ALPHA,
    BAND2,
    CJK,
    CJK_EXT,
    CLS,
    DIGIT,
    MAX_CP,
    SPACE,
    SPECIAL,
    UNIPUNCT,
    URLCHAR,
    ZEROW,
)
from .fsm import CLS_LIST
from .fsm import (
    ASCIIHWORD,
    ASCIIPARTHWORD,
    ASCIIWORD,
    CJK_CHAR,
    DECIMAL_T,
    EMAIL,
    FILEPATH,
    HOST,
    PROTOCOL,
    SCIENTIFIC,
    SPACE_T,
    TAG_T,
    TPS_Base,
    UNSIGNEDINT,
    URL_T,
    URLPATH,
    VERSIONNUMBER,
    WORD_T,
    XMLENTITY,
    Parser,
    parse_fsm,
)
from .stem import stem
from .stopwords import ENGLISH_STOPWORDS

MAXENTRYPOS = (1 << 14) - 1
MAXNUMPOS = 256


def _ranges_to_class(mask: np.ndarray) -> str:
    """Compress a boolean code-point mask into a regex char class body."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return ""
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([idx[0]], idx[breaks + 1]))
    ends = np.concatenate((idx[breaks], [idx[-1]]))
    parts = []
    for a, b in zip(starts.tolist(), ends.tolist()):
        if a == b:
            parts.append(re.escape(chr(a)))
        else:
            parts.append(f"{re.escape(chr(a))}-{re.escape(chr(b))}")
    return "".join(parts)


def _build_master() -> tuple[re.Pattern, re.Pattern]:
    cjk_mask = (CLS & CJK) != 0
    # exclude surrogate range from regex classes
    cjk_mask[0xD800:0xE000] = False
    cjk_cls = _ranges_to_class(cjk_mask)

    ascii_cp = np.arange(128)
    alnum = (CLS[:128] & ALNUM) != 0
    # chars that unconditionally end TPS_InAsciiWord
    term_w = ~alnum.copy()
    for ch in "._@:/-":
        term_w[ord(ch)] = False
    # chars that unconditionally end TPS_InUnsignedInt (':' ends it too)
    term_u = ~alnum.copy()
    for ch in "._@/-":
        term_u[ord(ch)] = False
    # blank continuation: stays in TPS_InSpace
    bl_cont = ~alnum.copy()
    for ch in "<-+&/":
        bl_cont[ord(ch)] = False
    # blank start: reaches TPS_InSpace from TPS_Base
    bl_start = bl_cont.copy()
    for ch in "~.":
        bl_start[ord(ch)] = False

    def cls128(mask):
        full = np.zeros(MAX_CP, dtype=bool)
        full[:128] = mask
        return _ranges_to_class(full)

    tw = cls128(term_w) + cjk_cls
    tu = cls128(term_u) + cjk_cls
    bs = cls128(bl_start)
    bc = cls128(bl_cont)
    # Sentence punctuation after words/numbers is safe when the char
    # after it cannot resurrect a host/file/decimal/protocol parse:
    #   word.  -> ends the word unless [0-9A-Za-z_] follows the dot
    #            (InHostFirstDomain continues on [0-9A-Za-z],
    #             InFileNext on [0-9A-Za-z_])
    #   word:  -> ends the word unless '//' follows (InProtocolFirst)
    #   123.   -> ends the uint unless [0-9A-Za-z] follows
    #            (InHostFirstDomain / InUDecimalFirst)
    # A '.' at Base falls through to a blank unless [./] follows
    # (InPathFirstFirst), and never yields a trailing token at EOF.
    wdot = r"\.(?![0-9A-Za-z_])|:(?!//)"
    udot = r"\.(?![0-9A-Za-z])"

    # --- single-token patterns with FSM-derived guards ----------------
    # host (wparser InHost* states): dot-separated labels of
    # [0-9A-Za-z] with -/_ only before another alnum; the FINAL label
    # must be pure ASCII letters (>=2) - a digit/-/_ there sends the
    # FSM to InHost, which never bingos (probed: x.ab3cd/x.c-om ->
    # file, x.ab-cd -> host "x.ab").  Terminator must not continue a
    # label, start a port (:), URL (/), or email (@).
    lab = r"[0-9A-Za-z](?:[0-9A-Za-z]|[-_][0-9A-Za-z])*"
    # a leading complete DOTLESS scientific float preempts the whole
    # host/email/url family in the FSM ('3e5.co' -> sfloat + blank +
    # word, '3e5@x.co' -> sfloat + blank + host, 'http://3e5.co/x' ->
    # protocol + sfloat + file), while the dotted mantissa form does
    # not ('1.2e5.co' IS a host) - probed against parse_fsm
    sfg = r"(?!\d+[eE][+-]?\d+)"
    host = rf"(?P<h>{sfg}(?:{lab}\.)+[A-Za-z]{{2,}})(?![0-9A-Za-z:\-_.@/])"
    # numeric family (InUDecimal/InVersion/InMantissa): terminator may
    # not resurrect a host (In{AsciiWord,Host} on [0-9A-Za-z@._-]) -
    # 1.2e5.com is a host, 1e5x is sfloat+word but falls back here
    num_term = r"(?![0-9A-Za-z@._-])"
    sfl = rf"(?P<e>\d+(?:\.\d+)?[eE][+-]?\d+){num_term}"
    ver = rf"(?P<v>\d+(?:\.\d+){{2,}}){num_term}"
    flt = rf"(?P<f>\d+\.\d+){num_term}"
    # XML entity: self-delimiting (InXMLEntityEnd bingos on any char);
    # rarer [:_.-] name chars fall back to the FSM
    ent = r"(?P<x>&(?:[A-Za-z][0-9A-Za-z]*|#[0-9]+|#[xX][0-9A-Fa-f]+);)"
    # non-ASCII word (InWord): starts at a non-ASCII non-CJK alpha,
    # continues over alpha/special (CJK-flagged chars bingo InWord, so
    # they terminate); a following digit (-> numword) or '-' (-> hword)
    # falls back
    alpha_m = (CLS & ALPHA) != 0
    special_m = (CLS & SPECIAL) != 0
    cjk_m = (CLS & CJK) != 0
    wstart = alpha_m & ~cjk_m
    wstart[:128] = False  # ASCII letters dispatch to InAsciiWord
    wstart[0xD800:0xE000] = False
    wcont = (alpha_m | special_m) & ~cjk_m
    wcont[0xD800:0xE000] = False
    wterm = wcont | ((CLS & DIGIT) != 0)
    wterm[ord("-")] = True
    ws_c = _ranges_to_class(wstart)
    wc_c = _ranges_to_class(wcont)
    wx_c = _ranges_to_class(wterm)
    word = rf"(?P<n>[{ws_c}][{wc_c}]*)(?![{wx_c}])"

    # --- multi-token / rarer families (checked last) -------------------
    # email (InEmail): local part reachable via InAsciiWord / InNum-
    # Word / InHost / InHostDomain ('@' pushes InEmail from each), so
    # alnum runs joined by single [._-]; the host side is the T_HOST
    # sub-parse = the same host grammar as the 'h' group.  Terminator
    # guard as for hosts; ':' (port) and '/' (URL) fall back.
    host_term = r"(?![0-9A-Za-z:\-_.@/])"
    local = r"[0-9A-Za-z]+(?:[._-][0-9A-Za-z]+)*"
    # sfg twice: the preemption bites at any base-state start, which
    # includes the host side right after '@' ('o@3e5.xy' is word +
    # blank + sfloat + ..., not an email) but NOT interior labels
    # ('a@x.3e5.co' IS an email) - probed against parse_fsm
    email = rf"(?P<E>{sfg}{local}@{sfg}(?:{lab}\.)+[A-Za-z]{{2,}}){host_term}"

    # URL (InFURL/InURLPath): host followed by '/' starts the
    # T_URLPATH sub-parse, which consumes the maximal URLCHAR run from
    # the '/' and re-emits host + url_path under the url token
    # (S_FURL rewind).  Protocol prefix (InProtocol*) is '<letters>://'.
    urlchar_m = (CLS & URLCHAR) != 0
    urlchar_m[0xD800:0xE000] = False
    uc_c = _ranges_to_class(urlchar_m)
    hostpat = rf"(?:{lab}\.)+[A-Za-z]{{2,}}"
    urlp = (
        rf"(?P<F>[A-Za-z]+://){sfg}(?P<H>{hostpat})"
        rf"(?:(?P<U>/[{uc_c}]+)|{host_term})"
    )
    urlb = rf"(?P<G>{sfg}{hostpat})(?P<V>/[{uc_c}]+)"

    # file (InFile*): '/'-led segments of [0-9A-Za-z_-] with interior
    # dots only before another segment char (InFileNext pops
    # otherwise).  Trailing '/' or '.' falls back; terminator must not
    # continue a segment.
    seg = r"[0-9A-Za-z_][0-9A-Za-z_\-]*(?:\.[0-9A-Za-z_][0-9A-Za-z_\-]*)*"
    filep = rf"(?P<Z>/{seg}(?:/{seg})*)(?![0-9A-Za-z_./\-])"

    # pure-ASCII hyphenated word (InHyphenAsciiWord): letters-only
    # parts joined by single hyphens.  The terminator may not extend a
    # part (alnum / non-ASCII alpha / special -> InHyphenWord), resume
    # the parallel InHost branch ('.', '_', '-', '@' -> host/email
    # family), or look like a path (':', '/') - all of those make the
    # backtracking FSM pick a different parse.
    hg = alpha_m | special_m | ((CLS & DIGIT) != 0)
    hg = hg.copy()
    hg[0xD800:0xE000] = False
    for ch in "@._:/-":
        hg[ord(ch)] = True
    hg_c = _ranges_to_class(hg)
    hword = rf"(?P<Y>[A-Za-z]+(?:-[A-Za-z]+)+)(?![{hg_c}])"

    # hyphenated word with a trailing pure-digit part ('foo-bar-1'):
    # the FSM backtracks to the letters-only asciihword, re-emits its
    # parts, then parses '-' as blank and the digits as a standalone
    # uint (verified against parse_fsm for every terminator admitted
    # here).  The terminator guard is conservative: whitespace, EOS,
    # or '.' followed by nothing that could resume a parse through the
    # dot (.digit -> float; .alnum -> the whole prefix re-parses as a
    # HOST like 'foo-bar-1.ab'; '.', '_', '-' keep ambiguity) - any
    # shape where the digits could extend (letter -> numpart, '-',
    # ':', '/', '@', '_') still falls back wholesale.
    numh = (
        r"(?P<N>[A-Za-z]+(?:-[A-Za-z]+)+)-(?P<M>[0-9]+)"
        r"(?=\s|\.(?![0-9A-Za-z._\-])|\Z)"
    )
    # a lone sentence-final '.' at end of input: the generic blank
    # branch refuses '.$' (mid-string '. ' runs merge into one blank),
    # so without this the most common ASCII sentence ending pays a
    # full FSM fallback; the FSM emits exactly one 1-char blank.
    eosdot = r"(?P<D>\.)\Z"

    # HTML tag (InTagFirst/InTagName/InTag/InTagEscape*): the dominant
    # token class of raw HTML, which otherwise pays a full FSM
    # fallback PER TAG (measured ~4.7x slower tokenization on web
    # pages).  Shapes mirrored exactly from the FSM tables:
    #   <name>      name = [A-Za-z:_][0-9A-Za-z:_.-]*  (open)
    #   </name>     close names start with a letter
    #   <name/>     InTagBeginEnd: '/' must be followed by '>'
    #   <name SP body>   InTag body: the listed ASCII chars, spaces,
    #                    and '...'/"..." strings with backslash escapes
    # Everything else with '<' (comments, DOCTYPE, <?xml, non-ASCII
    # name/body chars, unterminated tags) falls back to the FSM.
    # Opening <script/<style tags are EXCLUDED (negative lookahead):
    # their S_TAGS special flips the parser's ignore mode, which only
    # the FSM path maintains; closing tags only clear an already-clear
    # flag here, so they may match.  (The S_TAGS check compares the
    # exact prefixes '<script'/'<style' before a space or '>', so the
    # guard mirrors that shape - <scripts> or <script/> never ignore.)
    spc_m = (CLS & SPACE) != 0
    spc_m = spc_m.copy()
    spc_m[0xD800:0xE000] = False
    spc_c = _ranges_to_class(spc_m)
    q1 = r"'(?:\\[\s\S]|[^'\\])*'"
    q2 = r'"(?:\\[\s\S]|[^"\\])*"'
    tbody = rf"(?:[0-9A-Za-z=\-_#/:.&?%~{spc_c}]|{q1}|{q2})*"
    tguard = (
        rf"(?!(?:[sS][cC][rR][iI][pP][tT]|[sS][tT][yY][lL][eE])[{spc_c}>])"
    )
    tag = (
        rf"(?P<T><(?:/[A-Za-z]|{tguard}[A-Za-z:_])[0-9A-Za-z:_.\-]*"
        rf"(?:/?>|[{spc_c}]{tbody}>))"
    )
    # Complete <script>/<style> element with a SIMPLE body: inside the
    # parser's ignore mode, Base still dispatches CJK chars to InCJK
    # and '<' to a tag parse, and everything else runs into ONE blank
    # token - so a body free of '<' and CJK chars is exactly
    # [open tag][one blank][close tag].  The S_TAGS special compares
    # only the '<script'/'</script'/'<style'/'</style' prefixes
    # (case-insensitive, no name matching), so EITHER close tag ends
    # EITHER element, and a close tag may carry trailing spaces before
    # '>'.  Bodies with '<' (nested tags inside scripts, '</script'
    # inside a JS string) or CJK fall back to the exact FSM.
    scrname = r"(?:[sS][cC][rR][iI][pP][tT]|[sS][tT][yY][lL][eE])"
    script = (
        rf"(?P<S><{scrname}(?:>|[{spc_c}]{tbody}>))"
        rf"(?P<Sb>[^<{cjk_cls}]*)"
        rf"(?P<Sc></{scrname}[{spc_c}]*>)"
    )

    pat = (
        f"(?P<c>[{cjk_cls}]+)"
        f"|(?P<w>[A-Za-z]+)(?=[{tw}]|$|{wdot})"
        f"|(?P<u>[0-9]+)(?=[{tu}]|$|{udot})"
        f"|(?P<b>(?:[{bs}]|\\.(?!$|[./]))[{bc}]*)"
        f"|{tag}|{script}"
        f"|{host}|{sfl}|{ver}|{flt}|{ent}|{word}"
        f"|{email}|{urlp}|{urlb}|{filep}|{hword}"
        f"|{numh}|{eosdot}"
    )

    # --- lexemes-only master ------------------------------------------
    # Blanks take no position and emit nothing in lexemes(), so the lex
    # variant fuses trailing-blank consumption into every token
    # alternative (one regex call instead of token+blank pairs - blanks
    # are ~half of all matches on typical web text) and batches runs of
    # safe word+blank pairs into a single match (group W).  tokenize()
    # keeps the plain master: ts_debug parity needs the blank tokens.
    # Token ends come from m.end(group); m.end() is the resume point.
    tail = rf"(?:(?:[{bs}]|\.(?!$|[./]))[{bc}]*|\.\Z)?"
    # word-run separator: a blank-start char that also unconditionally
    # ends a word (bs & term_w - drops '@' ':' '_' etc., which need the
    # email/protocol/hword lookaheads), or a sentence dot that can
    # neither extend the word (alnum/_) nor start a path/blank-dot
    # quirk ('.', '/').  A dot at EOS is consumable here: the plain
    # master parses it as the D blank, which lexemes() drops anyway.
    bsw = cls128(bl_start & term_w)
    wrun = rf"(?P<W>(?:[A-Za-z]+(?:[{bsw}]|\.(?![0-9A-Za-z_./]))[{bc}]*)+)"
    # Tails go on the HOT alternatives only (c/w/u): measured
    # interleaved, adding them to every rare alternative slows the
    # whole master ~8% (bigger compiled program, no blank fused often
    # enough to pay for it).  Rare groups keep token end == m.end().
    lex_pat = (
        f"(?P<c>[{cjk_cls}]+){tail}"
        f"|{wrun}"
        f"|(?P<w>[A-Za-z]+)(?=[{tw}]|$|{wdot}){tail}"
        f"|(?P<u>[0-9]+)(?=[{tu}]|$|{udot}){tail}"
        f"|(?P<b>(?:[{bs}]|\\.(?!$|[./]))[{bc}]*)"
        f"|{tag}|{script}"
        f"|{host}|{sfl}|{ver}|{flt}|{ent}|{word}"
        f"|{email}|{urlp}|{urlb}|{filep}|{hword}"
        f"|{numh}|{eosdot}"
    )
    return re.compile(pat), re.compile(lex_pat)


# token type per single-token fast-path group
_GROUP_TYPE = {
    "h": HOST,
    "e": SCIENTIFIC,
    "v": VERSIONNUMBER,
    "f": DECIMAL_T,
    "x": XMLENTITY,
    "n": WORD_T,
    "E": EMAIL,
    "Z": FILEPATH,
    "T": TAG_T,
}


def _emit_url(out, m) -> None:
    """protocol? + url > host > url_path overlapping emission, exactly
    as the FSM's S_FURL rewind produces it."""
    g = m.lastgroup
    if g == "V":
        hs, he = m.span("G")
        us, ue = m.span("V")
    else:
        fs, fe = m.span("F")
        out.append((fs, fe - fs, PROTOCOL))
        hs, he = m.span("H")
        if g == "H":  # protocol + bare host, no path
            out.append((hs, he - hs, HOST))
            return
        us, ue = m.span("U")
    out.append((hs, ue - hs, URL_T))
    out.append((hs, he - hs, HOST))
    out.append((us, ue - us, URLPATH))


def _emit_hword(out, s: str, p: int, q: int) -> None:
    """composite + parts emission (S_HYPHEN re-lex): asciihword, then
    hword_asciipart for each part with the '-' chars as blanks."""
    out.append((p, q - p, ASCIIHWORD))
    i = p
    while True:
        j = s.find("-", i, q)
        e = q if j < 0 else j
        out.append((i, e - i, ASCIIPARTHWORD))
        if j < 0:
            return
        out.append((j, 1, SPACE_T))
        i = j + 1


_MASTER, _MASTER_LEX = _build_master()
_WORDS = re.compile(r"[A-Za-z]+")


def tokenize(s: str) -> list[tuple[int, int, int]]:
    """Tokenize ``s``; returns (start, length, type) triples, including
    blanks and zero-length swallowed CJK run-tails (full ts_debug
    parity with the reference stream)."""
    n = len(s)
    if n == 0:
        return []
    cps = np.frombuffer(
        s.encode("utf-32-le", "surrogatepass"), dtype="<u4"
    )
    flags = CLS[cps]
    out: list[tuple[int, int, int]] = []
    parser: Parser | None = None
    match = _MASTER.match
    p = 0
    while p < n:
        m = match(s, p)
        if m is not None:
            q = m.end()
            g = m.lastgroup
            if g == "c":
                if q - p < 48:
                    _emit_cjk_run_scalar(out, s, p, q, n)
                else:
                    _emit_cjk_run(out, flags, p, q, n)
            elif g == "w":
                out.append((p, q - p, ASCIIWORD))
            elif g == "u":
                out.append((p, q - p, UNSIGNEDINT))
            elif g == "b":
                out.append((p, q - p, SPACE_T))
            elif g in ("U", "H", "V"):
                _emit_url(out, m)
            elif g == "Y":
                _emit_hword(out, s, p, q)
            elif g == "M":  # numh: lastgroup is the trailing digits
                y_end = m.end("N")
                _emit_hword(out, s, p, y_end)
                out.append((y_end, 1, SPACE_T))
                out.append((y_end + 1, q - y_end - 1, UNSIGNEDINT))
            elif g == "D":
                out.append((p, 1, SPACE_T))
            elif g == "Sc":  # whole script/style element: tag+blank+tag
                so, se = m.span("S")
                out.append((so, se - so, TAG_T))
                bo, be = m.span("Sb")
                if be > bo:
                    out.append((bo, be - bo, SPACE_T))
                out.append((be, q - be, TAG_T))
            else:
                out.append((p, q - p, _GROUP_TYPE[g]))
            p = q
        else:
            if parser is None:
                parser = Parser(s, cps=cps.tolist() + [0])
            parser.stack[:] = [[p, 0, TPS_Base, -1]]
            while True:
                tok = parser.next_token()
                if tok is None:
                    p = n
                    break
                out.append((tok.start, tok.length, tok.type))
                st = parser.stack
                if (
                    len(st) == 1
                    and st[0][2] == TPS_Base
                    and not parser.ignore
                    and not parser.wanthost
                ):
                    p = st[0][0]
                    break
    return out


def _emit_cjk_run_scalar(out, s: str, p: int, q: int, n: int) -> None:
    """Per-char CJK widening; faster than NumPy for short runs."""
    cls = CLS_LIST
    prev_f = cls[ord(s[p - 1])] if p > 0 else 0
    cur_f = cls[ord(s[p])]
    for i in range(p, q):
        nxt_f = cls[ord(s[i + 1])] if i + 1 < n else 0
        if cur_f & BAND2 and nxt_f & BAND2 and not nxt_f & ZEROW:
            out.append((i, 2, CJK_CHAR))
        elif (
            cur_f & (CJK_EXT | UNIPUNCT)
            or (cur_f & BAND2 and not nxt_f & BAND2 and not prev_f & BAND2)
        ):
            out.append((i, 1, CJK_CHAR))
        else:
            out.append((i, 0, SPACE_T))
        prev_f = cur_f
        cur_f = nxt_f


def _emit_cjk_run(out, flags, p: int, q: int, n: int) -> None:
    f = flags[p:q]
    if q < n:
        f_next = flags[p + 1 : q + 1]
    else:
        f_next = np.concatenate((flags[p + 1 : q], [0])).astype(flags.dtype)
    if p > 0:
        f_prev = flags[p - 1 : q - 1]
    else:
        f_prev = np.concatenate(([0], flags[p : q - 1])).astype(flags.dtype)

    b2 = (f & BAND2) != 0
    nxt_raw = (f_next & BAND2) != 0
    widen = b2 & nxt_raw & ((f_next & ZEROW) == 0)
    uni = (
        ((f & CJK_EXT) != 0)
        | ((f & UNIPUNCT) != 0)
        | (b2 & ~nxt_raw & ~((f_prev & BAND2) != 0))
    )
    lens = np.where(widen, 2, np.where(uni, 1, 0))
    types = np.where(lens > 0, CJK_CHAR, SPACE_T)
    out.extend(zip(range(p, q), lens.tolist(), types.tolist()))


def tokenize_exact(s: str) -> list[tuple[int, int, int]]:
    """Pure-FSM tokenization (differential-testing oracle)."""
    return [(t.start, t.length, t.type) for t in parse_fsm(s)]


def token_strings(s: str) -> list[tuple[str, str]]:
    """(alias, token_text) pairs - ts_debug-style output."""
    from .fsm import TOKEN_ALIASES

    return [
        (TOKEN_ALIASES[tt], s[st : st + ln]) for st, ln, tt in tokenize(s)
    ]


# stemming cache: maps raw asciiword -> lexeme ('' = stopword).
# English vocabulary is tiny relative to corpus size, so hit rate ~ 1.
_STEM_CACHE: dict[str, str] = {}
_STEM_CACHE_MAX = 1 << 20


def lexemes(s: str) -> list[tuple[str, int]]:
    """Fused tokenize+dictionary pass: (lexeme, position) pairs ready
    for tsvector/posting construction.  Positions follow PG semantics
    (stopwords consume a position; blanks don't).

    Same semantics as running :func:`tokenize` + lexize, but blanks are
    never materialized and CJK tokens skip the (identity) lowercasing -
    differential tests assert equality with the FSM + lexize path.

    Runs on the lex master (``_MASTER_LEX``): trailing blanks are
    consumed inside each token's match and word+blank runs collapse
    into one match (group ``W``), so token ends come from
    ``m.end(group)`` while ``m.end()`` is the resume point.
    """
    n = len(s)
    out: list[tuple[str, int]] = []
    if n == 0:
        return out
    pos = 0
    cache = _STEM_CACHE
    cache_get = cache.get
    match = _MASTER_LEX.match
    cls = CLS_LIST
    fl: list[int] | None = None
    parser: Parser | None = None
    p = 0
    append = out.append
    wfind = _WORDS.findall
    # hoist per-emission globals: LOAD_FAST beats LOAD_GLOBAL in the
    # per-token loop (measured interleaved)
    MEP = MAXENTRYPOS
    B2 = BAND2
    ZW = ZEROW
    EXTP = CJK_EXT | UNIPUNCT
    stopwords = ENGLISH_STOPWORDS
    stem_ = stem
    while p < n:
        m = match(s, p)
        if m is not None:
            q = m.end()
            g = m.lastgroup
            if g == "c":
                # inline CJK widening, emitting lexemes directly; the
                # charclass flags come from one C-speed map pass -
                # whole-doc and cached across runs for ordinary docs
                # (lazy: ASCII-only docs skip it), but per-run for
                # huge docs so one stray CJK char in a 10 MB document
                # doesn't trigger an O(doc) list build
                ce = m.end("c")
                if n <= 65536:
                    if fl is None:
                        fl = list(map(cls.__getitem__, map(ord, s)))
                        fl.append(0)
                    loc = fl
                    base = 0
                else:
                    base = p - 1 if p > 0 else 0
                    loc = list(
                        map(cls.__getitem__, map(ord, s[base : ce + 1]))
                    )
                    if ce + 1 > n:
                        loc.append(0)
                prev_f = loc[p - 1 - base] if p > 0 else 0
                cur_f = loc[p - base]
                i = p
                while i < ce:
                    nxt_f = loc[i + 1 - base]
                    if cur_f & B2 and nxt_f & B2 and not nxt_f & ZW:
                        pos += 1
                        append(
                            (s[i : i + 2], pos if pos < MEP else MEP)
                        )
                    elif (
                        cur_f & EXTP
                        or (cur_f & B2 and not nxt_f & B2 and not prev_f & B2)
                    ):
                        pos += 1
                        append(
                            (s[i], pos if pos < MEP else MEP)
                        )
                    prev_f = cur_f
                    cur_f = nxt_f
                    i += 1
            elif g == "W":
                # batched word+blank run: iterate the words with the
                # trivial word scanner (blank chars carry no positions)
                for text in wfind(s, p, q):
                    if len(text) >= 2047:
                        continue
                    pos += 1
                    lex = cache_get(text)
                    if lex is None:
                        low = text.lower()
                        lex = "" if low in stopwords else stem_(low)
                        if len(cache) < _STEM_CACHE_MAX:
                            cache[text] = lex
                    if lex:
                        append((lex, pos if pos < MEP else MEP))
            elif g == "w":
                we = m.end("w")
                if we - p >= 2047:  # PG MAXSTRLEN: lexemes >= 2047 bytes aren't indexed
                    p = q
                    continue
                pos += 1
                text = s[p:we]
                lex = cache_get(text)
                if lex is None:
                    low = text.lower()
                    lex = "" if low in stopwords else stem_(low)
                    if len(cache) < _STEM_CACHE_MAX:
                        cache[text] = lex
                if lex:
                    append((lex, pos if pos < MEP else MEP))
            elif g == "u":
                ue = m.end("u")
                if ue - p >= 2047:
                    p = q
                    continue
                pos += 1
                append((s[p:ue], pos if pos < MEP else MEP))
            elif g in ("U", "H", "V", "Y", "M"):
                # multi-token families (url>host>url_path, hword+parts,
                # hword + trailing uint): every non-blank token takes a
                # position and lexizes via the simple dictionary
                # (lowercase), like the FSM branch
                toks: list[tuple[int, int, int]] = []
                if g == "Y":
                    _emit_hword(toks, s, p, m.end("Y"))
                elif g == "M":  # numh: lastgroup is the trailing digits
                    y_end = m.end("N")
                    _emit_hword(toks, s, p, y_end)
                    toks.append((y_end + 1, m.end("M") - y_end - 1, UNSIGNEDINT))
                else:
                    _emit_url(toks, m)
                for ts_, ln, tt in toks:
                    if tt == SPACE_T:
                        continue
                    pos += 1
                    if ln >= 2047:  # pure-ASCII spans: utf8 len == ln
                        pos -= 1
                        continue
                    append(
                        (
                            s[ts_ : ts_ + ln].lower(),
                            pos if pos < MEP else MEP,
                        )
                    )
            elif g == "Sc":
                # whole script/style element: the two tags take
                # positions and lexize via the simple dictionary; the
                # ignore-mode body is one blank (no position)
                for ts_, te_ in (m.span("S"), m.span("Sc")):
                    ln = te_ - ts_
                    pos += 1
                    text = s[ts_:te_]
                    if ln >= 512 and len(
                        text.encode("utf-8", "surrogatepass")
                    ) >= 2047:
                        pos -= 1
                        continue
                    append((text.lower(), pos if pos < MEP else MEP))
            elif g not in ("b", "D"):
                # host / sfloat / version / float / entity / email /
                # file: lowercased, no stemming (simple dictionary),
                # same as the FSM fallback's non-asciiword branch
                # ("D" is the end-of-input '.' blank: no position)
                ge = m.end(g)
                text = s[p:ge]
                if ge - p >= 512 and len(
                    text.encode("utf-8", "surrogatepass")
                ) >= 2047:
                    p = q
                    continue
                pos += 1
                append(
                    (text.lower(), pos if pos < MEP else MEP)
                )
            # blanks consume no position and are not emitted
            p = q
        else:
            if parser is None:
                cps = np.frombuffer(
                    s.encode("utf-32-le", "surrogatepass"), dtype="<u4"
                ).tolist()
                cps.append(0)
                parser = Parser(s, cps=cps)
            parser.stack[:] = [[p, 0, TPS_Base, -1]]
            while True:
                tok = parser.next_token()
                if tok is None:
                    p = n
                    break
                tt = tok.type
                if tt != SPACE_T:
                    pos += 1
                    text = tok.text(s)
                    if tok.length >= 512 and len(
                        text.encode("utf-8", "surrogatepass")
                    ) >= 2047:
                        pos -= 1  # PG skips over-long tokens (no position)
                    elif tt == ASCIIWORD:
                        lex = cache_get(text)
                        if lex is None:
                            low = text.lower()
                            lex = "" if low in stopwords else stem_(low)
                            if len(cache) < _STEM_CACHE_MAX:
                                cache[text] = lex
                        if lex:
                            out.append(
                                (lex, pos if pos < MEP else MEP)
                            )
                    else:
                        out.append(
                            (
                                text.lower(),
                                pos if pos < MEP else MEP,
                            )
                        )
                st = parser.stack
                if (
                    len(st) == 1
                    and st[0][2] == TPS_Base
                    and not parser.ignore
                    and not parser.wanthost
                ):
                    p = st[0][0]
                    break
    return out
