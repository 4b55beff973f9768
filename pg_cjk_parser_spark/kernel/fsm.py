"""The tokenizer finite-state machine.

A from-scratch Python reimplementation of the reference parser's
semantics (huangjimmy/pg_cjk_parser, /root/reference/pg_cjk_parser.c):

* the 24 token types (pg_cjk_parser.c:49-130),
* the per-state ordered action tables (pg_cjk_parser.c:1344-1985),
* the interpreter with push/pop/rerun/clear/merge/clrall backtracking
  (TParserGet, pg_cjk_parser.c:2094-2258),
* the special handlers SpecialTags/FURL/Hyphen/VerVersion
  (pg_cjk_parser.c:948-994) and the sub-parsers p_ishost/p_isURLPath
  (pg_cjk_parser.c:1013-1056),
* the CJK 2-gram widening / unigram / swallowed-blank post-step of
  prsd2_nexttoken (pg_cjk_parser.c:2284-2314).

The implementation works in code-point space (one Python ``str`` index
per character) instead of byte space; byte positions in the reference
only ever matter for UTF-8 decoding, which Python has already done.

This module is the *exact* (slow) kernel; ``tokenizer.py`` wraps it
with a vectorized fast path that defers to this FSM for anything
non-trivial.
"""

from __future__ import annotations

from .charclass import (
    ALNUM,
    ALPHA,
    ASCLET,
    BAND2,
    CJK,
    CJK_EXT,
    CLS,
    DIGIT,
    SPACE,
    SPECIAL,
    UNIPUNCT,
    URLCHAR,
    XDIGIT,
    ZEROW,
)

# --- token types (ids identical to the reference catalog) ----------------
ASCIIWORD = 1
WORD_T = 2
NUMWORD = 3
EMAIL = 4
URL_T = 5
HOST = 6
SCIENTIFIC = 7
VERSIONNUMBER = 8
NUMPARTHWORD = 9
PARTHWORD = 10
ASCIIPARTHWORD = 11
SPACE_T = 12
TAG_T = 13
PROTOCOL = 14
NUMHWORD = 15
ASCIIHWORD = 16
HWORD = 17
URLPATH = 18
FILEPATH = 19
DECIMAL_T = 20
SIGNEDINT = 21
UNSIGNEDINT = 22
XMLENTITY = 23
CJK_CHAR = 24
LASTNUM = 24

TOKEN_ALIASES = (
    "", "asciiword", "word", "numword", "email", "url", "host", "sfloat",
    "version", "hword_numpart", "hword_part", "hword_asciipart", "blank",
    "tag", "protocol", "numhword", "asciihword", "hword", "url_path",
    "file", "float", "int", "uint", "entity", "cjk",
)

TOKEN_DESCRIPTIONS = (
    "", "Word, all ASCII", "Word, all letters", "Word, letters and digits",
    "Email address", "URL", "Host", "Scientific notation", "Version number",
    "Hyphenated word part, letters and digits",
    "Hyphenated word part, all letters", "Hyphenated word part, all ASCII",
    "Space symbols", "XML tag", "Protocol head",
    "Hyphenated word, letters and digits", "Hyphenated word, all ASCII",
    "Hyphenated word, all letters", "URL path", "File or path name",
    "Decimal notation", "Signed integer", "Unsigned integer", "XML entity",
    "CJK Char",
)

# --- action flags ---------------------------------------------------------
A_NEXT = 0x00
A_BINGO = 0x01
A_POP = 0x02
A_PUSH = 0x04
A_RERUN = 0x08
A_CLEAR = 0x10
A_MERGE = 0x20
A_CLRALL = 0x40

# --- character-test codes -------------------------------------------------
T_ANY = 0        # catch-all (isclass == NULL)
T_EOF = 1
T_CJK = 2
T_EQ = 3         # p_iseq(c)
T_IGNORE = 4
T_ASCLET = 5
T_ALPHA = 6
T_DIGIT = 7
T_ALNUM = 8
T_NOTALNUM = 9
T_SPACE = 10
T_XDIGIT = 11
T_URLCHAR = 12
T_SPECIAL = 13
T_STOPHOST = 14
T_HOST = 15
T_URLPATH = 16

# --- special-handler codes --------------------------------------------------
S_TAGS = 1
S_FURL = 2
S_HYPHEN = 3
S_VER = 4

# --- parser states (same set as the reference enum) -----------------------
_STATE_NAMES = (
    "Base", "InNumWord", "InAsciiWord", "InWord", "InUnsignedInt",
    "InSignedIntFirst", "InSignedInt", "InSpace", "InUDecimalFirst",
    "InUDecimal", "InDecimalFirst", "InDecimal", "InVerVersion",
    "InSVerVersion", "InVersionFirst", "InVersion", "InMantissaFirst",
    "InMantissaSign", "InMantissa", "InXMLEntityFirst", "InXMLEntity",
    "InXMLEntityNumFirst", "InXMLEntityNum", "InXMLEntityHexNumFirst",
    "InXMLEntityHexNum", "InXMLEntityEnd", "InTagFirst", "InXMLBegin",
    "InTagCloseFirst", "InTagName", "InTagBeginEnd", "InTag",
    "InTagEscapeK", "InTagEscapeKK", "InTagBackSleshed", "InTagEnd",
    "InCommentFirst", "InCommentLast", "InComment", "InCloseCommentFirst",
    "InCloseCommentLast", "InCommentEnd", "InHostFirstDomain",
    "InHostDomainSecond", "InHostDomain", "InPortFirst", "InPort",
    "InHostFirstAN", "InHost", "InEmail", "InFileFirst", "InFileTwiddle",
    "InPathFirst", "InPathFirstFirst", "InPathSecond", "InFile",
    "InFileNext", "InURLPathFirst", "InURLPathStart", "InURLPath",
    "InFURL", "InProtocolFirst", "InProtocolSecond", "InProtocolEnd",
    "InHyphenAsciiWordFirst", "InHyphenAsciiWord", "InHyphenWordFirst",
    "InHyphenWord", "InHyphenNumWordFirst", "InHyphenNumWord",
    "InHyphenDigitLookahead", "InParseHyphen", "InParseHyphenHyphen",
    "InHyphenWordPart", "InHyphenAsciiWordPart", "InHyphenNumWordPart",
    "InHyphenUnsignedInt", "InCJK",
)
_S = {n: i for i, n in enumerate(_STATE_NAMES)}

# plain-list view of the charclass table: Python-int indexing is ~3x
# faster than NumPy scalar indexing in the per-char interpreter loop
CLS_LIST: list[int] = CLS.tolist()
TPS_Base = _S["Base"]
TPS_InCJK = _S["InCJK"]
NO_STATE = -1  # the reference uses TPS_Null for "keep current state"

# Each rule: (test, char, flags, tostate, token_type, special)
# Ordered exactly as the reference action tables (pg_cjk_parser.c:1344-1985).


def _tables():
    S = _S
    R = {}

    R[S["Base"]] = (
        (T_EOF, "", A_NEXT, NO_STATE, 0, 0),
        (T_CJK, "", A_NEXT, S["InCJK"], 0, 0),
        (T_EQ, "<", A_PUSH, S["InTagFirst"], 0, 0),
        (T_IGNORE, "", A_NEXT, S["InSpace"], 0, 0),
        (T_ASCLET, "", A_NEXT, S["InAsciiWord"], 0, 0),
        (T_ALPHA, "", A_NEXT, S["InWord"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InUnsignedInt"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InSignedIntFirst"], 0, 0),
        (T_EQ, "+", A_PUSH, S["InSignedIntFirst"], 0, 0),
        (T_EQ, "&", A_PUSH, S["InXMLEntityFirst"], 0, 0),
        (T_EQ, "~", A_PUSH, S["InFileTwiddle"], 0, 0),
        (T_EQ, "/", A_PUSH, S["InFileFirst"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InPathFirstFirst"], 0, 0),
        (T_ANY, "", A_NEXT, S["InSpace"], 0, 0),
    )
    R[S["InNumWord"]] = (
        (T_EOF, "", A_BINGO, S["Base"], NUMWORD, 0),
        (T_CJK, "", A_BINGO, S["Base"], NUMWORD, 0),
        (T_ALNUM, "", A_NEXT, S["InNumWord"], 0, 0),
        (T_SPECIAL, "", A_NEXT, S["InNumWord"], 0, 0),
        (T_EQ, "@", A_PUSH, S["InEmail"], 0, 0),
        (T_EQ, "/", A_PUSH, S["InFileFirst"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InFileNext"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHyphenNumWordFirst"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], NUMWORD, 0),
    )
    R[S["InAsciiWord"]] = (
        (T_EOF, "", A_BINGO, S["Base"], ASCIIWORD, 0),
        (T_CJK, "", A_BINGO, S["Base"], ASCIIWORD, 0),
        (T_EQ, ".", A_PUSH, S["InHostFirstDomain"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InFileNext"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHostFirstAN"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHyphenAsciiWordFirst"], 0, 0),
        (T_EQ, "_", A_PUSH, S["InHostFirstAN"], 0, 0),
        (T_EQ, "@", A_PUSH, S["InEmail"], 0, 0),
        (T_EQ, ":", A_PUSH, S["InProtocolFirst"], 0, 0),
        (T_EQ, "/", A_PUSH, S["InFileFirst"], 0, 0),
        (T_DIGIT, "", A_PUSH, S["InHost"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InNumWord"], 0, 0),
        (T_ASCLET, "", A_NEXT, NO_STATE, 0, 0),
        (T_ALPHA, "", A_NEXT, S["InWord"], 0, 0),
        (T_SPECIAL, "", A_NEXT, S["InWord"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], ASCIIWORD, 0),
    )
    R[S["InWord"]] = (
        (T_EOF, "", A_BINGO, S["Base"], WORD_T, 0),
        (T_CJK, "", A_BINGO, S["Base"], WORD_T, 0),
        (T_ALPHA, "", A_NEXT, NO_STATE, 0, 0),
        (T_SPECIAL, "", A_NEXT, NO_STATE, 0, 0),
        (T_DIGIT, "", A_NEXT, S["InNumWord"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHyphenWordFirst"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], WORD_T, 0),
    )
    R[S["InUnsignedInt"]] = (
        (T_EOF, "", A_BINGO, S["Base"], UNSIGNEDINT, 0),
        (T_CJK, "", A_BINGO, S["Base"], UNSIGNEDINT, 0),
        (T_DIGIT, "", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, ".", A_PUSH, S["InHostFirstDomain"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InUDecimalFirst"], 0, 0),
        (T_EQ, "e", A_PUSH, S["InMantissaFirst"], 0, 0),
        (T_EQ, "E", A_PUSH, S["InMantissaFirst"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHostFirstAN"], 0, 0),
        (T_EQ, "_", A_PUSH, S["InHostFirstAN"], 0, 0),
        (T_EQ, "@", A_PUSH, S["InEmail"], 0, 0),
        (T_ASCLET, "", A_PUSH, S["InHost"], 0, 0),
        (T_ALPHA, "", A_NEXT, S["InNumWord"], 0, 0),
        (T_SPECIAL, "", A_NEXT, S["InNumWord"], 0, 0),
        (T_EQ, "/", A_PUSH, S["InFileFirst"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], UNSIGNEDINT, 0),
    )
    R[S["InSignedIntFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_NEXT | A_CLEAR, S["InSignedInt"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InSignedInt"]] = (
        (T_EOF, "", A_BINGO, S["Base"], SIGNEDINT, 0),
        (T_DIGIT, "", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, ".", A_PUSH, S["InDecimalFirst"], 0, 0),
        (T_EQ, "e", A_PUSH, S["InMantissaFirst"], 0, 0),
        (T_EQ, "E", A_PUSH, S["InMantissaFirst"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], SIGNEDINT, 0),
    )
    R[S["InSpace"]] = (
        (T_EOF, "", A_BINGO, S["Base"], SPACE_T, 0),
        (T_CJK, "", A_BINGO, S["Base"], SPACE_T, 0),
        (T_EQ, "<", A_BINGO, S["Base"], SPACE_T, 0),
        (T_IGNORE, "", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "-", A_BINGO, S["Base"], SPACE_T, 0),
        (T_EQ, "+", A_BINGO, S["Base"], SPACE_T, 0),
        (T_EQ, "&", A_BINGO, S["Base"], SPACE_T, 0),
        (T_EQ, "/", A_BINGO, S["Base"], SPACE_T, 0),
        (T_NOTALNUM, "", A_NEXT, S["InSpace"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], SPACE_T, 0),
    )
    R[S["InUDecimalFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_CLEAR, S["InUDecimal"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InUDecimal"]] = (
        (T_EOF, "", A_BINGO, S["Base"], DECIMAL_T, 0),
        (T_DIGIT, "", A_NEXT, S["InUDecimal"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InVersionFirst"], 0, 0),
        (T_EQ, "e", A_PUSH, S["InMantissaFirst"], 0, 0),
        (T_EQ, "E", A_PUSH, S["InMantissaFirst"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], DECIMAL_T, 0),
    )
    R[S["InDecimalFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_CLEAR, S["InDecimal"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InDecimal"]] = (
        (T_EOF, "", A_BINGO, S["Base"], DECIMAL_T, 0),
        (T_DIGIT, "", A_NEXT, S["InDecimal"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InVerVersion"], 0, 0),
        (T_EQ, "e", A_PUSH, S["InMantissaFirst"], 0, 0),
        (T_EQ, "E", A_PUSH, S["InMantissaFirst"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], DECIMAL_T, 0),
    )
    R[S["InVerVersion"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_RERUN, S["InSVerVersion"], 0, S_VER),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InSVerVersion"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_BINGO | A_CLRALL, S["InUnsignedInt"], SPACE_T, 0),
        (T_ANY, "", A_NEXT, NO_STATE, 0, 0),
    )
    R[S["InVersionFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_CLEAR, S["InVersion"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InVersion"]] = (
        (T_EOF, "", A_BINGO, S["Base"], VERSIONNUMBER, 0),
        (T_DIGIT, "", A_NEXT, S["InVersion"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InVersionFirst"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], VERSIONNUMBER, 0),
    )
    R[S["InMantissaFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_CLEAR, S["InMantissa"], 0, 0),
        (T_EQ, "+", A_NEXT, S["InMantissaSign"], 0, 0),
        (T_EQ, "-", A_NEXT, S["InMantissaSign"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InMantissaSign"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_CLEAR, S["InMantissa"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InMantissa"]] = (
        (T_EOF, "", A_BINGO, S["Base"], SCIENTIFIC, 0),
        (T_DIGIT, "", A_NEXT, S["InMantissa"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], SCIENTIFIC, 0),
    )
    R[S["InXMLEntityFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "#", A_NEXT, S["InXMLEntityNumFirst"], 0, 0),
        (T_ASCLET, "", A_NEXT, S["InXMLEntity"], 0, 0),
        (T_EQ, ":", A_NEXT, S["InXMLEntity"], 0, 0),
        (T_EQ, "_", A_NEXT, S["InXMLEntity"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InXMLEntity"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ALNUM, "", A_NEXT, S["InXMLEntity"], 0, 0),
        (T_EQ, ":", A_NEXT, S["InXMLEntity"], 0, 0),
        (T_EQ, "_", A_NEXT, S["InXMLEntity"], 0, 0),
        (T_EQ, ".", A_NEXT, S["InXMLEntity"], 0, 0),
        (T_EQ, "-", A_NEXT, S["InXMLEntity"], 0, 0),
        (T_EQ, ";", A_NEXT, S["InXMLEntityEnd"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InXMLEntityNumFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "x", A_NEXT, S["InXMLEntityHexNumFirst"], 0, 0),
        (T_EQ, "X", A_NEXT, S["InXMLEntityHexNumFirst"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InXMLEntityNum"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InXMLEntityHexNumFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_XDIGIT, "", A_NEXT, S["InXMLEntityHexNum"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InXMLEntityNum"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_NEXT, S["InXMLEntityNum"], 0, 0),
        (T_EQ, ";", A_NEXT, S["InXMLEntityEnd"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InXMLEntityHexNum"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_XDIGIT, "", A_NEXT, S["InXMLEntityHexNum"], 0, 0),
        (T_EQ, ";", A_NEXT, S["InXMLEntityEnd"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InXMLEntityEnd"]] = (
        (T_ANY, "", A_BINGO | A_CLEAR, S["Base"], XMLENTITY, 0),
    )
    R[S["InTagFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "/", A_PUSH, S["InTagCloseFirst"], 0, 0),
        (T_EQ, "!", A_PUSH, S["InCommentFirst"], 0, 0),
        (T_EQ, "?", A_PUSH, S["InXMLBegin"], 0, 0),
        (T_ASCLET, "", A_PUSH, S["InTagName"], 0, 0),
        (T_EQ, ":", A_PUSH, S["InTagName"], 0, 0),
        (T_EQ, "_", A_PUSH, S["InTagName"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InXMLBegin"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "x", A_NEXT, S["InTag"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InTagCloseFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ASCLET, "", A_NEXT, S["InTagName"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InTagName"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "/", A_NEXT, S["InTagBeginEnd"], 0, 0),
        (T_EQ, ">", A_NEXT, S["InTagEnd"], 0, S_TAGS),
        (T_SPACE, "", A_NEXT, S["InTag"], 0, S_TAGS),
        (T_ALNUM, "", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, ":", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "_", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, ".", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "-", A_NEXT, NO_STATE, 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InTagBeginEnd"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, ">", A_NEXT, S["InTagEnd"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InTag"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, ">", A_NEXT, S["InTagEnd"], 0, S_TAGS),
        (T_EQ, "'", A_NEXT, S["InTagEscapeK"], 0, 0),
        (T_EQ, '"', A_NEXT, S["InTagEscapeKK"], 0, 0),
        (T_ASCLET, "", A_NEXT, NO_STATE, 0, 0),
        (T_DIGIT, "", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "=", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "-", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "_", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "#", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "/", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, ":", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, ".", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "&", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "?", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "%", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, "~", A_NEXT, NO_STATE, 0, 0),
        (T_SPACE, "", A_NEXT, NO_STATE, 0, S_TAGS),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InTagEscapeK"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "\\", A_PUSH, S["InTagBackSleshed"], 0, 0),
        (T_EQ, "'", A_NEXT, S["InTag"], 0, 0),
        (T_ANY, "", A_NEXT, S["InTagEscapeK"], 0, 0),
    )
    R[S["InTagEscapeKK"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "\\", A_PUSH, S["InTagBackSleshed"], 0, 0),
        (T_EQ, '"', A_NEXT, S["InTag"], 0, 0),
        (T_ANY, "", A_NEXT, S["InTagEscapeKK"], 0, 0),
    )
    R[S["InTagBackSleshed"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ANY, "", A_MERGE, NO_STATE, 0, 0),
    )
    R[S["InTagEnd"]] = (
        (T_ANY, "", A_BINGO | A_CLRALL, S["Base"], TAG_T, 0),
    )
    R[S["InCommentFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "-", A_NEXT, S["InCommentLast"], 0, 0),
        (T_EQ, "D", A_NEXT, S["InTag"], 0, 0),
        (T_EQ, "d", A_NEXT, S["InTag"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InCommentLast"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "-", A_NEXT, S["InComment"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InComment"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "-", A_NEXT, S["InCloseCommentFirst"], 0, 0),
        (T_ANY, "", A_NEXT, NO_STATE, 0, 0),
    )
    R[S["InCloseCommentFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "-", A_NEXT, S["InCloseCommentLast"], 0, 0),
        (T_ANY, "", A_NEXT, S["InComment"], 0, 0),
    )
    R[S["InCloseCommentLast"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "-", A_NEXT, NO_STATE, 0, 0),
        (T_EQ, ">", A_NEXT, S["InCommentEnd"], 0, 0),
        (T_ANY, "", A_NEXT, S["InComment"], 0, 0),
    )
    R[S["InCommentEnd"]] = (
        (T_ANY, "", A_BINGO | A_CLRALL, S["Base"], TAG_T, 0),
    )
    R[S["InHostFirstDomain"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ASCLET, "", A_NEXT, S["InHostDomainSecond"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHost"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InHostDomainSecond"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ASCLET, "", A_NEXT, S["InHostDomain"], 0, 0),
        (T_DIGIT, "", A_PUSH, S["InHost"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHostFirstAN"], 0, 0),
        (T_EQ, "_", A_PUSH, S["InHostFirstAN"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InHostFirstDomain"], 0, 0),
        (T_EQ, "@", A_PUSH, S["InEmail"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InHostDomain"]] = (
        (T_EOF, "", A_BINGO | A_CLRALL, S["Base"], HOST, 0),
        (T_ASCLET, "", A_NEXT, S["InHostDomain"], 0, 0),
        (T_DIGIT, "", A_PUSH, S["InHost"], 0, 0),
        (T_EQ, ":", A_PUSH, S["InPortFirst"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHostFirstAN"], 0, 0),
        (T_EQ, "_", A_PUSH, S["InHostFirstAN"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InHostFirstDomain"], 0, 0),
        (T_EQ, "@", A_PUSH, S["InEmail"], 0, 0),
        (T_DIGIT, "", A_POP, NO_STATE, 0, 0),
        (T_STOPHOST, "", A_BINGO | A_CLRALL, S["InURLPathStart"], HOST, 0),
        (T_EQ, "/", A_PUSH, S["InFURL"], 0, 0),
        (T_ANY, "", A_BINGO | A_CLRALL, S["Base"], HOST, 0),
    )
    R[S["InPortFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_NEXT, S["InPort"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InPort"]] = (
        (T_EOF, "", A_BINGO | A_CLRALL, S["Base"], HOST, 0),
        (T_DIGIT, "", A_NEXT, S["InPort"], 0, 0),
        (T_STOPHOST, "", A_BINGO | A_CLRALL, S["InURLPathStart"], HOST, 0),
        (T_EQ, "/", A_PUSH, S["InFURL"], 0, 0),
        (T_ANY, "", A_BINGO | A_CLRALL, S["Base"], HOST, 0),
    )
    R[S["InHostFirstAN"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHost"], 0, 0),
        (T_ASCLET, "", A_NEXT, S["InHost"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InHost"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHost"], 0, 0),
        (T_ASCLET, "", A_NEXT, S["InHost"], 0, 0),
        (T_EQ, "@", A_PUSH, S["InEmail"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InHostFirstDomain"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHostFirstAN"], 0, 0),
        (T_EQ, "_", A_PUSH, S["InHostFirstAN"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InEmail"]] = (
        (T_STOPHOST, "", A_POP, NO_STATE, 0, 0),
        (T_HOST, "", A_BINGO | A_CLRALL, S["Base"], EMAIL, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InFileFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ASCLET, "", A_NEXT, S["InFile"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InFile"], 0, 0),
        (T_EQ, ".", A_NEXT, S["InPathFirst"], 0, 0),
        (T_EQ, "_", A_NEXT, S["InFile"], 0, 0),
        (T_EQ, "~", A_PUSH, S["InFileTwiddle"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InFileTwiddle"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ASCLET, "", A_NEXT, S["InFile"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InFile"], 0, 0),
        (T_EQ, "_", A_NEXT, S["InFile"], 0, 0),
        (T_EQ, "/", A_NEXT, S["InFileFirst"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InPathFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ASCLET, "", A_NEXT, S["InFile"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InFile"], 0, 0),
        (T_EQ, "_", A_NEXT, S["InFile"], 0, 0),
        (T_EQ, ".", A_NEXT, S["InPathSecond"], 0, 0),
        (T_EQ, "/", A_NEXT, S["InFileFirst"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InPathFirstFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, ".", A_NEXT, S["InPathSecond"], 0, 0),
        (T_EQ, "/", A_NEXT, S["InFileFirst"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InPathSecond"]] = (
        (T_EOF, "", A_BINGO | A_CLEAR, S["Base"], FILEPATH, 0),
        (T_EQ, "/", A_NEXT | A_PUSH, S["InFileFirst"], 0, 0),
        (T_EQ, "/", A_BINGO | A_CLEAR, S["Base"], FILEPATH, 0),
        (T_SPACE, "", A_BINGO | A_CLEAR, S["Base"], FILEPATH, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InFile"]] = (
        (T_EOF, "", A_BINGO, S["Base"], FILEPATH, 0),
        (T_ASCLET, "", A_NEXT, S["InFile"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InFile"], 0, 0),
        (T_EQ, ".", A_PUSH, S["InFileNext"], 0, 0),
        (T_EQ, "_", A_NEXT, S["InFile"], 0, 0),
        (T_EQ, "-", A_NEXT, S["InFile"], 0, 0),
        (T_EQ, "/", A_PUSH, S["InFileFirst"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], FILEPATH, 0),
    )
    R[S["InFileNext"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ASCLET, "", A_CLEAR, S["InFile"], 0, 0),
        (T_DIGIT, "", A_CLEAR, S["InFile"], 0, 0),
        (T_EQ, "_", A_CLEAR, S["InFile"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InURLPathFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_URLCHAR, "", A_NEXT, S["InURLPath"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InURLPathStart"]] = (
        (T_ANY, "", A_NEXT, S["InURLPath"], 0, 0),
    )
    R[S["InURLPath"]] = (
        (T_EOF, "", A_BINGO, S["Base"], URLPATH, 0),
        (T_URLCHAR, "", A_NEXT, S["InURLPath"], 0, 0),
        (T_ANY, "", A_BINGO, S["Base"], URLPATH, 0),
    )
    R[S["InFURL"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_URLPATH, "", A_BINGO | A_CLRALL, S["Base"], URL_T, S_FURL),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InProtocolFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "/", A_NEXT, S["InProtocolSecond"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InProtocolSecond"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_EQ, "/", A_NEXT, S["InProtocolEnd"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InProtocolEnd"]] = (
        (T_ANY, "", A_BINGO | A_CLRALL, S["Base"], PROTOCOL, 0),
    )
    R[S["InHyphenAsciiWordFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ASCLET, "", A_NEXT, S["InHyphenAsciiWord"], 0, 0),
        (T_ALPHA, "", A_NEXT, S["InHyphenWord"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHyphenDigitLookahead"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InHyphenAsciiWord"]] = (
        (T_EOF, "", A_BINGO | A_CLRALL, S["InParseHyphen"], ASCIIHWORD, S_HYPHEN),
        (T_ASCLET, "", A_NEXT, S["InHyphenAsciiWord"], 0, 0),
        (T_ALPHA, "", A_NEXT, S["InHyphenWord"], 0, 0),
        (T_SPECIAL, "", A_NEXT, S["InHyphenWord"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHyphenNumWord"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHyphenAsciiWordFirst"], 0, 0),
        (T_ANY, "", A_BINGO | A_CLRALL, S["InParseHyphen"], ASCIIHWORD, S_HYPHEN),
    )
    R[S["InHyphenWordFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ALPHA, "", A_NEXT, S["InHyphenWord"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHyphenDigitLookahead"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InHyphenWord"]] = (
        (T_EOF, "", A_BINGO | A_CLRALL, S["InParseHyphen"], HWORD, S_HYPHEN),
        (T_ALPHA, "", A_NEXT, S["InHyphenWord"], 0, 0),
        (T_SPECIAL, "", A_NEXT, S["InHyphenWord"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHyphenNumWord"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHyphenWordFirst"], 0, 0),
        (T_ANY, "", A_BINGO | A_CLRALL, S["InParseHyphen"], HWORD, S_HYPHEN),
    )
    R[S["InHyphenNumWordFirst"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ALPHA, "", A_NEXT, S["InHyphenNumWord"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHyphenDigitLookahead"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InHyphenNumWord"]] = (
        (T_EOF, "", A_BINGO | A_CLRALL, S["InParseHyphen"], NUMHWORD, S_HYPHEN),
        (T_ALNUM, "", A_NEXT, S["InHyphenNumWord"], 0, 0),
        (T_SPECIAL, "", A_NEXT, S["InHyphenNumWord"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InHyphenNumWordFirst"], 0, 0),
        (T_ANY, "", A_BINGO | A_CLRALL, S["InParseHyphen"], NUMHWORD, S_HYPHEN),
    )
    R[S["InHyphenDigitLookahead"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHyphenDigitLookahead"], 0, 0),
        (T_ALPHA, "", A_NEXT, S["InHyphenNumWord"], 0, 0),
        (T_SPECIAL, "", A_NEXT, S["InHyphenNumWord"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InParseHyphen"]] = (
        (T_EOF, "", A_RERUN, S["Base"], 0, 0),
        (T_ASCLET, "", A_NEXT, S["InHyphenAsciiWordPart"], 0, 0),
        (T_ALPHA, "", A_NEXT, S["InHyphenWordPart"], 0, 0),
        (T_DIGIT, "", A_PUSH, S["InHyphenUnsignedInt"], 0, 0),
        (T_EQ, "-", A_PUSH, S["InParseHyphenHyphen"], 0, 0),
        (T_ANY, "", A_RERUN, S["Base"], 0, 0),
    )
    R[S["InParseHyphenHyphen"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_ALNUM, "", A_BINGO | A_CLEAR, S["InParseHyphen"], SPACE_T, 0),
        (T_SPECIAL, "", A_BINGO | A_CLEAR, S["InParseHyphen"], SPACE_T, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InHyphenWordPart"]] = (
        (T_EOF, "", A_BINGO, S["Base"], PARTHWORD, 0),
        (T_ALPHA, "", A_NEXT, S["InHyphenWordPart"], 0, 0),
        (T_SPECIAL, "", A_NEXT, S["InHyphenWordPart"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHyphenNumWordPart"], 0, 0),
        (T_ANY, "", A_BINGO, S["InParseHyphen"], PARTHWORD, 0),
    )
    R[S["InHyphenAsciiWordPart"]] = (
        (T_EOF, "", A_BINGO, S["Base"], ASCIIPARTHWORD, 0),
        (T_ASCLET, "", A_NEXT, S["InHyphenAsciiWordPart"], 0, 0),
        (T_ALPHA, "", A_NEXT, S["InHyphenWordPart"], 0, 0),
        (T_SPECIAL, "", A_NEXT, S["InHyphenWordPart"], 0, 0),
        (T_DIGIT, "", A_NEXT, S["InHyphenNumWordPart"], 0, 0),
        (T_ANY, "", A_BINGO, S["InParseHyphen"], ASCIIPARTHWORD, 0),
    )
    R[S["InHyphenNumWordPart"]] = (
        (T_EOF, "", A_BINGO, S["Base"], NUMPARTHWORD, 0),
        (T_ALNUM, "", A_NEXT, S["InHyphenNumWordPart"], 0, 0),
        (T_SPECIAL, "", A_NEXT, S["InHyphenNumWordPart"], 0, 0),
        (T_ANY, "", A_BINGO, S["InParseHyphen"], NUMPARTHWORD, 0),
    )
    R[S["InHyphenUnsignedInt"]] = (
        (T_EOF, "", A_POP, NO_STATE, 0, 0),
        (T_DIGIT, "", A_NEXT, NO_STATE, 0, 0),
        (T_ALPHA, "", A_CLEAR, S["InHyphenNumWordPart"], 0, 0),
        (T_SPECIAL, "", A_CLEAR, S["InHyphenNumWordPart"], 0, 0),
        (T_ANY, "", A_POP, NO_STATE, 0, 0),
    )
    R[S["InCJK"]] = (
        (T_EOF, "", A_BINGO, S["Base"], CJK_CHAR, 0),
        (T_ANY, "", A_BINGO, S["Base"], CJK_CHAR, 0),
    )
    return tuple(R[i] for i in range(len(_STATE_NAMES)))


TABLES = _tables()


# --- rule dispatch cache ---------------------------------------------------
#
# TParserGet scans each state's rule list linearly per input char; on web
# text that averages dozens of predicate calls per char.  For an *interior*
# position (pos < n) with ``ignore``/``wanthost`` clear and no resume index,
# the winning rule is a pure function of (state, code point):
#
# * T_EOF never fires at pos < n,
# * T_IGNORE / T_STOPHOST are deterministically false when their flag is
#   clear (and evaluate without side effects),
# * every other predicate depends only on the char class flags (plus
#   ``cp == ord(ch)`` / ``cp < 128`` for T_EQ / T_ASCLET),
# * EXCEPT the T_HOST / T_URLPATH sub-parses, which recurse into the
#   input; a state resolves to -1 ("scan dynamically") once one of those
#   is reached before a match.
#
# So we precompute, per state, a 128-entry table for ASCII and memoize by
# class-flag value for everything else (for cp >= 128 the T_EQ/T_ASCLET
# guards fail, leaving only flag tests).  get_token() consults this and
# falls back to the original scan for EOF positions, resumes after POP,
# and the ignore/wanthost modes.  Pure memoization: semantics unchanged.

_DETFALSE = (T_EOF, T_IGNORE, T_STOPHOST)


def _resolve_rule(state: int, cp: int) -> int:
    f = CLS_LIST[cp]
    for i, rule in enumerate(TABLES[state]):
        t = rule[0]
        if t == T_ANY:
            return i
        if t in _DETFALSE:
            continue
        if t == T_HOST or t == T_URLPATH:
            return -1
        if t == T_EQ:
            if cp < 128 and cp == ord(rule[1]):
                return i
        elif t == T_CJK:
            if f & CJK:
                return i
        elif t == T_ASCLET:
            if cp < 128 and f & ASCLET:
                return i
        elif t == T_ALPHA:
            if f & ALPHA:
                return i
        elif t == T_DIGIT:
            if f & DIGIT:
                return i
        elif t == T_ALNUM:
            if f & ALNUM:
                return i
        elif t == T_NOTALNUM:
            if not (f & ALNUM):
                return i
        elif t == T_SPACE:
            if f & SPACE:
                return i
        elif t == T_XDIGIT:
            if f & XDIGIT:
                return i
        elif t == T_URLCHAR:
            if f & URLCHAR:
                return i
        elif t == T_SPECIAL:
            if f & SPECIAL:
                return i
        else:  # pragma: no cover
            raise AssertionError(t)
    raise AssertionError(state)  # pragma: no cover - tables end in T_ANY/EOF


DISPATCH_ASCII: tuple[tuple[int, ...], ...] = tuple(
    tuple(_resolve_rule(s, cp) for cp in range(128))
    for s in range(len(TABLES))
)
_DISPATCH_FLAGS: dict[int, int] = {}


class Token:
    """A raw token: a [start, start+length) slice of the input + type id."""

    __slots__ = ("start", "length", "type")

    def __init__(self, start: int, length: int, type_: int):
        self.start = start
        self.length = length
        self.type = type_

    def text(self, s: str) -> str:
        return s[self.start : self.start + self.length]


class Parser:
    """Stateful token-at-a-time parser over one string (code-point space).

    Mirrors the reference TParser: a backtracking stack of position
    frames, the ``ignore``/``wanthost`` flags, plus the CJK widening
    post-step in :meth:`next_token`.
    """

    __slots__ = ("s", "cps", "n", "origin", "stack", "ignore", "wanthost")

    def __init__(self, s: str, cps=None, origin: int = 0, n: int | None = None):
        self.s = s
        # one extra 0 sentinel so class tests at EOF read code point 0
        self.cps = cps if cps is not None else [ord(c) for c in s] + [0]
        self.n = len(s) if n is None else n
        self.origin = origin
        # frame: [pos, lentok, state, resume_rule_index_or_-1]
        self.stack = [[origin, 0, TPS_Base, -1]]
        self.ignore = False
        self.wanthost = False

    # -- predicates ---------------------------------------------------------
    def _match(self, test: int, ch: str, pos: int) -> bool:
        cps = self.cps
        n = self.n
        if test == T_EOF:
            return pos >= n
        cp = cps[pos] if pos <= n else 0
        f = CLS_LIST[cp]
        if test == T_CJK:
            return bool(f & CJK)
        if test == T_EQ:
            return pos < n and cp < 128 and cp == ord(ch)
        if test == T_IGNORE:
            return self.ignore
        if test == T_ASCLET:
            return bool(f & ASCLET) and pos < n and cp < 128
        if test == T_ALPHA:
            return bool(f & ALPHA)
        if test == T_DIGIT:
            return bool(f & DIGIT)
        if test == T_ALNUM:
            return bool(f & ALNUM)
        if test == T_NOTALNUM:
            return not (f & ALNUM)
        if test == T_SPACE:
            return bool(f & SPACE)
        if test == T_XDIGIT:
            return bool(f & XDIGIT)
        if test == T_URLCHAR:
            return pos < n and bool(f & URLCHAR)
        if test == T_SPECIAL:
            return bool(f & SPECIAL)
        if test == T_STOPHOST:
            if self.wanthost:
                self.wanthost = False
                return True
            return False
        if test == T_HOST:
            return self._sub_parse(HOST, None)
        if test == T_URLPATH:
            return self._sub_parse(URLPATH, _S["InURLPathFirst"])
        raise AssertionError(test)

    def _sub_parse(self, want_type: int, push_state: int | None) -> bool:
        """p_ishost / p_isURLPath: recursive probe at the current position
        (reference TParserCopyInit + TParserGet, pg_cjk_parser.c:1013-1056)."""
        st = self.stack[-1]
        sub = Parser(self.s, cps=self.cps, origin=st[0], n=self.n)
        if push_state is None:
            sub.wanthost = True
        else:
            sub.stack.append([st[0], 0, push_state, -1])
        tok = sub.get_token()
        if tok is not None and tok.type == want_type:
            st[0] += tok.length
            st[1] += tok.length
            return True
        return False

    # -- specials -----------------------------------------------------------
    def _special(self, code: int, tok_start: int) -> None:
        st = self.stack[-1]
        if code == S_TAGS:
            # SpecialTags (pg_cjk_parser.c:948-970)
            l = st[1]
            if l in (6, 7, 8):
                t = self.s[tok_start : tok_start + l].lower()
                if l == 8 and t == "</script":
                    self.ignore = False
                elif l == 7 and t == "</style":
                    self.ignore = False
                elif l == 7 and t == "<script":
                    self.ignore = True
                elif l == 6 and t == "<style":
                    self.ignore = True
        elif code == S_FURL:
            self.wanthost = True
            st[0] -= st[1]
        elif code == S_HYPHEN:
            st[0] -= st[1]
        elif code == S_VER:
            st[0] -= st[1]
            st[1] = 0

    # -- the interpreter (reference TParserGet, pg_cjk_parser.c:2094-2258) --
    def get_token(self) -> Token | None:
        stack = self.stack
        st = stack[-1]
        n = self.n
        if st[0] >= n:
            return None
        tok_start = st[0]
        st[3] = -1
        out_len = -1
        out_type = 0
        bingo = False

        cps = self.cps
        dflags = _DISPATCH_FLAGS
        while st[0] <= n:
            rules = TABLES[st[2]]
            rule = None
            if st[3] >= 0:
                idx = st[3] + 1
                st[3] = -1
            else:
                idx = 0
                if st[0] < n and not self.ignore and not self.wanthost:
                    cp = cps[st[0]]
                    if cp < 128:
                        i = DISPATCH_ASCII[st[2]][cp]
                    else:
                        key = (st[2], CLS_LIST[cp])
                        i = dflags.get(key)
                        if i is None:
                            i = _resolve_rule(st[2], cp)
                            dflags[key] = i
                    if i >= 0:
                        idx = i
                        rule = rules[i]
            if rule is None:
                while True:
                    rule = rules[idx]
                    test = rule[0]
                    if test == T_ANY or self._match(test, rule[1], st[0]):
                        break
                    idx += 1
            flags = rule[2]

            if rule[5]:
                self._special(rule[5], tok_start)

            if flags & A_BINGO:
                out_len = st[1]
                st[1] = 0
                out_type = rule[4]
                bingo = True

            if flags & A_POP:
                stack.pop()
                st = stack[-1]
            elif flags & A_PUSH:
                st[3] = idx
                st = [st[0], st[1], st[2], -1]
                stack.append(st)
            elif flags & A_CLEAR:
                del stack[-2]
            elif flags & A_MERGE:
                prev = stack[-2]
                prev[0] = st[0]
                prev[1] = st[1]
                stack.pop()
                st = stack[-1]

            elif flags & A_CLRALL:
                del stack[:-1]

            if rule[3] != NO_STATE:
                st[2] = rule[3]

            if bingo or (st[0] >= n and not (flags & A_RERUN)):
                break
            if flags & (A_RERUN | A_POP):
                continue
            if st[0] < n:
                st[0] += 1
                st[1] += 1

        if not bingo:
            return None
        return Token(tok_start, out_len, out_type)

    # -- CJK post-step (prsd2_nexttoken, pg_cjk_parser.c:2284-2314) ---------
    def next_token(self) -> Token | None:
        tok = self.get_token()
        if tok is None:
            return None
        if tok.type == CJK_CHAR:
            cps = self.cps
            pos = self.stack[-1][0]
            cur = cps[tok.start]
            nxt = cps[pos] if pos < self.n else 0
            curf = CLS_LIST[cur]
            nxtf = CLS_LIST[nxt]
            if (curf & BAND2) and (nxtf & BAND2) and not (nxtf & ZEROW):
                # widen to an overlapping 2-gram (p_isCJK2gram_twice)
                tok.length += 1
            elif not self._is_unigram(cur, pos):
                # swallowed run-tail char -> zero-length blank
                tok.type = SPACE_T
                tok.length = 0
        return tok

    def _is_unigram(self, cur: int, pos: int) -> bool:
        """p_isCJKunigram (pg_cjk_parser.c:834-911)."""
        cps = self.cps
        f = CLS_LIST[cur]
        if cur >= 0x10000:
            return bool(f & CJK_EXT)
        if cur < 0x800:
            return False
        if f & BAND2:
            nxt = cps[pos] if pos < self.n else 0
            if not (CLS_LIST[nxt] & BAND2):
                prev = cps[pos - 2] if (pos - self.origin) >= 2 else 0
                if not (CLS_LIST[prev] & BAND2):
                    return True
            return False
        if f & UNIPUNCT:
            return True
        return False


def parse_fsm(s: str) -> list[Token]:
    """Tokenize a whole string with the exact FSM (no fast path)."""
    p = Parser(s)
    out = []
    while True:
        tok = p.next_token()
        if tok is None:
            return out
        out.append(tok)
