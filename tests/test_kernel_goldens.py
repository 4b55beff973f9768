"""Golden tokenizer-parity tests.

Expected values are the reference's own regression fixtures:
/root/reference/Readme.md:16-56 (ts_debug table), postgres-16.sh:60-76,
Readme.md:353-370 (tsvector/tsquery goldens).
"""

from pg_cjk_parser_spark.kernel.fsm import parse_fsm

DORAEMON = (
    "Doraemnon Nobita「ドラえもん のび太の牧場物語」多拉A梦 野比大雄χΨψΩω "
    "https://www.doraemon.com/welcome.html"
)

# (alias-id shorthand via text): the 34-token stream incl. zero-length
# swallowed run-tail blanks (Readme.md:21-56)
EXPECTED_DORAEMON = [
    ("asciiword", "Doraemnon"),
    ("blank", " "),
    ("asciiword", "Nobita"),
    ("cjk", "「"),
    ("cjk", "ドラ"),
    ("cjk", "ラえ"),
    ("cjk", "えも"),
    ("cjk", "もん"),
    ("blank", ""),      # swallowed ん
    ("blank", " "),
    ("cjk", "のび"),
    ("cjk", "び太"),
    ("cjk", "太の"),
    ("cjk", "の牧"),
    ("cjk", "牧場"),
    ("cjk", "場物"),
    ("cjk", "物語"),
    ("blank", ""),      # swallowed 語
    ("cjk", "」"),
    ("cjk", "多拉"),
    ("blank", ""),      # swallowed 拉
    ("asciiword", "A"),
    ("cjk", "梦"),
    ("blank", " "),
    ("cjk", "野比"),
    ("cjk", "比大"),
    ("cjk", "大雄"),
    ("blank", ""),      # swallowed 雄
    ("word", "χΨψΩω"),
    ("blank", " "),
    ("protocol", "https://"),
    ("url", "www.doraemon.com/welcome.html"),
    ("host", "www.doraemon.com"),
    ("url_path", "/welcome.html"),
]

from pg_cjk_parser_spark.kernel.fsm import TOKEN_ALIASES


def stream(s):
    return [(TOKEN_ALIASES[t.type], t.text(s)) for t in parse_fsm(s)]


def test_doraemon_ts_debug_stream():
    assert stream(DORAEMON) == EXPECTED_DORAEMON


def test_korean_mixed_stream():
    s = "大韩民国개인정보의 수집 및 이용 목적(「개인정보 보호법」 제15조)"
    got = stream(s)
    nonblank = [t for t in got if t[0] != "blank"]
    assert nonblank == [
        ("cjk", "大韩"), ("cjk", "韩民"), ("cjk", "民国"), ("cjk", "国개"),
        ("cjk", "개인"), ("cjk", "인정"), ("cjk", "정보"), ("cjk", "보의"),
        ("cjk", "수집"), ("cjk", "및"), ("cjk", "이용"), ("cjk", "목적"),
        ("cjk", "「"), ("cjk", "개인"), ("cjk", "인정"), ("cjk", "정보"),
        ("cjk", "보호"), ("cjk", "호법"), ("cjk", "」"), ("cjk", "제"),
        ("uint", "15"), ("cjk", "조"),
    ]


def test_simple_classes():
    assert stream("3.14") == [("float", "3.14")]
    assert stream("-5") == [("int", "-5")]
    assert stream("42") == [("uint", "42")]
    assert stream("1e-5") == [("sfloat", "1e-5")]
    assert stream("1.2e+3") == [("sfloat", "1.2e+3")]
    assert stream("1.2.3") == [("version", "1.2.3")]
    assert stream("nobita@doraemon.com") == [("email", "nobita@doraemon.com")]
    assert stream("/usr/local/bin") == [("file", "/usr/local/bin")]
    assert stream("&amp;") == [("entity", "&amp;")]
    assert stream("&#x1F;") == [("entity", "&#x1F;")]
    assert stream("doraemon.com") == [("host", "doraemon.com")]


def test_hyphenated_word_reemission():
    # trailing "-digits" is not part of the hyphenated word: the digit
    # lookahead state pops unless a letter follows (actionTPS_InHyphenDigitLookahead)
    got = stream("foo-bar-1")
    assert got == [
        ("asciihword", "foo-bar"),
        ("hword_asciipart", "foo"),
        ("blank", "-"),
        ("hword_asciipart", "bar"),
        ("blank", "-"),
        ("uint", "1"),
    ]
    # digits followed by letters DO join: numhword
    got_n = stream("foo-bar1x")
    assert got_n[0] == ("numhword", "foo-bar1x")
    got2 = stream("state-of-the-art")
    assert got2[0] == ("asciihword", "state-of-the-art")
    assert [t for t in got2 if t[0] == "hword_asciipart"] == [
        ("hword_asciipart", "state"),
        ("hword_asciipart", "of"),
        ("hword_asciipart", "the"),
        ("hword_asciipart", "art"),
    ]


def test_tags_and_script_suppression():
    s = "<html><body>hi<script>var x=1;</script>ok</body></html>"
    got = stream(s)
    tags = [t for t in got if t[0] == "tag"]
    assert [t[1] for t in tags] == [
        "<html>", "<body>", "<script>", "</script>", "</body>", "</html>",
    ]
    words = [t for t in got if t[0] == "asciiword"]
    # script body is swallowed into blanks; 'hi' and 'ok' survive
    assert [t[1] for t in words] == ["hi", "ok"]


def test_comment_and_doctype():
    assert ("tag", "<!-- hey -->") in stream("a <!-- hey --> b")
    assert stream("<!DOCTYPE html>")[0] == ("tag", "<!DOCTYPE html>")


def test_lextype_catalog():
    import pg_cjk_parser_spark as m

    cat = m.lextype()
    assert len(cat) == 24
    assert cat[0] == (1, "asciiword", "Word, all ASCII")
    assert cat[23] == (24, "cjk", "CJK Char")
    assert cat[11] == (12, "blank", "Space symbols")


def test_zht2zhs_golden():
    import pg_cjk_parser_spark as m

    assert m.cjk_zht2zhs("大韓民國") == "大韩民国"
    assert m.cjk_zht2zhs("ascii stays 123") == "ascii stays 123"
    assert m.cjk_zht2zhs("𠀀 4-byte passes") == "𠀀 4-byte passes"
    assert m.cjk_zht2zhs("中文簡體混合 mixed 體") == "中文简体混合 mixed 体"


def test_extraction_determinism_pin():
    """Per-url byte-identical extraction invariant: pin digests of the
    token stream + extracted text for fixed synthetic pages so any
    kernel change that altered extraction would fail loudly."""
    import hashlib

    from pg_cjk_parser_spark.kernel.tokenizer import lexemes, token_strings
    from pg_cjk_parser_spark.spark.corpus import _doc_fields, _html_of

    digests = []
    for i in (0, 1, 2, 3, 4, 997):
        text, lang, url = _doc_fields(i, seed=42)
        html = _html_of(i, text).decode("utf-8")
        stream = "\x1f".join(f"{a}\x1e{t}" for a, t in token_strings(html))
        lex = "\x1f".join(f"{t}\x1e{p}" for t, p in lexemes(text))
        digests.append(
            (
                url,
                hashlib.md5(stream.encode()).hexdigest()[:12],
                hashlib.md5(lex.encode()).hexdigest()[:12],
            )
        )
    # stream digests re-pinned 2026-08-17 when the synthetic pages
    # gained deterministic outlink anchors (<nav> block); the lexeme
    # digests over the text column are UNCHANGED from round 1.
    assert digests == [
        ("https://site0.example/zh/page0.html", "058680a0908f", "b5f3da556494"),
        ("https://site1.example/ja/page1.html", "54b24d18fa1d", "fb960da1318e"),
        ("https://site2.example/ko/page2.html", "28591845f5d6", "5f3d88739839"),
        ("https://site3.example/en/page3.html", "cc9920584119", "7e2b9215f1dc"),
        ("https://site4.example/mixed/page4.html", "e8309822f594", "25d65de93865"),
        ("https://site0.example/ko/page997.html", "65836579ca06", "198826acbf9e"),
    ]
