"""Differential tests: hybrid fast-path tokenizer == exact FSM."""

import random

from pg_cjk_parser_spark.kernel.tokenizer import tokenize, tokenize_exact

ATOMS = [
    "ドラえもん", "のび太の牧場物語", "野比大雄", "多拉A梦", "大韩民国",
    "개인정보 보호법", "제15조", "「", "」", "（", "）", "、", "。",
    "Doraemnon", "Nobita", "state-of-the-art", "foo-bar-1", "χΨψΩω",
    "https://www.doraemon.com/welcome.html", "http://x.co:8080/a?b=c",
    "nobita@doraemon.com", "42", "-5", "+7", "3.14", "1e-5", "1.2E+3",
    "1.2.3", "5..3", "&amp;", "&#123;", "&#x1F;", "/usr/local/bin",
    "~/x", "./run.sh", "a.out", "readme.txt", "<b>", "</b>", "<br/>",
    "<!-- c -->", "<!DOCTYPE html>", "<?xml version='1.0'?>",
    "<script>var x=1;</script>", "<style>.a{color:red}</style>",
    "<a href=\"https://x.co/y\">", "doraemon.com", "www.x-y_z.org",
    " ", "  ", "\t", "\n", ", ", ". ", "... ", "!?", "()", "[]",
    "---", "++", "a_b", "_x", "mixed漢字word", "テストtest테스트",
    "ドラ゙もん", "𠀀𠀁", "étude", "​", "xःy",
    "<", ">", "&", "@", ":", ";", "'", '"', "\\", "|", "100%", "a:b",
    "1:2", "v1.2.3-rc1", "CJK漢字123", "字", "字a字", "ん", "っ",
    # email / url / file / hyphen-word fast-path stressors
    "a.b-c_d@mail.x.co.uk", "9a@x.co", "1.2@x.co", "mail@x.co.",
    "ab@x.co:8080/z", "a@x.co/z", "e@x.co-b", "a@b", "a@@b.co",
    "x.co/", "x.co/a,b", "x.co/'q'", "example.org/policy?v=2",
    "https://x.co", "HTTPS://X.CO/Q", "ftp://", "https://localhost/x",
    "x.co//double", "x.co/path/", "end-to-end", "plug-in.",
    "a-b-c-d-e", "over-9000", "go2-win", "ab3cd-x", "-a-b", "a-1-b",
    "foo--bar", "ab-cd@x.co", "ab-cd.", "ab-cd:z", "ab-cd://x.co",
    "state-of-the-art.", "/usr/", "/a.b.c", "/a..b", "/a.-b", "~/.rc",
    "/a/b-c/d_e.f", "über-gut", "naïve-plan", "x.ab-cd", "x.c-om",
    # numhword-tail / end-of-input-dot fast-path stressors (round 3)
    "foo-bar-12", "a-b-1", "a-b-c-123", "foo-bar-1.2", "foo-bar-1-2",
    "foo-bar-1x", "foo-bar-1-x", "foo-bar-1.x", "foo-bar-1e5",
    "foo-bar-1.", "foo-bar-1..", "foo-bar-1:8080", "foo-bar-1/z",
    "foo-bar-1@x.co", "Foo-Bar-9", "x foo-bar-1. y", "hello.",
    "hello..", "hello. ", "hello.\n", "w.", ".", "..", "a.b.",
    "foo-bar-1,", "foo-bar-1;", "foo-bar-1.ab-cd.", "foo-bar-1.ab",
    "foo-bar-1..x", "foo-bar-1._", "foo-bar-1.-q", "a-b-2.x.co/z",
    # dotless-sfloat host preemption (FSM: '3e5' preempts host/email/
    # url parses; dotted mantissa does not)
    "3e5.co", "3e5.ra", "1e5.xy", "3e5x.co", "3e5.co/a", "3e5@x.co",
    "http://3e5.co/x", "1.2e5.co", "1.2e5@x.co", "ftp://1.2e3.org/x",
    "3e5.co.uk", "3e5.3e5.co", "3e+5.co", "a.3e5.co", "x3e5.co",
    "3e5-x.co", "33e.co", "1e5.co/@", "3e5.co:80",
]


def test_structured_fragment_fuzz():
    """Random concatenations of the fragments that exposed the
    dotless-sfloat host preemption bug (round 3): hybrid == FSM."""
    rng = random.Random(99)
    parts = [
        "foo", "bar", "a", "xy", "1", "23", "-", ".", " ", "@", "/",
        ":", "x.co", "漢字", "e5", "_", ",", "\n", "3e5", "1.2e5",
        "http://", "co", "uk",
    ]
    for _ in range(3000):
        s = "".join(rng.choice(parts) for _ in range(rng.randint(1, 16)))
        assert_same(s)


def assert_same(s):
    assert tokenize(s) == tokenize_exact(s), repr(s)


def test_atoms_and_goldens():
    for a in ATOMS:
        assert_same(a)
    assert_same(
        "Doraemnon Nobita「ドラえもん のび太の牧場物語」多拉A梦 野比大雄χΨψΩω "
        "https://www.doraemon.com/welcome.html"
    )
    assert_same("大韩民国개인정보의 수집 및 이용 목적(「개인정보 보호법」 제15조)")


def test_random_concatenations():
    rng = random.Random(42)
    for trial in range(300):
        k = rng.randint(1, 12)
        joiner = rng.choice(["", " ", "", " ", "\n", ", "])
        s = joiner.join(rng.choice(ATOMS) for _ in range(k))
        assert_same(s)


def test_random_char_soup():
    rng = random.Random(7)
    pool = (
        "abcXYZ019 .-_@:/<>&~;!?'\"()\\="
        + "漢字のひ太국개「」"
        + "゙́​𠀀"
    )
    for trial in range(300):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(0, 60)))
        assert_same(s)


def test_hypothesis_fuzz():
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        return
    alphabet = st.sampled_from(
        list("ab1 .-@:/<&~'\"") + list("漢のひ국「𠀀゙​")
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(alphabet, max_size=40).map("".join))
    def inner(s):
        assert tokenize(s) == tokenize_exact(s)

    inner()


def test_lexemes_equals_fsm_lexize_path():
    import random
    from pg_cjk_parser_spark.kernel.tokenizer import lexemes
    from pg_cjk_parser_spark.kernel.tsvector import iter_lexemes

    rng = random.Random(99)
    for trial in range(150):
        s = rng.choice(["", " "]).join(
            rng.choice(ATOMS) for _ in range(rng.randint(0, 10))
        )
        assert lexemes(s) == list(iter_lexemes(s)), repr(s)


def test_all_24_token_types_reachable():
    from pg_cjk_parser_spark.kernel.tokenizer import tokenize
    from pg_cjk_parser_spark.kernel.fsm import TOKEN_ALIASES

    sample = (
        "word λόγος num3x a@b.co http://h.co/p h.co 1e5 1.2.3 "
        "x-1 λ-1b mix-a1 , <b> ftp:// a-b1 big-deal λmix-λx /p?q "
        "/usr/x 3.14 -5 42 &amp; 漢"
    )
    seen = set()
    for st, ln, tt in tokenize(sample):
        seen.add(tt)
    missing = {
        TOKEN_ALIASES[i] for i in range(1, 25) if i not in seen
    }
    assert not missing, missing


def test_overlong_token_fast_path_matches_exact():
    from pg_cjk_parser_spark.kernel.tokenizer import lexemes
    from pg_cjk_parser_spark.kernel.tsvector import iter_lexemes

    for s in (
        "hello " + "a" * 3000 + " world",
        "x " + "9" * 2500 + " y",
        "a" * 2045 + " tail",
    ):
        assert lexemes(s) == list(iter_lexemes(s)), len(s)
