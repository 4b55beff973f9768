"""ts_headline behavior tests (semantics per reference
mark_hl_words/mark_hl_fragments + PG rendering conventions)."""

from pg_cjk_parser_spark.functions.headline import headline


LONG = (
    "PostgreSQL full text search supports many languages. "
    "The Doraemon comics follow Nobita and his robot cat through many "
    "adventures in Tokyo and beyond. Fans of the series praise its humor "
    "warmth and imagination across generations of readers everywhere. "
    "Other unrelated sentences pad this document with more filler words "
    "so the snippet selector has something to trim away happily."
)


def test_basic_highlight():
    out = headline(LONG, "Nobita")
    assert "<b>Nobita</b>" in out
    assert "filler" not in out  # window does not span the whole doc


def test_multi_term_cover():
    out = headline(LONG, "robot adventures")
    assert "<b>robot</b>" in out
    assert "<b>adventures</b>" in out


def test_cjk_highlight():
    text = "前置き " + "これは「ドラえもん のび太の牧場物語」についての文章です。" + " 後書き"
    out = headline(text, "のび太", min_words=3, max_words=8)
    assert "<b>" in out
    assert "のび" in out


def test_custom_selectors_and_fragments():
    out = headline(
        LONG,
        "Nobita imagination",
        max_fragments=2,
        start_sel="[",
        stop_sel="]",
        fragment_delimiter=" // ",
        min_words=4,
        max_words=8,
    )
    assert "[" in out and "]" in out


def test_highlight_all():
    out = headline("a tiny doc about cats", "cats", highlight_all=True)
    assert out.endswith("<b>cats</b>")
    assert out.startswith("a tiny doc")


def test_no_match_shows_min_words_prefix():
    out = headline(LONG, "zebra", min_words=5, max_words=10)
    assert out.startswith("PostgreSQL full text search")
    assert "<b>" not in out


def test_stopword_only_query():
    out = headline(LONG, "the")
    assert "<b>" not in out


def test_option_validation():
    import pytest

    with pytest.raises(ValueError):
        headline(LONG, "x", min_words=40, max_words=35)


def test_headline_websearch_mode():
    from pg_cjk_parser_spark.functions.headline import headline

    t = "the spark merge value big table fast row scan slow"
    assert headline(t, '"spark merge"', mode="websearch") == headline(
        t, "spark <-> merge", mode="tsquery"
    )
    h = headline(t, "spark or big", mode="websearch")
    assert "<b>spark</b>" in h and "<b>big</b>" in h


def test_headline_or_wide_cover():
    """Old-PG quirk the reference inherits: a cover of 'a | b' spans
    both terms when both are present, so the snippet window centers
    on the span, not a single occurrence."""
    from pg_cjk_parser_spark.functions.headline import headline

    t = ("spark " + "row " * 6 + "vector " + "line " * 10).strip()
    h = headline(t, "spark | vector", mode="tsquery",
                 min_words=5, max_words=12)
    assert "<b>spark</b>" in h and "<b>vector</b>" in h


def test_headline_prefix_operand():
    from pg_cjk_parser_spark.functions.headline import headline

    t = "the spark merge value big batch table fast row scan"
    h = headline(t, "b:* & merge", mode="tsquery", min_words=5, max_words=12)
    assert "<b>big</b>" in h and "<b>batch</b>" in h and "<b>merge</b>" in h
    # prefix with no match in the doc -> no highlight
    h2 = headline(t, "zz:*", mode="tsquery", min_words=5, max_words=12)
    assert "<b>" not in h2


def test_headline_negated_operand_rejects_covers():
    """PG hlfinditem marks negated operands' words too, so the
    window recheck rejects covers containing them; the no-cover
    fallback window still highlights item words (PG behavior)."""
    from pg_cjk_parser_spark.functions.headline import headline

    # cover [foo..?] would contain bar -> rejected; lone-foo window
    # (no bar inside) is accepted
    h = headline("foo baz word bar", "foo & !bar", mode="tsquery",
                 min_words=2, max_words=3)
    assert h.startswith("<b>foo</b>") and "<b>bar</b>" not in h
    # no valid cover at all -> fallback window, items still marked
    h2 = headline("foo bar baz word line", "foo & !bar", mode="tsquery",
                  min_words=3, max_words=8)
    assert "<b>foo</b>" in h2
