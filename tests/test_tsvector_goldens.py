"""tsvector/tsquery golden-parity tests (reference Readme.md:353-370,
postgres-16.sh:60-76)."""

from pg_cjk_parser_spark.kernel.stem import stem
from pg_cjk_parser_spark.kernel.tsvector import (
    plainto_tsquery,
    to_tsquery,
    to_tsvector,
    ts_match,
    tsquery_str,
    tsvector_str,
)

DORAEMON = "Doraemnon Nobita「ドラえもん のび太の牧場物語」多拉A梦 野比大雄χΨψΩω"


def test_doraemon_tsvector_golden():
    got = tsvector_str(to_tsvector(DORAEMON))
    expected = (
        "'doraemnon':1 'nobita':2 'χψψωω':22 '「':3 '」':15 'えも':6 "
        "'のび':8 'の牧':11 'び太':9 'もん':7 'ドラ':4 'ラえ':5 '場物':13 "
        "'多拉':16 '大雄':21 '太の':10 '梦':18 '比大':20 '牧場':12 "
        "'物語':14 '野比':19"
    )
    # python sorted() orders lexemes differently from PG's C collation;
    # compare as sets of 'lex':positions entries instead
    assert set(got.split(" ")) == set(expected.split(" "))


def test_korean_tsvector_golden():
    s = "大韩民国개인정보의 수집 및 이용 목적(「개인정보 보호법」 제15조)"
    expected = (
        "'15':21 '「':13 '」':19 '国개':4 '大韩':1 '民国':3 '韩民':2 "
        "'개인':5,14 '목적':12 '및':10 '보의':8 '보호':17 '수집':9 "
        "'이용':11 '인정':6,15 '정보':7,16 '제':20 '조':22 '호법':18"
    )
    got = tsvector_str(to_tsvector(s))
    assert set(got.split(" ")) == set(expected.split(" "))


def test_tsquery_goldens():
    assert tsquery_str(to_tsquery("のび太")) == "'のび' <-> 'び太'"
    assert tsquery_str(to_tsquery("野比大雄")) == "'野比' <-> '比大' <-> '大雄'"
    assert (
        tsquery_str(to_tsquery("「大韩民国개인정보"))
        == "'「' <-> '大韩' <-> '韩民' <-> '民国' <-> '国개' <-> '개인' <-> '인정' <-> '정보'"
    )


def test_match_goldens():
    v = to_tsvector(DORAEMON)
    assert ts_match(v, to_tsquery("のび太"))
    assert ts_match(v, to_tsquery("野比大雄"))
    assert not ts_match(v, to_tsquery("野比大雄x"))
    assert ts_match(v, to_tsquery("'doraemnon' & '野比大雄'"))
    assert ts_match(v, to_tsquery("zzz | 'のび太'"))
    assert not ts_match(v, to_tsquery("!'doraemnon'"))
    assert ts_match(v, plainto_tsquery("Nobita 牧場物語"))
    # phrase must be consecutive: 'のび' <-> '太の' is NOT adjacent
    assert not ts_match(v, to_tsquery("'のび' <-> '太の'"))
    assert ts_match(v, to_tsquery("'のび' <2> '太の'"))


def test_stopword_consumes_position():
    v = to_tsvector("multi A dream")
    assert v["multi"] == [1]
    assert "a" not in v
    assert v["dream"] == [3]


def test_porter2_vectors():
    vectors = {
        "caresses": "caress", "ties": "tie", "cries": "cri",
        "gaps": "gap", "gap": "gap", "running": "run", "hopping": "hop",
        "hoping": "hope", "beautiful": "beauti", "skies": "sky",
        "dying": "die", "news": "news", "inning": "inning",
        "happy": "happi", "say": "say", "by": "by",
        "argument": "argument", "arguments": "argument",
        "generously": "generous", "conditional": "condit",
        "consolidated": "consolid", "doraemnon": "doraemnon",
        "nobita": "nobita", "engineering": "engin",
    }
    for w, want in vectors.items():
        assert stem(w) == want, (w, stem(w), want)
