"""Deterministic synthetic Common-Crawl-style corpus.

Emits the exact input shape mandated by the engine target
(columns ``url:string, warc_ts:timestamp, html:binary, text:string,
lang:string``), generated as a pure function of (doc id, seed): no
Python RNG state, so any partition of the id range regenerates
identical rows (idempotent resume, reproducible benches).

Content pools draw on the reference's own golden strings plus mixed
zh/ja/ko/en sentences, URLs, emails, numbers, versions, hyphenated
words and entities so every token class is exercised.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

# sentence pools per language; (lang, sentence)
_POOL = [
    ("ja", "ドラえもん のび太の牧場物語 は楽しいです"),
    ("ja", "吾輩は猫である。名前はまだ無い。"),
    ("ja", "どこで生れたかとんと見当がつかぬ"),
    ("ja", "東京タワーの高さは333メートルです"),
    ("zh", "多拉A梦 野比大雄 是一部经典动画"),
    ("zh", "大韩民国与中华人民共和国建立了外交关系"),
    ("zh", "今天的天气真好，我们去公园散步吧。"),
    ("zh", "机器学习模型需要大量的训练数据"),
    ("ko", "개인정보 보호법 제15조에 따라 수집 및 이용 목적을 안내합니다"),
    ("ko", "대한민국의 수도는 서울입니다"),
    ("ko", "오늘 날씨가 정말 좋네요"),
    ("en", "The quick brown fox jumps over the lazy dog."),
    ("en", "Doraemnon Nobita and friends explore the farm story world."),
    ("en", "Search engines build inverted indexes for fast retrieval."),
    ("en", "It was a dark and stormy night, and the rain fell in torrents."),
    ("en", "state-of-the-art systems use foo-bar-1 style identifiers."),
    ("en", "Contact nobita@doraemon.com or visit https://www.doraemon.com/welcome.html today."),
    ("en", "Version 1.2.3 fixed 42 bugs, improving accuracy by 3.14 percent at 1e-5 tolerance."),
    ("en", "Install files under /usr/local/bin and read the docs &amp; examples."),
    ("en", "Read more at doraemon.com or mail fans@doraemon.com about it."),
    ("mixed", "Nobita 牧場物語 review: 野比大雄χΨψΩω rated 4.5 stars"),
    ("mixed", "「개인정보」 guidelines at https://example.org/policy?v=2 updated"),
    ("mixed", "CJK漢字123 tokens mix with ASCII words seamlessly"),
    ("mixed", "「大韩民国개인정보」 정책은 제15조에 따라 공개됩니다"),
    ("ko", "大韩民国개인정보의 수집 및 이용 목적(「개인정보 보호법」 제15조)"),
]

_LANGS = ("zh", "ja", "ko", "en", "mixed")
_EPOCH = np.datetime64("2024-10-08T00:00:00")


def _doc_fields(i: int, seed: int) -> tuple[str, str, str]:
    """(text, lang, url) for doc index i - pure function of (i, seed)."""
    h = (i * 2654435761 + seed * 97) & 0xFFFFFFFF
    lang = _LANGS[i % len(_LANGS)]
    n_sent = 3 + (h % 6)
    pool = [s for lg, s in _POOL if lg == lang] if lang != "mixed" else None
    sents = []
    for j in range(n_sent):
        g = (h ^ (j * 2246822519)) & 0xFFFFFFFF
        if lang == "mixed" or (g % 7) == 0:
            sents.append(_POOL[g % len(_POOL)][1])
        else:
            sents.append(pool[g % len(pool)])
    text = " ".join(sents)
    url = f"https://site{i % 997}.example/{lang}/page{i}.html"
    return text, lang, url


def _links_of(i: int) -> str:
    """Deterministic outlinks for page i: two absolute anchors (one
    per quote style; cross-site except when the target index collides
    with i's own site - at i % 997 in {498, 913} one of them is a
    same-site self-edge, which real crawls have too), one
    root-relative nav link, and a protocol-relative CDN link on every
    third page - the shapes ``ops.graph.extract_links`` must handle
    on real crawl HTML."""
    a = (i * 7 + 3) % 997
    b = (i * 13 + 11) % 997
    links = [
        f'<a href="https://site{a}.example/ref/page{a}.html">ref{a}</a>',
        f"<a href='https://site{b}.example/ref/page{b}.html'>ref{b}</a>",
        '<a href="/nav/home.html">home</a>',
    ]
    if i % 3 == 0:
        links.append(f'<a href="//cdn{i % 5}.example/asset.js">cdn</a>')
    return "".join(links)


def _html_of(i: int, text: str) -> bytes:
    return (
        f"<html><head><title>t{i}</title><style>.x{{color:red}}</style>"
        f"</head><body><p>{text}</p><nav>{_links_of(i)}</nav>"
        f"<script>var x={i};</script>"
        f"</body></html>"
    ).encode("utf-8")


def synth_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    parts = num_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, parts)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = [_doc_fields(i, seed) for i in ids]
            texts = [r[0] for r in rows]
            yield pd.DataFrame(
                {
                    "url": [r[2] for r in rows],
                    "warc_ts": pd.Series(
                        _EPOCH + np.array(ids, dtype="timedelta64[s]")
                    ),
                    "html": [_html_of(i, t) for i, t in zip(ids, texts)],
                    "text": texts,
                    "lang": [r[1] for r in rows],
                }
            )

    return base.mapInPandas(gen, CORPUS_SCHEMA)
