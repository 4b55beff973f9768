"""Training-data pipeline operators: dedup family + text stats."""

import pytest
from pyspark.sql import functions as F

from pg_cjk_parser_spark.ops.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    verify_jaccard,
)
from pg_cjk_parser_spark.ops.textstats import lang_of


BASE = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "falls gently on the quiet green meadow near the old stone bridge"
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = []
    words = BASE.split()
    for i in range(30):
        rows.append((i, " ".join(words)))  # exact dups of each other
    for i in range(30, 60):
        w = list(words)
        w[i % len(w)] = f"mut{i}"         # near dups (1-word mutation)
        rows.append((i, " ".join(w)))
    for i in range(60, 90):
        rows.append((i, f"totally different text number {i} about "
                        f"topic{i} and subject{i*7} with unique words"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(dup_docs):
    groups = exact_duplicates(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0].n_dups == 30
    assert groups[0].keep_id == 0


def test_minhash_lsh_finds_near_dups(dup_docs):
    sigs = minhash_signatures(dup_docs, n_hashes=64, shingle_k=5)
    pairs = lsh_candidate_pairs(sigs, bands=16, rows_per_band=4)
    found = verify_jaccard(dup_docs, pairs, threshold=0.7)
    got = {(r.id_a, r.id_b) for r in found.collect()}
    # ground truth: exact jaccard over all pairs
    want = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(dup_docs, n=5, min_jaccard=0.0)
        .where(F.col("jaccard") >= 0.7)
        .collect()
    }
    assert want, "test corpus must contain near-dup pairs"
    missed = want - got
    # LSH at (16 bands x 4 rows) catches j>=0.7 pairs w.h.p.
    assert len(missed) / len(want) < 0.02, f"missed {len(missed)}/{len(want)}"
    assert got <= want or all(
        r.jaccard >= 0.7 for r in found.collect()
    )


def test_simhash_near_dup_hamming(spark, dup_docs):
    sh = {r.id: r.simhash for r in simhash64(dup_docs).collect()}
    assert sh[0] == sh[1]  # identical docs -> identical hash

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sh[0], sh[35]) <= 12        # 1-word mutation stays close
    assert ham(sh[0], sh[65]) >= 20        # unrelated text is far


def test_lang_of_goldens():
    assert lang_of("The quick brown fox jumps over the lazy dog") == "en"
    assert lang_of("吾輩は猫である。名前はまだ無い。") == "ja"
    assert lang_of("机器学习模型需要大量的训练数据") == "zh"
    assert lang_of("대한민국의 수도는 서울입니다") == "ko"
    assert lang_of("Быстрая коричневая лиса") == "ru"
    assert lang_of("12345 !!!") == "unknown"
    assert lang_of("") == "unknown"
    assert lang_of("ドラえもん") == "ja"
