"""Bit-identity of the driver-side XXH64 with Spark's xxhash64."""

from pg_cjk_parser_spark.index.xxh64 import (
    pmod,
    spark_xxhash64_long,
    spark_xxhash64_str,
)

STRINGS = [
    "", "a", "ab", "abc", "abcd", "abcde", "spark", "merg",
    "のび", "び太", "大韩", "「", "개인", "x" * 31, "y" * 32, "z" * 100,
    "www.doraemon.com", "漢字とカナmixed123",
]


def test_string_hash_matches_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64_str(r.s) == r.h, r.s


def test_long_hash_matches_spark(spark):
    from pyspark.sql import functions as F

    vals = [0, 1, -1, 42, -(1 << 62), (1 << 62), 1234567890123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select("v", F.xxhash64("v").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64_long(r.v) == r.h, r.v


def test_pmod_matches_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    rows = df.select(
        "s", F.pmod(F.xxhash64("s"), F.lit(64)).cast("int").alias("b")
    ).collect()
    for r in rows:
        assert pmod(spark_xxhash64_str(r.s), 64) == r.b
