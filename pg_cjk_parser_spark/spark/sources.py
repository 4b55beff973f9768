"""Corpus sources/sinks: format negotiation for the documents table.

The engine is format-agnostic (every pipeline takes a DataFrame); this
module standardizes reading the Common-Crawl-style corpus shape
``(url, warc_ts, html, text, lang)`` from Iceberg when an Iceberg
catalog is configured on the session, falling back to Parquet.  This
sandbox ships no Iceberg runtime jar, so the Iceberg branch is
exercised only by plan construction at deploy time; Parquet is the
tested path, and the index layout itself (hive-partitioned parquet +
manifests) is directly registrable as an external Iceberg table.

Vendoring attempts (2026-08-16, re-verified twice on 2026-08-17 in
round 5, and again on 2026-08-22 in round 6 - curl to repo1.maven.org
still exits 000 and ``pip download pyiceberg`` still finds no
distribution): ``pip download pyiceberg`` fails with DNS
resolution errors against the sandbox's package index, Maven Central
(repo1.maven.org) is unreachable (curl exit 000), and no iceberg jar
exists anywhere on the filesystem, so neither iceberg-spark-runtime
nor pyiceberg can be fetched.  The executing
DSv2 stand-in (tests/test_sources.py: format lookup -> load ->
schema/column validation against a registered Python data source)
remains the deepest coverage available here; on a real deployment the
only change is ``--packages org.apache.iceberg:iceberg-spark-runtime``
plus a catalog config, which this module's format negotiation already
detects via ``iceberg_available``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_corpus(
    spark: SparkSession,
    path_or_table: str,
    fmt: str = "auto",
) -> DataFrame:
    """Read a corpus table by parquet path or Iceberg table name."""
    if fmt == "auto":
        import os

        looks_like_path = (
            "/" in path_or_table
            or "://" in path_or_table
            or os.path.exists(path_or_table)
        )
        fmt = (
            "iceberg"
            if not looks_like_path and iceberg_available(spark)
            else "parquet"
        )
    if fmt == "parquet":
        df = spark.read.parquet(path_or_table)
    else:
        # iceberg (table name via the session catalog) or any other
        # registered DataSourceV2 format
        df = spark.read.format(fmt).load(path_or_table)
    missing = [c for c in ("url", "text") if c not in df.columns]
    if missing:
        raise ValueError(f"corpus table missing columns: {missing}")
    return df
