"""Corpus source negotiation, incl. the Iceberg read branch.

The sandbox ships no Iceberg runtime jar, so the real Iceberg
DataSourceV2 cannot load; instead a Python DataSource registered under
the same format name stands in, which makes ``read_corpus``'s iceberg
branch EXECUTE for real (format lookup -> load -> schema/column
validation) rather than being import-only.  If the branch rots (wrong
format string, broken column check, broken auto-routing), these tests
fail.
"""

import pytest

import pg_cjk_parser_spark.spark.sources as sources
from pg_cjk_parser_spark.spark.sources import (
    CORPUS_COLUMNS,
    iceberg_available,
    read_corpus,
)


@pytest.fixture(scope="module")
def fake_iceberg(spark):
    from pyspark.sql.datasource import DataSource, DataSourceReader

    class FakeIcebergReader(DataSourceReader):
        def read(self, partition):
            yield (
                "https://example.com/a",
                "2020-01-01T00:00:00",
                "<html>hello</html>",
                "hello world",
                "en",
            )

    class FakeIceberg(DataSource):
        @classmethod
        def name(cls):
            return "iceberg"

        def schema(self):
            return (
                "url string, warc_ts string, html string, "
                "text string, lang string"
            )

        def reader(self, schema):
            return FakeIcebergReader()

    spark.dataSource.register(FakeIceberg)
    return spark


def test_iceberg_not_on_classpath(spark):
    # the sandbox has no Iceberg jar: auto must route to parquet, and
    # the availability probe must not raise
    assert iceberg_available(spark) is False


def test_read_corpus_iceberg_branch_executes(fake_iceberg):
    df = read_corpus(fake_iceberg, "warehouse.db.corpus", fmt="iceberg")
    assert list(df.columns) == list(CORPUS_COLUMNS)
    rows = df.collect()
    assert rows[0].url == "https://example.com/a"
    assert rows[0].text == "hello world"


def test_read_corpus_auto_routes_to_iceberg(fake_iceberg, monkeypatch):
    # a catalog-style name (no path separators) with iceberg available
    # must take the iceberg branch under fmt='auto'
    monkeypatch.setattr(sources, "iceberg_available", lambda s: True)
    df = sources.read_corpus(fake_iceberg, "warehouse.db.corpus", fmt="auto")
    assert list(df.columns) == list(CORPUS_COLUMNS)
    assert df.count() == 1


def test_read_corpus_validates_required_columns(fake_iceberg):
    from pyspark.sql.datasource import DataSource, DataSourceReader

    class BadReader(DataSourceReader):
        def read(self, partition):
            yield ("x",)

    class BadSource(DataSource):
        @classmethod
        def name(cls):
            return "iceberg_bad"

        def schema(self):
            return "url string"

        def reader(self, schema):
            return BadReader()

    fake_iceberg.dataSource.register(BadSource)
    with pytest.raises(ValueError, match="missing columns"):
        read_corpus(fake_iceberg, "warehouse.db.bad", fmt="iceberg_bad")
