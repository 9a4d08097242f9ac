"""Iceberg path: full-text golden pins for EVERY SQL/DDL builder
(jar-free — pure string generation), plus the real end-to-end
integration test that executes CREATE TABLE + MERGE INTO round-trips
against a local hadoop catalog. The integration test is
skipped-with-reason in this sandbox: no Iceberg runtime jars are baked
in and there is no network/pip to vendor them (documented in
sources/iceberg.py) — it runs unmodified the moment
``iceberg-spark-runtime`` lands on the classpath.
"""

import textwrap

import pytest

from wos_crawler_spark.sources import iceberg as ib


def _jars_present() -> bool:
    import os
    from pathlib import Path

    import pyspark

    jars = Path(os.path.dirname(pyspark.__file__)) / "jars"
    return any("iceberg-spark-runtime" in p.name for p in jars.glob("*.jar"))


# ------------------------------------------------- full-text goldens


def test_golden_create_pages_table():
    assert ib.create_pages_table_sql("cat.db.pages") == textwrap.dedent(
        """\
        CREATE TABLE IF NOT EXISTS cat.db.pages (
          url string,
          warc_ts timestamp,
          html binary,
          text string,
          lang string,
          wave int
        ) USING iceberg
        PARTITIONED BY (days(warc_ts), bucket(256, url))"""
    )


def test_golden_create_seen_table():
    assert ib.create_seen_table_sql("cat.db.seen") == textwrap.dedent(
        """\
        CREATE TABLE IF NOT EXISTS cat.db.seen (
          url_hash bigint,
          wave int
        ) USING iceberg
        PARTITIONED BY (bucket(256, url_hash))"""
    )


def test_golden_merge_into():
    assert ib.merge_into_sql("cat.db.documents", "_staging_documents") == (
        "MERGE INTO cat.db.documents t\n"
        "USING _staging_documents s\n"
        "ON t.unique_id = s.unique_id\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert ib.merge_into_sql("t2", "v2", key="url_hash") == (
        "MERGE INTO t2 t\nUSING v2 s\nON t.url_hash = s.url_hash\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_golden_create_from_schema():
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("unique_id", T.StringType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField(
                "refs",
                T.ArrayType(
                    T.StructType([T.StructField("doi", T.StringType())])
                ),
            ),
        ]
    )
    assert ib.create_table_from_schema_sql(
        "cat.db.authors", schema, partition_by="bucket(64, unique_id)"
    ) == textwrap.dedent(
        """\
        CREATE TABLE IF NOT EXISTS cat.db.authors (
          unique_id string,
          rank int,
          refs array<struct<doi:string>>
        ) USING iceberg
        PARTITIONED BY (bucket(64, unique_id))"""
    )
    # no partition clause when none requested
    assert "PARTITIONED" not in ib.create_table_from_schema_sql(
        "t", T.StructType([T.StructField("a", T.LongType())])
    )


def test_golden_normalized_store_ddl_tracks_live_schema(spark):
    """The per-entity DDL derives from the LIVE parse schema — pin the
    documents table's DDL head so schema drift is loud."""
    from wos_crawler_spark.fixtures.synth import gen_pages_pdf
    from wos_crawler_spark.operators.normalize import normalize_all
    from wos_crawler_spark.operators.parse_plaintext import parse_pages

    pages = spark.createDataFrame(gen_pages_pdf([0], 1))
    tables = normalize_all(parse_pages(pages))
    ddl = ib.create_table_from_schema_sql(
        "cat.db.documents", tables["documents"].schema,
        partition_by="bucket(64, unique_id)",
    )
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS cat.db.documents (")
    assert "\n  unique_id string," in ddl
    assert ddl.endswith("PARTITIONED BY (bucket(64, unique_id))")


# ------------------------------------------------- integration (gated)


@pytest.mark.skipif(
    not _jars_present(),
    reason=(
        "Iceberg runtime jars absent: sandbox has no network/pip to vendor "
        "iceberg-spark-runtime (see sources/iceberg.py); this test executes "
        "unmodified once the jar is on the classpath"
    ),
)
def test_iceberg_merge_roundtrip_executes(tmp_path):
    """REAL execution: hadoop catalog on a tmp dir, CREATE TABLE from
    the live schema, MERGE the same batch twice → idempotent."""
    from pyspark.sql import SparkSession

    from wos_crawler_spark.fixtures.synth import gen_pages_pdf
    from wos_crawler_spark.operators.normalize import normalize_all
    from wos_crawler_spark.operators.parse_plaintext import parse_pages

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-it")
        .config(
            "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.it.type", "hadoop")
        .config("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
        .getOrCreate()
    )
    try:
        assert ib.iceberg_available(spark, catalog="it")
        spark.sql("CREATE NAMESPACE IF NOT EXISTS it.db")
        pages = spark.createDataFrame(gen_pages_pdf(list(range(6)), 6))
        tables = normalize_all(parse_pages(pages))
        docs = tables["documents"]
        spark.sql(
            ib.create_table_from_schema_sql(
                "it.db.documents", docs.schema,
                partition_by="bucket(64, unique_id)",
            )
        )
        ib.write_normalized_iceberg({"documents": docs}, "it.db")
        ib.write_normalized_iceberg({"documents": docs}, "it.db")  # again
        assert spark.table("it.db.documents").count() == 6
    finally:
        spark.stop()
