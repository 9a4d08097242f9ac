"""Iceberg sink path (BASELINE.json input_hint: "Iceberg table of
Common-Crawl-style web pages"). The sandbox has no Iceberg jars, so
every entry point is CONDITIONAL: callers probe
:func:`iceberg_available` and fall back to the parquet twins in
``sources/exports.py``; the SQL/DDL builders below are pure string
generation and unit-tested jar-free.

Production layout (SURVEY §2.1 S6/S8, §4 partition pruning):

- ``pages``  PARTITIONED BY (days(warc_ts), bucket(256, url)) — hidden
  partitioning gives storage-partitioned fetch joins (the
  prepare_fetch_side cache is its sandbox stand-in) and day-level
  pruning for ``since_ts`` scans.
- ``seen``   PARTITIONED BY (bucket(256, url_hash)) — the anti-join's
  build side never re-shuffles.
- normalized store: one table per entity, idempotent via
  ``MERGE INTO ... ON unique_id WHEN NOT MATCHED THEN INSERT`` (the
  snapshot-isolated twin of exports.write_normalized's anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Catalog impls that mark an Iceberg-enabled session.
_ICEBERG_CATALOG_CLASSES = (
    "org.apache.iceberg.spark.SparkCatalog",
    "org.apache.iceberg.spark.SparkSessionCatalog",
)


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    """True when an Iceberg catalog is configured AND the runtime class
    is loadable (jars present). Cheap, no side effects."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if impl not in _ICEBERG_CATALOG_CLASSES:
        return False
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001 — jar absent
        return False


def create_pages_table_sql(table: str = "pages") -> str:
    """DDL for the crawl input/output table (input_hint shape)."""
    return f"""CREATE TABLE IF NOT EXISTS {table} (
  url string,
  warc_ts timestamp,
  html binary,
  text string,
  lang string,
  wave int
) USING iceberg
PARTITIONED BY (days(warc_ts), bucket(256, url))"""


def create_seen_table_sql(table: str = "seen") -> str:
    return f"""CREATE TABLE IF NOT EXISTS {table} (
  url_hash bigint,
  wave int
) USING iceberg
PARTITIONED BY (bucket(256, url_hash))"""


def create_table_from_schema_sql(
    table: str,
    schema,
    partition_by: str | None = None,
) -> str:
    """Iceberg DDL for an arbitrary ``StructType`` — the normalized
    store's per-entity tables (documents, authors, ...) derive their
    DDL from the live parse schema so the two can never drift.
    ``partition_by``: Iceberg transform list, e.g. ``"bucket(64,
    unique_id)"`` (the normalized tables' default — co-locates the
    MERGE join on the key it merges on)."""
    cols = ",\n".join(
        f"  {f.name} {f.dataType.simpleString()}" for f in schema.fields
    )
    ddl = f"CREATE TABLE IF NOT EXISTS {table} (\n{cols}\n) USING iceberg"
    if partition_by:
        ddl += f"\nPARTITIONED BY ({partition_by})"
    return ddl


def merge_into_sql(target: str, staging_view: str, key: str = "unique_id") -> str:
    """Idempotent insert-if-absent upsert — the Iceberg twin of the
    parquet sink's left_anti + append (A5 skip-existing semantics)."""
    return (
        f"MERGE INTO {target} t\n"
        f"USING {staging_view} s\n"
        f"ON t.{key} = s.{key}\n"
        f"WHEN NOT MATCHED THEN INSERT *"
    )


def write_pages_iceberg(pages: DataFrame, table: str, wave: int | None = None) -> None:
    """S6 on Iceberg: snapshot-atomic append (one commit per wave —
    resume is time travel to the last committed snapshot)."""
    from pyspark.sql import functions as F

    df = pages.withColumn("wave", F.lit(wave)) if wave is not None else pages
    df.writeTo(table).append()


def write_normalized_iceberg(
    tables: dict[str, DataFrame], namespace: str, key: str = "unique_id"
) -> None:
    """S8 on Iceberg: per-table MERGE INTO keyed on unique_id.
    Children merge on the same document key — a re-run of a wave whose
    documents already landed inserts nothing anywhere. Intra-batch
    duplicates are collapsed BEFORE the merge (MERGE ... WHEN NOT
    MATCHED inserts every unmatched SOURCE row, so two staged copies of
    one unique_id would both land): documents on the key, children by
    full row — mirroring the parquet twin."""
    for name, df in tables.items():
        if key not in df.columns:
            df.writeTo(f"{namespace}.{name}").append()
            continue
        staged = (
            df.dropDuplicates([key]) if name == "documents"
            else df.dropDuplicates()
        )
        view = f"_staging_{name}"
        staged.createOrReplaceTempView(view)
        df.sparkSession.sql(merge_into_sql(f"{namespace}.{name}", view, key))


def write_normalized_auto(
    tables: dict[str, DataFrame], root: str, spark: SparkSession
) -> None:
    """Dispatch: MERGE INTO when an Iceberg catalog is live, else the
    parquet anti-join sink. ``root`` is a namespace (Iceberg) or a
    filesystem dir (parquet)."""
    if iceberg_available(spark):
        write_normalized_iceberg(tables, root)
    else:
        from wos_crawler_spark.sources.exports import write_normalized

        write_normalized(tables, root)
