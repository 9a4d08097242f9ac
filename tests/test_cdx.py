"""CDXJ index source (sources/cdx.py): the spaces-in-JSON split trap,
malformed-line null degradation, latest-capture frontier seeding,
splittable read path, round trip through the serializer."""

from pyspark.sql import functions as F

from wos_crawler_spark.sources.cdx import (
    cdx_frontier_seeds,
    parse_cdxj_lines,
    read_cdxj,
    serialize_cdxj,
)


def _lines(spark):
    rows = [
        # JSON contains spaces AND a ")" — whole-line space split would
        # shear it; the blob must be taken by position
        'com,example)/a 20240101120000 {"url": "https://example.com/a", '
        '"status": "200", "mime": "text/html", "digest": "AAA", '
        '"filename": "f.warc.gz", "offset": "10", "length": "20"}',
        # older capture of the same url — frontier keeps the newer one
        'com,example)/a 20230101120000 {"url": "https://example.com/a", '
        '"status": "200", "mime": "text/html", "digest": "OLD", '
        '"filename": "g.warc.gz", "offset": "1", "length": "2"}',
        # non-200 and non-html captures — excluded from seeds
        'com,example)/b 20240101120000 {"url": "https://example.com/b", '
        '"status": "404", "mime": "text/html", "digest": "BBB", '
        '"filename": "f.warc.gz", "offset": "30", "length": "5"}',
        'com,example)/c 20240101120000 {"url": "https://example.com/c", '
        '"status": "200", "mime": "image/png", "digest": "CCC", '
        '"filename": "f.warc.gz", "offset": "40", "length": "5"}',
        # malformed JSON and a bare garbage line — null fields, no kill
        "com,example)/d 20240101120000 {not json",
        "garbage",
    ]
    return spark.createDataFrame([(r,) for r in rows], "value string")


def test_parse_cdxj_split_trap_and_null_degrade(spark):
    out = parse_cdxj_lines(_lines(spark)).collect()
    assert len(out) == 6
    a = [r for r in out if r["digest"] == "AAA"][0]
    assert a["urlkey"] == "com,example)/a"
    assert a["url"] == "https://example.com/a"
    assert a["status"] == 200 and a["offset"] == 10 and a["length"] == 20
    assert a["fetch_ts"] is not None
    # malformed rows survive with NULL url
    bad = [r for r in out if r["url"] is None]
    assert len(bad) == 2


def test_frontier_seeds_latest_capture(spark):
    seeds = cdx_frontier_seeds(parse_cdxj_lines(_lines(spark)))
    got = {r["url"]: r["digest"] for r in seeds.collect()}
    # /a deduped to the 2024 capture; /b (404) and /c (png) excluded
    assert got == {"https://example.com/a": "AAA"}


def test_roundtrip_and_splittable_read(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("com,ex)/p", "https://ex.com/p", 200, "text/html", "D1",
             "w.warc.gz", 5, 9),
        ],
        "urlkey string, url string, status int, mime string,"
        " digest string, filename string, offset long, length long",
    ).withColumn(
        "fetch_ts", F.to_timestamp(F.lit("2024-06-01 10:20:30"))
    )
    line = df.select(serialize_cdxj(df).alias("value"))
    import pathlib

    d = tmp_path / "cdx"
    d.mkdir()
    (d / "part-0.cdxj").write_text(line.first()["value"] + "\n")
    back = read_cdxj(spark, str(d)).first()
    assert back["urlkey"] == "com,ex)/p"
    assert back["url"] == "https://ex.com/p"
    assert back["status"] == 200 and back["offset"] == 5
    assert str(back["fetch_ts"]).startswith("2024-06-01 10:20:30")
