"""WET source: Content-Length framing (payloads containing the record
magic survive), byte-exact unicode round trips, malformed-record
resync, the file-per-task reader, and serialize determinism."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.sources.wet import (
    parse_wet,
    parse_wet_bytes,
    read_wet,
    serialize_wet,
    wet_file_bytes,
    wet_record_bytes,
    with_warc_ts,
)

D = "2020-06-01T12:34:56Z"


def test_magic_inside_payload_survives():
    """The classic WET bug: a payload containing 'WARC/1.0\\r\\n' must
    not split the record — Content-Length framing is authoritative."""
    evil = "line one\r\nWARC/1.0\r\nWARC-Type: conversion\r\n\r\nfake"
    blob = wet_file_bytes(
        [("https://a", D, evil), ("https://b", D, "plain")]
    )
    got = list(parse_wet_bytes(blob))
    assert [(u, t) for u, _, t, _ in got] == [
        ("https://a", evil),
        ("https://b", "plain"),
    ]


def test_unicode_framed_by_octets():
    t = "héllo wörld — 日本語 ☃"
    blob = wet_file_bytes([("https://u", D, t)])
    (u, d, text, nb) = next(iter(parse_wet_bytes(blob)))
    assert text == t
    assert nb == len(t.encode("utf-8"))
    assert nb > len(t)  # chars < octets for this payload


def test_malformed_records_resync():
    good = wet_record_bytes("https://ok", D, "fine")
    bad_len = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://bad\r\n"
        b"Content-Length: notanumber\r\n\r\nbody\r\n\r\n"
    )
    missing_len = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://bad2\r\n\r\nbody\r\n\r\n"
    )
    truncated = wet_record_bytes("https://cut", D, "x" * 100)[:-60]
    for noise in (bad_len, missing_len):
        got = list(parse_wet_bytes(noise + good))
        assert [u for u, *_ in got] == ["https://ok"], noise
    got = list(parse_wet_bytes(good + truncated))
    assert [u for u, *_ in got] == ["https://ok"]


def test_empty_and_null_payloads():
    blob = wet_file_bytes([("https://e", D, "")])
    (u, _, text, nb) = next(iter(parse_wet_bytes(blob)))
    assert (text, nb) == ("", 0)
    assert list(parse_wet_bytes(b"")) == []
    assert list(parse_wet_bytes(b"garbage no magic")) == []


def test_roundtrip_through_files(spark, tmp_path):
    rows = [
        (f"https://ex.com/{i:03d}", D, f"doc {i} body — π {'x' * i}")
        for i in range(40)
    ]
    # two files, interleaved records
    (tmp_path / "a.wet").write_bytes(wet_file_bytes(rows[::2]))
    (tmp_path / "b.wet").write_bytes(wet_file_bytes(rows[1::2]))
    got = read_wet(spark, str(tmp_path)).collect()
    assert sorted((r["url"], r["text"]) for r in got) == sorted(
        (u, t) for u, _, t in rows
    )
    ts = {r["warc_ts"] for r in got}
    assert len(ts) == 1 and next(iter(ts)) is not None
    assert all(
        r["n_bytes"] == len(r["text"].encode("utf-8")) for r in got
    )


def test_serialize_parse_identity_and_determinism(spark):
    rows = [
        (i, f"https://ex.com/{i}", D, f"text {i} ü{i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "grp long, url string, warc_date string, text string"
    ).withColumn("grp", F.col("grp") % 3)
    a = serialize_wet(df.repartition(1), "grp").collect()
    b = serialize_wet(df.repartition(7), "grp").collect()
    assert sorted((r["grp"], bytes(r["wet"])) for r in a) == sorted(
        (r["grp"], bytes(r["wet"])) for r in b
    )
    parsed = with_warc_ts(parse_wet(serialize_wet(df, "grp"), "wet"))
    assert sorted(
        (r["url"], r["text"]) for r in parsed.collect()
    ) == sorted((u, t) for _, u, _, t in rows)
    assert parsed.filter(F.col("warc_ts").isNull()).count() == 0


def test_bad_date_yields_null_ts_not_error(spark):
    blob = wet_file_bytes([("https://x", "not-a-date", "t")])
    df = spark.createDataFrame([(blob,)], "content binary")
    got = with_warc_ts(parse_wet(df)).collect()
    assert len(got) == 1 and got[0]["warc_ts"] is None


def test_fuzz_roundtrip_byte_exact(spark):
    """500 seeded adversarial payloads — unicode planes, control
    chars, CRLF runs, embedded record magics, header-shaped lines,
    empty docs — must round-trip byte-exact through serialize→parse
    (Content-Length framing is the only authority)."""
    import random

    rng = random.Random(20260819)
    alphabet = (
        "abc xyz\t\r\n"
        "WARC/1.0\r\n"
        "Content-Length: 7\r\n"
        "émojis: \U0001f600☃ 日本語 Ж א"
    )
    rows = []
    for i in range(500):
        n = rng.randrange(0, 120)
        payload = "".join(rng.choice(alphabet) for _ in range(n))
        rows.append((i, f"https://fz/{i}", D, payload))
    df = spark.createDataFrame(
        rows, "grp long, url string, warc_date string, text string"
    ).withColumn("grp", F.col("grp") % 7)
    parsed = parse_wet(serialize_wet(df, "grp"), "wet").collect()
    got = {r["url"]: (r["text"], r["n_bytes"]) for r in parsed}
    assert len(got) == 500
    for _, u, _, t in rows:
        assert got[u] == (t, len(t.encode("utf-8"))), u
