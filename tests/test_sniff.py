"""Content sniffing: BOM table incl. UTF-32-over-UTF-16 precedence,
aligned null-byte counting (the 0x30 0x0A seam trap), binary verdict
with BOM exclusion, NULL payloads."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.sniff import (
    is_binary_payload,
    null_bytes_in_prefix,
    sniff_bom,
    sniff_payloads,
)


def _one(spark, payload: bytes | None, expr_fn):
    df = spark.createDataFrame([(payload,)], "html binary")
    return df.select(expr_fn(F.col("html")).alias("v")).first().v


@pytest.mark.parametrize(
    "payload,expect",
    [
        (b"\xef\xbb\xbfhello", "utf-8"),
        (b"\xfe\xff\x00h", "utf-16be"),
        (b"\xff\xfeh\x00", "utf-16le"),
        (b"\x00\x00\xfe\xffx", "utf-32be"),
        (b"\xff\xfe\x00\x00x", "utf-32le"),  # must beat utf-16le
        (b"plain text", None),
        (b"", None),
    ],
)
def test_bom(spark, payload, expect):
    assert _one(spark, payload, sniff_bom) == expect


def test_null_count_alignment(spark):
    # 0x30 0x0A hexes to '300A' — unaligned '00' at the seam must NOT
    # count; the single real NUL must.
    assert _one(spark, b"0\n0\n\x00", null_bytes_in_prefix) == 1
    assert _one(spark, b"ab", null_bytes_in_prefix) == 0
    assert _one(spark, b"\x00" * 10, null_bytes_in_prefix) == 10


def test_binary_verdict(spark):
    png_ish = b"\x89PNG\r\n\x1a\n" + bytes(64)  # 64 NULs of 72 bytes
    assert _one(spark, png_ish, is_binary_payload)
    assert not _one(spark, b"just ascii text here", is_binary_payload)
    # UTF-16LE text is half NUL bytes but BOM-excluded
    utf16 = "hello world this is text".encode("utf-16-le")
    assert not _one(spark, b"\xff\xfe" + utf16, is_binary_payload)
    # same bytes WITHOUT the BOM: heuristic calls it binary (honest FP)
    assert _one(spark, utf16, is_binary_payload)


def test_sniff_payloads_frame(spark):
    rows = [(1, b"\xef\xbb\xbfdoc"), (2, bytes(32)), (3, None)]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {r.id: (r.bom_encoding, r.n_null_prefix, r.payload_binary)
           for r in sniff_payloads(df).collect()}
    assert got[1] == ("utf-8", 0, False)
    assert got[2] == (None, 32, True)
    assert got[3] == (None, None, None)  # NULL payload → NULL verdicts
