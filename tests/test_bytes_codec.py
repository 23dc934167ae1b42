"""Round-trip and Java-parity tests for the big-endian codec.

Parity oracle: Python ``struct`` big-endian packing, which matches HBase
Bytes.toBytes exactly for int/long/short/float/double; boolean is 0xFF/0x00;
bigdecimal is 4-byte BE scale + two's-complement unscaled bytes.
"""

import decimal
import math
import struct

import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.functions import bytes_codec as bc

INTS = [0, 1, -1, 42, -42, 2147483647, -2147483648, 123456789, -987654321]
LONGS = [0, 1, -1, 2**62, -(2**62), 9223372036854775807, -9223372036854775808, 1234567890123]
SHORTS = [0, 1, -1, 32767, -32768, 12345, -12345]
FLOATS = [0.0, 1.0, -1.0, 3.14159, -2.5e-10, 1.17549435e-38, 3.4e38, 6.0e-42]
DOUBLES = [0.0, 1.0, -1.0, 3.141592653589793, 2.5e-310, -1.7e308, 4.9e-324, 1e-300]


def _roundtrip(spark, values, py_type, enc, dec, pack_fmt=None):
    df = spark.createDataFrame([(v,) for v in values], f"v {py_type}")
    out = df.select(
        F.col("v"),
        enc(F.col("v")).alias("bin"),
        dec(enc(F.col("v"))).alias("back"),
    ).collect()
    for r in out:
        if pack_fmt is not None:
            assert r["bin"] == struct.pack(pack_fmt, r["v"]), r
        assert r["back"] == r["v"], r


def test_int_roundtrip(spark):
    _roundtrip(spark, INTS, "int", bc.encode_int, bc.decode_int, ">i")


def test_long_roundtrip(spark):
    _roundtrip(spark, LONGS, "long", bc.encode_long, bc.decode_long, ">q")


def test_short_roundtrip(spark):
    _roundtrip(spark, SHORTS, "short", bc.encode_short, bc.decode_short, ">h")


def test_float_roundtrip(spark):
    vals = [struct.unpack(">f", struct.pack(">f", v))[0] for v in FLOATS]
    _roundtrip(spark, vals, "float", bc.encode_float, bc.decode_float, ">f")


def test_double_roundtrip(spark):
    _roundtrip(spark, DOUBLES, "double", bc.encode_double, bc.decode_double, ">d")


def test_boolean_roundtrip(spark):
    df = spark.createDataFrame([(True,), (False,)], "v boolean")
    rows = df.select("v", bc.decode_boolean(bc.encode_boolean(F.col("v"))).alias("back"),
                     bc.encode_boolean(F.col("v")).alias("bin")).collect()
    for r in rows:
        assert r["back"] == r["v"]
        assert r["bin"] == (b"\xff" if r["v"] else b"\x00")


def test_string_roundtrip(spark):
    vals = ["", "hello", "héllo wörld", "with-hyphen", "日本語"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    rows = df.select("v", bc.decode_string(bc.encode_string(F.col("v"))).alias("back")).collect()
    for r in rows:
        assert r["back"] == r["v"]


def test_float_special_values(spark):
    vals = [float("inf"), float("-inf"), float("nan")]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select("v", bc.decode_double(bc.encode_double(F.col("v"))).alias("back")).collect()
    for r in rows:
        if math.isnan(r["v"]):
            assert math.isnan(r["back"])
        else:
            assert r["back"] == r["v"]


def test_wrong_length_decodes_to_null(spark):
    # drop-on-error contract, ByteArrayValueMappers.java:154-164
    df = spark.createDataFrame([(b"\x00\x01",)], "v binary")
    row = df.select(
        bc.decode_int(F.col("v")).alias("i"),
        bc.decode_long(F.col("v")).alias("l"),
        bc.decode_double(F.col("v")).alias("d"),
        bc.decode_float(F.col("v")).alias("f"),
        bc.decode_boolean(F.col("v")).alias("b"),
    ).first()
    assert all(row[c] is None for c in ["i", "l", "d", "f", "b"])


def test_bigdecimal_roundtrip(spark):
    vals = [decimal.Decimal("123.456"), decimal.Decimal("-0.001"),
            decimal.Decimal("98765432109876.543210"), decimal.Decimal("0")]
    df = spark.createDataFrame([(str(v),) for v in vals], "s string")
    rows = df.select(
        F.col("s"),
        bc.decode_bigdecimal(bc.encode_bigdecimal(F.col("s"))).alias("back"),
    ).collect()
    for r in rows:
        assert r["back"] == decimal.Decimal(r["s"]).scaleb(0), r


def test_java_parity_bigdecimal_encoding(spark):
    # Bytes.toBigDecimal layout: 4-byte BE scale + two's-complement unscaled
    df = spark.createDataFrame([("123.45",)], "s string")
    b = df.select(bc.encode_bigdecimal(F.col("s")).alias("b")).first()["b"]
    assert b[:4] == (2).to_bytes(4, "big")
    assert int.from_bytes(b[4:], "big", signed=True) == 12345
