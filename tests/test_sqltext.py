"""SQL-text decoder templates (functions/sqltext.py) must be result- and
dtype-identical to the Column builders (functions/bytes_codec.py) they
replace in the extraction compile — checked decoder-by-decoder over
adversarial byte patterns: wrong lengths, NULL, empty, inf/nan/subnormal/
negative-zero bit patterns, and max/min exponents."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.functions import bytes_codec as bc
from hbase_indexer_spark.functions import sqltext as st

TYPES = ("int", "long", "short", "double", "float", "boolean", "string",
         "bytes")


def _cases():
    out = [None, b"", b"\x00", b"\xff", b"\x00\x00", b"\xff\xff",
           b"\x80\x00", b"\x7f\xff"]
    for v in (0, 1, -1, 2 ** 31 - 1, -2 ** 31, 12345678, -12345678):
        out.append(struct.pack(">i", v))
    for v in (0, 1, -1, 2 ** 63 - 1, -2 ** 63, 987654321987):
        out.append(struct.pack(">q", v))
    for f in (0.0, -0.0, 1.5, -1.5, 3.4e38, 1e-45, float("inf"),
              float("-inf"), float("nan")):
        out.append(struct.pack(">f", f))
    for f in (0.0, -0.0, 1.5, -1.5, 1.7e308, 5e-324, float("inf"),
              float("-inf"), float("nan")):
        out.append(struct.pack(">d", f))
    out += [bytes.fromhex(h) for h in (
        "0000000000000001", "800fffffffffffff", "7fefffffffffffff",
        "fff0000000000000", "7ff0000000000001", "fff8000000000000",
        "00000001", "807fffff", "7f7fffff", "ff800001", "7fc00000",
        "deadbeefcafebabe", "deadbeef", "abcd", "61")]
    out.append("hello world".encode())
    return out


def _same(o, n):
    if o is None or n is None:
        return o is None and n is None
    if isinstance(o, float) and isinstance(n, float):
        if math.isnan(o) or math.isnan(n):
            return math.isnan(o) and math.isnan(n)
        # bit-exact, incl. -0.0 vs 0.0
        return struct.pack(">d", o) == struct.pack(">d", n)
    return o == n


@pytest.mark.parametrize("type_name", TYPES)
def test_decode_sql_matches_column_builder(spark, type_name):
    rows = [(i, bytearray(b) if b is not None else None)
            for i, b in enumerate(_cases())]
    df = spark.createDataFrame(rows, "i int, v binary")
    sel = df.select(
        "i",
        bc.DECODERS[type_name](F.col("v")).alias("o"),
        F.expr(st.decode_sql(type_name, "v")).alias("n"),
    )
    dtypes = dict(sel.dtypes)
    assert dtypes["o"] == dtypes["n"]
    for r in sel.collect():
        assert _same(r["o"], r["n"]), (type_name, r["i"], r["o"], r["n"])


def test_decode_sql_unknown_types_fall_back():
    assert st.decode_sql("bigdecimal", "v") is None      # pandas UDF
    assert st.decode_sql("no_such_type", "v") is None    # custom mapper name
    assert st.decode_sql(lambda c: c, "v") is None       # callable type object


def test_qlit_escapes_quotes():
    assert st.qlit("a'b") == "'a''b'"
    assert st.qlit("plain") == "'plain'"
