"""Property-based invariants over random mutation logs (hypothesis).

The incremental engine's correctness rests on two properties the unit
matrices can only sample:

1. micro-batch-boundary invariance: replaying any log in k chunks yields
   the same index as one chunk (tombstone ts-masking is order-independent);
2. store equivalence: the bucketed copy-on-write store and the plain
   store produce identical indexes.
"""

import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_indexer_spark.config.indexer_conf import IndexerConf
from hbase_indexer_spark.plans.incremental import IncrementalIndexer

EVENT_DDL = (
    "seq long, event_ts long, table string, row string, family string, "
    "qualifier string, ts long, op string, value binary"
)

CONF = IndexerConf.from_dict({
    "table": "t",
    "fields": [
        {"name": "a_s", "value": "f:a"},
        {"name": "b_s", "value": "f:b"},
    ],
})

event_st = st.tuples(
    st.integers(0, 4),                              # row
    st.sampled_from(["a", "b"]),                    # qualifier
    st.sampled_from(["put", "put", "put",           # puts dominate
                     "delete_row", "delete_column", "delete_family"]),
    st.integers(0, 99),                             # value seed
)

log_st = st.lists(event_st, min_size=1, max_size=24)


def to_rows(log):
    rows = []
    for i, (row, qual, op, vseed) in enumerate(log):
        val = f"v{vseed}".encode() if op == "put" else None
        rows.append((i, i, "t", f"r{row}", "f", qual, i, op, val))
    return rows


def replay(spark, rows, n_chunks, n_buckets=None):
    tmp = tempfile.mkdtemp(prefix="hbis_prop_")
    ix = IncrementalIndexer(
        spark, CONF,
        state_path=os.path.join(tmp, "s"), index_path=os.path.join(tmp, "i"),
        n_buckets=n_buckets,
    )
    df = spark.createDataFrame(rows, EVENT_DDL)
    out = ix.replay(df, n_chunks=n_chunks)
    return sorted(tuple(r) for r in out.select("id", "a_s", "b_s").collect())


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(log=log_st)
def test_chunking_invariance(spark, log):
    rows = to_rows(log)
    assert replay(spark, rows, 1) == replay(spark, rows, 3)


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(log=log_st)
def test_bucketed_equals_plain(spark, log):
    rows = to_rows(log)
    assert replay(spark, rows, 2) == replay(spark, rows, 2, n_buckets=3)


# -- XML conf round-trip (conf_to_xml is the inverse of conf_from_xml) ------

_ident = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1,
                 max_size=8)
_types = st.sampled_from(["string", "int", "long", "float", "double",
                          "boolean"])


@st.composite
def _field_dicts(draw):
    wildcard = draw(st.booleans())
    name = draw(_ident) + ("*" if wildcard and draw(st.booleans()) else "")
    d = {
        "name": name,
        "value": f"{draw(_ident)}:{draw(_ident)}{'*' if wildcard else ''}",
        "type": draw(_types),
    }
    if wildcard:
        if draw(st.booleans()):
            d["source"] = "qualifier"
        if not name.endswith("*") and draw(st.booleans()):
            d["output_fields"] = draw(
                st.lists(_ident, min_size=1, max_size=3))
    return d


@st.composite
def _conf_dicts(draw):
    d = {
        "table": draw(_ident),
        "unique_key_field": draw(_ident),
        "unique_key_formatter": draw(st.sampled_from(["string", "hex"])),
        # uniquify output names by index — duplicate doc-field names are
        # rejected by IndexerConf.validate, not a round-trip concern
        "fields": [
            {**f,
             "name": f"f{i}_" + f["name"],
             **({"output_fields": [f"o{i}_{j}_{n}" for j, n in
                 enumerate(f["output_fields"])]}
                if "output_fields" in f else {})}
            for i, f in enumerate(
                draw(st.lists(_field_dicts(), min_size=1, max_size=5)))
        ],
    }
    if draw(st.booleans()):
        d["mapping_type"] = "column"
        d["row_field"] = draw(_ident)
        d["column_family_field"] = draw(_ident)
    if draw(st.booleans()):
        d["variables"] = draw(
            st.dictionaries(_ident, _ident, max_size=3))
    return d


@settings(max_examples=100, deadline=None)
@given(_conf_dicts())
def test_conf_xml_roundtrip(conf_dict):
    """conf_from_xml(conf_to_xml(c)) == c for every XML-expressible conf."""
    from hbase_indexer_spark.config.indexer_conf import (
        IndexerConf,
        conf_from_xml,
        conf_to_xml,
    )

    c = IndexerConf.from_dict(conf_dict)
    assert conf_from_xml(conf_to_xml(c)) == c


# ---------------------------------------------------------------------------
# Avro codec: encode -> decode is the identity on the supported subset
# (pure python, no Spark session — cheap enough for many examples)
# ---------------------------------------------------------------------------

AVRO_SCHEMA = {
    "type": "record", "name": "P",
    "fields": [
        {"name": "n", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
    ],
}

avro_rec_st = st.fixed_dictionaries({
    "n": st.integers(-(2 ** 62), 2 ** 62),      # full zigzag-varint range
    "s": st.text(max_size=40),                   # arbitrary unicode
    "d": st.floats(allow_nan=False),             # NaN breaks == by design
    "ok": st.booleans(),
    "opt": st.none() | st.text(max_size=10),
    "xs": st.lists(st.integers(-(2 ** 40), 2 ** 40), max_size=8),
})


@settings(max_examples=200, deadline=None)
@given(recs=st.lists(avro_rec_st, max_size=12),
       codec=st.sampled_from(["null", "deflate"]))
def test_avro_container_roundtrip_random(recs, codec):
    from hbase_indexer_spark.functions.avro_codec import (
        decode_container,
        encode_container,
    )

    blob = encode_container(AVRO_SCHEMA, recs, codec=codec)
    assert decode_container(blob) == recs
