"""Avro OCF codec + readAvroContainer/extractAvroPaths stage pair
(reference morphlines.conf:40-48 path, P15 surface)."""

import json

import pytest

from pyspark.sql import functions as F

from hbase_indexer_spark.functions.avro_codec import (
    decode_container,
    encode_container,
)
from hbase_indexer_spark.operators.transform import TransformChain

SCHEMA = {
    "type": "record", "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "note", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "meta", "type": {
            "type": "record", "name": "Meta",
            "fields": [{"name": "src", "type": "string"},
                       {"name": "v", "type": "int"}]}},
    ],
}

RECORDS = [
    {"id": 1, "name": "alpha", "score": 1.25, "ok": True,
     "note": None, "tags": ["a", "b"], "meta": {"src": "s1", "v": 7}},
    {"id": -2, "name": "βeta", "score": -0.5, "ok": False,
     "note": "hi", "tags": [], "meta": {"src": "s2", "v": -1}},
    {"id": 2 ** 40, "name": "", "score": 3089.42, "ok": True,
     "note": "x", "tags": ["z"], "meta": {"src": "", "v": 0}},
]


def test_container_roundtrip_null_codec():
    blob = encode_container(SCHEMA, RECORDS)
    assert blob[:4] == b"Obj\x01"
    assert decode_container(blob) == RECORDS


def test_container_roundtrip_deflate():
    blob = encode_container(SCHEMA, RECORDS, codec="deflate")
    assert decode_container(blob) == RECORDS
    # deflate really compresses a repetitive payload
    rep = [RECORDS[0]] * 200
    assert len(encode_container(SCHEMA, rep, codec="deflate")) \
        < len(encode_container(SCHEMA, rep)) / 2


def test_container_rejects_garbage():
    with pytest.raises(ValueError):
        decode_container(b"not-avro-at-all")


def test_zigzag_longs_roundtrip():
    schema = {"type": "record", "name": "N",
              "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 63, 64, -64, -65, 2 ** 62, -(2 ** 62)]
    recs = [{"v": v} for v in vals]
    assert decode_container(encode_container(schema, recs)) == recs


def test_stage_pair_explodes_and_extracts(spark):
    """readAvroContainer multiplies rows (one per record); extractAvroPaths
    pulls typed fields JVM-side, incl. a nested path."""
    blob = encode_container(SCHEMA, RECORDS)
    df = spark.createDataFrame([("r1", bytearray(blob))],
                               "row string, body binary")
    chain = TransformChain.from_config([
        {"stage": "read_avro_container", "field": "body"},
        {"stage": "extract_avro_paths",
         "paths": {"doc_id": "/id", "name": "/name", "score": "/score",
                   "src": "/meta/src"},
         "types": {"doc_id": "long", "score": "double"}},
    ])
    out = chain(df).select("row", "doc_id", "name", "score", "src") \
        .orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == sorted(r["id"] for r in RECORDS)
    got = {r["doc_id"]: (r["name"], r["score"], r["src"]) for r in out}
    for rec in RECORDS:
        assert got[rec["id"]] == (rec["name"], rec["score"], rec["meta"]["src"])
    # json payloads are canonical (sorted keys) for deterministic hashing
    js = chain.stages[0] if hasattr(chain, "stages") else None
    one = TransformChain.from_config(
        [{"stage": "read_avro_container", "field": "body"}])(df) \
        .select("avro_json").first()["avro_json"]
    assert json.loads(one) == json.loads(json.dumps(json.loads(one), sort_keys=True))


def test_bytes_fields_decode_to_hex_strings():
    """The documented convention: encoder takes raw bytes, decoder emits
    lowercase hex (decoded records must survive JSON, which has no binary
    type) — so encode->decode maps b"..." to its .hex() form."""
    schema = {"type": "record", "name": "B",
              "fields": [{"name": "payload", "type": "bytes"},
                         {"name": "opt", "type": ["null", "bytes"]}]}
    recs = [{"payload": b"\x00\xffab", "opt": None},
            {"payload": b"", "opt": b"\x01\x02"}]
    got = decode_container(encode_container(schema, recs))
    assert got == [{"payload": "00ff6162", "opt": None},
                   {"payload": "", "opt": "0102"}]
