"""Corpus ingestion (sources/corpus.py) vs adversarial strings: the
JSONL and CSV roundtrips must preserve newlines, quotes, commas,
backslashes, unicode, and empty/NULL text exactly — these are the
escaping footguns that silently corrupt training corpora."""

import pyspark.sql.utils
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_indexer_spark.sources import corpus

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

NASTY = [
    'line one\nline two',
    'quote " inside',
    'comma, semicolon; tab\t',
    'back\\slash and \\n literal',
    'unicode: naïve café 日本語 🚀',
    '"fully quoted"',
    '',
    'trailing newline\n',
    '\r\nwindows line',
    "single 'quotes'",
]


def _df(spark, texts):
    rows = [(i, t, "en", "test", len(t) if t is not None else None)
            for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, corpus.DOCUMENTS_SCHEMA)


@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_nasty_strings_roundtrip(spark, tmp_path, fmt):
    df = _df(spark, NASTY + [None])
    path = str(tmp_path / fmt)
    (corpus.write_jsonl if fmt == "jsonl" else corpus.write_csv)(df, path)
    back = corpus.read_documents(spark, path, fmt=fmt)
    want = {(r["doc_id"], r["text"]) for r in df.collect()}
    got = {(r["doc_id"], r["text"]) for r in back.collect()}
    # CSV cannot distinguish NULL from empty string under quoteAll;
    # JSONL can.  Normalize only for csv and document the asymmetry.
    if fmt == "csv":
        want = {(i, t if t is not None else "") for i, t in want}
        got = {(i, t if t is not None else "") for i, t in got}
    assert got == want


text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    max_size=40)
# CSV documented limitation: a field-trailing NUL is dropped by the
# univocity reader (write_csv docstring) — JSONL keeps the full
# alphabet, CSV excludes NUL; test_csv_nul_behavior pins the asymmetry
csv_text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    max_size=40)


@settings(**_SETTINGS)
@given(texts=st.lists(text_st, min_size=1, max_size=10))
def test_random_unicode_roundtrip_jsonl(spark, tmp_path_factory, texts):
    df = _df(spark, texts)
    path = str(tmp_path_factory.mktemp("corp") / "jsonl")
    corpus.write_jsonl(df, path)
    back = corpus.read_documents(spark, path, fmt="jsonl")
    want = {(r["doc_id"], r["text"] or "") for r in df.collect()}
    got = {(r["doc_id"], r["text"] or "") for r in back.collect()}
    assert got == want


@settings(**_SETTINGS)
@given(texts=st.lists(csv_text_st, min_size=1, max_size=10))
def test_random_unicode_roundtrip_csv(spark, tmp_path_factory, texts):
    df = _df(spark, texts)
    path = str(tmp_path_factory.mktemp("corp") / "csv")
    corpus.write_csv(df, path)
    back = corpus.read_documents(spark, path, fmt="csv")
    want = {(r["doc_id"], r["text"] or "") for r in df.collect()}
    got = {(r["doc_id"], r["text"] or "") for r in back.collect()}
    assert got == want


def test_csv_nul_behavior(spark, tmp_path):
    """Pin the documented CSV NUL asymmetry: the multiLine reader drops
    NULs immediately following a newline inside a quoted field; NULs
    anywhere else survive.  JSONL round-trips everything losslessly.
    If a Spark/univocity upgrade changes this, the write_csv docstring
    must move with it."""
    texts = ["a\x00b", "x\x00", "\n\x00", "p\n\x00q"]
    df = _df(spark, texts)
    corpus.write_csv(df, str(tmp_path / "csv"))
    got = {r["doc_id"]: r["text"] for r in corpus.read_documents(
        spark, str(tmp_path / "csv"), fmt="csv").collect()}
    assert got == {0: "a\x00b", 1: "x\x00", 2: "\n", 3: "p\nq"}
    corpus.write_jsonl(df, str(tmp_path / "jsonl"))
    got_j = {r["doc_id"]: r["text"] for r in corpus.read_documents(
        spark, str(tmp_path / "jsonl"), fmt="jsonl").collect()}
    assert got_j == dict(enumerate(texts))


def test_failfast_rejects_malformed_jsonl(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s",'
        ' "n_chars": 2}\n'
        'this is not json\n')
    with pytest.raises(Exception):
        corpus.read_jsonl(spark, str(p)).collect()


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown corpus format"):
        corpus.read_documents(spark, "/nowhere", fmt="xml")


def test_parquet_schema_drift_fails_fast(spark, tmp_path):
    """r5 ADVICE: the declared-schema contract now holds for parquet too —
    name/type drift raises at the read, extra columns are pruned."""
    # conforming file with an extra column: passes, extra column dropped
    ok = spark.createDataFrame(
        [(1, "t", "en", "s", 1, "extra")],
        corpus.DOCUMENTS_SCHEMA + ", junk string")
    p_ok = str(tmp_path / "ok")
    ok.write.parquet(p_ok)
    back = corpus.read_documents(spark, p_ok, fmt="parquet")
    assert back.columns == ["doc_id", "text", "lang", "source", "n_chars"]

    # type drift: doc_id written as string
    bad = spark.createDataFrame(
        [("1", "t", "en", "s", 1)],
        "doc_id string, text string, lang string, source string, "
        "n_chars long")
    p_bad = str(tmp_path / "bad")
    bad.write.parquet(p_bad)
    with pytest.raises(ValueError, match="type_drift"):
        corpus.read_documents(spark, p_bad, fmt="parquet")

    # missing column
    partial = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    p_miss = str(tmp_path / "miss")
    partial.write.parquet(p_miss)
    with pytest.raises(ValueError, match="missing"):
        corpus.read_documents(spark, p_miss, fmt="parquet")
