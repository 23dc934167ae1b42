"""Winnowing fingerprints (MOSS): selection rule, the substring-match
guarantee, density, and the overlap-pair detector."""

from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from hbase_indexer_spark.pipeline.text import token_hash60


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fps(spark, rows, **kw):
    out = {}
    for r in winnow_fingerprints(_docs(spark, rows), **kw).collect():
        out.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    return out


def test_selection_is_window_min(spark):
    # hand-verifiable with k=1, w=2: hashes are per-token; each adjacent
    # pair selects its min
    rows = [(1, "a b c")]
    out = _fps(spark, rows, k=1, w=2)
    h = {t: None for t in "abc"}
    vals = {r["t"]: r["h"] for r in _docs(spark, rows).select(
        F.explode(F.split("text", " ")).alias("t")).select(
        "t", token_hash60(F.col("t")).alias("h")).collect()}
    ha, hb, hc = vals["a"], vals["b"], vals["c"]
    expect = set()
    win1 = min(ha, hb)
    expect.add((1 if win1 == ha else 2, win1) if ha != hb else (2, ha))
    win2 = min(hb, hc)
    expect.add((2 if win2 == hb else 3, win2) if hb != hc else (3, hb))
    assert out[1] == expect


def test_shared_long_substring_shares_fingerprint(spark):
    # winnowing guarantee: shared run of >= w + k - 1 = 6 tokens
    shared = "p q r s t u"
    out = _fps(spark, [
        (1, "x y z " + shared),
        (2, shared + " m n o"),
    ], k=3, w=4)
    assert {fp for _, fp in out[1]} & {fp for _, fp in out[2]}


def test_short_doc_still_fingerprinted(spark):
    out = _fps(spark, [(1, "a b c")], k=3, w=4)   # one 3-gram, m=1 < w
    assert len(out[1]) == 1


def test_density_below_full_kgram_set(spark):
    text = " ".join(f"w{i}" for i in range(60))
    out = _fps(spark, [(1, text)], k=3, w=4)
    assert 0 < len(out[1]) < 58   # strictly sparser than all 58 k-grams


def test_overlap_pairs_detects_shared_paragraph(spark):
    para = "alpha beta gamma delta epsilon zeta eta theta"
    pairs = winnow_overlap_pairs(_docs(spark, [
        (1, "intro words here " + para),
        (2, para + " completely different tail text"),
        (3, "unrelated content entirely separate words"),
    ]), k=3, w=4, min_shared=2).collect()
    assert [(r["x"], r["y"]) for r in pairs] == [(1, 2)]


def test_max_postings_drops_boilerplate_fp(spark):
    para = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(i, f"header{i} filler{i} " + para) for i in range(1, 6)]
    # para's fingerprints appear in all 5 docs; cap at 4 removes them
    n_uncapped = winnow_overlap_pairs(
        _docs(spark, docs), k=3, w=4, min_shared=2,
        max_postings=None).count()
    n_capped = winnow_overlap_pairs(
        _docs(spark, docs), k=3, w=4, min_shared=2,
        max_postings=4).count()
    assert n_uncapped == 10 and n_capped == 0
