"""Gopher-style rule filter (gopher_rules): each rule triggered in
isolation, the conjunction, and empty-doc handling."""

from hbase_indexer_spark.pipeline.text import gopher_rules


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(spark, rows, **kw):
    res = gopher_rules(_docs(spark, rows), **kw).collect()
    return {r["doc_id"]: r.asDict() for r in res}


GOOD = "the cat and the dog went to the market " * 8  # 72 tokens, all rules ok


def test_good_doc_keeps(spark):
    out = _out(spark, [(1, GOOD)])
    r = out[1]
    assert r["keep"] and all(
        r[k] for k in ("r_len", "r_mean", "r_sym", "r_alpha", "r_stop"))


def test_too_short_fails_len_only(spark):
    out = _out(spark, [(1, "the cat and the dog")])
    r = out[1]
    assert not r["r_len"] and r["r_mean"] and r["r_stop"] and not r["keep"]


def test_mean_length_bounds(spark):
    # 60 single-char tokens -> mean 1 < 3
    out = _out(spark, [(1, "a " * 30 + "the of " * 15)], min_tokens=10)
    assert not out[1]["r_mean"]


def test_symbol_and_alpha_rules(spark):
    hashy = ("the of " * 20) + ("# " * 20)          # 20/60 symbolic
    out = _out(spark, [(1, hashy)], min_tokens=10)
    assert not out[1]["r_sym"] and not out[1]["r_alpha"]


def test_stopword_rule(spark):
    out = _out(spark, [(1, "zebra lion tiger puma " * 15)], min_tokens=10)
    assert not out[1]["r_stop"] and not out[1]["keep"]


def test_empty_doc_all_ratio_rules_false(spark):
    r = _out(spark, [(1, "")])[1]
    assert r["n_tokens"] == 0 and not r["keep"]
    assert not (r["r_mean"] or r["r_sym"] or r["r_alpha"])


def test_corpus_report_hand_check(spark):
    from hbase_indexer_spark.pipeline.curation import corpus_report

    df = spark.createDataFrame(
        [(1, "the cat and the dog sat", "en", "s1"),
         (2, "the cat and the dog sat", "en", "s1"),   # exact dup
         (3, "unique words here now", "en", "s1"),
         (4, "der hund", "de", "s2")],
        "doc_id long, text string, lang string, source string")
    out = {(r["source"], r["lang"]): r.asDict()
           for r in corpus_report(df, min_tokens=3).collect()}
    s1 = out[("s1", "en")]
    assert s1["n_docs"] == 3 and s1["uniq_texts"] == 2
    assert s1["n_dup_docs"] == 1 and s1["n_tokens"] == 16
    s2 = out[("s2", "de")]
    assert s2["n_docs"] == 1 and s2["n_keep"] == 0   # too short + no stopwords


def test_normalize_text_collapses_variants(spark):
    from hbase_indexer_spark.pipeline.text import normalize_text

    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "  HELLO\tWORLD. ")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["norm_text"], r["norm_md5"])
           for r in normalize_text(df).collect()}
    assert out[1][0] == out[2][0] == out[3][0] == "hello world"
    assert out[1][1] == out[2][1] == out[3][1]
