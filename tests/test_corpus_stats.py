"""Corpus-statistics scorers (tfidf_topk, unigram_logprob).

Pins: idf ordering (corpus-wide terms rank below rare ones), the k
cutoff and its deterministic term tiebreak, fixed-point NLL values
against a hand computation, empty-doc handling, and partitioning
independence of the integer sums.
"""

import math

from hbase_indexer_spark.pipeline.corpus_stats import (
    MICRO,
    tfidf_topk,
    unigram_logprob,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_rare_term_outranks_common(spark):
    docs = _docs(spark, [
        (1, "the zebra"),
        (2, "the cat"),
        (3, "the dog"),
    ])
    out = tfidf_topk(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # equal tf: "the" occurs in every doc (df=3) -> lowest idf loses
    assert top == {1: "zebra", 2: "cat", 3: "dog"}


def test_tfidf_k_cutoff_and_tiebreak(spark):
    docs = _docs(spark, [(1, "b a"), (2, "x")])
    rows = [(r["rank"], r["term"]) for r in
            tfidf_topk(docs, k=2).filter("doc_id = 1").collect()]
    # a and b tie on (tf=1, df=1) -> term ASC breaks the tie
    assert sorted(rows) == [(1, "a"), (2, "b")]


def test_tfidf_score_formula(spark):
    docs = _docs(spark, [(1, "q q w"), (2, "w")])
    r = {x["term"]: x["score_micro"]
         for x in tfidf_topk(docs, k=5).filter("doc_id = 1").collect()}
    n = 2
    w_q = math.floor(MICRO * (math.log((n + 1) / (1 + 1)) + 1))
    w_w = math.floor(MICRO * (math.log((n + 1) / (2 + 1)) + 1))
    assert r["q"] == 2 * w_q
    assert r["w"] == 1 * w_w


def test_nll_hand_computed(spark):
    docs = _docs(spark, [(1, "a a b"), (2, "b")])
    out = {r["doc_id"]: (r["n_tokens"], r["nll_micro_total"],
                         r["nll_micro_per_token"])
           for r in unigram_logprob(docs).collect()}
    # C=4, c_a=2, c_b=2 -> w = floor(1e6 * ln(2)) for both terms
    w = math.floor(MICRO * math.log(4 / 2))
    assert out[1] == (3, 3 * w, (3 * w) // 3)
    assert out[2] == (1, w, w)


def test_nll_empty_doc(spark):
    out = {r["doc_id"]: (r["n_tokens"], r["nll_micro_total"],
                         r["nll_micro_per_token"])
           for r in unigram_logprob(_docs(spark, [(1, ""), (2, "x y")]))
           .collect()}
    assert out[1] == (0, 0, None)


def test_partitioning_independent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, unigram_logprob(docs).collect()))
    b = sorted(map(tuple, unigram_logprob(docs.repartition(17)).collect()))
    assert a == b
    assert len(a) == docs.count()


def test_bigram_nll_hand_computed(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import bigram_logprob

    # corpus bigrams: (a,b) x2 [doc1], (a,c) x1 [doc2] -> cl(a) = 3
    docs = _docs(spark, [(1, "a b a b"), (2, "a c")])
    out = {r["doc_id"]: (r["n_bigrams"], r["nll_micro_total"],
                         r["nll_micro_per_bigram"])
           for r in bigram_logprob(docs).collect()}
    w_ab = math.floor(MICRO * math.log(3 / 2))
    w_ba = math.floor(MICRO * math.log(1 / 1))
    w_ac = math.floor(MICRO * math.log(3 / 1))
    # doc1 bigrams: ab, ba, ab
    assert out[1] == (3, 2 * w_ab + w_ba, (2 * w_ab + w_ba) // 3)
    assert out[2] == (1, w_ac, w_ac)


def test_bigram_short_docs(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import bigram_logprob

    out = {r["doc_id"]: (r["n_bigrams"], r["nll_micro_per_bigram"])
           for r in bigram_logprob(
               _docs(spark, [(1, "solo"), (2, ""), (3, "x y")])).collect()}
    assert out[1] == (0, None)
    assert out[2] == (0, None)
    assert out[3][0] == 1


def test_vocab_overlap_estimates(spark):
    from hbase_indexer_spark.pipeline.text import vocab_overlap

    # sources share exactly half their vocabulary -> J = 1/3
    shared = [f"s{i}" for i in range(100)]
    only_a = [f"a{i}" for i in range(100)]
    only_b = [f"b{i}" for i in range(100)]
    docs = spark.createDataFrame(
        [(1, " ".join(shared + only_a), "A"),
         (2, " ".join(shared + only_b), "B")],
        "doc_id long, text string, source string")
    r = vocab_overlap(docs, group_col="source", k=64).collect()[0]
    assert (r["src_a"], r["src_b"]) == ("A", "B")
    est = r["n_common"] / r["n_x"]
    assert abs(est - 1 / 3) < 0.15          # k=64 sketch accuracy
    # identical sources -> exactly 1
    docs2 = spark.createDataFrame(
        [(1, " ".join(shared), "A"), (2, " ".join(shared), "B")],
        "doc_id long, text string, source string")
    r2 = vocab_overlap(docs2, group_col="source", k=64).collect()[0]
    assert r2["jaccard_micro"] == 1_000_000


def test_char_entropy_values(spark):
    from hbase_indexer_spark.pipeline.text import char_entropy

    docs = _docs(spark, [(1, "aaaa"), (2, "abcd"), (3, "")])
    out = {r["doc_id"]: (r["n_chars"], r["entropy_micro_per_char"])
           for r in char_entropy(docs).collect()}
    assert out[1] == (4, 0)                      # one symbol: H = 0
    # uniform over 4 symbols: H = ln(4) per char
    assert out[2] == (4, math.floor(MICRO * math.log(4)))
    assert out[3] == (0, None)
