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


def test_bm25_exact_match_ranks_first(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import bm25_topk

    docs = spark.createDataFrame([
        (1, "apple banana cherry"),
        (2, "apple apple apple apple"),
        (3, "banana date elderberry fig grape"),
        (4, "unrelated words entirely different"),
    ], "doc_id long, text string")
    out = bm25_topk(docs, [(1, "apple"), (2, "banana date")], k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    q1 = sorted(by_q[1], key=lambda r: r["rank"])
    # doc 2 (tf=4, but short) and doc 1 both match 'apple'; doc 4 never
    assert {r["doc_id"] for r in q1} == {1, 2}
    assert all(r["score_micro"] > 0 for r in q1)
    q2 = sorted(by_q[2], key=lambda r: r["rank"])
    # doc 3 matches both query terms -> outranks doc 1 (banana only)
    assert q2[0]["doc_id"] == 3
    assert {r["doc_id"] for r in q2} == {1, 3}


def test_bm25_k_bound_and_determinism(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import bm25_topk

    docs = spark.createDataFrame(
        [(i, "common word here") for i in range(20)],
        "doc_id long, text string")
    out = bm25_topk(docs, [(1, "common")], k=5)
    rows = out.collect()
    assert len(rows) == 5
    # identical docs tie on score -> doc_id ascending breaks the tie
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 3, 4]
    again = bm25_topk(docs, [(1, "common")], k=5).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_rrf_fuse_combines_and_breaks_ties(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int")
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10).collect()}
    # doc 11 appears in both legs -> highest fused score
    assert out[11]["rank"] == 1
    assert out[11]["rrf_micro"] == 1_000_000 // 61 + 1_000_000 // 62
    # doc absent from a leg contributes nothing from it
    assert out[10]["rrf_micro"] == 1_000_000 // 61
    assert out[13]["rrf_micro"] == 1_000_000 // 62
    # equal scores (10 vs 13? no) — tie case: two docs with same single rank
    c = spark.createDataFrame(
        [(2, 7, 1), (2, 5, 1)], "query_id long, doc_id long, rank int")
    tie = sorted((r["rank"], r["doc_id"])
                 for r in rrf_fuse([c], k=10).collect())
    assert tie == [(1, 5), (2, 7)]  # doc_id ascending breaks the tie


def test_key_skew_report_shares_and_mean_multiple(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import key_skew_report

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    out = {r["key"]: r for r in key_skew_report(df, "k", k=2).collect()}
    assert set(out) == {"hot", "warm"}  # top-2 only
    assert out["hot"]["rank"] == 1
    assert out["hot"]["share_ppm"] == 600_000          # 60/100
    # mean key load = 100 div 3 = 33 (floored integer mean — the
    # overflow-safe form); 60e6 div 33
    assert out["hot"]["x_mean_ppm"] == 1_818_181
    assert out["warm"]["share_ppm"] == 300_000

    # NULL keys profile like any value
    dn = spark.createDataFrame(
        [(None,)] * 3 + [("x",)], "k string")
    top = key_skew_report(dn, "k", k=1).collect()[0]
    assert top["key"] is None and top["n_rows"] == 3


def test_trigram_backoff_chain(spark):
    """Each backoff level fires where expected: trigram hit scores
    ln(c12/c123); unseen trigram with seen bigram adds one BACKOFF
    penalty; unseen bigram with seen unigram adds two; OOV w3 counts in
    n_oov and is never scored."""
    import math

    from hbase_indexer_spark.pipeline.corpus_stats import (
        BACKOFF_MICRO,
        backoff_trigram_logprob,
    )

    docs = spark.createDataFrame([
        (0, "a b c d"),            # train: trigrams (a,b,c) (b,c,d)
        (1, "a b c"),              # held: trigram hit
        (3, "x b c"),              # held: tri miss, bigram (b,c) hit
        (5, "x y c"),              # held: tri+bi miss, unigram c hit
        (7, "x y zz"),             # held: zz OOV
    ], "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in backoff_trigram_logprob(docs).collect()}

    # doc 1: trigram (a,b,c): c123=1, context (a,b) total=1 -> ln(1)=0
    assert (out[1]["n_scored"], out[1]["nll_micro_total"]) == (1, 0)
    # doc 3: bigram (b,c): c23=1, context b total=1 -> B + 0
    assert out[3]["nll_micro_total"] == BACKOFF_MICRO
    # doc 5: unigram c: c3=1, C=4 -> 2B + floor(1e6 ln 4)
    assert out[5]["nll_micro_total"] == \
        2 * BACKOFF_MICRO + math.floor(1e6 * math.log(4.0))
    # doc 7: w3=zz not in train vocab -> OOV, unscored
    assert (out[7]["n_scored"], out[7]["n_oov"]) == (0, 1)
    assert out[7]["nll_micro_per_gram"] is None


def test_postings_upsert_replaces_document(spark, tmp_path):
    """Re-ingesting a CHANGED document replaces all its postings — no
    stale terms, no duplicates — and the indexed BM25 equals the ad-hoc
    BM25 over the final corpus (modulo the documented N definition)."""
    from hbase_indexer_spark.pipeline.corpus_stats import (
        bm25_topk,
        bm25_topk_indexed,
        postings_upsert,
    )
    from hbase_indexer_spark.sinks.index_store import IndexStore

    store = IndexStore(str(tmp_path / "p"), key="pk")
    v1 = spark.createDataFrame(
        [(1, "apple banana"), (2, "cherry date")], "doc_id long, text string")
    postings_upsert(store, v1)
    # doc 1 edited: 'banana' disappears, 'elderberry' appears
    v2 = spark.createDataFrame(
        [(1, "apple elderberry elderberry")], "doc_id long, text string")
    postings_upsert(store, v2)

    rows = {(r["doc_id"], r["term"]): r["tf"]
            for r in store.read(spark).collect()}
    assert rows == {(1, "apple"): 1, (1, "elderberry"): 2,
                    (2, "cherry"): 1, (2, "date"): 1}

    final = spark.createDataFrame(
        [(1, "apple elderberry elderberry"), (2, "cherry date")],
        "doc_id long, text string")
    queries = [(1, "apple"), (2, "elderberry date")]
    got = sorted(map(tuple, bm25_topk_indexed(
        spark, store, queries, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(final, queries, k=5).collect()))
    assert got == want  # no token-less docs here, so N definitions agree


def test_retrieval_eval_perfect_and_disjoint(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import retrieval_eval

    k = 3
    perfect = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int")
    out = retrieval_eval(perfect, perfect, k=k).collect()[0]
    assert out["overlap"] == 3
    assert out["recall_micro"] == 1_000_000
    assert out["dcg_micro"] == out["idcg_micro"]
    assert out["ndcg_micro"] == 1_000_000

    disjoint = spark.createDataFrame(
        [(1, 90, 1), (1, 91, 2), (1, 92, 3)],
        "query_id long, doc_id long, rank int")
    out = retrieval_eval(disjoint, perfect, k=k).collect()[0]
    assert (out["overlap"], out["recall_micro"], out["dcg_micro"],
            out["ndcg_micro"]) == (0, 0, 0, 0)

    # partial, reordered: truth doc 10 (rel 3) found at rank 2
    partial = spark.createDataFrame(
        [(1, 99, 1), (1, 10, 2), (1, 98, 3)],
        "query_id long, doc_id long, rank int")
    out = retrieval_eval(partial, perfect, k=k).collect()[0]
    assert out["overlap"] == 1
    # dcg = rel(10) * W[2] = 3 * floor(1e6/log2(3))
    import math

    assert out["dcg_micro"] == 3 * int(1_000_000 // math.log2(3))
    assert 0 < out["ndcg_micro"] < 1_000_000


def test_fk_integrity_orphans_and_nulls(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import fk_integrity_report

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = fk_integrity_report(
        [("child.fk", child, "fk", parent, "pk")]).collect()[0]
    assert (out["n_child"], out["n_null_keys"], out["n_orphans"]) == (4, 1, 1)
    assert out["orphan_ppm"] == 250_000  # 1 of 4


def test_bm25_oracle_escapes_quoted_query_text(spark):
    """Spark path and DuckDB mirror agree on a query containing an
    apostrophe (regression: repr-built VALUES literals switched to
    double quotes, which DuckDB binds as an identifier)."""
    import duckdb

    from hbase_indexer_spark.pipeline.corpus_stats import (bm25_topk,
                                                           bm25_topk_sql)

    rows = [(1, "the engine's join planner"),
            (2, "apple banana cherry"),
            (3, "join planner internals guide")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = [(1, "engine's planner")]
    got = sorted(map(tuple, bm25_topk(docs, q, k=3).collect()))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')".replace("engine's",
                                                    "engine''s")
                            for i, t in rows)
                + ") v(doc_id, text)")
    want = sorted(map(tuple, con.execute(
        bm25_topk_sql(q, k=3)).fetchall()))
    assert got == want and len(got) > 0
