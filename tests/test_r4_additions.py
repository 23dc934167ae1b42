"""Round-4 continuation operators: bloom_screen, dedup_keep_best,
chunk_documents, token_budget_sample, label_centroids, knn_label_vote.

Pins: bloom no-false-negatives + exact output despite the probabilistic
prefilter; quality-canonical keeper policy; chunk boundary arithmetic
(overlap, short tail, empty doc); token-budget crossing-doc rule and
block-size invariance; fixed-point centroid sums; kNN vote tie-break.
"""

import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.curation import token_budget_sample
from hbase_indexer_spark.pipeline.dedup import (
    BLOOM_K,
    bloom_bits,
    bloom_screen,
    dedup_keep_best,
)
from hbase_indexer_spark.pipeline.pack import chunk_documents
from hbase_indexer_spark.pipeline.similarity import (
    knn_label_vote,
    label_centroids,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
LONG_B = "one two three four five six seven eight nine ten"


# ---------------------------------------------------------------- bloom

def test_bloom_screen_exact_despite_prefilter(spark):
    base = _docs(spark, [(0, LONG_A), (2, LONG_B)])
    new = _docs(spark, [(1, LONG_A), (3, "fresh unseen words here")])
    out = {r["doc_id"]: r for r in bloom_screen(base, new).collect()}
    # a true duplicate must always bloom-hit (no false negatives) and be
    # flagged exact
    assert out[1]["bloom_hit"] and out[1]["exact_dup"] and not out[1]["keep"]
    # a non-duplicate keeps regardless of any bloom false positive
    assert not out[3]["exact_dup"] and out[3]["keep"]


def test_bloom_bits_bounded_by_m(spark):
    # 200 distinct base docs at a tiny m: the bit-set can never exceed m
    base = _docs(spark, [(i, f"doc number {i} text") for i in range(200)])
    n_bits = bloom_bits(base, m_bits=64).count()
    assert n_bits <= 64


def test_bloom_small_m_all_hit_still_exact(spark):
    # m = 8 bits with 50 base docs -> essentially every probe hits; the
    # exact verify join must still produce the true answer
    base = _docs(spark, [(2 * i, f"base doc {i}") for i in range(50)])
    new = _docs(spark, [(1, "base doc 7"), (3, "never seen")])
    out = {r["doc_id"]: r for r in
           bloom_screen(base, new, m_bits=8).collect()}
    assert out[1]["exact_dup"] and not out[1]["keep"]
    assert not out[3]["exact_dup"] and out[3]["keep"]
    assert out[3]["bloom_hit"]  # saturated filter: FP expected at m=8


def test_bloom_hit_parity_with_oracle_under_false_positives(spark):
    # The gate corpus is sparse enough that (pre-fix) a double-md5 Spark
    # bit-set vs the oracle's single-md5 bit-set never actually diverged.
    # Force the issue: m=256 with 100 base docs x 5 hashes saturates the
    # filter to ~86% fill (~47% fpp), so dozens of probes are false
    # positives — bloom_hit must STILL match the oracle row for row.
    import duckdb

    from hbase_indexer_spark.pipeline.dedup import bloom_screen_sql

    rows = [(i, f"document number {i} with words {(i * 7) % 13}")
            for i in range(200)]
    base = _docs(spark, [r for r in rows if r[0] % 2 == 0])
    new = _docs(spark, [r for r in rows if r[0] % 2 == 1])
    m = 256
    got = {r["doc_id"]: (r["bloom_hit"], r["exact_dup"], r["keep"])
           for r in bloom_screen(base, new, m_bits=m).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2], r[3])
            for r in con.execute(bloom_screen_sql(m_bits=m)).fetchall()}
    assert got == want
    # the test only bites if false positives actually occurred
    fps = [d for d, (hit, dup, _) in got.items() if hit and not dup]
    assert len(fps) > 5


# ------------------------------------------------------------ keep-best

def test_keep_best_prefers_longer_member(spark):
    longer = LONG_A + " extra trailing tokens beyond"
    docs = spark.createDataFrame(
        [(1, LONG_A, len(LONG_A)), (2, longer, len(longer)),
         (9, LONG_B, len(LONG_B))],
        "doc_id long, text string, n_chars int")
    out = {r["doc_id"]: r for r in
           dedup_keep_best(docs, threshold=0.5).collect()}
    # 1 and 2 cluster (near-dups); keeper is the LONGER doc 2, not min-id
    assert out[1]["component"] == out[2]["component"]
    assert out[1]["keeper_id"] == 2 and out[2]["keeper_id"] == 2
    assert out[2]["is_canonical"] and not out[1]["is_canonical"]
    # singleton keeps itself
    assert out[9]["keeper_id"] == 9 and out[9]["is_canonical"]


def test_keep_best_tie_breaks_min_id(spark):
    docs = spark.createDataFrame(
        [(5, LONG_A, 100), (3, LONG_A, 100)],
        "doc_id long, text string, n_chars int")
    out = {r["doc_id"]: r for r in
           dedup_keep_best(docs, threshold=0.5).collect()}
    assert out[3]["keeper_id"] == 3 and out[5]["keeper_id"] == 3


# -------------------------------------------------------------- chunker

def test_chunk_boundaries_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    out = sorted(
        chunk_documents(_docs(spark, [(1, text)]), size=4, stride=3)
        .collect(), key=lambda r: r["chunk_id"])
    # n=10, size=4, stride=3 -> 1 + ceil(6/3) = 3 chunks
    assert [r["chunk_id"] for r in out] == [0, 1, 2]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t3 t4 t5 t6"      # 1-token overlap
    assert out[2]["chunk_text"] == "t6 t7 t8 t9"
    assert all(r["n_chunk_tokens"] == 4 for r in out)


def test_chunk_short_tail_and_empty(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c d e"), (2, "   ")]), size=4, stride=4
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 5 tokens -> full chunk + 1-token tail
    tail = sorted(by_doc[1], key=lambda r: r["chunk_id"])[-1]
    assert tail["chunk_text"] == "e" and tail["n_chunk_tokens"] == 1
    # empty doc emits nothing
    assert 2 not in by_doc


def test_chunk_doc_shorter_than_window(spark):
    out = chunk_documents(_docs(spark, [(1, "only three tokens")]),
                          size=32, stride=24).collect()
    assert len(out) == 1 and out[0]["chunk_text"] == "only three tokens"


# ------------------------------------------------------- token budget

def _src_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_budget_crossing_doc_included(spark):
    docs = _src_docs(spark, [
        (i, "s", " ".join(["w"] * 10)) for i in range(10)])  # 10 tokens each
    out = token_budget_sample(docs, budget=25).collect()
    kept = sorted(r["doc_id"] for r in out if r["kept"])
    # 25-token budget over 10-token docs: cum_before 0,10,20 < 25 -> 3 kept
    assert len(kept) == 3
    total = sum(r["n_tokens"] for r in out if r["kept"])
    assert total == 30  # smallest prefix reaching the budget


def test_budget_per_source_and_min_one_doc(spark):
    docs = _src_docs(spark, [
        (1, "big", " ".join(["w"] * 500)),   # one doc far over budget
        (2, "small", "a b"),
        (3, "small", "c d"),
    ])
    out = {r["doc_id"]: r for r in
           token_budget_sample(docs, budget=100).collect()}
    assert out[1]["kept"]  # crossing doc included: source never empty
    assert out[2]["kept"] and out[3]["kept"]  # under budget: all kept


def test_budget_assignment_is_total_and_deterministic(spark):
    docs = _src_docs(spark, [
        (i, f"s{i % 3}", " ".join(["w"] * (i % 7 + 1))) for i in range(60)])
    a = sorted(token_budget_sample(docs, budget=30).collect(),
               key=lambda r: r["doc_id"])
    b = sorted(token_budget_sample(docs.repartition(7), budget=30).collect(),
               key=lambda r: r["doc_id"])
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 60


# ------------------------------------------------------------ centroids

def test_label_centroid_sums_exact(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, -0.5], "x"), (1, [0.25, 0.25], "x"), (2, [2.0, 0.0], "y")],
        "vec_id long, embedding array<float>, label string")
    out = {(r["label"], r["dim"]): r for r in label_centroids(emb).collect()}
    assert out[("x", 0)]["sum_micro"] == 1_250_000
    assert out[("x", 1)]["sum_micro"] == -250_000
    assert out[("x", 0)]["n_vecs"] == 2
    assert out[("y", 0)]["sum_micro"] == 2_000_000 and out[("y", 0)]["n_vecs"] == 1


# ------------------------------------------------------------- knn vote

def test_knn_vote_majority_and_tiebreak(spark):
    # query 0 at origin-ish; 2 'a' neighbors + 2 'b' neighbors equally
    # near -> tie at k=4 breaks to 'a' (lexicographically smallest)
    rows = [
        (0, [1.0, 0.0], "q"),
        (1, [0.9, 0.1], "a"), (2, [0.9, -0.1], "a"),
        (3, [0.8, 0.2], "b"), (4, [0.8, -0.2], "b"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string")
    out = knn_label_vote(emb, [0], k=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["true_label"] == "q"
    assert r["predicted_label"] == "a" and r["n_votes"] == 2


# ------------------------------------------------------- fixed-k sample

def test_fixed_k_exact_count_per_stratum(spark):
    from hbase_indexer_spark.pipeline.curation import fixed_k_sample

    docs = spark.createDataFrame(
        [(i, "a" if i < 20 else "b", "t") for i in range(23)],
        "doc_id long, lang string, text string")
    out = fixed_k_sample(docs, k=5, strat_col="lang").collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r["rk"])
    assert sorted(by["a"]) == [1, 2, 3, 4, 5]
    assert sorted(by["b"]) == [1, 2, 3]  # only 3 docs -> min(k, n)


def test_fixed_k_append_stable(spark):
    from hbase_indexer_spark.pipeline.curation import fixed_k_sample

    base = [(i, "a", "t") for i in range(30)]
    d1 = spark.createDataFrame(base, "doc_id long, lang string, text string")
    d2 = spark.createDataFrame(base + [(99, "a", "t")],
                               "doc_id long, lang string, text string")
    s1 = {r["doc_id"] for r in fixed_k_sample(d1, k=5).collect()}
    s2 = {r["doc_id"] for r in fixed_k_sample(d2, k=5).collect()}
    # appending one doc can displace at most one winner
    assert len(s1 - s2) <= 1 and len(s1) == len(s2) == 5


# ------------------------------------------------- source overlap matrix

def test_source_overlap_counts(spark):
    from hbase_indexer_spark.pipeline.dedup import source_overlap_matrix

    near = LONG_A.replace("kappa", "lambda")
    docs = spark.createDataFrame(
        [(1, LONG_A, "web"), (2, near, "books"), (3, LONG_B, "web"),
         (4, LONG_B, "web")],
        "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): r["n_pairs"]
           for r in source_overlap_matrix(docs, threshold=0.5).collect()}
    assert out[("books", "web")] == 1   # cross-source near-dup
    assert out[("web", "web")] == 1     # exact dup on the diagonal


# --------------------------------------------------------- bpe pairs

def test_bpe_pair_counts_weighted_by_word_freq(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import bpe_merge_candidates

    docs = _docs(spark, [(1, "aab aab ab"), (2, "aab")])
    out = {(r["left"], r["right"]): (r["n_occ"], r["rank"])
           for r in bpe_merge_candidates(docs, k=10).collect()}
    # 'aab' x3 contributes (a,a)x3 and (a,b)x3; 'ab' x1 contributes (a,b)
    assert out[("a", "b")][0] == 4
    assert out[("a", "a")][0] == 3
    assert out[("a", "b")][1] == 1  # top merge candidate


def test_bpe_single_char_words_ignored(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import bpe_merge_candidates

    out = bpe_merge_candidates(_docs(spark, [(1, "a b c")]), k=5).collect()
    assert out == []


# --------------------------------------------------------- int8 rerank

def test_int8_rerank_matches_bruteforce_at_full_m(spark):
    from hbase_indexer_spark.pipeline.similarity import (
        brute_force_topk,
        int8_rerank_topk,
    )

    import random
    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)], "x")
         for i in range(40)],
        "vec_id long, embedding array<float>, label string")
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in brute_force_topk(emb, [0, 1], k=3).collect()}
    # m = corpus size -> the coarse stage prunes nothing; re-rank must
    # reproduce brute force exactly
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in int8_rerank_topk(emb, [0, 1], k=3, m=40).collect()}
    assert got == exact


def test_int8_rerank_recall_at_default_m(spark):
    from hbase_indexer_spark.pipeline.similarity import (
        brute_force_topk,
        int8_rerank_topk,
    )

    import random
    rng = random.Random(11)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)], "x")
         for i in range(200)],
        "vec_id long, embedding array<float>, label string")
    qs = list(range(5))
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, qs, k=5).collect()}
    got = {(r["query_id"], r["neighbor_id"])
           for r in int8_rerank_topk(emb, qs, k=5).collect()}
    # int8 coarse ranking is a faithful cosine proxy: high recall
    assert len(got & exact) / len(exact) >= 0.9


# ------------------------------------------------- tfidf cosine pairs

def test_tfidf_cosine_topical_overlap(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import tfidf_cosine_pairs

    docs = _docs(spark, [
        (1, "quantum physics entanglement qubit decoherence"),
        (2, "decoherence qubit entanglement physics quantum"),  # reordered
        (3, "gardening soil compost tomato seedling"),
    ])
    out = {(r["x"], r["y"]): r for r in
           tfidf_cosine_pairs(docs, threshold=0.5).collect()}
    # same vocabulary, different order -> cosine 1.0; Jaccard shingles
    # would see ~0 overlap
    assert (1, 2) in out and abs(out[(1, 2)]["cos_sim"] - 1.0) < 1e-9
    assert not any(3 in p for p in out)


def test_tfidf_cosine_max_df_drops_hot_terms(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import tfidf_cosine_pairs

    # 'the' appears in every doc; with max_df=2 it can't generate
    # candidates, and the remaining vocab is disjoint -> no pairs
    docs = _docs(spark, [
        (1, "the alpha"), (2, "the beta"), (3, "the gamma")])
    assert tfidf_cosine_pairs(docs, threshold=0.01,
                              max_df=2).collect() == []


# --------------------------------------------------------- nll outliers

def test_nll_outlier_flags_rare_vocab_doc(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import nll_outliers

    common = "alpha beta gamma delta"
    rows = [(i, common, "en") for i in range(20)]
    rows.append((99, "zyx wvu tsr qpo", "en"))  # all-rare vocabulary
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r["is_outlier"]
           for r in nll_outliers(docs, z=2).collect()}
    assert out[99] is True
    assert sum(out.values()) == 1  # only the rare-vocab doc


def test_nll_outlier_empty_doc_not_flagged(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import nll_outliers

    docs = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "", "en")],
        "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nll_outliers(docs, z=2).collect()}
    assert out[2]["is_outlier"] is False
    assert out[2]["nll_micro_per_token"] is None


# -------------------------------------------------------- epoch expand

def test_epoch_expand_full_epochs_plus_remainder(spark):
    from hbase_indexer_spark.pipeline.curation import epoch_expand

    # group 'en': two docs x 10 tokens = 20 avail; target 50 -> 2 full
    # epochs + 10-token remainder prefix (exactly one doc)
    docs = spark.createDataFrame(
        [(1, "en", " ".join(["w"] * 10)), (2, "en", " ".join(["w"] * 10)),
         (3, "de", "a b c")],
        "doc_id long, lang string, text string")
    out = epoch_expand(docs, {"en": 50}, group_col="lang").collect()
    en = [r for r in out if r["lang"] == "en"]
    de = [r for r in out if r["lang"] == "de"]
    assert len(en) == 5  # 2 docs x 2 epochs + 1 remainder row
    tokens_emitted = sum(r["n_tokens"] for r in en)
    assert tokens_emitted == 50
    # untargeted group passes through exactly once
    assert [(r["doc_id"], r["epoch"]) for r in de] == [(3, 0)]


def test_epoch_expand_target_below_one_epoch_downsamples(spark):
    from hbase_indexer_spark.pipeline.curation import epoch_expand

    docs = spark.createDataFrame(
        [(i, "en", " ".join(["w"] * 10)) for i in range(10)],
        "doc_id long, lang string, text string")
    out = epoch_expand(docs, {"en": 35}, group_col="lang").collect()
    # 100 avail, target 35 -> 0 full epochs, remainder prefix of 4 docs
    # (cum_before 0,10,20,30 < 35)
    assert len(out) == 4 and all(r["epoch"] == 0 for r in out)


# ------------------------------------------------------ mixed language

def test_mixed_language_flags_code_switch(spark):
    from hbase_indexer_spark.pipeline.text import mixed_language

    en_seg = "the cat is of the house and the dog is the best"
    de_seg = "der hund ist ein tier und die katze ist das beste"
    docs = _docs(spark, [
        (1, " ".join([en_seg] * 3)),              # pure en
        (2, " ".join([en_seg] * 2 + [de_seg] * 2)),  # switches mid-doc
        (3, ""),
    ])
    out = {r["doc_id"]: r for r in
           mixed_language(docs, size=12).collect()}
    assert not out[1]["is_mixed"] and out[1]["majority_lang"] == "en"
    assert out[2]["is_mixed"] and out[2]["n_langs"] >= 2
    assert out[3]["n_segments"] == 0 and not out[3]["is_mixed"]
    assert out[3]["majority_lang"] is None


# --------------------------------------------------- dup size histogram

def test_dup_size_histogram_counts(spark):
    from hbase_indexer_spark.pipeline.dedup import dup_size_histogram

    docs = _docs(spark, [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "c")])
    out = {r["group_size"]: (r["n_groups"], r["n_docs"])
           for r in dup_size_histogram(docs).collect()}
    assert out[3] == (1, 3)  # one group of 3 copies
    assert out[1] == (2, 2)  # two unique docs


# ------------------------------------------------------ quality deciles

def test_quality_deciles_monotone_and_tied_scores_share_bin(spark):
    from hbase_indexer_spark.pipeline.curation import quality_deciles

    rows = [(i, "s", " ".join(["tok%d" % j for j in range(i + 1)]))
            for i in range(20)]          # increasing quality with length
    rows += [(100, "s", rows[5][2]), (101, "s", rows[5][2])]  # exact ties
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in
           quality_deciles(docs, n_bins=4, group_col="source").collect()}
    # ranks respect score order
    scores = [(out[i]["score_micro"], out[i]["decile"]) for i in range(20)]
    for (s1, d1), (s2, d2) in zip(scores, scores[1:]):
        if s1 < s2:
            assert d1 <= d2
    assert 1 <= min(d for _, d in scores) and max(d for _, d in scores) == 4
    # identical scores land in the identical bin
    assert out[100]["decile"] == out[101]["decile"] == out[5]["decile"]


# -------------------------------------------------------- ngram novelty

def test_ngram_novelty_originator_vs_copier(spark):
    from hbase_indexer_spark.pipeline.dedup import ngram_novelty

    docs = _docs(spark, [
        (1, LONG_A),            # originator: all grams first here
        (2, LONG_A),            # verbatim copy: zero novel
        (3, LONG_B),            # disjoint content: fully novel
        (4, ""),  # empty: the whole-text-as-shingle convention
    ])
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[1]["novelty_pct"] == 100
    assert out[2]["novelty_pct"] == 0 and out[2]["n_grams"] > 0
    assert out[3]["novelty_pct"] == 100
    # shingle convention (shingles_of): sub-n docs emit their whole text
    # as the single shingle, so the empty doc owns one (novel) gram
    assert out[4]["n_grams"] == 1 and out[4]["novelty_pct"] == 100


# ------------------------------------------------------- shard manifest

def test_shard_manifest_detects_any_content_change(spark):
    from hbase_indexer_spark.sinks.sharding import shard_manifest

    rows = [(i, f"doc number {i} body") for i in range(40)]
    a = shard_manifest(_docs(spark, rows), n_shards=4).collect()
    # identical corpus, different partitioning -> identical manifest
    b = shard_manifest(_docs(spark, rows).repartition(13),
                       n_shards=4).collect()
    key = lambda r: (r["shard"], r["n_docs"], r["n_tokens"], r["checksum"])
    assert sorted(map(key, a)) == sorted(map(key, b))
    assert sum(r["n_docs"] for r in a) == 40
    # flip one character in one doc -> exactly that shard's checksum moves
    rows2 = list(rows)
    rows2[7] = (7, rows[7][1] + "!")
    c = {r["shard"]: r for r in
         shard_manifest(_docs(spark, rows2), n_shards=4).collect()}
    a_by = {r["shard"]: r for r in a}
    diffs = [s for s in a_by
             if a_by[s]["checksum"] != c[s]["checksum"]]
    assert len(diffs) == 1


# ----------------------------------------------------- curriculum order

def test_curriculum_order_is_tiered_dense_permutation(spark):
    from hbase_indexer_spark.pipeline.curation import curriculum_order

    rows = [(i, "s", " ".join("tok%d" % j for j in range(i % 15 + 1)))
            for i in range(40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    out = curriculum_order(docs, n_bins=4).collect()
    assert sorted(r["pos"] for r in out) == list(range(40))
    # positions respect tier blocks: every tier-1 doc precedes tier-2 etc.
    by_pos = sorted(out, key=lambda r: r["pos"])
    tiers = [r["tier"] for r in by_pos]
    assert tiers == sorted(tiers)
    # anti-curriculum flips the tier order, keeps a dense permutation
    anti = curriculum_order(docs, n_bins=4, easy_first=False).collect()
    anti_tiers = [r["tier"] for r in sorted(anti, key=lambda r: r["pos"])]
    assert anti_tiers == sorted(anti_tiers, reverse=True)


def test_curriculum_partition_invariant(spark):
    from hbase_indexer_spark.pipeline.curation import curriculum_order

    rows = [(i, "s%d" % (i % 2), "w " * (i % 9 + 1))
            for i in range(30)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    a = sorted(map(tuple, curriculum_order(docs).collect()))
    b = sorted(map(tuple, curriculum_order(docs.repartition(7)).collect()))
    assert a == b


# ----------------------------------------------------------- cdc dedup

def test_cdc_spans_partition_token_stream(spark):
    from hbase_indexer_spark.pipeline.dedup import cdc_spans

    docs = _docs(spark, [(1, LONG_A), (2, "")])
    rows = sorted(cdc_spans(docs, avg_mod=4).collect(),
                  key=lambda r: (r["doc_id"], r["pos"]))
    got = " ".join(r["span"] for r in rows if r["doc_id"] == 1)
    assert got.split() == LONG_A.split()   # chunks tile the stream
    assert not [r for r in rows if r["doc_id"] == 2]


def test_cdc_dedup_is_shift_robust(spark):
    from hbase_indexer_spark.pipeline.dedup import cdc_dedup, span_dedup

    body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    shifted = "brand new preamble sentence here " + body
    docs = _docs(spark, [(1, body), (2, shifted)])
    cdc = {r["doc_id"]: r for r in cdc_dedup(docs, avg_mod=4).collect()}
    # the shared body re-chunks identically after the insertion, so the
    # copy loses most of its spans...
    assert cdc[2]["n_removed"] > 0
    # ...while fixed windows are fully shifted: span_dedup sees nothing
    fixed = {r["doc_id"]: r for r in span_dedup(docs, span=4).collect()}
    assert fixed[2]["n_removed"] == 0
    # first occurrence untouched in both
    assert cdc[1]["n_removed"] == 0 and cdc[1]["text"].split() == body.split()


def test_cdc_dedup_identical_docs_collapse(spark):
    from hbase_indexer_spark.pipeline.dedup import cdc_dedup

    docs = _docs(spark, [(1, LONG_A), (2, LONG_A)])
    out = {r["doc_id"]: r for r in cdc_dedup(docs, avg_mod=4).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == out[2]["n_spans"] and out[2]["text"] == ""


# -------------------------------------------------------- recall report

def test_ann_recall_report_full_probe_is_100(spark):
    from hbase_indexer_spark.pipeline.similarity import ann_recall_report

    import random
    rng = random.Random(5)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)], "x")
         for i in range(60)],
        "vec_id long, embedding array<float>, label string")
    # probe_bits == n_bits probes every bucket -> LSH degenerates to
    # exact -> recall must be exactly 100 for every query
    out = ann_recall_report(emb, [0, 1, 2], k=3, n_bits=3,
                            probe_bits=3, n_tables=1).collect()
    assert len(out) == 3
    assert all(r["recall_pct"] == 100 and r["n_hits"] == 3 for r in out)


# ------------------------------------------------------ ivf+int8 stack

def test_ivf_int8_full_probe_full_m_equals_bruteforce(spark):
    from hbase_indexer_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_int8_topk,
    )

    import random
    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)], "x")
         for i in range(50)],
        "vec_id long, embedding array<float>, label string")
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in brute_force_topk(emb, [0, 1], k=3).collect()}
    # probe every cell AND keep every candidate: both approximations off
    # -> the stack must reproduce brute force exactly
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in ivf_int8_topk(emb, [0, 1], k=3, dim=8, n_cells=4,
                                  n_probe=4, m=50).collect()}
    assert got == exact


# --------------------------------------------------- dedup pair quality

def test_dedup_pair_quality_perfect_on_clean_dups(spark):
    from hbase_indexer_spark.pipeline.dedup import dedup_pair_quality

    near = LONG_A.replace("kappa", "lambda")
    docs = _docs(spark, [(1, LONG_A), (2, LONG_A), (3, near), (4, LONG_B)])
    row = dedup_pair_quality(docs, threshold=0.5).collect()[0]
    assert row["n_exact"] > 0
    # candidate-exact verification => precision 100; banding recall on
    # J>=0.5 verbatim-ish dups => recall 100 here
    assert row["precision_pct"] == 100
    assert row["recall_pct"] == 100
    assert row["n_hit"] == row["n_exact"] == row["n_lsh"]


def test_dedup_pair_quality_empty_corpus_nulls(spark):
    from hbase_indexer_spark.pipeline.dedup import dedup_pair_quality

    docs = _docs(spark, [(1, LONG_A), (2, LONG_B)])  # nothing similar
    row = dedup_pair_quality(docs, threshold=0.9).collect()[0]
    assert row["n_exact"] == 0 and row["recall_pct"] is None


# ------------------------------------------------------ event analytics

def _ev(spark, rows):
    from datetime import datetime

    return spark.createDataFrame(
        [(i, datetime(2024, 1, d, h), u, t, 1.0, None)
         for i, (d, h, u, t) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string")


def test_event_funnel_strict_ordering(spark):
    from hbase_indexer_spark.plans.events import event_funnel

    rows = [
        # user 1: full ordered funnel
        (1, 1, 1, "signup"), (1, 2, 1, "view"), (1, 3, 1, "click"),
        (1, 4, 1, "purchase"),
        # user 2: purchase arrives BEFORE the click -> stops at click
        (2, 1, 2, "signup"), (2, 2, 2, "view"), (2, 4, 2, "click"),
        (2, 3, 2, "purchase"),
        # user 3: signup only
        (3, 1, 3, "signup"),
        # user 4: never signed up -> depth 0
        (3, 2, 4, "view"),
    ]
    out = {r["step_idx"]: r for r in event_funnel(
        _ev(spark, rows), ["signup", "view", "click", "purchase"]).collect()}
    assert out[1]["n_users"] == 3          # users 1,2,3
    assert out[2]["n_users"] == 2          # users 1,2
    assert out[3]["n_users"] == 2          # users 1,2 (click still ordered)
    assert out[4]["n_users"] == 1          # user 2's purchase pre-dates click
    assert out[2]["pct_of_first"] == 66    # 2/3 integer pct


def test_retention_cohorts_grid(spark):
    from hbase_indexer_spark.plans.events import retention_cohorts

    rows = [
        (1, 1, 1, "view"),    # user 1 first week 0
        (9, 1, 1, "view"),    # active again week 1
        (16, 1, 1, "view"),   # and week 2
        (9, 1, 2, "view"),    # user 2 first week 1
        (16, 2, 2, "view"),   # active week 2 (offset 1)
    ]
    out = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention_cohorts(_ev(spark, rows)).collect()}
    # weeks are absolute (epoch div), so normalize by the min cohort
    base = min(c for c, _ in out)
    norm = {(c - base, o): n for (c, o), n in out.items()}
    assert norm[(0, 0)] == 1 and norm[(0, 1)] == 1 and norm[(0, 2)] == 1
    assert norm[(1, 0)] == 1 and norm[(1, 1)] == 1


# --------------------------------------------------- threshold curve

def test_threshold_curve_monotone_and_counts(spark):
    from hbase_indexer_spark.pipeline.dedup import jaccard_threshold_curve

    near = LONG_A.replace("kappa", "lambda")      # J ~ 0.78 (7/9)
    docs = _docs(spark, [(1, LONG_A), (2, LONG_A), (3, near), (4, LONG_B)])
    out = {r["threshold_pct"]: r["n_pairs"] for r in
           jaccard_threshold_curve(docs, floor=0.5).collect()}
    # monotone non-increasing with threshold
    ts = sorted(out)
    assert all(out[a] >= out[b] for a, b in zip(ts, ts[1:]))
    assert out[100] == 1      # only the exact pair survives J >= 1.0
    assert out[50] >= 3       # 1-2, 1-3, 2-3 all above 0.5


# ------------------------------------------------------ embedding drift

def test_embedding_drift_identical_and_rotated(spark):
    from hbase_indexer_spark.pipeline.similarity import embedding_drift

    schema = "vec_id long, embedding array<float>, label string"
    a = spark.createDataFrame(
        [(1, [1.0, 0.0], "x"), (2, [0.9, 0.1], "x"),
         (3, [0.0, 1.0], "y")], schema)
    same = spark.createDataFrame(
        [(11, [1.0, 0.0], "x"), (12, [0.9, 0.1], "x"),
         (13, [0.0, 1.0], "y")], schema)
    flipped = spark.createDataFrame(
        [(21, [0.0, 1.0], "x"), (23, [0.0, 1.0], "y")], schema)
    out = {r["label"]: r["centroid_cos"]
           for r in embedding_drift(a, same).collect()}
    assert abs(out["x"] - 1.0) < 1e-9 and abs(out["y"] - 1.0) < 1e-9
    out2 = {r["label"]: r["centroid_cos"]
            for r in embedding_drift(a, flipped).collect()}
    assert out2["x"] < 0.2    # x centroid rotated ~90 degrees
    assert abs(out2["y"] - 1.0) < 1e-9


# ------------------------------------------------------ token fertility

def test_token_fertility_totals(spark):
    from hbase_indexer_spark.pipeline.text import token_fertility

    docs = spark.createDataFrame(
        [(1, "s1", "ab cd"), (2, "s1", "efg"), (3, "s2", "")],
        "doc_id long, source string, text string")
    out = {r["source"]: r for r in
           token_fertility(docs, group_col="source").collect()}
    assert out["s1"]["n_tokens"] == 3 and out["s1"]["n_chars"] == 8
    assert out["s1"]["chars_per_token_x100"] == 266   # 800 div 3
    assert out["s2"]["n_tokens"] == 0
    assert out["s2"]["chars_per_token_x100"] is None


# -------------------------------------------------------- snapshot diff

def test_snapshot_diff_counts(spark):
    from hbase_indexer_spark.pipeline.curation import snapshot_diff

    sch = "doc_id long, source string, text string"
    base = spark.createDataFrame(
        [(1, "web", "kept page"), (2, "web", "dropped page"),
         (3, "books", "stable book")], sch)
    new = spark.createDataFrame(
        [(10, "web", "kept page"), (11, "web", "fresh page"),
         (13, "books", "stable book")], sch)
    out = {r["source"]: r for r in snapshot_diff(base, new).collect()}
    assert out["web"]["n_added"] == 1      # fresh page
    assert out["web"]["n_removed"] == 1    # dropped page
    assert out["web"]["n_unchanged"] == 1  # kept page (id changed)
    assert out["books"]["n_unchanged"] == 1
    assert out["books"]["n_added"] == 0 and out["books"]["n_removed"] == 0


# ---------------------------------------------------------- media dedup

def test_media_dedup_codec_free(spark):
    from hbase_indexer_spark.pipeline.multimodal import media_dedup

    rows = [
        (1, "image", bytearray(b"\x00\x01\x02"), 1, 1, 0),
        (2, "image", bytearray(b"\x00\x01\x02"), 9, 9, 0),  # same bytes
        (3, "audio", bytearray(b"\x00\x01\x02"), 0, 0, 1),  # other modality
        (4, "image", bytearray(b"\xff"), 1, 1, 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary, "
              "width int, height int, sample_rate int")
    out = {r["doc_id"]: r for r in media_dedup(df).collect()}
    assert out[1]["is_canonical"] and out[2]["keeper_id"] == 1
    assert not out[2]["is_canonical"]
    # identical bytes in a different modality dedup independently
    assert out[3]["is_canonical"] and out[3]["keeper_id"] == 3
    assert out[4]["is_canonical"]


def test_json_key_profile_counts_and_edge_payloads(spark):
    """Key coverage/distincts over flat JSON; NULL, malformed and
    non-object payloads count in the denominator but emit no keys —
    the same silent-NULL surviving set as the DuckDB oracle."""
    from hbase_indexer_spark.plans.events import json_key_profile

    e = spark.createDataFrame(
        [('{"k": 87, "m": "x"}',), ('{"k": 0}',), (None,),
         ("not json",), ("[1,2]",)],
        "props string")
    out = {r["key"]: r.asDict() for r in json_key_profile(e).collect()}
    assert set(out) == {"k", "m"}
    assert (out["k"]["n_present"], out["k"]["n_distinct_values"]) == (2, 2)
    assert (out["m"]["n_present"], out["m"]["n_distinct_values"]) == (1, 1)
    # denominator is ALL rows (5), including the three key-less ones
    assert out["k"]["present_ppm"] == 1_000_000 * 2 // 5
    assert out["m"]["present_ppm"] == 1_000_000 // 5
