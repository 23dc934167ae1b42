"""Cross-operator algebra: invariants that hold when pipeline stages
compose — the properties a user silently relies on when chaining them.

- dedup closure: the deduped corpus contains no near-dup pair at the
  dedup threshold (re-running the detector on the output finds nothing).
- idempotence: span/cdc dedup are fixed points on their own output.
- screen reflexivity: screening a corpus against itself flags every doc
  as an exact duplicate.
- curation monotonicity: the curated corpus is a subset of the input
  and of the quality gate's keeps.
"""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu"]


def _corpus(spark, n=30):
    rows = []
    for i in range(n):
        toks = [WORDS[(i * 7 + j) % len(WORDS)] for j in range(10)]
        rows.append((i, " ".join(toks)))
    # seed exact + near duplicates
    rows.append((100, rows[0][1]))
    rows.append((101, rows[1][1].replace("beta", "nu")))
    return _docs(spark, rows)


def test_deduped_corpus_is_pair_free(spark):
    from hbase_indexer_spark.pipeline.dedup import (
        deduped_corpus,
        minhash_lsh_dedup_pairs,
    )

    docs = _corpus(spark)
    out = deduped_corpus(docs, threshold=0.7)  # kept doc_ids
    kept = docs.join(out.select("doc_id"), "doc_id", "left_semi")
    # detector finds nothing left to remove
    assert minhash_lsh_dedup_pairs(kept, threshold=0.7).count() == 0
    # and the output is a subset of the input ids
    in_ids = {r["doc_id"] for r in docs.collect()}
    assert {r["doc_id"] for r in out.collect()} <= in_ids


def test_span_dedup_idempotent(spark):
    from hbase_indexer_spark.pipeline.dedup import span_dedup

    docs = _corpus(spark)
    once = span_dedup(docs, span=5).select("doc_id", "text")
    twice = span_dedup(once, span=5)
    assert twice.agg(F.sum("n_removed")).first()[0] == 0


def test_cdc_dedup_idempotent(spark):
    from hbase_indexer_spark.pipeline.dedup import cdc_dedup

    docs = _corpus(spark)
    once = cdc_dedup(docs, avg_mod=4).select("doc_id", "text")
    twice = cdc_dedup(once, avg_mod=4)
    assert twice.agg(F.sum("n_removed")).first()[0] == 0


def test_bloom_screen_reflexive(spark):
    from hbase_indexer_spark.pipeline.dedup import bloom_screen

    docs = _corpus(spark)
    out = bloom_screen(docs, docs)
    assert out.filter(~F.col("exact_dup")).count() == 0


def test_curated_corpus_subset_of_gopher_keeps(spark):
    from hbase_indexer_spark.pipeline.curation import curated_corpus
    from hbase_indexer_spark.pipeline.text import token_count

    # curated_corpus gates on min_tokens among other things: every
    # surviving doc satisfies the token floor
    docs = _corpus(spark).withColumn("lang", F.lit("en"))
    out = curated_corpus(docs, min_tokens=5)
    kept = docs.join(out.select("doc_id"), "doc_id", "left_semi")
    bad = kept.filter(token_count(F.col("text")) < 5).count()
    assert bad == 0
    in_ids = {r["doc_id"] for r in docs.collect()}
    assert {r["doc_id"] for r in out.collect()} <= in_ids


def test_dedup_store_screen_matches_stateless_exact(spark, tmp_path):
    """The persistent store's exact verdicts agree with the stateless
    dedup_against exact path on the same split."""
    from hbase_indexer_spark.pipeline.dedup import dedup_against
    from hbase_indexer_spark.pipeline.dedup_store import DedupIndexStore

    docs = _corpus(spark)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    store = DedupIndexStore(str(tmp_path / "dd"), threshold=0.7)
    store.accept(spark, base)
    stateful = {r["doc_id"]: r["exact_dup"]
                for r in store.screen(spark, new).collect()}
    stateless = {r["doc_id"]: r["exact_dup"]
                 for r in dedup_against(base, new,
                                        threshold=0.7).collect()}
    assert stateful == stateless


def test_curation_lineage_consistent_with_curated_corpus(spark):
    """dropped_by IS NULL <=> the doc survives curated_corpus."""
    from hbase_indexer_spark.pipeline.curation import (
        curated_corpus,
        curation_lineage,
    )

    docs = _corpus(spark).withColumn("lang", F.lit("en"))
    survivors = {r["doc_id"] for r in
                 curated_corpus(docs, min_tokens=5, min_quality=0.1,
                                dedup_threshold=0.7).collect()}
    lineage = {r["doc_id"]: r["dropped_by"] for r in
               curation_lineage(docs, min_tokens=5, min_quality=0.1,
                                dedup_threshold=0.7).collect()}
    assert {d for d, why in lineage.items() if why is None} == survivors
    # the seeded exact copy is attributed to the exact stage
    assert lineage[100] == "exact_dup"
