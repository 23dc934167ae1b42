"""Curation operators: determinism/stability invariants that matter for
training pipelines (no leakage across re-runs, partition-independence)."""

from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.curation import (
    curated_corpus,
    stratified_sample,
    train_test_split,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_split_partition_independent(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r["doc_id"]: r["split"]
         for r in train_test_split(docs).collect()}
    b = {r["doc_id"]: r["split"]
         for r in train_test_split(docs.repartition(13)).collect()}
    assert a == b


def test_split_covers_and_respects_frac(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = train_test_split(docs, test_frac=0.2).collect()
    assert len(out) == docs.count()
    frac = sum(1 for r in out if r["split"] == "test") / len(out)
    assert 0.1 < frac < 0.3  # hash-uniform around 0.2


def test_split_salt_redeal(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r["doc_id"]: r["split"]
         for r in train_test_split(docs, salt="v1").collect()}
    b = {r["doc_id"]: r["split"]
         for r in train_test_split(docs, salt="v2").collect()}
    assert a != b  # a new salt re-deals assignments
    assert set(a) == set(b)


def test_split_stable_under_append(spark, sf_dir):
    # old docs never migrate when the corpus grows: assignment depends
    # only on (doc_id, salt)
    docs = _docs(spark, sf_dir)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full = {r["doc_id"]: r["split"] for r in train_test_split(docs).collect()}
    part = {r["doc_id"]: r["split"] for r in train_test_split(half).collect()}
    assert all(full[k] == v for k, v in part.items())


def test_stratified_sample_rates(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = stratified_sample(docs, {"en": 1.0, "de": 0.0}, default_frac=0.5)
    got = {r["lang"]: 1 for r in out.select("lang").distinct().collect()}
    assert "en" in got and "de" not in got
    n_en = out.filter(F.col("lang") == "en").count()
    assert n_en == docs.filter(F.col("lang") == "en").count()


def test_curated_corpus_is_filtered_subset(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = curated_corpus(docs, min_tokens=1, min_quality=0.0)
    kept = [r["doc_id"] for r in out.collect()]
    assert 0 < len(kept) <= docs.count()
    assert len(set(kept)) == len(kept)


def test_repetition_stats_hand_computed(spark):
    from hbase_indexer_spark.pipeline.text import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b a b a"),      # words: a*3 b*2; bigrams: ab*2 ba*2
         (2, "x y z"),          # no repetition
         (3, "w"),              # single word, no bigrams
         (4, "")],              # empty -> drops out entirely
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2, 3}
    r = rows[1]
    assert (r["n_words"], r["n_distinct_words"]) == (5, 2)
    assert r["top_word_count"] == 3
    assert r["dup_word_count"] == 5          # both words repeat
    assert r["n_bigrams"] == 4 and r["dup_bigram_count"] == 4
    r = rows[2]
    assert (r["n_words"], r["dup_word_count"]) == (3, 0)
    assert r["n_bigrams"] == 2 and r["dup_bigram_count"] == 0
    r = rows[3]
    assert (r["n_words"], r["n_bigrams"]) == (1, 0)


def test_quality_ensemble_bins_and_bounds(spark):
    from hbase_indexer_spark.pipeline.curation import quality_ensemble

    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog and runs far"),
        (2, "aaa aaa aaa aaa aaa aaa aaa aaa"),            # repetitive
        (3, "zq xv wk jm pf bd gh tn rs lc yw qe rt"),      # high entropy
        (4, ""),                                            # no tokens
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_ensemble(docs, bins=16).collect()}
    assert 4 not in out  # token-less docs carry no signals
    for r in out.values():
        for c in ("q_bin", "ent_bin", "typ_bin"):
            assert 0 <= r[c] <= 15, r
        assert 0 <= r["ensemble_micro"] <= 1_000_000, r
    # repetitive doc has the lowest entropy bin
    assert out[2]["ent_bin"] == min(r["ent_bin"] for r in out.values())
    import pytest

    with pytest.raises(ValueError):
        quality_ensemble(docs, bins=1)
