"""Unit tests for decontamination, n-gram stats, and PII scrubbing —
fixture-driven behavior the sf-corpus oracle can't exercise (the synthetic
docs contain no emails/urls, and contamination needs a known plant)."""

import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.decontam import (
    decontaminate,
    ngram_topk,
    word_ngrams,
)
from hbase_indexer_spark.pipeline.scrub import DEFAULT_RULES, scrub


def test_word_ngrams_short_doc_is_empty(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    out = df.select(word_ngrams(F.col("text"), 3).alias("g")).first()
    assert out["g"] == []


def test_word_ngrams_distinct_and_ordered_content(spark):
    df = spark.createDataFrame([("x y x y x y",)], "text string")
    out = df.select(word_ngrams(F.col("text"), 2).alias("g")).first()
    assert sorted(out["g"]) == ["x y", "y x"]


def test_decontaminate_flags_planted_overlap(spark):
    # find a doc_id for each split under the default salt, then plant a
    # shared 8-token span between one train doc and one test doc
    from hbase_indexer_spark.pipeline.curation import train_test_split

    base = [(i, f"filler{i} " * 12) for i in range(40)]
    df = spark.createDataFrame(base, "doc_id long, text string")
    split = {r["doc_id"]: r["split"]
             for r in train_test_split(df, test_frac=0.3).collect()}
    test_id = next(i for i in split if split[i] == "test")
    train_id = next(i for i in split if split[i] == "train")
    clean_id = next(i for i in split
                    if split[i] == "train" and i != train_id)
    span = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, (span if i in (test_id, train_id) else f"filler{i} ") + f" tail{i} " * 8)
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_shared"]
           for r in decontaminate(df, n=6, min_shared=3,
                                  test_frac=0.3).collect()}
    assert train_id in out and out[train_id] >= 3
    assert clean_id not in out


def test_decontaminate_plan_broadcasts_test_side(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = decontaminate(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_ngram_topk_deterministic_ties(spark):
    # every bigram appears in exactly one doc -> full tie; the k cut must
    # then be alphabetical, stable across runs and partitionings
    df = spark.createDataFrame(
        [(i, f"w{i:02d} w{i:02d}x") for i in range(10)],
        "doc_id long, text string")
    out = [r["ngram"] for r in ngram_topk(df, n=2, k=3).collect()]
    assert out == sorted(out) and len(out) == 3
    assert out[0] == "w00 w00x"


def test_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.com or visit "
             "https://ex.org/a?b=1 or call +1 (555) 123-4567 room 12")],
        "id long, text string")
    row = scrub(df).first()
    s = row["text_scrubbed"]
    assert "<EMAIL>" in s and "<URL>" in s and "<PHONE>" in s
    assert "corp.example.com" not in s and "555" not in s
    # the trailing bare number survives as <NUM>, not <PHONE>
    assert s.rstrip().endswith("room <NUM>")
    assert (row["n_email"], row["n_url"], row["n_phone"]) == (1, 1, 1)


def test_scrub_rule_order_email_before_number(spark):
    df = spark.createDataFrame([(1, "a1b2@x3.com end")], "id long, text string")
    s = scrub(df).first()["text_scrubbed"]
    assert s == "<EMAIL> end"


def test_scrub_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "t 9")], "id long, text string")
    plan = scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_quantize_error_bounded_and_ansi_safe(spark):
    from hbase_indexer_spark.pipeline.similarity import quantize_embeddings

    rows = [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [127.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    # error bound: half a quantization step per component
    assert out[1]["max_err"] <= out[1]["scale"] / 2 + 1e-12
    codes1 = [int(c) for c in out[1]["codes_s"].split("\x1f")]
    assert codes1 == [64, -127, 32]  # floor(x/scale + .5)
    # zero vector: guarded division, all-zero codes, zero error
    assert out[2]["scale"] == 0.0 and out[2]["max_err"] == 0.0
    assert out[2]["codes_s"] == "\x1f".join(["0"] * 3)
    assert out[3]["codes_s"] == "127"


def test_quantize_is_shuffle_free(spark, sf_dir):
    from hbase_indexer_spark.pipeline.similarity import quantize_embeddings

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = quantize_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_vocab_kmv_exact_below_k_and_estimates_above(spark):
    from hbase_indexer_spark.pipeline.text import vocab_kmv

    # 30 distinct tokens, k=256 -> the sketch is exact
    small = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(30))) for i in range(5)],
        "doc_id long, text string")
    r = vocab_kmv(small, k=256).first()
    assert (r["n_min"], r["est_vocab"]) == (30, 30)

    # 2000 distinct tokens, k=128 -> estimate within 25% of truth
    big = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(100))) for i in range(20)],
        "doc_id long, text string")
    r = vocab_kmv(big, k=128).first()
    assert r["n_min"] == 128
    assert abs(r["est_vocab"] - 2000) / 2000 < 0.25, r["est_vocab"]


def test_quantized_search_preserves_topk(spark, sf_dir):
    # codes-first ANN: searching over dequantized int8 vectors must agree
    # with full-precision search for almost all of the top-k
    from hbase_indexer_spark.pipeline.similarity import (
        brute_force_topk,
        dequantize,
        quantize_codes,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(5).collect()]
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, qids, k=10).collect()}
    approx_emb = dequantize(quantize_codes(emb))
    approx = {(r["query_id"], r["neighbor_id"])
              for r in brute_force_topk(approx_emb, qids, k=10).collect()}
    overlap = len(exact & approx) / len(exact)
    assert overlap >= 0.9, overlap


def test_scrub_and_profile_run_on_streams(spark, tmp_path):
    # the curation map ops are pure projections, so they must compose with
    # readStream unchanged and produce exactly the batch result
    from hbase_indexer_spark.pipeline.scrub import scrub
    from hbase_indexer_spark.pipeline.text import text_profile

    schema = "doc_id long, text string"
    rows = [(1, "mail a@b.co now 42"), (2, "plain words only here")]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        text_profile(scrub(stream).withColumnRenamed("text_scrubbed", "text2")
                     .drop("text").withColumnRenamed("text2", "text"))
        .writeStream.format("memory").queryName("scrub_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM scrub_stream").collect()}

    batch = spark.createDataFrame(rows, schema)
    want = {r["doc_id"]: r for r in text_profile(
        scrub(batch).withColumnRenamed("text_scrubbed", "text2")
        .drop("text").withColumnRenamed("text2", "text")).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k].asDict() == want[k].asDict()


# ---------------------------------------------------------------------------
# property-based invariants (hypothesis) — batched: one Spark job per example
# set, not per example, by collecting the strategy into a single DataFrame
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

text_st = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    min_size=0, max_size=80)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(text_st, min_size=1, max_size=30))
def test_scrub_output_never_contains_digits(spark, texts):
    # the NUMBER rule runs last over [0-9]+, so no digit can survive any
    # rule interaction — the strongest single invariant of the chain
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")
    for r in scrub(df).collect():
        assert not any(c.isdigit() for c in r["text_scrubbed"]), r


token_st = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(token_st, min_size=0, max_size=12),
                min_size=1, max_size=20))
def test_word_ngrams_counts_and_shape(spark, docs_tokens):
    n = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)],
        "doc_id long, text string")
    out = {r["doc_id"]: r["g"] for r in df.select(
        "doc_id", word_ngrams(F.col("text"), n).alias("g")).collect()}
    for i, toks in enumerate(docs_tokens):
        grams = out[i]
        assert len(grams) <= max(0, len(toks) - n + 1)
        assert len(set(grams)) == len(grams)          # distinct
        for g in grams:
            assert len(g.split(" ")) == n             # exactly n tokens


def test_decontaminate_streams_against_static_benchmark(spark, tmp_path):
    # online contamination filter: incoming train docs stream against a
    # STATIC benchmark n-gram set (stream-static broadcast join) and must
    # flag exactly what the batch form flags
    from hbase_indexer_spark.pipeline.decontam import word_ngrams

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    bench = spark.createDataFrame([(100, span)], "doc_id long, text string")
    bench_grams = (bench.select(F.explode(word_ngrams(F.col("text"), 6))
                                .alias("g")).distinct())

    rows = [(1, span + " extra tail words here"),
            (2, "unrelated filler content with many plain words going on")]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    flagged = (
        stream.select("doc_id",
                      F.explode(word_ngrams(F.col("text"), 6)).alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    q = (flagged.writeStream.format("memory").queryName("decontam_stream")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r["n_shared"]
           for r in spark.sql("SELECT * FROM decontam_stream").collect()}
    assert 1 in got and got[1] >= 3
    assert 2 not in got


def test_token_freq_spectrum_bands(spark):
    from hbase_indexer_spark.pipeline.text import token_freq_spectrum

    # one hapax, one token appearing 3x, one appearing 40x
    text = " ".join(["once"] + ["few"] * 3 + ["head"] * 40)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r["band"]: (r["n_tokens"], r["n_occurrences"])
           for r in token_freq_spectrum(df).collect()}
    assert got == {"1": (1, 1), "2-3": (1, 3), "32+": (1, 40)}


def test_training_corpus_composition_invariants(spark, sf_dir):
    from hbase_indexer_spark.pipeline.curation import (
        curated_corpus,
        train_test_split,
        training_corpus,
    )
    from hbase_indexer_spark.pipeline.decontam import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    final = {r["doc_id"] for r in training_corpus(docs).collect()}
    curated = {r["doc_id"] for r in curated_corpus(docs).collect()}
    split = {r["doc_id"]: r["split"]
             for r in train_test_split(docs, test_frac=0.1).collect()}
    dirty = {r["doc_id"] for r in decontaminate(docs).collect()}
    assert final <= curated
    assert all(split[d] == "train" for d in final)
    assert not (final & dirty)
    # and it actually removed something relative to plain curation
    assert final != curated


def test_vocab_kmv_by_matches_global_on_single_group(spark):
    from hbase_indexer_spark.pipeline.text import vocab_kmv, vocab_kmv_by

    df = spark.createDataFrame(
        [(i, "en", " ".join(f"tok{i}_{j}" for j in range(60)))
         for i in range(10)],
        "doc_id long, lang string, text string")
    grouped = vocab_kmv_by(df, group_col="lang", k=64).collect()
    glob = vocab_kmv(df, k=64).first()
    assert len(grouped) == 1
    g = grouped[0]
    assert (g["n_min"], g["h_k"], g["est_vocab"]) == (
        glob["n_min"], glob["h_k"], glob["est_vocab"])


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    from hbase_indexer_spark.pipeline.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string")
    cont = {(r["x"], r["y"]): r["containment"]
            for r in ngram_containment_pairs(df, threshold=0.8).collect()}
    jac = {(r["x"], r["y"]) for r in ngram_jaccard_pairs(df, 0.7).collect()}
    assert cont[(1, 2)] == 1.0          # short fully embedded in long
    assert (2, 1) not in cont           # containment is directional
    assert (1, 2) not in jac            # Jaccard structurally misses it


def test_simhash_banded_join_is_complete(spark, sf_dir):
    # pigeonhole: the banded join must find EXACTLY the quadratic scan's
    # pairs — recall 1, no approximation
    from hbase_indexer_spark.pipeline.dedup import simhash, simhash_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    banded = {(r["x"], r["y"], r["hamming"])
              for r in simhash_near_pairs(docs, max_hamming=3).collect()}
    sigs = simhash(docs).collect()
    brute = set()
    sig_list = [(r["doc_id"], r["simhash"]) for r in sigs]
    for i, (dx, sx) in enumerate(sig_list):
        for dy, sy in sig_list[i + 1:]:
            h = bin(sx ^ sy).count("1")
            if h <= 3:
                a, b = (dx, dy) if dx < dy else (dy, dx)
                brute.add((a, b, h))
    assert banded == brute and brute

    import pytest as _pt
    with _pt.raises(ValueError):
        simhash_near_pairs(docs, max_hamming=4, n_bands=4)


def test_semantic_decontam_flags_near_test_vectors(spark):
    """A train vector nearly parallel to a test vector is flagged with
    the right hit count; an orthogonal one is not — even though neither
    shares any n-gram surface (the case the n-gram screen can't catch)."""
    import hashlib

    from hbase_indexer_spark.pipeline.curation import SPLIT_BUCKETS
    from hbase_indexer_spark.pipeline.decontam import semantic_decontam

    def bucket(vec_id, salt="split-v1"):
        h = hashlib.md5(f"{vec_id}:{salt}".encode()).hexdigest()
        return int(h[:15], 16) % SPLIT_BUCKETS

    cut = int(0.1 * SPLIT_BUCKETS)
    test_id = next(i for i in range(1000) if bucket(i) < cut)
    trains = [i for i in range(1000) if bucket(i) >= cut and i != test_id]
    train_a, train_b = trains[0], trains[1]
    dim = 64
    base = [1.0] + [0.0] * (dim - 1)
    near = [0.98] + [0.199] + [0.0] * (dim - 2)   # cosine ~0.98 to base
    ortho = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)
    emb = spark.createDataFrame(
        [(test_id, base), (train_a, near), (train_b, ortho)],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["n_test_hits"]
           for r in semantic_decontam(emb, threshold=0.9).collect()}
    assert out == {train_a: 1}
