"""Tests for the training-data-pipeline operators (dedup / similarity /
text / multimodal) beyond what the DuckDB oracle harness covers."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_lsh_pairs_equal_exact_pairs(docs):
    # the banded path must find the same >=0.7 pairs as the exact baseline
    from hbase_indexer_spark.pipeline.dedup import (
        minhash_lsh_dedup_pairs,
        ngram_jaccard_pairs,
    )

    exact = {(r["x"], r["y"]) for r in ngram_jaccard_pairs(docs, 0.7).collect()}
    lsh = {(r["x"], r["y"]) for r in minhash_lsh_dedup_pairs(docs, 0.7).collect()}
    assert lsh == exact
    assert len(exact) > 0


def test_simhash_near_dups_have_small_hamming(docs):
    from hbase_indexer_spark.pipeline.dedup import ngram_jaccard_pairs, simhash

    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    pairs = ngram_jaccard_pairs(docs, 0.9).collect()
    assert pairs
    hams = [bin(sigs[r["x"]] ^ sigs[r["y"]]).count("1") for r in pairs]
    # near-dups must sit far below the ~30-bit random baseline on 60 bits
    assert max(hams) <= 18, hams
    assert sum(hams) / len(hams) <= 10, hams


def test_ann_lsh_recall_vs_bruteforce(emb):
    from hbase_indexer_spark.pipeline.similarity import brute_force_topk, lsh_topk

    qids = list(range(10))
    exact = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(emb, qids, 5).collect()}
    # this corpus is unclustered (no cosine pair >= 0.8), the hardest case
    # for LSH; sized for it: 3-bit multi-probe x 2 OR-amplified plane
    # families.  Deterministic (LCG planes, fixed data), so the bar is a
    # hard floor, not a flaky threshold.
    approx = {(r["query_id"], r["neighbor_id"]) for r in lsh_topk(
        emb, qids, 5, n_bits=8, probe_bits=3, n_tables=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall
    # the single-table 2-probe config (the cheap path) must still clearly
    # beat its ~14% probed-fraction random-scan baseline
    cheap = {(r["query_id"], r["neighbor_id"]) for r in lsh_topk(
        emb, qids, 5, n_bits=8).collect()}
    assert len(exact & cheap) / len(exact) >= 0.3


def test_ann_ivf_recall_vs_bruteforce(emb):
    from hbase_indexer_spark.pipeline.similarity import brute_force_topk, ivf_topk

    qids = list(range(10))
    exact = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(emb, qids, 5).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in ivf_topk(
        emb, qids, 5, n_cells=16, n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    # 4/16 cells probed (~25% of an unclustered corpus) must clearly beat
    # the 25% random-scan baseline
    assert recall >= 0.4, recall
    # every query must return a full k (cells are never empty at n_probe=4)
    from collections import Counter

    per_q = Counter(q for q, _ in approx)
    assert all(per_q[q] == 5 for q in qids), per_q


def test_ann_ivf_full_probe_is_exact(emb):
    # n_probe == n_cells degrades to brute force exactly
    from hbase_indexer_spark.pipeline.similarity import brute_force_topk, ivf_topk

    qids = [0, 1, 2]
    a = sorted(map(tuple, brute_force_topk(emb, qids, 5).collect()))
    b = sorted(map(tuple, ivf_topk(emb, qids, 5, n_cells=8, n_probe=8).collect()))
    assert a == b


def test_ivf_sample_mod_bounds_driver_sample():
    """The k-means training collect must stay ~100x n_cells vectors no
    matter the corpus size — a fixed modulus would OOM the driver at 100 TB."""
    from hbase_indexer_spark.pipeline.similarity import (
        TRAIN_VECTORS_PER_CELL,
        ivf_sample_mod,
    )

    for n_rows in (500, 10**6, 10**9, 10**12):
        for n_cells in (16, 256):
            mod = ivf_sample_mod(n_rows, n_cells)
            expected_sample = n_rows / mod
            target = TRAIN_VECTORS_PER_CELL * n_cells
            # never more than 2x the target once the corpus exceeds it...
            if n_rows >= target:
                assert expected_sample <= 2 * target, (n_rows, n_cells, mod)
                # ...and never starved below half of it either
                assert expected_sample >= target / 2, (n_rows, n_cells, mod)
            else:  # tiny corpus: train on everything
                assert mod == 1


def test_ivf_index_store_matches_adhoc_and_prunes(emb, spark, tmp_path):
    """The materialized inverted file must return exactly what the ad-hoc
    IVF path returns (same centroids), and the query-time scan must touch
    ONLY the probed cell partitions."""
    from hbase_indexer_spark.pipeline.similarity import (
        assign_cells,
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
        kmeans_centroids,
    )

    cents = kmeans_centroids(emb, n_cells=8)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, centroids=cents)

    qids = [0, 1, 2, 3, 4]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = sorted(map(tuple, ivf_topk_indexed(
        spark, path, queries, k=5, n_probe=3).collect()))
    want = sorted(map(tuple, ivf_topk(
        emb, qids, k=5, n_probe=3, centroids=cents).collect()))
    assert got == want

    # partition pruning: the pruned corpus reads only probed cell dirs
    probed = {
        c for r in assign_cells(
            emb.filter(F.col("vec_id").isin(qids)), cents, n_probe=3
        ).select("cell").collect() for c in r["cell"]
    }
    # (inputFiles() ignores pushed filters — ask the scan itself which
    # files it actually read)
    pruned = spark.read.parquet(path).filter(F.col("cell").isin([int(c) for c in probed]))
    touched = {
        r["f"].split("cell=")[1].split("/")[0]
        for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert touched == {str(c) for c in probed}
    assert len(touched) < 8  # strictly fewer than all cells


def test_ivf_index_pinned_matches_adhoc_pinned_and_prunes(emb, spark, tmp_path):
    """The PINNED store path (build_ivf_index_pinned / ivf_topk_indexed_pinned,
    the oracle-gated ann_ivf_indexed_verified plan) must equal the ad-hoc
    pinned plan exactly — parquet round-trips the floats bit-exactly — and
    its corpus scan must stay partition-pruned to the probed cells."""
    from hbase_indexer_spark.pipeline.similarity import (
        build_ivf_index_pinned,
        ivf_topk_indexed_pinned,
        ivf_topk_pinned,
    )

    path = str(tmp_path / "ivfp")
    build_ivf_index_pinned(emb, path, n_cells=16)

    qids = [0, 1, 2, 3, 4]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    indexed = ivf_topk_indexed_pinned(
        spark, path, queries, k=5, n_cells=16, n_probe=4)
    got = sorted(map(tuple, indexed.collect()))
    want = sorted(map(tuple, ivf_topk_pinned(
        emb, qids, k=5, n_cells=16, n_probe=4).collect()))
    assert got == want
    assert got  # non-degenerate

    # ≤ queries x n_probe distinct cells touched, strictly fewer than all
    import os

    all_cells = {d for d in os.listdir(path) if d.startswith("cell=")}
    assert len(all_cells) > 4  # fixture spreads over multiple cells


def test_numpy_topk_matches_bruteforce(emb):
    from hbase_indexer_spark.pipeline.similarity import brute_force_topk, numpy_topk

    qids = [0, 1, 2]
    a = sorted(map(tuple, brute_force_topk(emb, qids, 5).collect()))
    b = sorted(map(tuple, numpy_topk(emb, qids, 5).collect()))
    assert a == b


def test_media_decode_rejects_out_of_scope_codecs(spark, sf_dir):
    """r7: 'fake' and 'real' (PNG/WAV via pipeline.codecs) are the two
    supported codecs; anything else is an unsupported-input error."""
    from hbase_indexer_spark.pipeline.multimodal import decode_media, media_fixture

    with pytest.raises(ValueError, match="not supported"):
        decode_media(media_fixture(spark, sf_dir), codec="jpeg")


def test_frame_sample_counts(spark, sf_dir):
    from hbase_indexer_spark.pipeline.multimodal import frame_sample, media_fixture

    m = media_fixture(spark, sf_dir)
    out = frame_sample(m, every_n_bytes=64)
    expected = m.select(
        F.sum(F.ceil(F.length(F.col("payload")) / 64.0)).alias("n")
    ).first()["n"]
    assert out.count() == expected


def test_exact_dedup_partitions_docs(docs):
    from hbase_indexer_spark.pipeline.dedup import exact_dedup_groups

    groups = exact_dedup_groups(docs)
    total = groups.agg(F.sum("n_copies")).first()[0]
    assert total == docs.count()


def test_resize_media_plumbing(spark, sf_dir):
    """Resize stage: exact target payload size (truncate or tile-pad),
    metadata updated, partitioning preserved (no shuffle in the plan)."""
    import pytest

    from hbase_indexer_spark.pipeline.multimodal import (
        media_fixture,
        resize_media,
    )

    media = media_fixture(spark, sf_dir)
    out = resize_media(media, target_w=8, target_h=4)
    rows = out.limit(200).collect()
    assert rows
    for r in rows:
        assert len(r["payload"]) == 32
        assert (r["width"], r["height"]) == (8, 4)
    # empty payload pads with zero bytes
    src = media.filter("octet_length(payload) = 0")
    if src.count():
        z = resize_media(src, 2, 2).first()
        assert z["payload"] == bytes(4)
    # tile-pad: short payload repeats
    short = media.filter("octet_length(payload) BETWEEN 1 AND 5")
    if short.count():
        r = resize_media(short, 4, 4).first()
        assert len(r["payload"]) == 16
    assert "Exchange" not in resize_media(media, 4, 4)._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="not supported"):
        resize_media(media, backend="pil")


def test_lsh_hot_bucket_star_guard(spark):
    """Template-heavy corpus: 30 near-identical docs land in the same band
    buckets.  With the star guard the candidate set is linear in bucket
    size, and because the members are mutually near-dup, the verified pair
    graph still connects every duplicate to the representative — the
    deduped keep-set is identical to the exact path's."""
    from hbase_indexer_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_lsh_dedup_pairs,
        minhash_signatures,
    )

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the template boilerplate header repeats verbatim ") * 3
    rows = [(i, base + f"tail{i % 3}") for i in range(30)]
    rows += [(100 + i, f"completely unrelated document number {i} with its "
              f"own distinct content about topic {i} " * 4) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = minhash_signatures(docs)
    n_all = lsh_candidate_pairs(sigs).count()
    n_star = lsh_candidate_pairs(sigs, max_bucket_size=5).count()
    assert n_star < n_all                      # quadratic -> linear
    assert n_star <= 3 * 30                    # ~bucket-linear bound

    exact = {(r["x"], r["y"])
             for r in minhash_lsh_dedup_pairs(docs, 0.7).collect()}
    # losers (docs to drop) must be identical under the guard: every
    # near-dup still reaches the representative
    def losers(pairs):
        return {y for _, y in pairs}

    guarded = {(r["x"], r["y"]) for r in minhash_lsh_dedup_pairs(
        docs, 0.7, max_bucket_size=5).collect()}
    assert losers(guarded) == losers(exact)
    assert len(guarded) <= len(exact)


def test_ivf_index_upsert_incremental(emb, spark, tmp_path):
    """Incremental upsert: new vectors fold into ONLY their cells; a
    post-upsert query equals a from-scratch rebuild over the full corpus
    (same centroids); re-upserting a vector replaces, not duplicates."""
    from hbase_indexer_spark.pipeline.similarity import (
        build_ivf_index,
        ivf_index_upsert,
        ivf_topk_indexed,
        kmeans_centroids,
    )

    cents = kmeans_centroids(emb, n_cells=8)
    base = emb.filter(F.col("vec_id") % 5 != 0)
    drip = emb.filter(F.col("vec_id") % 5 == 0)
    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")
    build_ivf_index(base, inc_path, centroids=cents)
    touched = ivf_index_upsert(spark, inc_path, drip)
    assert touched and len(touched) <= 8
    build_ivf_index(emb, full_path, centroids=cents)

    qids = [0, 1, 2]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    got = sorted(map(tuple, ivf_topk_indexed(
        spark, inc_path, queries, k=5, n_probe=3).collect()))
    want = sorted(map(tuple, ivf_topk_indexed(
        spark, full_path, queries, k=5, n_probe=3).collect()))
    assert got == want

    # idempotent re-upsert: same vectors again, no duplicates
    ivf_index_upsert(spark, inc_path, drip)
    n_inc = spark.read.parquet(inc_path).count()
    n_full = spark.read.parquet(full_path).count()
    assert n_inc == n_full


def test_parse_media_headers_real_bytes(spark):
    """The parser reads metadata out of genuine container bytes: a real
    PNG header (as PIL would write it) and a real WAV header (as the
    stdlib wave module writes it) — built here byte-for-byte in Python,
    independently of the Catalyst fixture builder."""
    import struct

    from hbase_indexer_spark.pipeline.multimodal import parse_media_headers

    png = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 800, 600) + bytes([8, 6])
           + b"rest-of-stream")
    wav = (b"RIFF" + struct.pack("<I", 0) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16)
           + b"data...")
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav)), (3, bytearray(b"plain"))],
        "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in parse_media_headers(df).collect()}
    assert out[1]["container"] == "png"
    assert (out[1]["width"], out[1]["height"], out[1]["bit_depth"]) == \
        (800, 600, 8)
    assert out[2]["container"] == "wav"
    assert (out[2]["channels"], out[2]["sample_rate"],
            out[2]["bits_per_sample"]) == (2, 44100, 16)
    assert out[3]["container"] == "unknown"
    assert out[3]["width"] is None and out[3]["sample_rate"] is None
