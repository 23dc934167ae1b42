"""Sequence packing (pack_sequences).

Pins: exact global token offsets in doc_id order, sequence-id spans for
docs inside / straddling / spanning windows, empty docs (NULL span,
n_seqs 0), block-size invariance (the two-level prefix sum must produce
the same layout for any block partitioning), and full-corpus totals.
"""

from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.pack import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(spark, rows, **kw):
    res = pack_sequences(_docs(spark, rows), **kw).collect()
    return {r["doc_id"]: (r["n_tokens"], r["start_token"], r["first_seq"],
                          r["last_seq"], r["n_seqs"]) for r in res}


def test_offsets_and_spans(spark):
    # seq_len=4: doc 1 fills seq 0 exactly; doc 2 straddles 1-2;
    # doc 3 sits inside seq 2
    out = _out(spark, [
        (1, "a b c d"),
        (2, "e f g h i j"),
        (3, "k l"),
    ], seq_len=4)
    assert out[1] == (4, 0, 0, 0, 1)
    assert out[2] == (6, 4, 1, 2, 2)
    assert out[3] == (2, 10, 2, 2, 1)


def test_doc_spanning_many_sequences(spark):
    out = _out(spark, [(1, " ".join(["t"] * 10))], seq_len=3)
    assert out[1] == (10, 0, 0, 3, 4)


def test_empty_doc_occupies_nothing(spark):
    out = _out(spark, [(1, "a b"), (2, ""), (3, "c")], seq_len=2)
    assert out[2] == (0, 2, None, None, 0)
    # doc 3 starts where doc 1 ended — the empty doc shifts nothing
    assert out[3] == (1, 2, 1, 1, 1)


def test_order_is_doc_id_not_input_order(spark):
    out = _out(spark, [(5, "x y"), (1, "a b c")], seq_len=2)
    assert out[1][1] == 0 and out[5][1] == 3


def test_block_size_invariant(spark):
    rows = [(i, " ".join(["w"] * (i % 7))) for i in range(40)]
    base = _out(spark, rows, seq_len=5, block_size=1)
    for bs in (3, 17, 1000):
        assert _out(spark, rows, seq_len=5, block_size=bs) == base


def test_full_corpus_totals(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = pack_sequences(docs, seq_len=128)
    assert res.count() == docs.count()
    agg = res.agg(
        F.sum("n_tokens").alias("tot"),
        F.max(F.col("start_token") + F.col("n_tokens")).alias("end"),
        F.max("last_seq").alias("mx"),
    ).first()
    # offsets tile the token stream exactly: last end == total tokens
    assert agg["end"] == agg["tot"]
    assert agg["mx"] == (agg["tot"] - 1) // 128


def test_sequence_manifest_hand_check(spark):
    from hbase_indexer_spark.pipeline.pack import sequence_manifest

    # seq_len=4, stream: doc1 "a b c d" | doc2 "e f g h i j" | doc3 "k l"
    # seq 0 = doc1[0:4]; seq 1 = doc2[0:4]; seq 2 = doc2[4:6] + doc3[0:2]
    out = {r["seq_id"]: (r["n_docs"], r["n_tokens"], r["first_doc"],
                         r["last_doc"])
           for r in sequence_manifest(_docs(spark, [
               (1, "a b c d"), (2, "e f g h i j"), (3, "k l")]),
               seq_len=4).collect()}
    assert out == {0: (1, 4, 1, 1), 1: (1, 4, 2, 2), 2: (2, 4, 2, 3)}


def test_sequence_manifest_tiles_corpus(spark, sf_dir):
    from hbase_indexer_spark.pipeline.pack import sequence_manifest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    man = sequence_manifest(docs, seq_len=128).cache()
    agg = man.agg(F.sum("n_tokens").alias("tot"),
                  F.max("seq_id").alias("mx"),
                  F.count("*").alias("n")).first()
    # sequences tile the stream: every seq full except possibly the last
    assert agg["n"] == agg["mx"] + 1
    short = man.filter((F.col("n_tokens") != 128)
                       & (F.col("seq_id") != agg["mx"])).count()
    assert short == 0


def test_packed_sequence_text_hand_check(spark):
    from hbase_indexer_spark.pipeline.pack import packed_sequence_text

    out = {r["seq_id"]: (r["n_tokens"], r["text"])
           for r in packed_sequence_text(_docs(spark, [
               (1, "a b c d"), (2, "e f g h i j"), (3, "k l")]),
               seq_len=4).collect()}
    assert out == {0: (4, "a b c d"), 1: (4, "e f g h"),
                   2: (4, "i j k l")}


def test_packed_sequence_text_reconstructs_stream(spark, sf_dir):
    from hbase_indexer_spark.pipeline.pack import packed_sequence_text

    # filter, not limit: two actions on a limit may pick different rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter("doc_id < 200")
    seqs = packed_sequence_text(docs, seq_len=64).orderBy("seq_id").collect()
    stream = " ".join(r["text"] for r in seqs).split()
    expect = []
    for r in docs.orderBy("doc_id").collect():
        expect.extend(r["text"].split())
    assert stream == expect
    assert all(r["n_tokens"] == 64 for r in seqs[:-1])


def test_shuffle_order_is_permutation_and_deterministic(spark, sf_dir):
    from hbase_indexer_spark.pipeline.pack import shuffle_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    out = shuffle_order(docs).collect()
    assert sorted(r["pos"] for r in out) == list(range(n))
    again = {r["doc_id"]: r["pos"]
             for r in shuffle_order(docs.repartition(7)).collect()}
    assert {r["doc_id"]: r["pos"] for r in out} == again


def test_shuffle_order_salt_redeals(spark):
    from hbase_indexer_spark.pipeline.pack import shuffle_order

    docs = _docs(spark, [(i, "x") for i in range(200)])
    a = {r["doc_id"]: r["pos"] for r in shuffle_order(docs, "s1").collect()}
    b = {r["doc_id"]: r["pos"] for r in shuffle_order(docs, "s2").collect()}
    assert a != b
    assert sorted(a.values()) == sorted(b.values()) == list(range(200))


def test_shuffled_pack_tiles_and_matches_order(spark, sf_dir):
    from hbase_indexer_spark.pipeline.pack import shuffle_order, shuffled_pack

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sp = shuffled_pack(docs, seq_len=64).cache()
    assert sp.count() == docs.count()
    # offsets tile the shuffled stream exactly
    agg = sp.agg(F.sum("n_tokens").alias("tot"),
                 F.max(F.col("start_token") + F.col("n_tokens")).alias("end"))\
        .first()
    assert agg["end"] == agg["tot"]
    # stream order == shuffle_order positions
    pos = {r["doc_id"]: r["pos"] for r in shuffle_order(docs).collect()}
    rows = sorted(sp.collect(), key=lambda r: r["start_token"])
    nonzero = [r for r in rows]
    assert [r["doc_id"] for r in nonzero] == \
        [d for d, _ in sorted(pos.items(), key=lambda kv: kv[1])]


def test_pack_append_continuation(spark):
    """pack(all) == pack(first half) ++ pack(second half, start_offset=
    tokens(first half)) — the incremental-append contract: accepted
    data never re-packs."""
    from pyspark.sql import functions as F

    from hbase_indexer_spark.pipeline.pack import pack_sequences
    from hbase_indexer_spark.pipeline.text import token_count

    rows = [(i, " ".join(["w"] * (i % 9 + 1))) for i in range(24)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {r["doc_id"]: tuple(r)
            for r in pack_sequences(docs, seq_len=7).collect()}
    p1 = docs.filter(F.col("doc_id") < 12)
    p2 = docs.filter(F.col("doc_id") >= 12)
    off = p1.select(F.sum(token_count(F.col("text")))).first()[0]
    part = {r["doc_id"]: tuple(r)
            for r in pack_sequences(p1, seq_len=7).collect()}
    part.update({r["doc_id"]: tuple(r)
                 for r in pack_sequences(p2, seq_len=7,
                                         start_offset=int(off)).collect()})
    assert part == full
