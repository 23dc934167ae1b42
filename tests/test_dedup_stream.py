"""Streaming dedup: stream==batch equivalence and watermark state eviction."""

import os

import pytest
from pyspark.sql import functions as F

SCHEMA = "text string, event_time timestamp"


def _write_file(spark, rows, path):
    from datetime import datetime

    typed = [(t, datetime.fromisoformat(s)) for t, s in rows]
    spark.createDataFrame(typed, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _drop(staging_dir, src_dir, tag):
    n = 0
    for f in os.listdir(staging_dir):
        if f.endswith(".parquet"):
            os.rename(os.path.join(staging_dir, f),
                      os.path.join(src_dir, f"{tag}-{n}.parquet"))
            n += 1


def test_stream_exact_dedup_equals_batch(spark, tmp_path):
    from hbase_indexer_spark.streaming.dedup_stream import (
        batch_first_per_key,
        dedup_stream_exact,
    )

    rows = [
        ("hello  world", "2024-01-01 00:00:00"),
        ("Hello World", "2024-01-01 00:00:00"),   # same normalized key
        ("other doc", "2024-01-01 00:05:00"),
        ("other doc", "2024-01-01 00:05:00"),     # identical duplicate
        ("third", "2024-01-01 00:10:00"),
    ]
    df_rows = [(t, s) for t, s in rows]
    src = tmp_path / "src"
    src.mkdir()
    stage = tmp_path / "stage"
    _write_file(spark, df_rows, str(stage))
    _drop(str(stage), str(src), "b0")

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        dedup_stream_exact(stream)
        .writeStream.format("memory").queryName("dedup_exact")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got_keys = {r["text"].lower().replace("  ", " ")
                for r in spark.table("dedup_exact").collect()}
    from datetime import datetime

    batch = spark.createDataFrame(
        [(t, datetime.fromisoformat(s)) for t, s in df_rows], SCHEMA
    )
    want_keys = {r["text"].lower().replace("  ", " ")
                 for r in batch_first_per_key(batch).collect()}
    assert got_keys == want_keys
    assert spark.table("dedup_exact").count() == 3  # one per distinct key


def test_watermark_dedup_bounds_state(spark, tmp_path):
    """Duplicates within the horizon collapse; after the watermark passes,
    the key's state is evicted and a later duplicate is re-emitted —
    bounded state is exactly this trade."""
    from hbase_indexer_spark.streaming.dedup_stream import dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    stage = tmp_path / "stage"

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        dedup_stream(stream, delay="10 minutes")
        .writeStream.format("memory").queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch 1: dup pair inside the horizon -> collapses to one
        _write_file(spark, [("doc A", "2024-01-01 00:00:00"),
                            ("doc A", "2024-01-01 00:01:00"),
                            ("doc B", "2024-01-01 00:00:00")], str(stage))
        _drop(str(stage), str(src), "b1")
        q.processAllAvailable()
        # batch 2: advances the watermark far past A's expiry (00:11)
        _write_file(spark, [("doc C", "2024-01-01 01:00:00")], str(stage))
        _drop(str(stage), str(src), "b2")
        q.processAllAvailable()
        # batch 3: A again, after eviction -> re-emitted
        _write_file(spark, [("doc A", "2024-01-01 01:00:00")], str(stage))
        _drop(str(stage), str(src), "b3")
        q.processAllAvailable()
    finally:
        q.stop()

    texts = [r["text"] for r in spark.table("dedup_wm").collect()]
    assert texts.count("doc B") == 1
    assert texts.count("doc C") == 1
    assert texts.count("doc A") == 2  # once per horizon, not globally once


def test_stream_against_static_base(spark, tmp_path):
    from hbase_indexer_spark.streaming.dedup_stream import (
        dedup_stream_against,
    )

    base = spark.createDataFrame(
        [("hello  world",), ("seen before",)], "text string")
    rows = [
        ("Hello World", "2024-01-01 00:00:00"),   # normalized hit in base
        ("seen before", "2024-01-01 00:01:00"),   # exact hit in base
        ("brand new doc", "2024-01-01 00:02:00"),
    ]
    src = tmp_path / "src2"
    src.mkdir()
    stage = tmp_path / "stage2"
    _write_file(spark, rows, str(stage))
    _drop(str(stage), str(src), "b0")

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        dedup_stream_against(stream, base)
        .writeStream.format("memory").queryName("dedup_vs_base")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["text"] for r in spark.sql(
        "SELECT * FROM dedup_vs_base").collect()}
    assert got == {"brand new doc"}


def test_curation_stream_end_to_end(spark, tmp_path):
    """Continuous curation: batch 2 re-delivers a batch-1 page plus new
    content; the corpus ends with exactly the unique, quality-passing
    docs and the dedup state holds their sketches."""
    from hbase_indexer_spark.pipeline.dedup_store import DedupIndexStore
    from hbase_indexer_spark.sinks.index_store import IndexStore
    from hbase_indexer_spark.streaming.dedup_stream import curation_stream

    doc_schema = "doc_id long, text string"
    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    long_b = "one two three four five six seven eight nine ten"
    src = tmp_path / "src"
    src.mkdir()

    def drop(rows, name):
        df = spark.createDataFrame(rows, doc_schema)
        stage = tmp_path / ("stage_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        import shutil

        for f in stage.glob("*.parquet"):
            shutil.copy(f, src / (name + ".parquet"))

    store = DedupIndexStore(str(tmp_path / "dd"), threshold=0.7)
    corpus = IndexStore(str(tmp_path / "corpus"), key="doc_id")

    def run_available():
        stream = spark.readStream.schema(doc_schema).option(
            "maxFilesPerTrigger", "1").parquet(str(src))
        q = curation_stream(stream, store, corpus,
                            checkpoint=str(tmp_path / "ckpt"),
                            min_tokens=5)
        q.processAllAvailable()
        q.stop()

    drop([(1, long_a), (2, "too short")], "b0")
    run_available()
    got1 = {r["doc_id"] for r in corpus.read(spark).collect()}
    assert got1 == {1}  # quality gate dropped doc 2

    # batch 2: exact re-crawl of doc 1 (new id), a near-dup, fresh content
    near = long_a.replace("kappa", "lambda")
    drop([(10, long_a), (11, near), (12, long_b)], "b1")
    run_available()
    got2 = {r["doc_id"] for r in corpus.read(spark).collect()}
    assert got2 == {1, 12}  # 10 exact-dropped, 11 near-dropped, 12 kept

    # the state now screens against everything accepted so far
    verd = {r["doc_id"]: r["keep"] for r in store.screen(
        spark, spark.createDataFrame([(20, long_b)], doc_schema)).collect()}
    assert verd[20] is False


def test_curation_stream_survives_restart(spark, tmp_path):
    """Stop after batch 1, start a FRESH query on the same checkpoint +
    stores: batch 2's duplicates of batch-1 content still drop — the
    pause/resume contract (T4) holds for the pipeline side too."""
    from hbase_indexer_spark.pipeline.dedup_store import DedupIndexStore
    from hbase_indexer_spark.sinks.index_store import IndexStore
    from hbase_indexer_spark.streaming.dedup_stream import curation_stream

    doc_schema = "doc_id long, text string"
    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    src = tmp_path / "src"
    src.mkdir()

    def drop(rows, name):
        import shutil

        df = spark.createDataFrame(rows, doc_schema)
        stage = tmp_path / ("stage_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        for f in stage.glob("*.parquet"):
            shutil.copy(f, src / (name + ".parquet"))

    store = DedupIndexStore(str(tmp_path / "dd"))
    corpus = IndexStore(str(tmp_path / "corpus"), key="doc_id")

    def run_once():
        stream = spark.readStream.schema(doc_schema).parquet(str(src))
        q = curation_stream(stream, store, corpus,
                            checkpoint=str(tmp_path / "ckpt"))
        q.processAllAvailable()
        q.stop()

    drop([(1, long_a)], "b0")
    run_once()  # first query lifetime ends here (simulated crash/stop)

    drop([(10, long_a), (11, "genuinely new content here today")], "b1")
    run_once()  # fresh query object, same checkpoint + stores

    got = {r["doc_id"] for r in corpus.read(spark).collect()}
    assert got == {1, 11}  # 10 dropped against state built pre-restart


def test_curation_stream_intra_batch_twins_land_once(spark, tmp_path):
    """Two copies of the same text racing into ONE micro-batch: only the
    min-doc_id copy enters the corpus and the state (the oracle's
    batch-first CTE mirrors this)."""
    from hbase_indexer_spark.pipeline.dedup_store import DedupIndexStore
    from hbase_indexer_spark.sinks.index_store import IndexStore
    from hbase_indexer_spark.streaming.dedup_stream import curation_stream

    doc_schema = "doc_id long, text string"
    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    src = tmp_path / "src"
    src.mkdir()
    df = spark.createDataFrame(
        [(7, long_a), (3, long_a), (9, "a different page entirely here")],
        doc_schema)
    df.coalesce(1).write.parquet(str(tmp_path / "stage"))
    import os
    for f in os.listdir(tmp_path / "stage"):
        if f.endswith(".parquet"):
            os.rename(tmp_path / "stage" / f, src / "b0.parquet")
    store = DedupIndexStore(str(tmp_path / "state"))
    corpus = IndexStore(str(tmp_path / "corpus"), key="doc_id")
    stream = spark.readStream.schema(doc_schema).parquet(str(src))
    q = curation_stream(stream, store, corpus,
                        checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"] for r in corpus.read(spark).collect()}
    assert got == {3, 9}  # min doc_id per text survives, twin 7 dropped
    state_ids = {r["doc_id"] for r in store.sketches(spark).collect()}
    assert 7 not in state_ids


def test_sketch_fold_raises_on_batch_id_regression(spark, tmp_path):
    """Checkpoint reset against a populated sketch store must fail
    loudly, not silently skip every future batch."""
    import pytest

    from hbase_indexer_spark.sinks.index_store import IndexStore
    from hbase_indexer_spark.streaming.sketch_stream import (
        fold_hll_batch,
        fold_sketch_batch,
    )

    docs = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    store = IndexStore(str(tmp_path / "sk"), key="row")
    assert fold_sketch_batch(store, docs, batch_id=5) is True
    assert fold_sketch_batch(store, docs, batch_id=5) is False  # replay
    with pytest.raises(ValueError, match="checkpoint was reset"):
        fold_sketch_batch(store, docs, batch_id=0)

    keys = spark.createDataFrame([(1, "g")], "k long, grp string")
    hstore = IndexStore(str(tmp_path / "hll"), key="grp")
    assert fold_hll_batch(hstore, keys, 3, key="k", group="grp") is True
    with pytest.raises(ValueError, match="checkpoint was reset"):
        fold_hll_batch(hstore, keys, 1, key="k", group="grp")


def test_sketch_stream_crash_restart_equals_batch(spark, tmp_path):
    """VERDICT r5 #8: kill the sketch stream BETWEEN micro-batches,
    restart a fresh query from the same checkpoint + store, and assert
    the end state is identical to one batch sketch over the whole input
    (the happy resume path; the raise-on-reset path is pinned above).
    Covers both folds: count-min (sum-merge) and HLL (max-merge)."""
    from hbase_indexer_spark.pipeline.corpus_stats import (
        count_min_sketch,
        hll_registers,
    )
    from hbase_indexer_spark.sinks.index_store import IndexStore
    from hbase_indexer_spark.streaming.sketch_stream import (
        cms_stream,
        hll_stream,
    )

    doc_schema = "doc_id long, text string"
    chunks = [
        [(1, "alpha beta gamma alpha"), (2, "delta epsilon")],
        [(3, "alpha zeta zeta"), (4, "eta theta")],
        [(5, "iota kappa alpha beta")],
    ]
    src = tmp_path / "src"
    src.mkdir()

    def drop(rows, name):
        stage = tmp_path / ("stage_" + name)
        spark.createDataFrame(rows, doc_schema) \
            .coalesce(1).write.mode("overwrite").parquet(str(stage))
        import shutil

        for f in stage.glob("*.parquet"):
            shutil.copy(f, src / (name + ".parquet"))

    store = IndexStore(str(tmp_path / "cms"), key="row")

    def run_cms():
        stream = (spark.readStream.schema(doc_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = cms_stream(stream, store, str(tmp_path / "ckpt"))
        q.processAllAvailable()
        q.stop()  # simulated crash/stop between micro-batches

    drop(chunks[0], "b0")
    run_cms()                      # first query lifetime: batch 0 only
    drop(chunks[1], "b1")
    drop(chunks[2], "b2")
    run_cms()                      # fresh query object resumes checkpoint

    all_rows = spark.createDataFrame(
        [r for c in chunks for r in c], doc_schema)
    want = {(r["row"], r["cell"], r["c"])
            for r in count_min_sketch(all_rows).collect()}
    got = {(r["row"], r["cell"], r["c"])
           for r in store.read(spark).select("row", "cell", "c").collect()}
    assert got == want

    # HLL: same stop/resume shape, register-wise max merge
    from pyspark.sql import functions as F

    hsrc = tmp_path / "hsrc"
    hsrc.mkdir()

    def hdrop(rows, name):
        stage = tmp_path / ("hstage_" + name)
        spark.createDataFrame(rows, "k long, grp string") \
            .coalesce(1).write.mode("overwrite").parquet(str(stage))
        import shutil

        for f in stage.glob("*.parquet"):
            shutil.copy(f, hsrc / (name + ".parquet"))

    hstore = IndexStore(str(tmp_path / "hll"), key="grp")

    def run_hll():
        stream = (spark.readStream.schema("k long, grp string")
                  .option("maxFilesPerTrigger", 1).parquet(str(hsrc)))
        q = hll_stream(stream, hstore, str(tmp_path / "hckpt"),
                       key="k", group="grp")
        q.processAllAvailable()
        q.stop()

    hchunks = [[(i, "g") for i in range(20)],
               [(i, "g") for i in range(10, 30)],
               [(i, "h") for i in range(5)]]
    hdrop(hchunks[0], "b0")
    run_hll()
    hdrop(hchunks[1], "b1")
    hdrop(hchunks[2], "b2")
    run_hll()

    hall = spark.createDataFrame(
        [r for c in hchunks for r in c], "k long, grp string")
    hwant = {(r["grp"], r["reg"], r["mr"])
             for r in hll_registers(hall, F.col("k"), "grp").collect()}
    hgot = {(r["grp"], r["reg"], r["mr"])
            for r in hstore.read(spark).select("grp", "reg", "mr").collect()}
    assert hgot == hwant
