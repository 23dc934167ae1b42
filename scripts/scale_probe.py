#!/usr/bin/env python
"""sf1 scale probe for the two iterative loops (VERDICT r5 #7).

Validates the "per-round cost is one join + one combinable agg" claim for
``pagerank`` and the bounded-pair-graph claim for ``dedup_clusters`` OFF
the toy gate scale: inputs are the sf0.1 tables replicated 10x with
disjoint key offsets (~6M lineitem rows / ~11M trade edges — the sf1
shape), built deterministically so the probe is reproducible.

Method: shuffle bytes come from the Spark REST status API (the probe
session enables the UI); per-round marginal cost is measured by running
the SAME loop at iters=2 and iters=7 and differencing — fixed costs
(edge build, checkpoint, node table) cancel, leaving 5 pure rounds:

    per_round_wall_s       = (t7 - t2) / 5
    per_round_shuffle_mb   = (S7 - S2) / 5

If rounds were anything other than one join + one agg over the rank
vector, the marginal shuffle would grow with the edge list (it must stay
~|nodes| + |edges-partition traffic| and constant across rounds).

Writes SCALE_PROBE.json at the repo root; bench.py attaches it to the
bench JSON line so the per-round sf1 numbers ride BENCH_r{N}.json.

Run:  python scripts/scale_probe.py  [--base /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
# disjoint key spaces per replica: larger than any base key (~6M max at
# sf0.1) but small enough that replica-9 keys stay far inside int32 —
# the typed-decode fixtures cast keys to int, and ANSI Spark would throw
# on a 9e9 key where a 9.6e7 one is fine
KEY_OFF = 10_000_000


def build_session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName("scale-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # REST status API is the shuffle-byte source (get_spark disables it)
        .config("spark.ui.enabled", "true")
        # shuffle_totals sums /stages cumulatively; the default 1000-stage
        # retention evicts early stages mid-probe, silently shrinking the
        # totals and turning later deltas negative — keep every stage
        .config("spark.ui.retainedStages", "100000")
        .config("spark.ui.retainedJobs", "100000")
        .getOrCreate()
    )


def shuffle_totals(spark) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all stages."""
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages"))
    return (sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages))


def replicate(df, key_cols: list[str], replicas: int = REPLICAS):
    """Union ``replicas`` copies with each copy's keys offset into a
    disjoint range — same degree distribution per replica, 10x rows."""
    from pyspark.sql import functions as F

    parts = []
    for i in range(replicas):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * KEY_OFF))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(spark, fn):
    """(wall_s, shuffle_read_mb, shuffle_write_mb) around one action."""
    r0, w0 = shuffle_totals(spark)
    t0 = time.time()
    n = fn()
    wall = time.time() - t0
    r1, w1 = shuffle_totals(spark)
    # negative deltas mean the status store evicted stages mid-probe
    # (retention misconfigured) — publish None, never a garbage number
    dr = round((r1 - r0) / 1e6, 1) if r1 >= r0 else None
    dw = round((w1 - w0) / 1e6, 1) if w1 >= w0 else None
    return n, round(wall, 2), dr, dw


# key columns to offset per table so FK relationships stay consistent
# across replicas (each replica is a disjoint copy of the whole schema;
# nation/region are small shared dims and stay un-offset, so un-offset
# FK columns like c_nationkey remain valid)
REPLICATE_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": None,   # copy once
    "region": None,
}

# headline queries re-run at the sf1-shaped dir through the REAL
# entry.queries() surface — batch index build, typed decode, incremental
# apply, analytics, dedup, packing, LM scoring, retrieval
SF1_QUERIES = [
    "row_index_customer",
    "typed_decode_matrix",
    "incremental_row_index",
    "pricing_summary",
    "top_revenue_supplier",
    "exact_dedup",
    "minhash_lsh_dedup",
    "pack_sequences",
    "unigram_logprob",
    "gopher_rules",
    "bm25_topk",
    "event_time_rollup",
    "hll_daily_users",
    # r7 arrivals: the global-rank sort path, the iterated trainer, and
    # the real-codec decode at 10x
    "sorted_neighborhood_pairs",
    "bpe_train",
    "media_decode",
    "asof_nearest_click",
    # r8 arrivals: the grid-cell interval join, the exact-recall
    # all-pairs family (1-in-4 slice), the dHash decode+group path,
    # and the user-keyed attribution join at 10x
    "interval_overlap_pairs",
    "prefix_filter_dups",
    "dhash_groups",
    "attribution_position",
    "gapfill_daily_value",
    # r10 (VERDICT r9 #8): extend the slice to the full top-40 bench
    # entries — everything in the top 42 of the r10 round-start idle
    # record that is not already covered by a dedicated probe section
    # (pagerank/dedup_clusters/minhash/bm25/stream_stream_join/
    # bm25_incremental/curation_stream/dedup_store_screen/bpe above)
    "streaming_row_index",
    "incremental_column_index",
    "dedup_keep_best",
    "dedup_pair_quality",
    "cms_stream",
    "hll_stream",
    "stream_dedup",
    "simhash_near_dups",
    "embedding_lsh_recall",
    "training_corpus",
    "deduped_corpus",
    "retrieval_eval",
    "ann_ivf_build",
    "hybrid_rrf",
    "ann_pq_adc",
    "curated_corpus",
    "prefix_filter_xjoin",
    "quality_ensemble",
    "quarantine_merge",
    "bpe_fertility",
    "source_overlap_matrix",
    "fk_integrity",
    "bucketed_join_revenue",
    "winnow_overlap",
    "dsir_selection",
    "filter_ablation",
    "embedding_cosine_lsh",
    "trustrank_seeds",
]

# the ten heaviest bench entries (r10 round-start idle record): re-run at
# SPARK_GRAFT_CPUS=8 against the same sf1 replica for the low-core scaling
# evidence that matters at 100 TB (--sf1-only --only-sf1 ... --sf1-key
# sf1_queries_c8)
SF1_HEAVIEST = [
    "streaming_row_index",
    "pagerank_trade",
    "curation_stream",
    "incremental_row_index",
    "dedup_store_screen",
    "trustrank_seeds",
    "incremental_column_index",
    "bm25_incremental",
    "dedup_keep_best",
    "typed_decode_matrix",
]


def build_sf1_dir(spark, base: str, tmp: str) -> str:
    """Materialize a full FK-consistent 10x replica of every table —
    a ~sf1 dataset the entry queries can run against unchanged.  A dir
    already carrying the completion marker is reused as-is (lets the
    8-core re-run share the 32-core run's replica)."""
    out = os.path.join(tmp, "sf1")
    marker = os.path.join(out, "_HBIS_SF1_COMPLETE")
    if os.path.exists(marker):
        print(f"# reusing sf1 replica at {out}", file=sys.stderr)
        return out
    os.makedirs(out, exist_ok=True)
    for table, keys in REPLICATE_KEYS.items():
        src = spark.read.parquet(f"{base}/{table}.parquet")
        df = src if keys is None else replicate(src, keys)
        df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    with open(marker, "w") as f:
        f.write("ok")
    return out


def run_sf1_queries(spark, sf1: str, names: list[str]) -> dict:
    """Run entry queries against the sf1 replica, best-of-2 each."""
    import __spark_entry__ as entry

    qs = entry.queries()
    # approximate plans with no oracle (ann_ivf_build, ann_pq_adc, ...)
    # live outside the gate surface but stay benchmarked — same rule as
    # bench.py
    qs.update(entry.bench_only())
    sf1_out = {}
    for name in names:
        runs, metrics = [], None
        for _ in range(2):
            n, wall, rmb, wmb = timed(
                spark, lambda: qs[name](spark, sf1).count())
            runs.append(wall)
            if metrics is None or wall < metrics[0]:
                metrics = (wall, rmb, wmb, n)
        sf1_out[name] = {
            "wall_s": metrics[0],
            "shuffle_read_mb": metrics[1],
            "shuffle_write_mb": metrics[2],
            "rows": metrics[3],
        }
        print(f"# sf1 {name}: {json.dumps(sf1_out[name])}", file=sys.stderr)
    return sf1_out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--skip-queries", action="store_true",
                    help="only the iterative-loop probes, no sf1 bench")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.json"))
    # r10: 8-core slice support — run ONLY the sf1 entry queries against a
    # (reusable) replica dir and merge the result into --out under
    # --sf1-key, preserving every other probe section
    ap.add_argument("--sf1-only", action="store_true",
                    help="skip the loop probes; run only sf1 entry queries "
                         "and merge into --out under --sf1-key")
    ap.add_argument("--sf1-dir", default=None,
                    help="parent dir for the sf1 replica (reused when the "
                         "completion marker exists)")
    ap.add_argument("--only-sf1", default=None,
                    help="comma list of entry queries for the sf1 slice "
                         "(default: SF1_QUERIES)")
    ap.add_argument("--sf1-key", default="sf1_queries",
                    help="output key for the sf1 slice in --out")
    args = ap.parse_args()

    from hbase_indexer_spark.pipeline.dedup import dedup_clusters
    from hbase_indexer_spark.pipeline.graph import pagerank, trade_edges

    spark = build_session()
    tmp = args.sf1_dir or tempfile.mkdtemp(prefix="hbis_probe_")
    os.makedirs(tmp, exist_ok=True)

    if args.sf1_only:
        sf1 = build_sf1_dir(spark, args.base, tmp)
        names = (args.only_sf1.split(",") if args.only_sf1
                 else list(SF1_QUERIES))
        sf1_out = run_sf1_queries(spark, sf1, names)
        if args.sf1_key != "sf1_queries":
            sf1_out = {"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                       "queries": sf1_out}
        data = {}
        if os.path.exists(args.out):
            with open(args.out, encoding="utf-8") as f:
                data = json.load(f)
        if (args.sf1_key == "sf1_queries"
                and isinstance(data.get(args.sf1_key), dict)):
            # partial re-runs extend the slice, never clobber it
            data[args.sf1_key].update(sf1_out)
        else:
            data[args.sf1_key] = sf1_out
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=1)
        print(json.dumps({args.sf1_key: sf1_out}))
        return

    # ---- build the sf1-shaped inputs once, as real parquet scans ----
    orders0 = spark.read.parquet(f"{args.base}/orders.parquet")
    li0 = spark.read.parquet(f"{args.base}/lineitem.parquet")
    docs0 = spark.read.parquet(f"{args.base}/documents.parquet")
    replicate(orders0.select("o_orderkey", "o_custkey"),
              ["o_orderkey", "o_custkey"]) \
        .write.mode("overwrite").parquet(f"{tmp}/orders")
    replicate(li0.select("l_orderkey", "l_suppkey"),
              ["l_orderkey", "l_suppkey"]) \
        .write.mode("overwrite").parquet(f"{tmp}/lineitem")
    replicate(docs0.select("doc_id", "text"), ["doc_id"]) \
        .write.mode("overwrite").parquet(f"{tmp}/documents")
    orders = spark.read.parquet(f"{tmp}/orders")
    lineitem = spark.read.parquet(f"{tmp}/lineitem")
    docs = spark.read.parquet(f"{tmp}/documents")
    n_li = lineitem.count()

    out: dict = {
        "sf_equivalent": 1.0,
        "base": args.base,
        "replicas": REPLICAS,
        "lineitem_rows": n_li,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }

    # ---- pagerank: marginal per-round cost via iters=2 vs iters=7 ----
    edges = trade_edges(orders, lineitem)
    n_edges = edges.count()
    # warm-up run: the first pagerank over fresh parquet pays page-cache
    # first-touch + codegen that would otherwise inflate the iters=2 leg
    # and make the (t7 - t2) difference negative (observed r6)
    pagerank(edges, iters=1).count()
    spark.catalog.clearCache()
    _, t2, r2, w2 = timed(spark, lambda: pagerank(edges, iters=2).count())
    spark.catalog.clearCache()
    n_nodes, t7, r7, w7 = timed(spark, lambda: pagerank(edges, iters=7).count())
    out["pagerank"] = {
        "edges": n_edges,
        "nodes": n_nodes,
        "iters2_wall_s": t2,
        "iters7_wall_s": t7,
        "per_round_wall_s": round((t7 - t2) / 5, 2),
        # timed() reports None when the status store evicted stages —
        # propagate it instead of crashing the probe on the subtraction
        "per_round_shuffle_write_mb": (
            round((w7 - w2) / 5, 1)
            if w7 is not None and w2 is not None else None),
        "per_round_shuffle_read_mb": (
            round((r7 - r2) / 5, 1)
            if r7 is not None and r2 is not None else None),
    }
    print(f"# pagerank: {json.dumps(out['pagerank'])}", file=sys.stderr)

    # ---- dedup_clusters on 10x documents (pair graph + CC rounds) ----
    n_docs, t_dc, r_dc, w_dc = timed(
        spark, lambda: dedup_clusters(docs).count())
    out["dedup_clusters"] = {
        "docs": n_docs,
        "wall_s": t_dc,
        "shuffle_read_mb": r_dc,
        "shuffle_write_mb": w_dc,
    }
    print(f"# dedup_clusters: {json.dumps(out['dedup_clusters'])}",
          file=sys.stderr)

    # ---- banded minhash pair generation on 10x documents ----
    from hbase_indexer_spark.pipeline.dedup import minhash_lsh_dedup_pairs

    n_pairs, t_mh, r_mh, w_mh = timed(
        spark, lambda: minhash_lsh_dedup_pairs(docs, threshold=0.7).count())
    out["minhash_lsh_pairs"] = {
        "docs": out["dedup_clusters"]["docs"],
        "pairs": n_pairs,
        "wall_s": t_mh,
        "shuffle_read_mb": r_mh,
        "shuffle_write_mb": w_mh,
    }
    print(f"# minhash_lsh_pairs: {json.dumps(out['minhash_lsh_pairs'])}",
          file=sys.stderr)

    # ---- BM25 retrieval on 10x documents (inverted-index probe) ----
    from hbase_indexer_spark.pipeline.corpus_stats import bm25_topk

    queries = [(1, "spark fast join"), (2, "stream window agg"),
               (3, "customer order query table")]
    n_hits, t_bm, r_bm, w_bm = timed(
        spark, lambda: bm25_topk(docs, queries, k=10).count())
    out["bm25_topk"] = {
        "docs": out["dedup_clusters"]["docs"],
        "result_rows": n_hits,
        "wall_s": t_bm,
        "shuffle_read_mb": r_bm,
        "shuffle_write_mb": w_bm,
    }
    print(f"# bm25_topk: {json.dumps(out['bm25_topk'])}", file=sys.stderr)

    # ---- streaming legs at sf1 (VERDICT r6 #6) ----
    # stream_stream_join: the claim is state bounded by
    # rate x (watermark + delay), NOT stream length — so record the
    # per-trigger state-store rows from the query's own progress events
    # alongside wall + shuffle at the 10x replica.
    events = replicate(
        spark.read.parquet(f"{args.base}/events.parquet"),
        ["event_id", "user_id"])
    events.write.mode("overwrite").parquet(f"{tmp}/events")
    events = spark.read.parquet(f"{tmp}/events")
    n_events = events.count()

    from __spark_entry__ import _stage_stream_chunks_by_ts
    from hbase_indexer_spark.streaming.joins import stream_attribution_join

    src = _stage_stream_chunks_by_ts(events, "hbis_probe_ssj_")
    sink = os.path.join(tmp, "ssj_sink")
    r0, w0 = shuffle_totals(spark)
    t0 = time.time()
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    joined = stream_attribution_join(stream, "click", "purchase")
    # state partitions sized like the gate query (r9): per-trigger
    # state / ~17k rows per partition, not the batch shuffle width —
    # see q_stream_stream_join's rationale
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (joined.writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", os.path.join(tmp, "ssj_ckpt"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    wall_ssj = round(time.time() - t0, 2)
    progress = [json.loads(p) if isinstance(p, str) else p
                for p in q.recentProgress]
    state_rows = [
        sum(int(op["numRowsTotal"]) for op in p["stateOperators"])
        for p in progress if p.get("stateOperators")
    ]
    r1, w1 = shuffle_totals(spark)
    out["stream_stream_join"] = {
        "events": n_events,
        "result_rows": spark.read.parquet(sink).count(),
        "wall_s": wall_ssj,
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        # per-trigger totals: bounded (and shrinking once the watermark
        # passes) proves cleanup works; monotone growth would mean state
        # leaks with stream length
        "state_rows_per_trigger": state_rows,
    }
    print(f"# stream_stream_join: {json.dumps(out['stream_stream_join'])}",
          file=sys.stderr)

    # bm25_incremental: the claim is each postings fold costs
    # O(new docs + postings view), independent of how many folds came
    # before — record the per-fold wall/shuffle curve over 6 equal
    # chunks at 10x docs (a growing curve would falsify it).
    from hbase_indexer_spark.pipeline.corpus_stats import (
        bm25_topk_indexed,
        postings_upsert,
    )
    from hbase_indexer_spark.sinks.index_store import IndexStore

    from pyspark.sql import functions as F

    store = IndexStore(os.path.join(tmp, "postings"), key="pk")
    folds = []
    for chunk in range(6):
        _, t_f, r_f, w_f = timed(
            spark, lambda: postings_upsert(
                store, docs.filter(F.col("doc_id") % 6 == chunk)) or 1)
        folds.append({"wall_s": t_f, "shuffle_read_mb": r_f,
                      "shuffle_write_mb": w_f})
    bm_queries = [(1, "spark fast join"), (2, "stream window agg"),
                  (3, "customer order query table")]
    n_hits2, t_q, r_q, w_q = timed(
        spark,
        lambda: bm25_topk_indexed(spark, store, bm_queries, k=10).count())
    out["bm25_incremental"] = {
        "docs": out["dedup_clusters"]["docs"],
        "folds": folds,
        "query_wall_s": t_q,
        "query_shuffle_read_mb": r_q,
        "query_shuffle_write_mb": w_q,
        "result_rows": n_hits2,
    }
    print(f"# bm25_incremental: {json.dumps(out['bm25_incremental'])}",
          file=sys.stderr)

    # ---- continuous-curation loop at 10x docs (VERDICT r8 #4) ----
    # the claim: per-trigger cost is batch-sized (sketch checkpoint +
    # band-bounded screen joins + two keyed merges), state is
    # accepted-corpus-sized — record the per-trigger wall curve from the
    # stream's own progress events at the sf1 replica.
    from __spark_entry__ import _stage_stream_chunks
    from hbase_indexer_spark.pipeline.dedup_store import DedupIndexStore
    from hbase_indexer_spark.sinks.index_store import IndexStore
    from hbase_indexer_spark.streaming.dedup_stream import curation_stream

    cur_src = _stage_stream_chunks(docs, "doc_id", "hbis_probe_cur_")
    cur_tmp = os.path.dirname(cur_src)
    cur_state = DedupIndexStore(os.path.join(cur_tmp, "state"),
                                threshold=0.7)
    cur_corpus = IndexStore(os.path.join(cur_tmp, "corpus"), key="doc_id")
    r0, w0 = shuffle_totals(spark)
    t0 = time.time()
    cstream = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", 1).parquet(cur_src))
    cq = curation_stream(cstream, cur_state, cur_corpus,
                         os.path.join(cur_tmp, "ckpt"),
                         min_tokens=10, min_quality=0.5)
    try:
        cq.processAllAvailable()
        cprog = [json.loads(p) if isinstance(p, str) else p
                 for p in cq.recentProgress]
    finally:
        cq.stop()
    wall_cur = round(time.time() - t0, 2)
    r1, w1 = shuffle_totals(spark)
    accepted = cur_corpus.read(spark)
    state_df = cur_state.sketches(spark)
    out["curation_stream"] = {
        "docs": out["dedup_clusters"]["docs"],
        "accepted": accepted.count() if accepted is not None else 0,
        "state_sketch_rows": state_df.count() if state_df is not None else 0,
        "wall_s": wall_cur,
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        # per-trigger wall + input rows: flat per batch-size proves the
        # loop's cost is the batch, not the accumulated state/corpus
        "trigger_wall_ms": [int(p["durationMs"]["triggerExecution"])
                            for p in cprog if p.get("durationMs")],
        "trigger_input_rows": [int(p.get("numInputRows", 0))
                               for p in cprog],
    }
    print(f"# curation_stream: {json.dumps(out['curation_stream'])}",
          file=sys.stderr)

    # ---- sequential stateful screen fold curve (VERDICT r8 #4) ----
    # dedup_store_screen's shape: per batch, sketch + screen against the
    # accumulated state + accept keeps.  A flat per-batch wall (state
    # joins band-bounded, screen cost ~ batch) is the 100 TB claim.
    from hbase_indexer_spark.pipeline.dedup_store import doc_sketches

    from pyspark.sql import functions as F  # noqa: F811 (local rebind)

    scr_store = DedupIndexStore(os.path.join(tmp, "screen_state"),
                                threshold=0.7)
    scr_folds = []
    for b in range(4):
        sbatch = docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == F.lit(b))

        def one_fold(sbatch=sbatch):
            sk = doc_sketches(sbatch, scr_store.n) \
                .localCheckpoint(eager=True)
            verd = scr_store.screen(spark, sbatch, sketches=sk) \
                .localCheckpoint(eager=True)
            keeps = verd.filter(F.col("keep")).select("doc_id")
            scr_store.accept(spark, sbatch,
                             sketches=sk.join(keeps, "doc_id", "left_semi"))
            return verd.count()

        n_v, t_b, r_b, w_b = timed(spark, one_fold)
        scr_folds.append({"verdicts": n_v, "wall_s": t_b,
                          "shuffle_read_mb": r_b, "shuffle_write_mb": w_b})
    scr_state = scr_store.sketches(spark)
    out["dedup_store_screen"] = {
        "docs": out["dedup_clusters"]["docs"],
        "folds": scr_folds,
        "state_sketch_rows": (scr_state.count()
                              if scr_state is not None else 0),
    }
    print(f"# dedup_store_screen: {json.dumps(out['dedup_store_screen'])}",
          file=sys.stderr)

    # ---- BPE trainer at tokenizer-sized merge counts (VERDICT r8 #5) ----
    # the r8 plan-depth fix re-checkpoints every 25 rounds; prove the
    # per-round marginal wall stays flat at n_merges=200 (vs 50) on the
    # BASE sf0.1 corpus — the two-point difference cancels the corpus
    # read exactly like the pagerank probe.
    from hbase_indexer_spark.pipeline.corpus_stats import bpe_train

    docs_base = (spark.read.parquet(f"{args.base}/documents.parquet")
                 .select("doc_id", "text"))
    bpe_train(docs_base, 5).count()  # warm-up: corpus read + codegen
    _, t50, r50, w50 = timed(spark, lambda: bpe_train(docs_base, 50).count())
    _, t200, r200, w200 = timed(
        spark, lambda: bpe_train(docs_base, 200).count())
    out["bpe_train_200"] = {
        "base": args.base,
        "merges50_wall_s": t50,
        "merges200_wall_s": t200,
        "per_round_wall_s": round((t200 - t50) / 150, 3),
        "per_round_shuffle_write_mb": (
            round((w200 - w50) / 150, 2)
            if w200 is not None and w50 is not None else None),
    }
    print(f"# bpe_train_200: {json.dumps(out['bpe_train_200'])}",
          file=sys.stderr)

    # ---- headline entry queries against a FULL sf1-shaped replica ----
    # the real driver surface (entry.queries()) run unchanged at 10x —
    # "would this plan still work at the next scale-up" measured, not
    # argued.  Each query best-of-2 (codegen warm-up cancels).
    if not args.skip_queries:
        sf1 = build_sf1_dir(spark, args.base, tmp)
        out["sf1_queries"] = run_sf1_queries(spark, sf1, SF1_QUERIES)

    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
