#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "sf": ..., "git_head": ...,
     "summary": {...}, "queries": {...}, ...}

Each query is materialized via a count-style action (no driver-side collect
of the full result) so the measured time is the engine plan, not IPC.

Truncation resilience (r10): the line is ~15KB (187 per-query times), and
one round's capture of it kept only a 2000-char tail, nulling the whole
round-over-round comparison.  The headline fields — metric/value/unit/sf,
the git HEAD the bench ran on, and a <=1KB "summary" object (total,
per-query geomean vs the committed baseline, regression/suspect lists) —
now lead the line, so ANY prefix capture of ~1.5KB carries the verdict
even when the per-query map is cut off; the same summary is also printed
to stderr.  The stdout contract stays exactly one JSON line.

Idle-record provenance (r10): the regression pre-adjudicator consults the
newest committed BENCH_r*_local.json for "a plan regression reproduces
idle" evidence; a record stamped with a different git_head than the
running code is IGNORED (it can't exonerate code it never measured).
Unstamped legacy records stay usable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: batch index builds, full decode matrix, incremental apply
# (plain + bucketed store + real Structured Streaming), analytics scans,
# and the training-data pipeline (dedup family, ANN, text, multimodal)
BENCH_QUERIES = [
    "row_index_customer",
    "xml_conf_index",
    "column_index_orders",
    "typed_decode_matrix",
    "incremental_row_index",
    "streaming_row_index",
    "stream_static_join",
    "etl_enrichment_chain",
    "pricing_summary",
    "revenue_forecast",
    "top_unshipped_orders",
    "regional_revenue",
    "customer_order_distribution",
    "large_orders",
    "part_supplier_variety",
    "min_cost_supplier",
    "disjunctive_promo_revenue",
    "top_revenue_supplier",
    "nation_trade_volume",
    "market_share",
    "returned_item_losses",
    "waiting_suppliers",
    "asof_click_attribution",
    "event_value_bands",
    "udaf_event_stats",
    "session_windows",
    "skew_salted_user_stats",
    "exact_dedup",
    "curated_corpus",
    "train_test_split",
    "span_dedup",
    "pack_sequences",
    "sequence_manifest",
    "packed_sequence_text",
    "mixture_resample",
    "tfidf_topk",
    "unigram_logprob",
    "dsir_selection",
    "c4_line_clean",
    "substring_dedup",
    "ann_pq_adc",
    "line_dedup",
    "vocab_encode",
    "filter_ablation",
    "cms_heavy_hitters",
    "cms_stream",
    "bigram_logprob",
    "gopher_rules",
    "dedup_against",
    "corpus_report",
    "winnow_overlap",
    "vocab_overlap",
    "char_entropy",
    "shuffle_order",
    "shuffled_pack",
    "normalize_text",
    "blocklist_filter",
    "contrastive_pairs",
    "length_buckets",
    "psi_drift",
    "simhash",
    "minhash_lsh_dedup",
    "embedding_cosine_dedup",
    "embedding_cosine_lsh",
    "embedding_lsh_recall",
    "kmeans_cells",
    "semdedup",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_indexed",
    "ann_ivf_indexed_verified",
    "ann_lsh_verified",
    "ann_ivf_verified",
    "text_profile",
    "repetition_filter",
    "media_frame_sample",
    "decontaminate",
    "semantic_decontam",
    "quality_model_scores",
    "ngram_topk",
    "embedding_quantize",
    "vocab_estimate",
    "token_freq_spectrum",
    "training_corpus",
    "vocab_by_lang",
    "ngram_containment",
    "simhash_near_dups",
    "pii_scrub",
    "language_histogram",
    # r4 additions: the re-verified §2.7 extension surface and the
    # remaining heavy pipeline plans
    "sliding_event_rates",
    "user_event_history",
    "dedup_clusters",
    "deduped_corpus",
    "incremental_column_index",
    # r4 continuation: sketch-first exact screen, keeper policy, chunker,
    # token-budget mixture, embedding audits
    "bloom_screen",
    "dedup_store_screen",
    "curation_stream",
    "dedup_keep_best",
    "chunk_documents",
    "token_budget_sample",
    "label_centroids",
    "knn_label_vote",
    "fixed_k_sample",
    "source_overlap_matrix",
    "bpe_merge_candidates",
    "ann_int8_rerank",
    "tfidf_cosine_pairs",
    "nll_outliers",
    "epoch_expand",
    "mixed_language",
    "dup_size_histogram",
    "quality_deciles",
    "ngram_novelty",
    "shard_manifest",
    "curriculum_order",
    "cdc_dedup",
    "ann_recall_report",
    "ann_ivf_int8",
    "dedup_pair_quality",
    "event_funnel",
    "retention_cohorts",
    "curation_lineage",
    "jaccard_threshold_curve",
    "embedding_drift",
    "token_fertility",
    "snapshot_diff",
    "pack_append",
    "media_dedup",
    "corpus_summary",
    # r5 continuation: numeric iterative graph + distinct-count sketch
    "pagerank_trade",
    "trustrank_seeds",
    "hll_daily_users",
    "hll_stream",
    "quantile_sketch",
    "selfjoin_size",
    "column_profile",
    "jsonl_ingest",
    "csv_ingest",
    # r6 additions
    "bm25_topk",
    "hybrid_rrf",
    "key_skew_report",
    "quality_ensemble",
    "trigram_backoff",
    "bm25_incremental",
    "media_header_parse",
    "retrieval_eval",
    "edit_distance_dedup",
    "fk_integrity",
    "span_corruption",
    "prefix_lm_pairs",
    "fim_transform",
    "json_key_profile",
    "zorder_bucket_stats",
    "stream_stream_join",
    "bucketed_join_revenue",
    "priority_grouping_sets",
    "exact_quantiles_by_lang",
    "segment_overlap_sketch",
    "store_changefeed",
    "low_quality_spans",
    "rolling_active_users",
    "incremental_agg_maintenance",
    # r7 additions: real codec round trips, the IVF build leg, IVM
    # min/max, watermarked stream dedup
    "media_decode",
    "media_resize",
    "ann_ivf_build",
    "incremental_minmax_maintenance",
    "stream_dedup",
    "bpe_train",
    "bpe_fertility",
    "sorted_neighborhood_pairs",
    "asof_forward_purchase",
    "asof_nearest_click",
    "avro_write_roundtrip",
    # r8 additions: range-join family completion, gapfill/LOCF, privacy
    # audit, integer OLS, exact-recall all-pairs, perceptual hashing
    "interval_overlap_pairs",
    "gapfill_daily_value",
    "k_anonymity_audit",
    "revenue_trend",
    "prefix_filter_dups",
    "dhash_groups",
    "fd_discovery",
    "attribution_position",
    # r9 additions: K1 error isolation, the privacy triad tail,
    # rendezvous resharding, the cross-corpus exact-recall join
    "quarantine_merge",
    "l_diversity_audit",
    "t_closeness_audit",
    "rendezvous_reshard",
    "prefix_filter_xjoin",
]


# the paths whose content determines what the bench measures: a commit
# that only adds records/docs outside them cannot change any timing
_CODE_PATHS = ("hbase_indexer_spark", "__spark_entry__.py", "bench.py")


def _git_head() -> str | None:
    """Commit hash of the code being benched (None outside a git tree)."""
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001
        return None


def _code_tree() -> str | None:
    """Joint tree hash of the measured code paths at HEAD, or None when
    unavailable or when the working tree is dirty under them (a dirty
    tree runs code HEAD never saw, so its record must not match anything).

    Why not the commit hash: committing the idle record itself advances
    HEAD, so a head-stamped record could NEVER match the code state the
    driver later benches — the adjudicator would ignore every committed
    record.  The code-path tree hash is invariant under record/doc
    commits and changes exactly when measured behavior can."""
    import subprocess
    cwd = os.path.dirname(os.path.abspath(__file__))
    try:
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--", *_CODE_PATHS],
            cwd=cwd, capture_output=True, text=True, timeout=10)
        if dirty.returncode != 0 or dirty.stdout.strip():
            return None
        trees = subprocess.run(
            ["git", "rev-parse", *[f"HEAD:{p}" for p in _CODE_PATHS]],
            cwd=cwd, capture_output=True, text=True, timeout=10)
        if trees.returncode != 0:
            return None
        import hashlib
        return hashlib.sha256(trees.stdout.encode()).hexdigest()[:16]
    except Exception:  # noqa: BLE001
        return None


def _idle_record_usable(record: dict, head: str | None,
                        code_tree: str | None = None) -> bool:
    """May this committed idle record exonerate a regression flag?

    A stamped record is only believable when it measured the SAME code
    that is running now (a regression landed after the idle record would
    otherwise read idle_clean and be waved off as noise).  Matching is by
    ``code_tree`` (hash of the measured code paths — survives the commit
    of the record itself) when the record carries one; older head-stamped
    records fall back to exact-commit equality; unstamped legacy records
    predate the stamps and stay usable.
    """
    rec_tree = record.get("code_tree")
    if rec_tree is not None:
        return code_tree is not None and rec_tree == code_tree
    rec_head = record.get("git_head")
    if rec_head is None:
        return True
    return head is not None and rec_head == head


def main() -> None:
    import __spark_entry__ as entry
    from hbase_indexer_spark.session import get_spark

    # --only a,b,c: targeted idle re-timing of flagged queries (the JSON
    # line keeps its shape; "value" covers only the selected queries)
    names = list(BENCH_QUERIES)
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        unknown = only - set(names)
        if unknown:
            sys.exit(f"--only names unknown queries: {sorted(unknown)}")
        names = [n for n in names if n in only]

    spark = get_spark("bench")
    qs = entry.queries()
    # approximate plans with no oracle live outside the gate surface but
    # stay benchmarked
    qs.update(entry.bench_only())

    # warm the JVM + parquet footer caches with a trivial action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    def jvm_gc_millis() -> int:
        """Cumulative JVM GC wall-time — lets a slow query be attributed to
        GC pressure vs plan cost vs external load (VERDICT r5 #2: the
        driver saw ratios idle re-runs couldn't reproduce)."""
        try:
            beans = (spark._jvm.java.lang.management.ManagementFactory
                     .getGarbageCollectorMXBeans())
            return sum(b.getCollectionTime() for b in beans)
        except Exception:  # noqa: BLE001
            return -1

    times: dict[str, float] = {}
    runs_out: dict[str, list[float]] = {}
    gc_out: dict[str, int | None] = {}
    errors: dict[str, str] = {}
    load_start = os.getloadavg()[0]
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    baseline: dict[str, float] = {}
    if os.path.exists(base_path):
        with open(base_path, encoding="utf-8") as f:
            baseline = json.load(f).get("queries", {})
    for name in names:
        # best-of-2: the first run pays Python-worker-pool fork, codegen
        # warmup, and any transient background load; the min of two runs is
        # the engine's plan cost.  Single-run timings swung 2-4x run-to-run
        # on the same plan (measured r4), making regression flags noise.
        runs: list[float] = []
        gc0 = jvm_gc_millis()
        try:
            for _ in range(2):
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                n = df.count()
                runs.append(time.time() - t0)
            # noise guard (r6): this box is a VM — host contention can slow
            # BOTH runs of one query 2-10x while its neighbors time clean
            # (train_test_split measured 2.8s twice mid-bench, 0.35s
            # isolated).  When the best-of-2 still reads >1.3x its committed
            # baseline, buy up to two more runs before believing it: a real
            # plan regression reproduces, transient steal does not.
            base_t = baseline.get(name)
            while (base_t and min(runs) > 1.3 * base_t and len(runs) < 4):
                t0 = time.time()
                n = qs[name](spark, SF_DIR).count()
                runs.append(time.time() - t0)
            times[name] = round(min(runs), 3)
            runs_out[name] = [round(r, 3) for r in runs]
            gc1 = jvm_gc_millis()
            # -1 = MXBean read failed; a delta against it would publish
            # a nonsense (negative or inflated) number as real GC time
            gc_out[name] = gc1 - gc0 if gc0 >= 0 and gc1 >= 0 else None
            print(f"# {name}: {n} rows in {times[name]}s "
                  f"(runs: {[round(r, 2) for r in runs]}, "
                  f"gc: {gc_out[name]}ms)", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            msg = f"{type(exc).__name__}: {exc}"
            errors[name] = msg.splitlines()[0][:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    total = round(sum(times.values()), 3)
    git_head = _git_head()
    code_tree = _code_tree()
    # headline fields FIRST (json.dumps preserves insertion order): any
    # ~1.5KB prefix capture of the line carries metric/value/sf/head and
    # the <=1KB summary even when the 15KB per-query map is truncated
    out = {
        "metric": "headline_query_wall_seconds",
        # an errored query contributes no time, so a smaller total would
        # read as "faster" exactly when something broke — report the
        # metric as invalid instead and exit nonzero
        "value": None if errors else total,
        "unit": "sec",
        "sf": float(sf) if sf else None,
        "git_head": git_head,
        "code_tree": code_tree,
        "queries": times,
        # decomposition data (VERDICT r5 #2): when a driver-observed ratio
        # disagrees with an idle re-run, these attribute the delta —
        # runs[0] >> runs[1] = warm-up/transient; high gc_ms = JVM memory
        # pressure; load_avg_1m >> cpus = external contention.
        "runs": runs_out,
        "gc_ms": gc_out,
        "load_avg_1m": {"start": round(load_start, 2),
                        "end": round(os.getloadavg()[0], 2)},
    }
    # sf1 iterative-loop probe (VERDICT r5 #7): generated offline by
    # scripts/scale_probe.py (10x-replicated sf0.1 inputs, marginal
    # per-round cost from an iters=2 vs iters=7 diff) — attached here so
    # the numbers ride the per-round BENCH snapshot.
    probe_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "SCALE_PROBE.json")
    if os.path.exists(probe_path):
        with open(probe_path, encoding="utf-8") as f:
            out["scale_probe"] = json.load(f)
    if errors:
        out["errors"] = errors

    # per-query regression deltas vs the committed baseline snapshot —
    # human-readable on stderr, machine-readable in the JSON line
    if baseline:
        base = baseline
        ratios = {}
        cpus = float(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        loaded_box = os.getloadavg()[0] > cpus / 2

        # the committed idle record (BENCH_r{N}_local.json, recorded on an
        # otherwise-idle box at the same SF): its per-query ratio is the
        # strongest exoneration evidence — a plan regression reproduces
        # idle, VM contention does not (VERDICT r8 #1b: four consecutive
        # rounds of ghost flags needed manual adjudication)
        idle_ratios: dict[str, float] = {}
        try:
            import glob
            locals_ = sorted(glob.glob(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_r*_local.json")))
            if locals_:
                with open(locals_[-1], encoding="utf-8") as f:
                    record = json.load(f)
                # r10: a record stamped with different code cannot
                # exonerate THIS code — ignore it (see module docstring)
                if _idle_record_usable(record, git_head, code_tree):
                    idle_ratios = (record.get("vs_baseline", {})
                                   .get("ratios", {}))
        except Exception:  # noqa: BLE001
            idle_ratios = {}

        # a regression needs BOTH a >1.5x ratio and a >2s absolute delta:
        # sub-second queries swing multiples under background load, and the
        # first queries absorb codegen warmup — pure-ratio flags cried wolf.
        def flagged(name: str) -> bool:
            return (ratios[name] > 1.5
                    and times[name] - base.get(name, 0.0) > 2.0)

        # pre-adjudicated verdict (VERDICT r8 #1b): each flagged entry is
        # labeled noise|real from machine-readable markers so the reader
        # never has to re-run the bench to interpret a flag.
        #   idle_clean  — the committed idle record timed this plan <=1.25x
        #   run_spread  — this bench's own runs of the identical plan
        #                 spread >1.5x (contention; a plan cost times flat)
        #   loaded_box  — 1-min load average above cpus/2 during the bench
        #   gc_pressure — >1.5s of JVM GC inside this query's timing window
        # noise = idle_clean corroborated by any contention marker, or
        # run_spread + (loaded_box | gc_pressure); anything else is real.
        def markers_of(name: str) -> list[str]:
            rs = runs_out.get(name, [0.0])
            spread = max(rs) / max(min(rs), 1e-9)
            m = []
            idle = idle_ratios.get(name)
            if idle is not None and idle <= 1.25:
                m.append("idle_clean")
            if spread > 1.5:
                m.append("run_spread")
            if loaded_box:
                m.append("loaded_box")
            gc = gc_out.get(name)
            if gc is not None and gc > 1500:
                m.append("gc_pressure")
            return m

        def verdict_of(name: str) -> str:
            m = markers_of(name)
            if "idle_clean" in m and len(m) >= 2:
                return "noise"
            if "run_spread" in m and ("loaded_box" in m
                                      or "gc_pressure" in m):
                return "noise"
            return "real"

        def regressed(name: str) -> bool:
            return flagged(name) and verdict_of(name) == "real"

        for name, t in sorted(times.items()):
            b = base.get(name)
            if b:
                ratios[name] = round(t / b, 3)
                flag = "  <-- REGRESSION" if regressed(name) else ""
                print(f"# delta {name}: {t:.2f}s vs baseline {b:.2f}s "
                      f"({ratios[name]:.2f}x){flag}", file=sys.stderr)
            else:
                print(f"# delta {name}: {t:.2f}s (no baseline)",
                      file=sys.stderr)
        regressions = sorted(n for n in ratios if regressed(n))

        # machine-readable noise attribution (VERDICT r6 #3 + r8 #1b):
        # the driver records only this JSON tail, so the evidence that
        # distinguishes a plan regression from VM contention must live
        # INSIDE it — including the verdict.  suspect_noise = flagged
        # entries adjudicated noise, plus milder >1.3x entries showing
        # contention markers; every listed entry carries its verdict,
        # markers, and the committed idle-record ratio.
        def evidence(name: str) -> dict:
            rs = runs_out.get(name, [0.0])
            return {
                "ratio": ratios.get(name),
                "runs": rs,
                "spread": round(max(rs) / max(min(rs), 1e-9), 2),
                "gc_ms": gc_out.get(name),
                "idle_ratio": idle_ratios.get(name),
                "markers": markers_of(name),
                "verdict": verdict_of(name),
            }

        suspect = sorted(set(
            n for n in ratios
            if n not in regressions
            and ((flagged(n))  # flagged but adjudicated noise
                 or (ratios[n] > 1.3
                     and (evidence(n)["spread"] > 2.0 or loaded_box)))))
        out["vs_baseline"] = {
            "ratios": ratios,
            "regressions": regressions,
            "suspect_noise": suspect,
            "flag_evidence": {n: evidence(n)
                              for n in [*regressions, *suspect]},
            "loaded_box": loaded_box,
        }

    # compact (<=1KB) verdict, placed right after the headline fields so
    # it survives any prefix capture; mirrored on stderr so even a pure
    # stderr/tail capture keeps the round's verdict
    vsb = out.get("vs_baseline", {})
    rlist = vsb.get("ratios", {})
    geomean = None
    if rlist:
        import math
        vals = [v for v in rlist.values() if v and v > 0]
        if vals:
            geomean = round(
                math.exp(sum(math.log(v) for v in vals) / len(vals)), 3)
    summary = {
        "total_sec": None if errors else total,
        "n_queries": len(times),
        "n_errors": len(errors),
        "vs_baseline_geomean": geomean,
        "regressions": vsb.get("regressions", []),
        "suspect_noise": vsb.get("suspect_noise", []),
        "loaded_box": vsb.get("loaded_box"),
    }
    ordered = {k: out[k] for k in
               ("metric", "value", "unit", "sf", "git_head", "code_tree")}
    ordered["summary"] = summary
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    print(f"# summary: {json.dumps(summary)}", file=sys.stderr)
    print(json.dumps(ordered))
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
