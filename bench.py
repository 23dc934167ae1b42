#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via a count-style action (no driver-side collect
of the full result) so the measured time is the engine plan, not IPC.
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
    "simhash",
    "minhash_lsh_dedup",
    "embedding_cosine_dedup",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "text_profile",
    "repetition_filter",
    "media_frame_sample",
]


def main() -> None:
    import __spark_entry__ as entry
    from hbase_indexer_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry.queries()

    # warm the JVM + parquet footer caches with a trivial action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        # fault-isolated: one broken query must not zero the whole bench
        try:
            df = qs[name](spark, SF_DIR)
            n = df.count()
            times[name] = round(time.time() - t0, 3)
            print(f"# {name}: {n} rows in {times[name]}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            msg = f"{type(exc).__name__}: {exc}"
            errors[name] = msg.splitlines()[0][:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf else None,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
