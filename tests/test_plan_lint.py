"""Global plan lint: every registered query's physical plan is scanned for
operators that do not survive a 100x scale-up — CartesianProduct (all-pairs)
and BroadcastNestedLoopJoin (non-equi broadcast loop).  Unlike
test_plan_contracts.py (which pins per-query plan *shapes*), this is a
blanket floor over the whole queries() surface, so a newly-added query with
an accidental cross join fails the suite immediately.
"""

import contextlib
import io

import pytest

import __spark_entry__ as entry

# justified exceptions, each with the reason the node is scale-safe
ALLOW_BNLJ = {
    # TPC-H Q22: `c_acctbal > (select avg(c_acctbal) ...)` — the broadcast
    # side is a single-row global aggregate, so the "nested loop" is a
    # constant-time comparison per row, not an all-pairs join.
    "idle_high_balance_customers",
    # TPC-H Q11: `having sum(...) > (select sum(...) * frac)` — same
    # single-row scalar-aggregate broadcast shape as Q22.
    "important_part_value",
    # declared brute-force baseline: every corpus vector scored against the
    # K=|query_ids| broadcast query vectors; the broadcast side is O(K),
    # so the loop is K dot products per row — linear scan by design (the
    # scale path is ann_lsh_topk / ann_ivf_indexed).
    "ann_bruteforce_topk",
    # KMV sketch pairing: both join sides are G-row per-group sketch
    # aggregates (one row per source, <= k longs each); the `g1 < g2`
    # theta-join over broadcast G rows is G^2 array intersections, not
    # an all-pairs data join.
    "vocab_overlap",
    # kNN vote rides brute_force_topk by construction (the verifier
    # path — same O(K)-broadcast linear scan as ann_bruteforce_topk;
    # bulk scoring swaps in the LSH/IVF top-k, see the docstring).
    "knn_label_vote",
    # int8 coarse pass: the deliberate 1/4-byte linear scan against K
    # broadcast query-code rows (`vec_id != query_id` is non-equi, so
    # Spark plans BNLJ over the O(K) side); scan pruning comes from
    # composing with the IVF cell layout, not from this operator.
    "ann_int8_rerank",
    # recall report: runs brute_force_topk as the ground-truth side by
    # definition — same O(K)-broadcast verifier scan as above.
    "ann_recall_report",
    # contrastive mining scores the corpus against K broadcast anchors
    # (`vec_id != query_id` non-equi => BNLJ over the O(K) side) — the
    # verifier path; bulk mining feeds LSH/IVF candidates instead.
    "contrastive_pairs",
    # funnel: the `depth >= step_idx` suffix-sum theta-join and the
    # 1-row first-step crossJoin both operate on AGGREGATE tables
    # (<= n_steps+1 rows each) — constant-size loops, not data joins.
    "event_funnel",
    # threshold curve: the same suffix-sum theta-join over ~10 grid
    # rows x ~10 Jaccard-bucket aggregate rows.
    "jaccard_threshold_curve",
    # t-closeness: the group-totals x global-value-distribution
    # crossJoin — the broadcast side is the DISTINCT-SENSITIVE-VALUE
    # table (census-sized, ~5 rows here), so the loop materializes the
    # |groups| x |values| cell grid the TV distance is defined over,
    # not an all-pairs data join.
    "t_closeness_audit",
    # PQ/ADC coarse pass: the deliberate 32x-smaller code-corpus linear
    # scan against K broadcast query LUTs (`vec_id != query_id` non-equi
    # => BNLJ over the O(K) side) — the memory-bound regime PQ exists
    # for; scan pruning comes from composing with the IVF cell layout.
    "ann_pq_adc",
    # F2 report: crossJoin of TWO single-row aggregates (exact stats x
    # sketch estimate) — a 1x1 loop, not a data join.
    "selfjoin_size",
    # hybrid fusion's dense leg IS brute_force_topk (the declared
    # verifier baseline, same O(K)-broadcast scan as ann_bruteforce_topk);
    # the fusion itself is an equi-groupBy over top-k-truncated inputs.
    "hybrid_rrf",
    # skew profile: crossJoin of the per-key counts with ONE broadcast
    # (total, n_keys) aggregate row — a 1-row loop, not a data join.
    "key_skew_report",
    # ensemble: crossJoin of the signal table with ONE broadcast
    # (min,max)-per-signal aggregate row — same 1-row-loop shape.
    "quality_ensemble",
    # eval's TRUTH leg is brute_force_topk by definition (ground truth =
    # the exact dense ranking — same declared O(K)-broadcast verifier
    # scan as ann_bruteforce_topk); the evaluation itself is an
    # aggregate-sized equi-join of two top-k frames.
    "retrieval_eval",
    # FK audit: per relation a 1x1 crossJoin of two single-row
    # aggregates (counts x orphan count) — the scalar-join shape.
    "fk_integrity",
    # JSON key profile: keys-sized aggregate x the single-row total-rows
    # scalar (the ppm denominator) — the same 1x1 scalar-join shape.
    "json_key_profile",
    # z-order audit: the scan x ONE broadcast per-column (min,max) bounds
    # row (the fixed-point scaling denominators) — the scalar-join shape.
    "zorder_bucket_stats",
    # sketch-algebra overlap: the `seg_a < seg_b` pair expansion is a
    # theta-join over the G-row DISTINCT group list (aggregate-sized,
    # like vocab_overlap); data is touched only by the register build
    # and the equi-keyed exact-audit join.
    "segment_overlap_sketch",
    # rolling sketch: the (days x 64-register) grid crossJoin and the
    # 1-row (lo,hi) bounds broadcast are both aggregate-sized loops;
    # raw events are touched only by the register build and the
    # combinable exact-audit explode.
    "rolling_active_users",
    # gapfill+LOCF (r8): the day grid is groups x the 1-row (lo,hi)
    # bounds broadcast — the same aggregate-sized scalar-join shape as
    # rolling_active_users; events feed only the combinable daily agg.
    "gapfill_daily_value",
}


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    out = {}
    for name, fn in entry.queries().items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        out[name] = buf.getvalue()
    return out


def test_no_cartesian_product_anywhere(all_plans):
    offenders = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert not offenders, f"cartesian product in: {offenders}"


def test_no_nested_loop_join_outside_allowlist(all_plans):
    offenders = [
        n for n, p in all_plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in ALLOW_BNLJ
    ]
    assert not offenders, f"nested-loop join in: {offenders}"


def test_allowlist_entries_still_needed(all_plans):
    # prune the allowlist when a query stops producing the node
    stale = [n for n in ALLOW_BNLJ
             if "BroadcastNestedLoopJoin" not in all_plans.get(n, "")]
    assert not stale, f"allowlist entries no longer needed: {stale}"
