"""DedupIndexStore: persistent cross-snapshot dedup state.

Pins: empty-state screen keeps everything; accept -> re-screen flags
exact dups; near-dups caught via signature estimate without base text;
state survives a fresh store handle (restart); versioned publish
retains the previous state readable; accept is idempotent.
"""

from hbase_indexer_spark.pipeline.dedup_store import (
    DedupIndexStore,
    doc_sketches,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
LONG_B = "one two three four five six seven eight nine ten"


def _verdicts(df):
    return {r["doc_id"]: (r["exact_dup"], r["near_dup"], r["keep"])
            for r in df.collect()}


def test_empty_state_keeps_everything(spark, tmp_path):
    store = DedupIndexStore(str(tmp_path / "dd"))
    out = _verdicts(store.screen(spark, _df(spark, [(1, LONG_A)])))
    assert out[1] == (False, False, True)


def test_accept_then_screen_flags_duplicates(spark, tmp_path):
    store = DedupIndexStore(str(tmp_path / "dd"), threshold=0.7)
    store.accept(spark, _df(spark, [(0, LONG_A), (2, LONG_B)]))
    near = LONG_A.replace("kappa", "lambda")  # 1-token edit
    out = _verdicts(store.screen(spark, _df(
        spark, [(1, LONG_A), (3, near), (5, "totally unrelated words")])))
    assert out[1][0] is True and out[1][2] is False     # exact
    assert out[3][1] is True and out[3][2] is False     # near via sigs
    assert out[5] == (False, False, True)


def test_state_survives_restart(spark, tmp_path):
    path = str(tmp_path / "dd")
    DedupIndexStore(path).accept(spark, _df(spark, [(0, LONG_A)]))
    fresh = DedupIndexStore(path)  # new handle, same disk state
    out = _verdicts(fresh.screen(spark, _df(spark, [(1, LONG_A)])))
    assert out[1][0] is True


def test_incremental_accept_accumulates(spark, tmp_path):
    store = DedupIndexStore(str(tmp_path / "dd"))
    store.accept(spark, _df(spark, [(0, LONG_A)]))
    store.accept(spark, _df(spark, [(2, LONG_B)]))
    out = _verdicts(store.screen(spark, _df(
        spark, [(1, LONG_A), (3, LONG_B)])))
    assert out[1][0] is True and out[3][0] is True


def test_accept_idempotent_and_versioned(spark, tmp_path):
    store = DedupIndexStore(str(tmp_path / "dd"))
    batch = _df(spark, [(0, LONG_A)])
    store.accept(spark, batch)
    v1 = store.store.current_version()
    store.accept(spark, batch)  # same doc again
    assert store.store.current_version() == v1 + 1  # new publish...
    assert store.sketches(spark).count() == 1       # ...same state
    assert v1 in store.store.versions()             # previous retained


def test_sketch_size_is_text_independent(spark):
    big = " ".join(f"w{i}" for i in range(500))
    sk = doc_sketches(_df(spark, [(1, big)])).collect()[0]
    assert len(sk["sig"]) == 48  # fixed-size sketch however long the doc


def test_screen_batches_sequential_semantics(spark, tmp_path):
    """The gated transcript query: a duplicate arriving one batch after
    its original is dropped; the batch-0 original keeps; batch
    assignment is doc_id % n_batches."""
    from hbase_indexer_spark.pipeline.dedup_store import screen_batches

    # doc 0 -> batch 0 (kept), doc 1 -> batch 1 (exact dup of 0),
    # doc 5 -> batch 2 (near dup of 0), doc 4 -> batch 1 (fresh)
    near = LONG_A.replace("kappa", "lambda")
    docs = _df(spark, [(0, LONG_A), (1, LONG_A), (5, near), (4, LONG_B)])
    out = screen_batches(spark, docs, str(tmp_path / "dd"),
                         threshold=0.7, n_batches=3)
    v = {r["doc_id"]: r for r in out.collect()}
    assert v[0]["batch"] == 0 and v[0]["keep"]
    assert v[1]["batch"] == 1 and v[1]["exact_dup"] and not v[1]["keep"]
    assert v[5]["batch"] == 2 and v[5]["near_dup"] and not v[5]["keep"]
    assert v[4]["batch"] == 1 and v[4]["keep"]


def test_screen_plan_shape(spark, tmp_path):
    """The LIVE screen plan (referenced by scripts/explain.py's
    dedup_store_screen pin): candidates come from band-equality joins —
    never a cartesian/nested-loop of new x state, never a Python stage."""
    import contextlib
    import io
    import re

    store = DedupIndexStore(str(tmp_path / "dd"), threshold=0.7)
    store.accept(spark, _df(spark, [(0, LONG_A), (2, LONG_B)]))
    plan_df = store.screen(spark, _df(spark, [(1, LONG_A)]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad
    assert re.search(r"partial_min", plan)  # combinable sig aggregation


def test_signature_estimate_tracks_exact_jaccard(spark):
    """The store's near verdict rests on the MinHash estimate (matching
    sigs / 48).  Construct pairs across the Jaccard range from
    controlled shingle overlap and assert the estimator brackets the
    exact value within 3 sigma (sqrt(J(1-J)/48))."""
    import math

    from pyspark.sql import functions as F

    from hbase_indexer_spark.pipeline.dedup import (
        N_SIGS,
        exploded_shingles,
        sigs_from_shingles,
    )

    # doc pairs sharing k of 20 trigram-shingles: J = k / (40 - k)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for pi, k in enumerate([4, 10, 16, 19]):
        base = pi * 50
        shared = [" ".join(vocab[base + 3 * j: base + 3 * j + 3])
                  for j in range(20)]
        a = shared[:20]
        extra = [" ".join([f"x{pi}_{j}a", f"x{pi}_{j}b", f"x{pi}_{j}c"])
                 for j in range(20 - k)]
        b = shared[:k] + extra
        rows.append((2 * pi, " ".join(a)))
        rows.append((2 * pi + 1, " ".join(b)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = exploded_shingles(docs, 3)
    sigs = sigs_from_shingles(sh).collect()
    by_id = {r["doc_id"]: [r[f"s{i}"] for i in range(N_SIGS)] for r in sigs}
    sh_sets = {}
    for r in sh.collect():
        sh_sets.setdefault(r["doc_id"], set()).add(r["sh"])
    for pi in range(4):
        x, y = 2 * pi, 2 * pi + 1
        inter = len(sh_sets[x] & sh_sets[y])
        union = len(sh_sets[x] | sh_sets[y])
        exact = inter / union
        est = sum(1 for a, b in zip(by_id[x], by_id[y]) if a == b) / N_SIGS
        sigma = math.sqrt(exact * (1 - exact) / N_SIGS)
        assert abs(est - exact) <= 3 * sigma + 1e-9, (pi, exact, est)
