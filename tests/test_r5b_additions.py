"""Unit tests for the second r5 batch of pipeline operators:
blocklist_filter, contrastive_pairs, length_buckets, psi_drift.

Each also has an oracle gate entry (__spark_entry__) — these tests pin
the semantic corners the cross-engine hash can't see: verdict branches,
role correctness, partition invariance, and the zero-drift identity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# blocklist_filter
# ---------------------------------------------------------------------------

def test_blocklist_counts_and_verdicts(spark):
    from hbase_indexer_spark.pipeline.scrub import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "slow Big crawl of the web"),     # 2/6 blocked = 333333 ppm
            (2, "clean text only here"),          # 0 blocked
            (3, ""),                              # empty: NULL ppm, kept
            (4, "slow slow slow"),                # all blocked
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            blocklist_filter(docs, words=["slow", "big"],
                             max_ppm=300_000).collect()}
    assert rows[1]["n_blocked"] == 2 and rows[1]["n_tokens"] == 6
    assert rows[1]["blocked_ppm"] == 333_333 and rows[1]["keep"] is False
    assert rows[2]["n_blocked"] == 0 and rows[2]["keep"] is True
    assert rows[3]["n_tokens"] == 0 and rows[3]["blocked_ppm"] is None
    assert rows[3]["keep"] is True
    assert rows[4]["blocked_ppm"] == 1_000_000 and rows[4]["keep"] is False


def test_blocklist_casefolds(spark):
    from hbase_indexer_spark.pipeline.scrub import blocklist_filter

    docs = spark.createDataFrame([(1, "SLOW Slow sLoW")],
                                 "doc_id long, text string")
    row = blocklist_filter(docs, words=["Slow"]).collect()[0]
    assert row["n_blocked"] == 3


# ---------------------------------------------------------------------------
# contrastive_pairs
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_emb(spark):
    # 2-d embeddings: label 0 clusters near (1, 0), label 1 near (0, 1);
    # vec 4 is a label-1 point sitting close to the label-0 cluster —
    # the hard negative every label-0 anchor should surface first.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.8, 0.0], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.7, 0.3], 1),
        (5, [0.1, 0.9], 1),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def test_contrastive_roles_and_ranks(tiny_emb):
    from hbase_indexer_spark.pipeline.similarity import contrastive_pairs

    out = contrastive_pairs(tiny_emb, [0], k_pos=2, k_neg=2).collect()
    by_role = {}
    for r in out:
        by_role.setdefault(r["role"], []).append((r["rank"], r["pair_id"]))
    # positives: the two other label-0 vectors, nearest first — vec 2
    # (0.8, 0) is colinear with the anchor (cos = 1.0), so it wins
    assert sorted(by_role["pos"]) == [(1, 2), (2, 1)]
    # hard negative #1 is vec 4 (the label-1 point near the 0-cluster)
    assert sorted(by_role["neg"])[0] == (1, 4)
    # labels actually differ/match as the role claims
    labels = {r["vec_id"]: r["label"] for r in tiny_emb.collect()}
    for r in out:
        same = labels[r["pair_id"]] == labels[0]
        assert same == (r["role"] == "pos")


def test_contrastive_excludes_anchor_and_caps_k(tiny_emb):
    from hbase_indexer_spark.pipeline.similarity import contrastive_pairs

    out = contrastive_pairs(tiny_emb, [0, 3], k_pos=1, k_neg=2).collect()
    assert all(r["pair_id"] != r["query_id"] for r in out)
    for qid in (0, 3):
        mine = [r for r in out if r["query_id"] == qid]
        assert len([r for r in mine if r["role"] == "pos"]) == 1
        assert len([r for r in mine if r["role"] == "neg"]) == 2


# ---------------------------------------------------------------------------
# length_buckets
# ---------------------------------------------------------------------------

def _naive_manifest(spark, docs, bounds, batch_docs, salt):
    """Single-window reference implementation (the oracle shape)."""
    from hbase_indexer_spark.pipeline.text import token_count, token_hash60

    bucket = sum(
        (F.when(F.col("n_tokens") >= b, 1).otherwise(0) for b in bounds),
        F.lit(0),
    )
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt))
    c = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens"),
        token_hash60(key).alias("h")).withColumn("bucket", bucket)
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    return (
        c.withColumn("seq", F.row_number().over(w) - 1)
        .withColumn("batch_id", F.expr(f"cast(seq as bigint) div {batch_docs}"))
        .groupBy("bucket", "batch_id")
        .agg(F.count("*").alias("n_docs"),
             F.max("n_tokens").alias("max_tokens"),
             F.sum("n_tokens").alias("sum_tokens"))
        .withColumn("padding_tokens",
                    F.col("n_docs") * F.col("max_tokens")
                    - F.col("sum_tokens"))
    )


def test_length_buckets_matches_naive_window(spark, sf_dir):
    from hbase_indexer_spark.pipeline.pack import (DEFAULT_LEN_BOUNDARIES,
                                                   length_buckets)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fast = sorted(map(tuple, length_buckets(docs, batch_docs=8).collect()))
    ref = sorted(map(tuple, _naive_manifest(
        spark, docs, DEFAULT_LEN_BOUNDARIES, 8, "len-bucket-v1").collect()))
    assert fast == ref


def test_length_buckets_partitions_corpus_exactly(spark, sf_dir):
    from hbase_indexer_spark.pipeline.pack import length_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = length_buckets(docs, batch_docs=8).collect()
    assert sum(r["n_docs"] for r in m) == docs.count()
    assert all(1 <= r["n_docs"] <= 8 for r in m)
    assert all(r["padding_tokens"] >= 0 for r in m)
    # only the tail batch of each bucket may be short
    short = [(r["bucket"], r["batch_id"]) for r in m if r["n_docs"] < 8]
    last = {}
    for r in m:
        last[r["bucket"]] = max(last.get(r["bucket"], -1), r["batch_id"])
    assert all(bid == last[b] for b, bid in short)


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------

def test_psi_identical_snapshots_is_zero(spark, sf_dir):
    from hbase_indexer_spark.pipeline.curation import psi_drift

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = psi_drift(docs, docs).collect()
    assert out and all(r["psi_micro"] == 0 for r in out)
    assert all(r["n_base"] == r["n_new"] for r in out)


def test_psi_detects_length_shift(spark):
    from hbase_indexer_spark.pipeline.curation import psi_drift

    short = [(i, "a b c", "web") for i in range(100)]           # 3 tokens
    long_ = [(i, " ".join(["t"] * 70), "web") for i in range(100)]
    schema = "doc_id long, text string, source string"
    base = spark.createDataFrame(short, schema)
    drifted = spark.createDataFrame(long_, schema)
    same = psi_drift(base, base).collect()[0]
    moved = psi_drift(base, drifted).collect()[0]
    assert same["psi_micro"] == 0
    # hard shift: PSI far above the 0.25 "changed character" rule of thumb
    assert moved["psi_micro"] > 250_000


def test_psi_one_sided_source_does_not_error(spark):
    from hbase_indexer_spark.pipeline.curation import psi_drift

    schema = "doc_id long, text string, source string"
    base = spark.createDataFrame([(1, "a b", "old-only")], schema)
    new = spark.createDataFrame([(2, "a b", "new-only")], schema)
    rows = {r["source"]: r for r in psi_drift(base, new).collect()}
    assert set(rows) == {"old-only", "new-only"}
    assert rows["old-only"]["n_new"] == 0
    assert rows["new-only"]["n_base"] == 0


# ---------------------------------------------------------------------------
# kmeans_cells / semdedup
# ---------------------------------------------------------------------------

def test_kmeans_cells_total_assignment(spark, sf_dir):
    from hbase_indexer_spark.pipeline.dedup import kmeans_cells

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = kmeans_cells(emb).collect()
    assert len(out) == emb.count()
    assert len({r["vec_id"] for r in out}) == len(out)
    assert all(0 <= r["cell"] < 16 for r in out)
    # deterministic: a second build lands every vector in the same cell
    again = {r["vec_id"]: r["cell"] for r in kmeans_cells(emb).collect()}
    assert all(again[r["vec_id"]] == r["cell"] for r in out)


def test_semdedup_keeper_invariants(spark, sf_dir):
    """Dropped ⇔ some lower-id cell-mate is >= threshold similar, and the
    exemplar is the smallest such id — checked against a numpy replay."""
    import numpy as np

    from hbase_indexer_spark.pipeline.dedup import kmeans_cells, semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    thr = 0.4
    out = {r["vec_id"]: r for r in semdedup(emb, threshold=thr).collect()}
    cells = {r["vec_id"]: r["cell"] for r in kmeans_cells(emb).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in rows}
    for vid, r in out.items():
        assert r["cell"] == cells[vid]
        mates = [o for o in vecs if o < vid and cells[o] == r["cell"]]
        sims = {
            o: float(np.dot(vecs[o], vecs[vid])
                     / (np.linalg.norm(vecs[o]) * np.linalg.norm(vecs[vid])))
            for o in mates
        }
        over = sorted(o for o, s in sims.items() if s >= thr)
        if over:
            assert r["kept"] == 0 and r["exemplar"] == over[0]
        else:
            assert r["kept"] == 1 and r["exemplar"] is None


def test_semdedup_drops_exact_duplicate(spark):
    from hbase_indexer_spark.pipeline.dedup import semdedup

    base = [float((i * 7 + d) % 13 - 6) for d in range(64) for i in (1,)]
    other = [float((i * 11 + d) % 17 - 8) for d in range(64) for i in (1,)]
    emb = spark.createDataFrame(
        [(1, base), (2, base), (3, other)],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semdedup(emb, threshold=0.95).collect()}
    assert out[1]["kept"] == 1
    assert out[2]["kept"] == 0 and out[2]["exemplar"] == 1
    assert out[1]["cell"] == out[2]["cell"]


# ---------------------------------------------------------------------------
# dsir_selection
# ---------------------------------------------------------------------------

def test_dsir_selection_invariants(spark, sf_dir):
    from hbase_indexer_spark.pipeline.corpus_stats import dsir_selection

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dsir_selection(docs, docs.filter("doc_id % 7 = 0"), k=50).collect()
    assert len(out) == docs.count()
    assert sum(r["sampled"] for r in out) == min(50, len(out))
    # the k selected are exactly the top-k by (score desc, doc_id asc)
    ranked = sorted(out, key=lambda r: (-r["score_micro"], r["doc_id"]))
    assert all(r["sampled"] == 1 for r in ranked[:50])
    assert all(r["sampled"] == 0 for r in ranked[50:])


def test_dsir_prefers_target_like_docs(spark):
    """Docs sharing the target slice's vocabulary outscore docs that
    don't — the importance weight is doing its job."""
    from hbase_indexer_spark.pipeline.corpus_stats import dsir_selection

    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "quantum flux lattice boson " * 3))
        else:
            rows.append((i, "cheap pills casino winner " * 3))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter("doc_id % 2 = 0")  # the science-y half
    out = {r["doc_id"]: r for r in
           dsir_selection(docs, target, k=10).collect()}
    sci = [out[i]["dsir_micro"] for i in range(0, 40, 2)]
    spam = [out[i]["dsir_micro"] for i in range(1, 40, 2)]
    assert min(sci) > max(spam)
    # all 10 sampled docs come from the target-like half despite noise
    assert all(out[i]["sampled"] == 0 for i in range(1, 40, 2))


# ---------------------------------------------------------------------------
# c4_line_clean
# ---------------------------------------------------------------------------

def test_c4_line_clean_rules(spark):
    from hbase_indexer_spark.pipeline.text import c4_line_clean

    good = "this line has enough words to pass easily."
    docs = spark.createDataFrame(
        [
            (1, "\n".join([good, good, good, "too short.",
                           "no terminal punctuation here at all",
                           "enable javascript to view this page."])),
            (2, "\n".join([good, good])),                # < 3 kept lines
            (3, "\n".join([good, good, good]) + "\nlorem ipsum dolor."),
            (4, "\n".join([good, good, good]) + "\nvar x = {1};"),
            (5, good + "\r\n" + good + "\r\n" + good),   # CRLF normalized
        ],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_clean(docs).collect()}
    assert out[1]["keep"] == 1 and out[1]["n_kept_lines"] == 3
    assert out[1]["clean_text"] == "\n".join([good, good, good])
    assert out[2]["keep"] == 0 and out[2]["clean_text"] is None
    assert out[3]["keep"] == 0          # lorem ipsum doc gate
    assert out[4]["keep"] == 0          # curly-brace doc gate
    assert out[5]["keep"] == 1 and out[5]["n_lines"] == 3


# ---------------------------------------------------------------------------
# substring_dedup
# ---------------------------------------------------------------------------

def test_substring_dedup_removes_repeats_keeps_first(spark):
    from hbase_indexer_spark.pipeline.dedup import substring_dedup

    shared = " ".join(f"s{i}" for i in range(6))      # 6-token repeat
    docs = spark.createDataFrame(
        [
            (1, f"a b c {shared} d e f"),
            (2, f"x y {shared} z w"),                  # later copy: removed
            (3, "u v " + " ".join(f"q{i}" for i in range(8))),  # unique
        ],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           substring_dedup(docs, width=6).collect()}
    # first occurrence survives intact
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == f"a b c {shared} d e f"
    # second occurrence loses exactly the 6-token window
    assert out[2]["n_dup_spans"] == 1 and out[2]["n_removed"] == 6
    assert out[2]["clean_text"] == "x y z w"
    assert out[3]["n_removed"] == 0


def test_substring_dedup_merges_overlapping_windows(spark):
    """A 9-token repeat yields 4 overlapping width-6 windows that must
    merge into ONE 9-token span, and a doc shorter than width is
    untouched."""
    from hbase_indexer_spark.pipeline.dedup import substring_dedup

    rep = " ".join(f"r{i}" for i in range(9))
    docs = spark.createDataFrame(
        [(1, f"{rep} tail1 tail2"), (2, f"head1 head2 {rep}"),
         (3, "tiny doc.")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           substring_dedup(docs, width=6).collect()}
    loser = out[2]
    assert loser["n_dup_spans"] == 1
    assert loser["n_removed"] == 9
    assert loser["clean_text"] == "head1 head2"
    assert out[1]["n_removed"] == 0
    assert out[3]["n_removed"] == 0 and out[3]["clean_text"] == "tiny doc."


def test_substring_dedup_matches_brute_replay(spark, sf_dir):
    """Window flagging matches an exact in-memory replay on real data."""
    from hbase_indexer_spark.pipeline.dedup import substring_dedup

    w = 15
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].split() for r in rows}
    first, flagged = {}, {}
    for did in sorted(toks):
        ts = toks[did]
        for i in range(len(ts) - w + 1):
            k = " ".join(ts[i:i + w])
            first.setdefault(k, []).append((did, i + 1))
    for k, occ in first.items():
        if len(occ) > 1:
            for did, i in occ[1:] if occ == sorted(occ) else sorted(occ)[1:]:
                flagged.setdefault(did, set()).add(i)
    removed = {}
    for did, starts in flagged.items():
        pos = set()
        for s in starts:
            pos.update(range(s, s + w))
        removed[did] = len(pos)
    out = {r["doc_id"]: r for r in
           substring_dedup(docs, width=w).collect()}
    assert all(out[d]["n_removed"] == removed.get(d, 0) for d in toks)
    got_clean = {d: out[d]["clean_text"] for d in toks}
    for d in toks:
        keep = [t for j, t in enumerate(toks[d], start=1)
                if not any(s <= j < s + w for s in flagged.get(d, ()))]
        assert got_clean[d] == " ".join(keep)


# ---------------------------------------------------------------------------
# PQ / ADC
# ---------------------------------------------------------------------------

def test_pq_encode_matches_numpy_argmin(spark, sf_dir):
    import numpy as np

    from hbase_indexer_spark.pipeline.similarity import (
        PQ_KS, PQ_SUBS, pq_encode, pq_train)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    book = np.array(pq_train(emb))  # [s][j][d] micro, trained on emb
    got = {r["vec_id"]: r["codes"]
           for r in pq_encode(emb, book.tolist()).collect()}
    for r in emb.collect():
        vm = np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6
                      + 0.5).astype(np.int64)
        for s in range(PQ_SUBS):
            sub = vm[s * 8:(s + 1) * 8]
            d2 = ((book[s] - sub) ** 2).sum(axis=1)
            expect = int(np.argmin(d2 * PQ_KS + np.arange(PQ_KS)))
            assert got[r["vec_id"]][s] == expect


def test_pq_adc_recall_vs_brute(spark, sf_dir):
    """ADC@3k-rerank recall vs exact top-5 is decent on real data (the
    4-bit pinned codebook is a placeholder, so the bar is modest)."""
    from hbase_indexer_spark.pipeline.similarity import (
        brute_force_topk, pq_adc_topk)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = list(range(10))
    truth = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, qids, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in pq_adc_topk(emb, qids, k=5).collect()}
    assert len(approx) == len(truth) == 50
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.3, recall


# ---------------------------------------------------------------------------
# line_dedup / vocab_encode
# ---------------------------------------------------------------------------

def test_line_dedup_removes_hot_lines_everywhere(spark):
    from hbase_indexer_spark.pipeline.dedup import line_dedup

    footer = "copyright 2026 example corp"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha\n{footer}"),
            (2, f"unique beta\n  {footer}  \nmore beta"),   # trim-matched
            (3, f"unique gamma\n{footer}"),
            (4, "only\n\nblanks kept\n"),
        ],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(docs, max_freq=2).collect()}
    # footer occurs 3x (> 2) -> dropped from every doc, trim-insensitive
    assert out[1]["clean_text"] == "unique alpha"
    assert out[2]["clean_text"] == "unique beta\nmore beta"
    assert out[3]["n_dropped"] == 1
    # blank lines pass through untouched and uncounted
    assert out[4]["n_dropped"] == 0
    assert out[4]["clean_text"] == "only\n\nblanks kept\n"


def test_vocab_encode_ids_and_oov(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import (
        build_vocab, vocab_encode)

    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc"), (2, "bb cc dd"), (3, "")],
        "doc_id long, text string")
    vocab = {r["token"]: r["token_id"]
             for r in build_vocab(docs, size=3).collect()}
    # counts: aa=3, bb=3, cc=2, dd=1 -> ids by (count desc, token asc)
    assert vocab == {"aa": 1, "bb": 2, "cc": 3}
    out = {r["doc_id"]: r for r in vocab_encode(docs, size=3).collect()}
    assert out[1]["ids"] == "\x1f".join("111223")
    assert out[1]["n_oov"] == 0
    assert out[2]["ids"] == "\x1f".join(["2", "3", "0"])  # dd is OOV
    assert out[2]["n_oov"] == 1
    assert out[3]["n_tokens"] == 0 and out[3]["ids"] == ""


# ---------------------------------------------------------------------------
# filter_ablation
# ---------------------------------------------------------------------------

def test_filter_ablation_partitions_corpus(spark, sf_dir):
    from hbase_indexer_spark.pipeline.curation import filter_ablation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = filter_ablation(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    pats = {(r["c4_keep"], r["gopher_keep"], r["rep_keep"],
             r["quality_keep"]) for r in rows}
    assert len(pats) == len(rows)          # one row per pattern
    assert all(all(b in (0, 1) for b in p) for p in pats)


def test_filter_ablation_bits_match_individual_gates(spark):
    from hbase_indexer_spark.pipeline.curation import filter_ablation
    from hbase_indexer_spark.pipeline.text import c4_line_clean

    good = "this line has plenty of words to pass the c4 gate."
    docs = spark.createDataFrame(
        [(1, "\n".join([good] * 4)),   # passes c4; fails repetition
         (2, "word " * 3)],            # fails c4 (1 line, no terminal .)
        "doc_id long, text string")
    c4 = {r["doc_id"]: r["keep"] for r in c4_line_clean(docs).collect()}
    assert c4 == {1: 1, 2: 0}
    rows = filter_ablation(docs).collect()
    # doc 1: 4 identical lines -> dup-word fraction 3/4 > 0.3 -> rep fail
    by_doccount = {r["n_docs"]: r for r in rows}
    assert len(rows) == 2
    one = [r for r in rows if r["c4_keep"] == 1][0]
    assert one["rep_keep"] == 0
    other = [r for r in rows if r["c4_keep"] == 0][0]
    assert other["n_docs"] == 1


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def test_cms_one_sided_and_merge(spark):
    from collections import Counter

    from hbase_indexer_spark.pipeline.corpus_stats import (
        cms_estimates, count_min_sketch)

    texts = ["aa bb aa cc", "aa dd ee bb", "ff " * 30]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    true = Counter(t for txt in texts for t in txt.split())
    out = {r["term"]: r for r in cms_estimates(docs, k=10).collect()}
    assert set(out) == set(true)  # < 10 distinct terms: all probed
    for t, r in out.items():
        assert r["true_count"] == true[t]
        assert r["est_count"] >= true[t]          # one-sided guarantee
    # mergeability: sketch(docs) == sketch(half1) + sketch(half2)
    whole = {(r["row"], r["cell"]): r["c"]
             for r in count_min_sketch(docs).collect()}
    h1 = count_min_sketch(docs.filter("doc_id < 1")).collect()
    h2 = count_min_sketch(docs.filter("doc_id >= 1")).collect()
    merged = {}
    for r in list(h1) + list(h2):
        merged[(r["row"], r["cell"])] = \
            merged.get((r["row"], r["cell"]), 0) + r["c"]
    assert merged == whole


def test_cms_stream_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Mergeability makes the streamed end state bit-identical to one
    batch sketch over the whole corpus — including across a restart."""
    from hbase_indexer_spark.pipeline.corpus_stats import count_min_sketch
    from hbase_indexer_spark.sinks.index_store import IndexStore
    from hbase_indexer_spark.streaming.sketch_stream import cms_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    src = tmp_path / "docs"
    src.mkdir()
    for b in range(2):
        chunk = docs.filter(f"doc_id % 2 = {b}")
        stage = tmp_path / f"stage{b}"
        chunk.coalesce(1).write.parquet(str(stage))
        pq = next(p for p in stage.iterdir() if p.suffix == ".parquet")
        pq.rename(src / f"chunk{b}.parquet")
    store = IndexStore(str(tmp_path / "sketch"), key="row")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = cms_stream(stream, store, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["row"], r["cell"]): r["c"]
           for r in store.read(spark).collect()}
    want = {(r["row"], r["cell"]): r["c"]
            for r in count_min_sketch(docs).collect()}
    assert got == want


def test_cms_fold_skips_redelivered_batch(spark, tmp_path):
    """foreachBatch is at-least-once: re-folding the same batch_id must
    be a no-op, not a double count."""
    from hbase_indexer_spark.sinks.index_store import IndexStore
    from hbase_indexer_spark.streaming.sketch_stream import fold_sketch_batch

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "cc aa dd")], "doc_id long, text string")
    store = IndexStore(str(tmp_path / "sk"), key="row")
    assert fold_sketch_batch(store, docs, batch_id=0) is True
    once = {(r["row"], r["cell"]): r["c"]
            for r in store.read(spark).collect()}
    assert fold_sketch_batch(store, docs, batch_id=0) is False  # replay
    again = {(r["row"], r["cell"]): r["c"]
             for r in store.read(spark).collect()}
    assert again == once
    assert fold_sketch_batch(store, docs, batch_id=1) is True   # progress
    more = {(r["row"], r["cell"]): r["c"]
            for r in store.read(spark).collect()}
    assert more == {k: 2 * v for k, v in once.items()}


def test_filter_ablation_keeps_empty_docs(spark):
    from hbase_indexer_spark.pipeline.curation import filter_ablation

    docs = spark.createDataFrame(
        [(1, ""), (2, "   \n  "),
         (3, "this line has plenty of words to pass the gates today.")],
        "doc_id long, text string")
    rows = filter_ablation(docs).collect()
    assert sum(r["n_docs"] for r in rows) == 3  # empty docs not dropped
    empties = [r for r in rows if r["rep_keep"] == 0]
    assert sum(r["n_docs"] for r in empties) >= 2


def test_generate_uuid_null_fields_do_not_collide(spark):
    from hbase_indexer_spark.operators.transform import TransformChain

    chain = TransformChain.from_config([
        {"stage": "generate_uuid", "field": "uid",
         "from_fields": ["k1", "k2"], "preserve_existing": False}])
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, "a"), (3, "a", "a")],
        "i long, k1 string, k2 string")
    uids = {r["i"]: r["uid"] for r in chain(df).collect()}
    assert len(set(uids.values())) == 3


def test_c4_line_clean_trailing_cr_fails_line_gate(spark):
    """A stray carriage return (from '...\\r\\r\\n' web text) must fail
    the terminal-punctuation gate — \\z semantics, not Java's $."""
    from hbase_indexer_spark.pipeline.text import c4_line_clean

    good = "this line has enough words to pass easily."
    docs = spark.createDataFrame(
        [(1, "\n".join([good, good, good, good + "\r"]))],
        "doc_id long, text string")
    row = c4_line_clean(docs).collect()[0]
    assert row["n_kept_lines"] == 3  # the \r line is out
