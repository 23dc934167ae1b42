"""T5-style span corruption (span_corruption).

Pins: sentinel numbering (0-based, position order), the denoising-pair
reconstruction invariant (splicing each target span back over its
sentinel in the input recovers the whitespace-normalized original),
count consistency (n_masked tokens across n_spans runs), determinism
across repartitioning, and the mask-rate extremes (0 -> identity,
1000 -> one all-covering span).
"""

import re

from hbase_indexer_spark.pipeline.pack import span_corruption

SENT = re.compile(r"<extra_id_(\d+)>")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows, **kw):
    return {r["doc_id"]: r.asDict()
            for r in span_corruption(_docs(spark, rows), **kw).collect()}


def _reconstruct(input_text, target_text):
    """Splice every <extra_id_k> span from the target back into the
    input — must recover the original normalized token stream."""
    spans = {}
    parts = SENT.split(target_text)
    # parts = ["", k0, toks0, k1, toks1, ...]
    for i in range(1, len(parts), 2):
        spans[int(parts[i])] = parts[i + 1].strip()
    # SENT.split on input interleaves text and captured k's the same way
    toks = []
    parts = SENT.split(input_text)
    for i, piece in enumerate(parts):
        if i % 2 == 1:  # captured sentinel index
            toks.append(spans[int(piece)])
        elif piece.strip():
            toks.append(piece.strip())
    return " ".join(t for t in toks if t)


ROWS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "single"),
    (3, ""),
    (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (5, None),  # NULL text must behave exactly like an empty doc
]


def test_reconstruction_and_counts(spark):
    out = _run(spark, ROWS, mask_milli=300)
    for doc_id, text in [(r[0], r[1] or "") for r in ROWS]:
        row = out[doc_id]
        norm = " ".join(text.split())
        assert _reconstruct(row["input_text"], row["target_text"]) == norm
        # every sentinel in the input appears exactly once in the target
        ks_in = [int(k) for k in SENT.findall(row["input_text"])]
        ks_tg = [int(k) for k in SENT.findall(row["target_text"])]
        assert ks_in == ks_tg == list(range(row["n_spans"]))
        assert row["n_tokens"] == len(norm.split()) if norm else True
        assert row["n_masked"] >= row["n_spans"]


def test_empty_doc(spark):
    row = _run(spark, ROWS, mask_milli=300)[3]
    assert (row["n_tokens"], row["n_masked"], row["n_spans"]) == (0, 0, 0)
    assert row["input_text"] == "" and row["target_text"] == ""


def test_mask_rate_extremes(spark):
    none = _run(spark, ROWS, mask_milli=0)
    for doc_id, text in [(r[0], r[1] or "") for r in ROWS]:
        assert none[doc_id]["input_text"] == " ".join(text.split())
        assert none[doc_id]["n_masked"] == 0
        assert none[doc_id]["target_text"] == ""
    full = _run(spark, ROWS, mask_milli=1000)
    row = full[1]  # non-empty doc: one run covering everything
    assert row["n_spans"] == 1 and row["n_masked"] == row["n_tokens"]
    assert row["input_text"] == "<extra_id_0>"


def test_deterministic_across_layout(spark):
    df = _docs(spark, ROWS)
    a = {r["doc_id"]: r["input_text"]
         for r in span_corruption(df, mask_milli=300).collect()}
    b = {r["doc_id"]: r["input_text"]
         for r in span_corruption(df.repartition(7), mask_milli=300)
         .collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Prefix-LM pairs (UL2 S-denoiser)
# ---------------------------------------------------------------------------

def test_prefix_lm_reconstruction_and_bounds(spark):
    from hbase_indexer_spark.pipeline.pack import prefix_lm_pairs

    rows = {r["doc_id"]: r.asDict()
            for r in prefix_lm_pairs(_docs(spark, ROWS)).collect()}
    for doc_id, text in [(r[0], r[1] or "") for r in ROWS]:
        row = rows[doc_id]
        norm = " ".join(text.split())
        glued = (row["input_text"] + " " + row["target_text"]).strip()
        assert glued == norm
        assert row["n_tokens"] == len(norm.split())
        if row["n_tokens"] > 0:
            # split in [0, n): target is never empty
            assert 0 <= row["split_pos"] < row["n_tokens"]
            assert row["target_text"] != ""
            assert len(row["input_text"].split()) == row["split_pos"]
        else:
            assert row["split_pos"] == 0
            assert row["input_text"] == "" == row["target_text"]


def test_prefix_lm_deterministic_across_layout(spark):
    from hbase_indexer_spark.pipeline.pack import prefix_lm_pairs

    df = _docs(spark, ROWS)
    a = sorted(map(tuple, prefix_lm_pairs(df).collect()))
    b = sorted(map(tuple, prefix_lm_pairs(df.repartition(5)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Fill-in-the-middle transform (PSM)
# ---------------------------------------------------------------------------

def test_fim_segments_tile_and_bounds(spark):
    from hbase_indexer_spark.pipeline.pack import fim_transform

    rows = {r["doc_id"]: r.asDict()
            for r in fim_transform(_docs(spark, ROWS)).collect()}
    for doc_id, text in [(r[0], r[1] or "") for r in ROWS]:
        row = rows[doc_id]
        norm = " ".join(text.split())
        glued = " ".join(p for p in (row["prefix_text"],
                                     row["middle_text"],
                                     row["suffix_text"]) if p)
        assert glued == norm
        assert 0 <= row["split_a"] <= row["split_b"] <= row["n_tokens"]
        assert len(row["prefix_text"].split()) == row["split_a"]
        assert (len(row["middle_text"].split())
                == row["split_b"] - row["split_a"])
        # PSM ordering with empty segments dropped, sentinels kept
        want = " ".join(p for p in (
            "<fim_prefix>", row["prefix_text"], "<fim_suffix>",
            row["suffix_text"], "<fim_middle>", row["middle_text"]) if p)
        assert row["fim_text"] == want


def test_fim_deterministic_across_layout(spark):
    from hbase_indexer_spark.pipeline.pack import fim_transform

    df = _docs(spark, ROWS)
    a = sorted(map(tuple, fim_transform(df).collect()))
    b = sorted(map(tuple, fim_transform(df.repartition(3)).collect()))
    assert a == b
