"""Property-based invariants for span_dedup and pack_sequences
(hypothesis): random small corpora vs pure-Python reference models.
The oracle gate pins these at parquet scale; the properties cover the
corpus shapes the fixtures can only sample (dup bursts, empty docs,
sparse doc_ids, span/seq_len edge sizes).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_indexer_spark.pipeline.dedup import span_dedup
from hbase_indexer_spark.pipeline.pack import pack_sequences

# tiny vocab makes cross-doc span collisions common
word_st = st.sampled_from(["a", "b", "c"])
doc_st = st.lists(word_st, min_size=0, max_size=9).map(" ".join)
corpus_st = st.lists(doc_st, min_size=1, max_size=6)


def _df(spark, texts, sparse=1):
    return spark.createDataFrame(
        [(i * sparse, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def model_pack(texts, sparse, seq_len):
    out, start = {}, 0
    for i, t in enumerate(texts):
        n = len(t.split())
        if n:
            fs, ls = start // seq_len, (start + n - 1) // seq_len
            out[i * sparse] = (n, start, fs, ls, ls - fs + 1)
        else:
            out[i * sparse] = (0, start, None, None, 0)
        start += n
    return out


def model_span_dedup(texts, sparse, span):
    seen = {}
    spans = {}
    for i, t in enumerate(texts):
        toks = t.split()
        doc = i * sparse
        spans[doc] = [" ".join(toks[p:p + span])
                      for p in range(0, len(toks), span)]
        for pos, s in enumerate(spans[doc]):
            seen.setdefault(s, (doc, pos))
    out = {}
    for doc, ss in spans.items():
        kept = [s for pos, s in enumerate(ss) if seen[s] == (doc, pos)]
        out[doc] = (" ".join(kept), len(ss), len(ss) - len(kept))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=corpus_st, sparse=st.sampled_from([1, 7]),
       seq_len=st.sampled_from([1, 3, 5]))
def test_pack_matches_model(spark, corpus, sparse, seq_len):
    got = {r["doc_id"]: (r["n_tokens"], r["start_token"], r["first_seq"],
                         r["last_seq"], r["n_seqs"])
           for r in pack_sequences(_df(spark, corpus, sparse),
                                   seq_len=seq_len).collect()}
    assert got == model_pack(corpus, sparse, seq_len)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=corpus_st, span=st.sampled_from([1, 2, 4]))
def test_span_dedup_matches_model(spark, corpus, span):
    got = {r["doc_id"]: (r["text"], r["n_spans"], r["n_removed"])
           for r in span_dedup(_df(spark, corpus), span=span).collect()}
    assert got == model_span_dedup(corpus, 1, span)


# ---------------------------------------------------------------------------
# Winnowing / mixture / cross-snapshot dedup properties
# ---------------------------------------------------------------------------

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=st.lists(st.lists(st.sampled_from("abcdef"), min_size=0,
                                max_size=12).map(" ".join),
                       min_size=1, max_size=5))
def test_winnow_guarantee_and_subset(spark, corpus):
    """Every selected fingerprint is a real k-gram hash at its claimed
    position, and every doc with >= w+k-1 tokens selects >= 1
    fingerprint (the winnowing density guarantee's lower edge)."""
    from hbase_indexer_spark.pipeline.dedup import winnow_fingerprints
    from hbase_indexer_spark.pipeline.text import token_hash60  # noqa: F401

    import hashlib

    k, w = 2, 3

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    got = {}
    for r in winnow_fingerprints(_df(spark, corpus), k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, text in enumerate(corpus):
        toks = text.split()
        grams = [" ".join(toks[p:p + k]) for p in range(len(toks) - k + 1)]
        expect_all = {(p + 1, h60(g)) for p, g in enumerate(grams)}
        sel = got.get(i, set())
        assert sel <= expect_all
        if len(toks) >= w + k - 1:
            assert sel


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sizes=st.lists(st.integers(1, 40), min_size=2, max_size=4))
def test_mixture_never_exceeds_group_size_and_keeps_smallest(spark, sizes):
    from hbase_indexer_spark.pipeline.curation import mixture_resample

    rows, i = [], 0
    for g, n in enumerate(sizes):
        for _ in range(n):
            rows.append((i, "t", f"g{g}"))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from pyspark.sql import functions as F

    kept = {r["lang"]: r["n"] for r in
            mixture_resample(docs).groupBy("lang")
            .agg(F.count("*").alias("n")).collect()}
    smallest = f"g{sizes.index(min(sizes))}"
    assert kept.get(smallest) == min(sizes)
    for g, n in enumerate(sizes):
        assert kept.get(f"g{g}", 0) <= n
