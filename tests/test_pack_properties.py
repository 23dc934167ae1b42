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
