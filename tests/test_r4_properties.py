"""Property-based invariants for the r4-continuation operators
(hypothesis): random small corpora vs pure-Python reference models.

- chunk_documents: exact reconstruction at stride==size; coverage and
  overlap arithmetic at stride<size.
- bloom_screen: ≡ the exact md5 anti-join verdict on EVERY corpus (the
  probabilistic prefilter must never change the answer).
- token_budget_sample: kept set is exactly the crossing-rule hash prefix.
- epoch_expand: targeted groups emit tokens in [target, target + max
  doc), untargeted groups exactly once.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_indexer_spark.pipeline.curation import (
    epoch_expand,
    token_budget_sample,
)
from hbase_indexer_spark.pipeline.dedup import bloom_screen
from hbase_indexer_spark.pipeline.pack import chunk_documents

word_st = st.sampled_from(["a", "b", "c", "d"])
doc_st = st.lists(word_st, min_size=0, max_size=12).map(" ".join)
corpus_st = st.lists(doc_st, min_size=1, max_size=6)


def _df(spark, texts, sparse=1):
    return spark.createDataFrame(
        [(i * sparse, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=corpus_st, size=st.sampled_from([1, 3, 5]))
def test_chunk_reconstruction_at_full_stride(spark, corpus, size):
    # stride == size: chunks partition the token stream; concatenating
    # chunk_texts in chunk_id order reproduces the tokenization exactly
    out = chunk_documents(_df(spark, corpus), size=size,
                          stride=size).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"],
                                                   r["chunk_text"]))
    for i, t in enumerate(corpus):
        toks = t.split()
        got = [c for _, c in sorted(by_doc.get(i, []))]
        assert " ".join(got).split() == toks
        if toks:
            # every chunk but the last is exactly `size` tokens
            assert all(len(c.split()) == size for c in got[:-1])
        else:
            assert got == []


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=corpus_st, size=st.sampled_from([2, 4]))
def test_chunk_overlap_arithmetic(spark, corpus, size):
    stride = max(1, size - 1)
    out = chunk_documents(_df(spark, corpus), size=size,
                          stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(corpus):
        toks = t.split()
        n = len(toks)
        rows = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if not n:
            assert rows == []
            continue
        import math
        expect = 1 + math.ceil(max(0, n - size) / stride)
        assert len(rows) == expect
        for r in rows:
            s = r["chunk_id"] * stride
            assert r["chunk_text"].split() == toks[s:s + size]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(base=corpus_st, new=corpus_st, m=st.sampled_from([16, 1 << 12]))
def test_bloom_screen_verdict_always_exact(spark, base, new, m):
    bdf = _df(spark, base)
    ndf = _df(spark, new, sparse=3)  # distinct id spaces
    out = {r["doc_id"]: r for r in
           bloom_screen(bdf, ndf, m_bits=m).collect()}
    base_texts = set(base)
    for i, t in enumerate(new):
        r = out[i * 3]
        assert r["exact_dup"] == (t in base_texts)
        assert r["keep"] == (t not in base_texts)
        if t in base_texts:
            assert r["bloom_hit"]  # no false negatives, at any m


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=corpus_st, budget=st.sampled_from([1, 5, 50]))
def test_budget_kept_is_crossing_prefix(spark, corpus, budget):
    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 2), t) for i, t in enumerate(corpus)],
        "doc_id long, source string, text string")
    rows = token_budget_sample(docs, budget=budget).collect()
    # model: per source, sort by the same salted hash; walk and keep
    # while cum < budget
    import hashlib

    def h(doc_id):
        d = hashlib.md5(f"{doc_id}:budget-v1".encode()).hexdigest()
        return int(d[:15], 16)

    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (h(r["doc_id"]), r["doc_id"]))
        cum = 0
        for r in rs:
            assert r["cum_before"] == cum
            assert r["kept"] == (cum < budget)
            cum += r["n_tokens"]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=corpus_st, target=st.sampled_from([1, 7, 40]))
def test_epoch_expand_token_accounting(spark, corpus, target):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", t)
         for i, t in enumerate(corpus)],
        "doc_id long, lang string, text string")
    rows = epoch_expand(docs, {"en": target}, group_col="lang").collect()
    en = [r for r in rows if r["lang"] == "en"]
    de = [r for r in rows if r["lang"] == "de"]
    avail = sum(len(t.split()) for i, t in enumerate(corpus)
                if i % 2 == 0)
    emitted = sum(r["n_tokens"] for r in en)
    if avail == 0:
        # no tokens to repeat: every empty-group doc passes through once
        assert all(r["epoch"] == 0 for r in en)
    else:
        max_doc = max((len(t.split()) for i, t in enumerate(corpus)
                       if i % 2 == 0), default=0)
        # crossing rule: reach the target, overshoot < one doc
        assert target <= emitted < target + max(1, max_doc)
    # untargeted group: exactly its epoch-0 rows
    de_expect = sum(1 for i in range(len(corpus)) if i % 2 == 1)
    assert len(de) == de_expect and all(r["epoch"] == 0 for r in de)
