"""Property-based invariants for the r5b operators (hypothesis):
random small corpora vs pure-Python reference models.

- substring_dedup: n_removed matches the positional-union replay exactly,
  the first occurrence of every duplicated window survives, and the
  output is invariant to input partitioning (the distributed min-keeper
  must not depend on row placement).
- line_dedup: a line survives iff its trimmed corpus frequency is within
  the cap; reassembly preserves per-doc line order.
- vocab_encode: decoding ids through the vocab round-trips every
  in-vocab token; OOV count matches the reference.
- dsir_selection: scores are invariant to input partitioning and the
  sampled set is exactly the top-k of the emitted scores.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny vocab so hypothesis finds collisions quickly
word_st = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
doc_st = st.lists(word_st, min_size=0, max_size=12).map(" ".join)
corpus_st = st.lists(doc_st, min_size=1, max_size=8)

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _docs_df(spark, texts, parts=None):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(parts) if parts else df


@settings(**_SETTINGS)
@given(texts=corpus_st, w=st.integers(min_value=2, max_value=4))
def test_substring_dedup_replay_and_partition_invariance(spark, texts, w):
    from hbase_indexer_spark.pipeline.dedup import substring_dedup

    toks = {i: t.split() for i, t in enumerate(texts)}
    first: dict[str, list] = {}
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - w + 1):
            first.setdefault(" ".join(ts[i:i + w]), []).append((d, i + 1))
    removed = {d: set() for d in toks}
    for occ in first.values():
        if len(occ) > 1:
            for d, i in sorted(occ)[1:]:
                removed[d].update(range(i, i + w))
    expect = {
        d: (len(toks[d]), len(removed[d]),
            " ".join(t for j, t in enumerate(toks[d], 1)
                     if j not in removed[d]))
        for d in toks
    }
    for parts in (None, 7):
        out = {r["doc_id"]: r for r in substring_dedup(
            _docs_df(spark, texts, parts), width=w).collect()}
        got = {d: (out[d]["n_tokens"], out[d]["n_removed"],
                   out[d]["clean_text"]) for d in toks}
        assert got == expect


@settings(**_SETTINGS)
@given(texts=st.lists(
    st.lists(st.sampled_from(["x", "  x ", "y", "z z", ""]),
             min_size=0, max_size=5).map("\n".join),
    min_size=1, max_size=6),
    cap=st.integers(min_value=1, max_value=3))
def test_line_dedup_frequency_cap(spark, texts, cap):
    from collections import Counter

    from hbase_indexer_spark.pipeline.dedup import line_dedup

    all_lines = Counter()
    for t in texts:
        for ln in t.split("\n"):
            if ln.strip():
                all_lines[ln.strip()] += 1
    out = {r["doc_id"]: r for r in line_dedup(
        _docs_df(spark, texts), max_freq=cap).collect()}
    for d, t in enumerate(texts):
        lines = t.split("\n")
        kept = [ln for ln in lines
                if not ln.strip() or all_lines[ln.strip()] <= cap]
        assert out[d]["clean_text"] == "\n".join(kept)
        assert out[d]["n_lines"] == len(lines)
        assert out[d]["n_dropped"] == len(lines) - len(kept)


@settings(**_SETTINGS)
@given(texts=corpus_st, size=st.integers(min_value=1, max_value=5))
def test_vocab_encode_round_trip(spark, texts, size):
    from collections import Counter

    from hbase_indexer_spark.pipeline.corpus_stats import (
        build_vocab, vocab_encode)

    df = _docs_df(spark, texts)
    counts = Counter(t for txt in texts for t in txt.split())
    order = sorted(counts, key=lambda t: (-counts[t], t))[:size]
    vocab = {r["token"]: r["token_id"]
             for r in build_vocab(df, size=size).collect()}
    assert vocab == {t: i + 1 for i, t in enumerate(order)}
    inv = {v: k for k, v in vocab.items()}
    out = {r["doc_id"]: r for r in vocab_encode(df, size=size).collect()}
    for d, txt in enumerate(texts):
        toks = txt.split()
        ids = [int(x) for x in out[d]["ids"].split("\x1f")] \
            if out[d]["ids"] else []
        assert len(ids) == len(toks) == out[d]["n_tokens"]
        assert out[d]["n_oov"] == sum(1 for t in toks if t not in vocab)
        for t, i in zip(toks, ids):
            assert (i == 0 and t not in vocab) or inv[i] == t


@settings(**_SETTINGS)
@given(texts=corpus_st, k=st.integers(min_value=1, max_value=4))
def test_dsir_partition_invariance_and_topk(spark, texts, k):
    from hbase_indexer_spark.pipeline.corpus_stats import dsir_selection

    def run(parts):
        df = _docs_df(spark, texts, parts)
        return sorted(map(tuple, dsir_selection(
            df, df.filter("doc_id % 2 = 0"), k=k).collect()))

    a = run(None)
    assert a == run(5)
    scored = sorted(((r[3], r[0]) for r in a),
                    key=lambda s: (-s[0], s[1]))
    top = {d for _, d in scored[:k]}
    assert {r[0] for r in a if r[4] == 1} == top
