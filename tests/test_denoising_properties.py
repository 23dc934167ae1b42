"""Property-based invariants for the denoising-objective builders
(hypothesis): random texts — including unicode, tabs/newlines, and
whitespace runs — vs a pure-Python model of the masking recipe. The
oracle gate pins both at parquet scale; these cover text shapes the
fixtures only sample.
"""

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_indexer_spark.pipeline.pack import prefix_lm_pairs, span_corruption

SENT = re.compile(r"<extra_id_(\d+)>")

# words avoid the sentinel shape itself; text mixes unicode words and
# varied whitespace (space, tab, newline, runs)
word_st = st.text(
    alphabet=st.characters(whitelist_categories=["Ll", "Lu", "Nd"],
                           max_codepoint=0x24F),
    min_size=1, max_size=6)
ws_st = st.sampled_from([" ", "  ", "\t", "\n", " \t "])
doc_st = st.builds(
    lambda parts: "".join(w + s for w, s in parts),
    st.lists(st.tuples(word_st, ws_st), min_size=0, max_size=12))
corpus_st = st.lists(doc_st, min_size=1, max_size=5)


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _df(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus_st, st.sampled_from([0, 150, 500, 1000]))
def test_span_corruption_matches_model(spark, texts, mask_milli):
    out = {r["doc_id"]: r.asDict()
           for r in span_corruption(_df(spark, texts),
                                    mask_milli=mask_milli).collect()}
    for doc_id, text in enumerate(texts):
        toks = text.split()
        masked = [_hash60(f"{doc_id}:{i}") % 1000 < mask_milli
                  for i in range(len(toks))]
        inp, tgt, k = [], [], -1
        for i, (t, m) in enumerate(zip(toks, masked)):
            if not m:
                inp.append(t)
            elif i == 0 or not masked[i - 1]:
                k += 1
                inp.append(f"<extra_id_{k}>")
                tgt.extend([f"<extra_id_{k}>", t])
            else:
                tgt.append(t)
        row = out[doc_id]
        assert row["n_tokens"] == len(toks)
        assert row["n_masked"] == sum(masked)
        assert row["n_spans"] == k + 1
        assert row["input_text"] == " ".join(inp)
        assert row["target_text"] == " ".join(tgt)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus_st)
def test_prefix_lm_matches_model(spark, texts):
    out = {r["doc_id"]: r.asDict()
           for r in prefix_lm_pairs(_df(spark, texts)).collect()}
    for doc_id, text in enumerate(texts):
        toks = text.split()
        split = _hash60(f"{doc_id}:plm") % len(toks) if toks else 0
        row = out[doc_id]
        assert row["n_tokens"] == len(toks)
        assert row["split_pos"] == split
        assert row["input_text"] == " ".join(toks[:split])
        assert row["target_text"] == " ".join(toks[split:])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus_st)
def test_fim_matches_model(spark, texts):
    from hbase_indexer_spark.pipeline.pack import fim_transform

    out = {r["doc_id"]: r.asDict()
           for r in fim_transform(_df(spark, texts)).collect()}
    for doc_id, text in enumerate(texts):
        toks = text.split()
        n = len(toks)
        a = _hash60(f"{doc_id}:fim_a") % (n + 1)
        b = a + _hash60(f"{doc_id}:fim_b") % (n - a + 1)
        pre, mid, suf = (" ".join(toks[:a]), " ".join(toks[a:b]),
                         " ".join(toks[b:]))
        row = out[doc_id]
        assert (row["n_tokens"], row["split_a"], row["split_b"]) == (n, a, b)
        assert (row["prefix_text"], row["middle_text"],
                row["suffix_text"]) == (pre, mid, suf)
        assert row["fim_text"] == " ".join(p for p in (
            "<fim_prefix>", pre, "<fim_suffix>", suf,
            "<fim_middle>", mid) if p)
