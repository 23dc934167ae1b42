"""Enforce the physical-plan properties from scripts/explain.py in pytest:
broadcasts stay broadcasts, filters stay pushed, map-only ops stay
shuffle-free, Python never enters a hot path.  Previously these asserts
lived only in the standalone script, so a plan regression could not fail
the suite."""

import contextlib
import io
import re

import pytest

import __spark_entry__ as entry
from scripts.explain import CHECKS


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = entry.queries()
    out = {}
    for name in CHECKS:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out[name] = buf.getvalue()
    return out


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_plan_shape(plans, name):
    must, must_not = CHECKS[name]
    plan = plans[name]
    for pat in must:
        assert re.search(pat, plan), f"{name}: missing /{pat}/\n{plan}"
    for pat in must_not:
        assert not re.search(pat, plan), f"{name}: found /{pat}/\n{plan}"


def test_shingle_paths_materialize_tokens(spark):
    """The token array must be a bound attribute behind a Generate barrier
    before any element-access lambda: interpreted HOF lambdas re-evaluate
    referenced expression trees per element, so an inlined tokenizer
    re-splits the doc per gram — O(tokens^2), measured 46x on 5k-token
    docs.  Two Generates in the plan = barrier + the gram explode."""
    from hbase_indexer_spark.pipeline.dedup import doc_spans, exploded_shingles

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    for df in (exploded_shingles(docs, 3), doc_spans(docs, 2)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Generate") >= 2, plan
