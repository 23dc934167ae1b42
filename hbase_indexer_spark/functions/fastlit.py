"""One-parse numeric array literals.

Building a large constant array with ``F.array(*[F.lit(x) for x in xs])``
costs one py4j round trip per element plus one per ``cast``; a 16x64
codebook written that way takes ~1-3 s of single-threaded DRIVER time per
reference (measured: 2.5 s for the 8x16x8 PQ book), which dominated the
ANN/LSH query walls at bench scale — the guide §7.3 "driver is doing
something single-threaded" signature.  Rendering the same constant as ONE
SQL array literal and parsing it with ``F.expr`` is a single py4j call and
one JVM parse (~5 ms measured), and Catalyst constant-folds the parsed
``CreateArray`` tree to the identical ``Literal`` value the element-wise
form produced, so plans, types and results are bit-exact-unchanged.

Only finite numbers are supported: every value is rendered with an
explicit type suffix (``L`` for bigint, ``D`` for double) or cast, so the
parsed literal's Catalyst type matches what ``F.lit(...).cast(...)``
produced before.  Python ``repr`` of a float is the shortest string that
round-trips to the same IEEE-754 double, and Spark's parser reads double
literals with ``Double.parseDouble`` (correctly-rounded), so the double
path is bit-exact too.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_SUFFIX = {"bigint": "L", "double": "D", "int": ""}


def _fmt(v, elem: str) -> str:
    if isinstance(v, (list, tuple)):
        return "array(" + ",".join(_fmt(x, elem) for x in v) + ")"
    if elem == "double":
        v = float(v)
        if not math.isfinite(v):
            raise ValueError(f"non-finite literal {v!r} not supported")
        return repr(v) + "D"
    return str(int(v)) + _SUFFIX[elem]


def _depth(v) -> int:
    d = 0
    while isinstance(v, (list, tuple)):
        d += 1
        v = v[0] if len(v) else 0
    return d


def array_lit(values, elem: str = "bigint") -> Column:
    """A (possibly nested) array literal Column of ``elem`` type
    (``bigint`` | ``double`` | ``int``) built with ONE expression parse.

    ``array_lit([[1, 2], [3, 4]], "bigint")`` is semantically identical to
    ``F.array(F.array(F.lit(1).cast("long"), ...), ...)`` — same Catalyst
    type, same folded Literal — at O(1) py4j calls instead of O(n)."""
    if elem not in _SUFFIX:
        raise ValueError(f"unsupported element type {elem!r}")
    typ = elem
    for _ in range(_depth(values)):
        typ = f"array<{typ}>"
    return F.expr(f"CAST({_fmt(values, elem)} AS {typ})")
