"""One-round-trip double-array plan literals.

``F.array(*[F.lit(float(x)) for x in xs])`` costs one py4j round trip
per element (~0.4 ms each), so a 12x64 hyperplane set or an 8x16x8 PQ
codebook burns ~1 s of DRIVER time per plan build — that is pure
serial overhead on every query construction, at any cluster size.
Rendering the same values as one SQL ``array(...)`` literal and
letting the JVM parse it is a single round trip and bit-exact:
``repr()`` of a Python float is the shortest round-tripping decimal
string, and Java's ``Double.parseDouble`` is correctly rounded, so the
parsed IEEE-754 bits equal the original (verified incl. -0.0,
denormals, 1e-308, 1/3, +/-1.5e300).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dtxt(x) -> str:
    v = float(x)
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(v) + "D"


def _node(v) -> str:
    if isinstance(v, (str, bytes)):
        raise TypeError(f"darray takes numbers/sequences, got {type(v)}")
    try:
        items = list(v)
    except TypeError:
        return _dtxt(v)
    if not items:
        # array() alone types as array<null>; pin the element type
        return "CAST(array() AS array<double>)"
    return "array(" + ",".join(_node(x) for x in items) + ")"


def darray(values) -> Column:
    """A (possibly nested) sequence of numbers as ONE array<double...>
    plan literal — identical values to the per-element ``F.lit`` form,
    built in one JVM round trip instead of one per element."""
    return F.expr(_node(values))
