"""Property-based tests (hypothesis) for the engine-independent layers."""

from __future__ import annotations

import decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from data_bridge_spark.functions.templating import render_sql, sql_literal

ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)
scalar = st.one_of(
    st.integers(-(10**9), 10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=30),
    st.none(),
    st.booleans(),
)


@given(st.dictionaries(ident, scalar, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_every_placeholder_renders(params):
    sql = " AND ".join(f"c_{k} = ::{k}::" for k in params)
    out = render_sql(sql, params)
    assert "::" not in out


@given(st.text())
@settings(max_examples=200, deadline=None)
def test_string_literal_quote_balance(s):
    lit = sql_literal(s)
    assert lit.startswith("'") and lit.endswith("'")
    # interior single quotes are all doubled: stripping the outer quotes
    # and undoing the escaping must round-trip
    assert lit[1:-1].replace("''", "'") == s


@given(st.lists(st.integers(-1000, 1000), min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_list_literal_expansion(xs):
    lit = sql_literal(xs)
    if not xs:
        assert lit == "NULL"
    else:
        assert lit == ", ".join(str(x) for x in xs)


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=30, deadline=None)
def test_decimal_sum_is_order_insensitive(xs):
    """The invariant functions/exact.py is built on: decimal-quantized
    sums are identical for any permutation (float sums are not)."""
    q = decimal.Decimal(1).scaleb(-6)
    dxs = [decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP) for x in xs]
    forward = sum(dxs)
    backward = sum(reversed(dxs))
    interleaved = sum(sorted(dxs, key=lambda d: (hash(str(d)) % 7)))
    assert forward == backward == interleaved
