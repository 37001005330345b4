"""Property tests for the InfluxQL select-expression parser (_Arith):
round-trip of arbitrary expression trees and precedence pins. Pure
parser work — no SparkSession."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ciws_server_spark.plans.influxql import InfluxQLError, _Arith

_FIELDS = ["hot", "cold", "flowRate", "v1"]
_AGGS = ["mean", "sum", "count", "min", "max"]
_OPS = ["+", "-", "*", "/", "%"]


def _leaf(use_aggs: bool):
    if use_aggs:
        return st.one_of(
            st.tuples(
                st.sampled_from(_AGGS), st.sampled_from(_FIELDS)
            ).map(lambda t: ("agg", t[0], t[1])),
            st.integers(0, 999).map(lambda n: ("num", str(n))),
        )
    return st.one_of(
        st.sampled_from(_FIELDS).map(lambda f: ("field", f)),
        st.integers(0, 999).map(lambda n: ("num", str(n))),
    )


def _trees(use_aggs: bool):
    return st.recursive(
        _leaf(use_aggs),
        lambda kids: st.tuples(
            st.sampled_from(_OPS), kids, kids
        ).map(tuple),
        max_leaves=8,
    )


def _render(node) -> str:
    """Fully parenthesized text for a tree — parsing must recover the
    exact tree."""
    if node[0] == "num":
        return node[1]
    if node[0] == "field":
        return node[1]
    if node[0] == "agg":
        return f"{node[1]}({node[2]})"
    return f"({_render(node[1])} {node[0]} {_render(node[2])})"


@settings(max_examples=200, deadline=None)
@given(_trees(False))
def test_raw_roundtrip(tree):
    parsed = _Arith(_render(tree))
    assert parsed.tree == tree
    assert not parsed.aggs


@settings(max_examples=200, deadline=None)
@given(_trees(True))
def test_agg_roundtrip(tree):
    parsed = _Arith(_render(tree))
    assert parsed.tree == tree
    assert not parsed.fields


def test_precedence_and_associativity():
    assert _Arith("a + b * c").tree == (
        "+", ("field", "a"), ("*", ("field", "b"), ("field", "c"))
    )
    assert _Arith("a - b - c").tree == (
        "-", ("-", ("field", "a"), ("field", "b")), ("field", "c")
    )
    assert _Arith("a / b / c").tree == (
        "/", ("/", ("field", "a"), ("field", "b")), ("field", "c")
    )
    assert _Arith("(a + b) * c").tree == (
        "*", ("+", ("field", "a"), ("field", "b")), ("field", "c")
    )


def test_alias_and_default_names():
    a = _Arith('hot + cold AS "total heat"')
    assert a.alias == "total heat"
    assert _Arith("hot + cold").alias == "hot_add_cold"
    assert _Arith("mean(hot) / 2").alias == "mean_hot_div_2"


def test_rejects():
    import pytest

    for bad in ["a +", "+ a", "a ++ b", "(a + b", "a + (b * )"]:
        with pytest.raises(InfluxQLError):
            _Arith(bad)
