"""Property-based tests (hypothesis): Spark expression helpers agree
with plain-Python models on arbitrary input. One Spark job per example
batch keeps runtime sane."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

_TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po"), max_codepoint=0x2FF
    ),
    max_size=80,
)


def _py_normalized(s: str) -> str:
    s = re.sub(r"[^a-z0-9 ]", "", s.lower())
    return re.sub(r" +", " ", s).strip()


def _py_shingles(s: str, n: int = 3) -> list[str]:
    t = s.split(" ")
    return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]


def _py_rolling(s: str, base: int = 131, mod: int = 1_000_000_007) -> int:
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % mod
    return h


@settings(max_examples=12, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=12))
def test_normalized_matches_python_model(spark, texts):
    from ciws_server_spark.functions.text import normalized

    df = spark.createDataFrame([(t,) for t in texts], ["text"]).select(
        normalized("text").alias("n")
    )
    got = [r["n"] for r in df.collect()]
    # Spark lower() is locale-insensitive UTF8 lower; restrict the
    # assertion to the ASCII-lowerable examples the model covers
    assert got == [_py_normalized(t) for t in texts]


@settings(max_examples=12, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=12))
def test_shingles_match_python_model(spark, texts):
    from ciws_server_spark.functions.text import word_shingles

    df = spark.createDataFrame([(t,) for t in texts], ["text"]).select(
        word_shingles("text", 3).alias("sh")
    )
    got = [list(r["sh"]) for r in df.collect()]
    assert got == [_py_shingles(t) for t in texts]


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127), max_size=60), min_size=1, max_size=12))
def test_rolling_hash_matches_python_model(spark, texts):
    from ciws_server_spark.operators.text_analysis import _RH_BASE, _RH_MOD

    codes = F.transform(F.split(F.col("text"), ""), lambda ch: F.ascii(ch))
    rh = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _RH_BASE + c.cast("long")) % _RH_MOD,
    )
    df = spark.createDataFrame([(t,) for t in texts], ["text"]).select(
        rh.alias("h")
    )
    got = [r["h"] for r in df.collect()]
    assert got == [_py_rolling(t) for t in texts]
