"""Unit tests for the §2.8 scalar helpers (P4-P7) against F1-style
inputs, including the negative fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_extract_site_metadata(spark):
    from ciws_server_spark.functions.scalar import extract_site_metadata

    rows = [
        ("Site #: 0042QC",),
        ("Site #: 0042",),
        ("Datalogger #: 0007",),
        ("Garbled nonsense without digits",),
    ]
    df = spark.createDataFrame(rows, ["line"]).select(
        extract_site_metadata(F.col("line")).alias("m")
    )
    got = [(r["m"]["id"], r["m"]["qc"]) for r in df.collect()]
    # leading zeros consumed by the reference regex prefix class
    assert got == [("42", True), ("42", False), ("7", False), ("", False)]


def test_normalize_site_name(spark):
    from ciws_server_spark.functions.scalar import normalize_site_name

    df = spark.createDataFrame(
        [("Site #1 Main",), ("B: East",)], ["s"]
    ).select(normalize_site_name("s").alias("n"))
    assert [r["n"] for r in df.collect()] == ["site_1main", "beast"]


def test_parse_event_time_yearfirst(spark):
    from ciws_server_spark.functions.scalar import parse_event_time

    df = spark.createDataFrame(
        [("2021-03-01 00:00:04",), ("not a time",)], ["t"]
    ).select(parse_event_time("t").alias("ts"))
    got = [r["ts"] for r in df.collect()]
    assert str(got[0]) == "2021-03-01 00:00:04"
    assert got[1] is None


def test_word_shingles_short_docs(spark):
    from ciws_server_spark.functions.text import word_shingles

    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",)], ["text"]
    ).select(word_shingles("text", 3).alias("sh"))
    got = [r["sh"] for r in df.collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # shorter than n → empty, not descending sequence
    assert got[2] == []


def test_md5_normalized_matches_expression_form(spark):
    """The Arrow/RE2 fingerprint fast path is bit-identical to the
    JVM expression form md5(normalized(text)) — the contract that
    lets the DuckDB oracle keep validating the operators that use it
    (the expression form measured 23.6s of regex replacement over
    sf10's 500k docs; the Arrow path ~20x faster)."""
    from pyspark.sql import functions as F

    from ciws_server_spark.functions.text import md5_normalized, normalized

    rows = [
        ("Hello, World!  42x",),
        ("  A  b  ",),
        ("ALL CAPS AND   spaces",),
        ("unicode: café ñ 北京",),
        ("",),
        (None,),
        ("a" * 5000 + "!?" + "B" * 100,),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = df.select(
        md5_normalized("text").alias("fast"),
        F.md5(normalized("text")).alias("expr"),
    ).collect()
    for r in got:
        assert r["fast"] == r["expr"], (r["fast"], r["expr"])


def test_pair_cosine_matches_hof_form(spark):
    """pair_cosine (Arrow per-dimension fold) is bit-identical to the
    interpreted zip_with/aggregate HOF cosine, including on vectors
    whose pairwise sums would round differently under numpy's default
    pairwise summation."""
    import random

    from pyspark.sql import functions as F

    from ciws_server_spark.functions.vectors import cosine, pair_cosine

    rng = random.Random(7)
    rows = [
        (
            [rng.uniform(-10, 10) for _ in range(64)],
            [rng.uniform(-10, 10) for _ in range(64)],
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = df.select(
        pair_cosine(F.col("a"), F.col("b")).alias("fast"),
        cosine(F.col("a"), F.col("b")).alias("hof"),
    ).collect()
    for r in got:
        assert r["fast"] == r["hof"], (r["fast"], r["hof"])
