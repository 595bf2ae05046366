"""Text-operator unit tests for the pieces without SQL oracles
(fingerprint: xxhash64-based; language scores)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators import text as T


def _one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_fingerprint_deterministic_and_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "the quick brown foxes")],
        "id long, text string",
    )
    rows = {
        r["id"]: r["fp"]
        for r in df.select("id", T.doc_fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert rows[1] == rows[2]          # same text → same fingerprint
    assert rows[1] != rows[3]          # one token differs → different
    assert 0 <= rows[1] < (1 << 56)    # bounded by the modulus
    again = {
        r["id"]: r["fp"]
        for r in df.select("id", T.doc_fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert rows == again               # re-execution stable


def test_detect_language_obvious_cases(spark):
    cases = [
        ("the cat is in the house and it is warm", "en"),
        ("der Hund ist nicht zu Hause und das ist gut", "de"),
        ("le chat est dans la maison et il est content", "fr"),
        ("xyzzy plugh 12345", "und"),
    ]
    df = spark.createDataFrame(cases, "text string, want string")
    out = df.select("want", T.detect_language(F.col("text")).alias("got")).collect()
    for r in out:
        assert r["got"] == r["want"], f"{r['want']} misdetected as {r['got']}"


def test_quality_score_orders_sensibly(spark):
    good = "A reasonably long, well formed document with many distinct words " * 4
    bad = "!!! ??? *** !!! ??? ***"
    df = spark.createDataFrame([(1, good), (2, bad)], "id long, text string")
    rows = {
        r["id"]: r["q"]
        for r in df.select("id", T.quality_score(F.col("text")).alias("q")).collect()
    }
    assert rows[1] > rows[2]
    assert 0.0 <= rows[2] <= rows[1] <= 1.0


def test_token_counts_agree_on_simple_text(spark):
    df = _one(spark, "hello world 123")
    r = df.select(
        T.whitespace_token_count(F.col("text")).alias("ws"),
        T.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r["ws"] == 3
    # hello(2) + world(2) + 123(1) started-4-char chunks
    assert r["bpe"] == 2 + 2 + 1


def test_space_tokens_equals_hof_filter_on_adversarial_strings(spark):
    """space_tokens (array_remove form, round-8) must produce the exact
    array the higher-order filter(split(text,' '), t -> t != '') it
    replaced produced — same tokens, same order — on every empty-token
    shape: leading/trailing/multiple spaces, all-space, empty, NULL,
    tabs (NOT separators under a single-space split), and unicode."""
    cases = [
        "hello world",
        "  leading",
        "trailing   ",
        "a  b   c",
        "   ",
        "",
        None,
        "tab\tseparated stays",
        "ünï¢ödé  tøkens",
        " x ",
        "a",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = df.select(
        T.space_tokens("text", lower=False).alias("fast"),
        F.filter(
            F.split("text", " "), lambda t: t != ""
        ).alias("hof"),
    ).collect()
    for row, case in zip(got, cases):
        assert row["fast"] == row["hof"], case


def test_space_tokens_lower_matches_hof_lower(spark):
    df = spark.createDataFrame([("A  Bb C ",), ("ÉÉ x",)], "text string")
    got = df.select(
        T.space_tokens("text").alias("fast"),
        F.filter(
            F.split(F.lower("text"), " "), lambda t: t != ""
        ).alias("hof"),
    ).collect()
    for row in got:
        assert row["fast"] == row["hof"]


def test_tokens_ws_class_equals_hof_form(spark):
    """operators/text.tokens (array_remove over the whitespace-class
    split) must equal its original HOF form across boundary-empty
    shapes."""
    cases = ["a\tb\nc", " \t x ", "", None, "one", "\x0b sep \f"]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = df.select(
        T.tokens(F.col("text")).alias("fast"),
        F.filter(
            F.split(F.lower("text"), T.TOKEN_SPLIT_RE), lambda t: t != ""
        ).alias("hof"),
    ).collect()
    for row, case in zip(got, cases):
        assert row["fast"] == row["hof"], case
