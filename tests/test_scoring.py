"""Golden tests for V9/V10 — the reference's exact scoring semantics
(llama-chatbot/main.py:168-215; eval.py:16-30)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ingestion_pipeline_spark.functions import scoring as sc


def _conf(
    spark, has_vector: bool, completeness: float, vec_words: int, nvd_words: int
) -> float:
    vec_text = " ".join(["w"] * vec_words) if vec_words else None
    nvd_text = " ".join(["n"] * nvd_words) if nvd_words else None
    df = spark.createDataFrame(
        [(has_vector, completeness, vec_text, nvd_text)],
        "has_vector boolean, completeness double, vec string, nvd string",
    )
    base = sc.base_confidence(F.col("has_vector"), F.col("completeness"))
    llm = sc.llm_confidence(F.col("vec"), F.col("nvd"))
    return df.select(sc.final_confidence(base, llm).alias("c")).first()["c"]


def _expected(has_vector: bool, completeness: float, vec_words: int, nvd_words: int) -> float:
    """The reference's arithmetic in plain Python (main.py:195-215,172)."""
    base = min(1.0, max(0.0, 0.5 + (0.25 if has_vector else 0.0) + 0.25 * completeness))
    vector_score = vec_words / 100 if vec_words else 0
    nvd_score = nvd_words / 100 if nvd_words else 0
    llm = min(1.0, max(0.0, 0.6 * vector_score + 0.4 * nvd_score))
    return round(0.7 * base + 0.3 * llm, 2)


def test_confidence_reference_constants(spark):
    # base saturates; llm = 0.6*2.0 + 0.4*0.5 = 1.6 → clamp 1.0
    assert _conf(spark, True, 1.0, 200, 50) == 1.0 == _expected(True, 1.0, 200, 50)
    # both evidence legs absent → llm = 0
    assert _conf(spark, False, 0.0, 0, 0) == 0.35 == _expected(False, 0.0, 0, 0)
    # NO per-leg cap: 150 vector words alone give 0.6*1.5 = 0.9, not 0.6
    got = _conf(spark, False, 2 / 3, 150, 0)
    assert got == _expected(False, 2 / 3, 150, 0)
    base = 0.5 + 0.25 * (2 / 3)
    assert got == round(0.7 * base + 0.3 * 0.9, 2)
    # mixed: one leg each
    assert _conf(spark, True, 1 / 3, 40, 10) == _expected(True, 1 / 3, 40, 10)


def test_confidence_clamped(spark):
    got = _conf(spark, True, 1.0, 10_000, 10_000)
    assert 0.0 <= got <= 1.0


def test_completeness_ratio(spark):
    df = spark.createDataFrame([(1,)], "x int")
    got = df.select(
        sc.completeness_ratio(F.lit(True), F.lit(False), F.lit(True)).alias("r")
    ).first()["r"]
    assert abs(got - 2 / 3) < 1e-12


def test_rag_verdicts(spark):
    """eval.py:22-30 — FP if any response phrase not in context; FN if
    any context phrase not in response; TP otherwise; FP wins. The
    empty phrase from a trailing '.' is a real set member."""
    cases = [
        ("a. b.", "a. b.", "TP"),
        ("a. x.", "a. b.", "FP"),      # x not in context
        ("a.", "a. b.", "FN"),         # b not in response
        ("x.", "a.", "FP"),            # both hold → FP (checked first)
        ("A.  b.", "a. b.", "TP"),     # case/whitespace normalization
        ("foo", "foo.", "FN"),         # '' in context set, missing from response
        ("foo.", "foo", "FP"),         # '' in response set, not in context
        ("foo.", "foo.", "TP"),        # '' on both sides cancels
    ]
    df = spark.createDataFrame(cases, "resp string, ctx string, want string")
    rows = df.select("want", sc.rag_verdict(F.col("resp"), F.col("ctx")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["want"], r


def test_verification_status(spark):
    """J2 status — verified iff both present (llama-chatbot/main.py:183)."""
    df = spark.createDataFrame(
        [(True, True), (True, False), (False, True), (False, False)], "v boolean, r boolean"
    )
    got = [r["s"] for r in df.select(sc.verification_status(F.col("v"), F.col("r")).alias("s")).collect()]
    assert got == ["verified", "partial", "partial", "partial"]
