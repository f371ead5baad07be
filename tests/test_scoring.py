"""Golden tests for V9/V10 — the reference's exact scoring constants
(llama-chatbot/main.py:168-215; eval.py:16-30)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ingestion_pipeline_spark.functions import scoring as sc


def _conf(spark, has_vector: bool, completeness: float, words: int) -> float:
    df = spark.createDataFrame(
        [(has_vector, completeness, " ".join(["w"] * words))],
        "has_vector boolean, completeness double, answer string",
    )
    base = sc.base_confidence(F.col("has_vector"), F.col("completeness"))
    llm = sc.llm_confidence(base, F.col("answer"))
    return df.select(sc.final_confidence(base, llm).alias("c")).first()["c"]


def test_confidence_reference_constants(spark):
    # base = 0.5 + 0.25 + 0.25*1 = 1.0; llm = 0.6*1 + 0.4*min(1,200/100)=1.0
    # final = round(0.7 + 0.3, 2) = 1.0
    assert _conf(spark, True, 1.0, 200) == 1.0
    # base = 0.5; words=0 → llm = 0.3; final = round(0.35+0.09,2)=0.44
    assert _conf(spark, False, 0.0, 0) == 0.44
    # base = 0.5+0.25*2/3 = 0.666...; llm = 0.6*base + 0.4*0.5
    base = 0.5 + 0.25 * (2 / 3)
    llm = 0.6 * base + 0.4 * 0.5
    assert _conf(spark, False, 2 / 3, 50) == round(0.7 * base + 0.3 * llm, 2)


def test_confidence_clamped(spark):
    got = _conf(spark, True, 1.0, 10_000)
    assert 0.0 <= got <= 1.0


def test_completeness_ratio(spark):
    df = spark.createDataFrame([(1,)], "x int")
    got = df.select(
        sc.completeness_ratio(F.lit(True), F.lit(False), F.lit(True)).alias("r")
    ).first()["r"]
    assert abs(got - 2 / 3) < 1e-12


def test_rag_verdicts(spark):
    """eval.py:22-30 — FP if any response phrase not in context; FN if
    any context phrase not in response; TP otherwise; FP wins."""
    cases = [
        ("a. b.", "a. b.", "TP"),
        ("a. x.", "a. b.", "FP"),      # x not in context
        ("a.", "a. b.", "FN"),         # b not in response
        ("x.", "a.", "FP"),            # both hold → FP (checked first)
        ("A.  b.", "a. b.", "TP"),     # case/whitespace normalization
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
