"""Reference-parity golden tests (VERDICT r3 directives #2/#3).

These load the PUBLIC reference's own Python — ``eval.py``'s
``evaluate_rag_response`` (imported; it is dependency-free) and
``main.py``'s ``assess_verification_with_llm`` /
``calculate_confidence_score`` (extracted by source segment via ``ast``
because main.py's module imports need network services) — and run it
verbatim against the column implementations. No reference code is
copied into this repo; it is read from ``/root/reference`` at test
time and skipped when absent.

A self-consistent oracle cannot catch a transcription error; executing
the reference itself can.
"""

from __future__ import annotations

import ast
import importlib.util
import os
import textwrap

import pytest
import pyspark.sql.functions as F

from ingestion_pipeline_spark.functions import scoring as sc

REF = "/root/reference/llama-chatbot"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


def _load_eval_module():
    spec = importlib.util.spec_from_file_location("ref_eval", os.path.join(REF, "eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _extract_methods(*names: str):
    """Pull named method bodies out of main.py by AST source segment and
    exec them as plain functions (self-free: they never touch self state
    beyond being methods)."""
    src = open(os.path.join(REF, "main.py")).read()
    tree = ast.parse(src)
    ns: dict = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in names:
            seg = textwrap.dedent(ast.get_source_segment(src, node))
            exec(seg, ns)
    missing = [n for n in names if n not in ns]
    assert not missing, f"reference methods not found: {missing}"
    return ns


RAG_CASES = [
    ("a. b.", "a. b."),
    ("a. x.", "a. b."),
    ("a.", "a. b."),
    ("x.", "a."),
    ("A.  b.", "a. b."),
    ("foo", "foo."),     # trailing-dot asymmetry: must be FN
    ("foo.", "foo"),     # reverse: must be FP
    ("foo.", "foo."),
    ("", ""),
    ("one two. three", "one two.  three"),
]


def test_rag_verdict_matches_reference_eval(spark):
    ref = _load_eval_module()
    df = spark.createDataFrame(RAG_CASES, "resp string, ctx string")
    got = {
        (r["resp"], r["ctx"]): r["v"]
        for r in df.select(
            "resp", "ctx", sc.rag_verdict(F.col("resp"), F.col("ctx")).alias("v")
        ).collect()
    }
    for resp, ctx in RAG_CASES:
        want = ref.evaluate_rag_response(ctx, resp)["Value"]
        assert got[(resp, ctx)] == want, (resp, ctx, got[(resp, ctx)], want)


CONF_CASES = [
    # (vector_results, nvd_data) exactly as the reference signature takes them
    ("some vector answer text here", {"vulnerabilities": 1, "descriptions": 1, "metrics": 1}),
    ("", None),
    (" ".join(["w"] * 150), None),                  # >100 words: no per-leg cap
    (None, {"vulnerabilities": 1}),
    ("short answer", {"descriptions": "long " * 80}),
    (" ".join(["w"] * 500), {"metrics": "m " * 400}),  # outer clamp binds
]


def test_llm_confidence_matches_reference(spark):
    ns = _extract_methods("assess_verification_with_llm", "calculate_confidence_score")
    assess = ns["assess_verification_with_llm"]

    rows = []
    for vec, nvd in CONF_CASES:
        vec_text = str(vec) if vec else None
        nvd_text = str(nvd) if nvd else None
        want = assess(None, vec, nvd)  # self is unused
        rows.append((vec_text, nvd_text, float(want)))
    df = spark.createDataFrame(rows, "vec string, nvd string, want double")
    out = df.select(
        "want", sc.llm_confidence(F.col("vec"), F.col("nvd")).alias("got")
    ).collect()
    for r in out:
        assert abs(r["got"] - r["want"]) < 1e-12, (r["got"], r["want"])


def test_base_confidence_matches_reference(spark):
    ns = _extract_methods("assess_verification_with_llm", "calculate_confidence_score")
    calc = ns["calculate_confidence_score"]
    key_fields = ["vulnerabilities", "descriptions", "metrics"]
    cases = [
        ("vec", {"vulnerabilities": 1, "descriptions": 1, "metrics": 1}),
        ("vec", {"vulnerabilities": 1}),
        (None, {"descriptions": 1, "metrics": 1}),
        (None, None),
        ("vec", None),
    ]
    rows = []
    for vec, nvd in cases:
        want = calc(None, vec, nvd)
        completeness = (
            sum(1 for f in key_fields if nvd and f in nvd) / len(key_fields)
        )
        rows.append((bool(vec), float(completeness), float(want)))
    df = spark.createDataFrame(rows, "has_vector boolean, completeness double, want double")
    out = df.select(
        "want",
        sc.base_confidence(F.col("has_vector"), F.col("completeness")).alias("got"),
    ).collect()
    for r in out:
        assert abs(r["got"] - r["want"]) < 1e-12, (r["got"], r["want"])
