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


def _extract_from(path: str, *names: str, extra_ns: dict | None = None):
    src = open(os.path.join("/root/reference", path)).read()
    tree = ast.parse(src)
    ns: dict = dict(extra_ns or {})
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in names:
            exec(textwrap.dedent(ast.get_source_segment(src, node)), ns)
    missing = [n for n in names if n not in ns]
    assert not missing, f"reference methods not found: {missing}"
    return ns


def test_embedding_template_matches_reference(spark):
    """P3: the template string (including the f-string's indentation
    whitespace) equals consumer.py's ``_process_cve_for_embedding``."""
    import json as _json

    from ingestion_pipeline_spark.functions import extract as ex
    from ingestion_pipeline_spark.schemas import CVE_CORE_SCHEMA

    ns = _extract_from(
        "consumer/consumer.py", "_process_cve_for_embedding", extra_ns={"Dict": dict}
    )
    ref = ns["_process_cve_for_embedding"]
    cases = [
        {
            "cveMetadata": {"cveId": "CVE-2024-0001"},
            "containers": {
                "cna": {"title": "Heap overflow", "descriptions": [{"value": "Bad."}]}
            },
        },
        {
            "cveMetadata": {"cveId": "CVE-2024-0002"},
            "containers": {"cna": {"title": "", "descriptions": [{"value": ""}]}},
        },
    ]
    df = spark.createDataFrame([( _json.dumps(c),) for c in cases], "raw string")
    parsed = df.select(F.from_json("raw", CVE_CORE_SCHEMA).alias("cve"))
    got = [r["t"] for r in parsed.select(ex.embedding_text(F.col("cve")).alias("t")).collect()]
    want = [ref(None, c)["text"] for c in cases]
    assert got == want


def test_enhance_query_matches_reference(spark):
    """P9: the rewrite suffix equals chatbot/main.py's ``_enhance_query``."""
    from ingestion_pipeline_spark.functions import extract as ex

    ns = _extract_from("chatbot/main.py", "_enhance_query")
    ref = ns["_enhance_query"]
    queries = ["What is CVE-2024-1?", "hello", "CVE- prefix only", "no id here"]
    df = spark.createDataFrame([(q,) for q in queries], "q string")
    got = [r["out"] for r in df.select(ex.enhance_query(F.col("q")).alias("out")).collect()]
    want = [ref(None, q) for q in queries]
    assert got == want
