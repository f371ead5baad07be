"""Pluggable embedding / LLM UDFs (SURVEY §2.10 V1/V2/V6).

The reference calls OpenAI ada-002 per record (``consumer/
consumer.py:117-120``) and MiniLM via HuggingFace (``chatbot_pg/
main.py:30``). Engine stance: the embedding model is a *pluggable
Arrow-batched pandas UDF*; the vector dimension is a property of the
data, not a constant. Tests and fixtures use the deterministic hashing
embedder (no model deps, stable across runs); production swaps in an
API/model-backed series function with the identical signature.

All UDFs here are Series→Series pandas UDFs: one Arrow batch per call,
never per-row Python.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType
from pyspark.sql.functions import pandas_udf


def hashing_embedder(dim: int = 64, normalize: bool = True) -> Callable[[pd.Series], pd.Series]:
    """Deterministic, dependency-free text embedder: token hashing into
    ``dim`` buckets with +/-1 signs (the classic hashing trick), then
    L2 normalization. Stable across runs/machines — the test stand-in
    for ada-002/MiniLM (V1/V2). ``normalize=False`` keeps the raw
    integer bucket counts (used by the oracle-verified gate query —
    integer space compares exactly across engines)."""

    def embed_series(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            vec = [0.0] * dim
            for tok in str(text or "").lower().split():
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")  # noqa: S324
                vec[h % dim] += 1.0 if (h >> 63) & 1 == 0 else -1.0
            if not normalize:
                out.append(vec)
                continue
            norm = math.sqrt(sum(v * v for v in vec))
            out.append([v / norm for v in vec] if norm > 0 else vec)
        return pd.Series(out)

    return embed_series


def embedding_udf(series_fn: Callable[[pd.Series], pd.Series] | None = None, dim: int = 64):
    """Wrap a Series→Series embedding function as an Arrow-batched UDF
    returning array<float> (V1/V2)."""
    fn = series_fn or hashing_embedder(dim)
    return pandas_udf(fn, ArrayType(FloatType()))


def with_embedding(df: DataFrame, text_col: str = "text", series_fn=None, dim: int = 64) -> DataFrame:
    """The K2 embed step as a column add — batch or streaming alike."""
    return df.withColumn("embedding", embedding_udf(series_fn, dim)(F.col(text_col)))


def llm_udf(completion_fn: Callable[[pd.Series], pd.Series] | None = None):
    """V6 — LLM completion as a batched pandas UDF. The completion
    function is injectable (tests use a deterministic template; wiring a
    real chat API means swapping this one function). Default fake echoes
    a truncated prompt-derived answer — deterministic, offline."""

    def default_fn(prompts: pd.Series) -> pd.Series:
        return prompts.map(lambda p: f"ANSWER[{str(p)[:40]}]")

    return pandas_udf(completion_fn or default_fn, "string")
