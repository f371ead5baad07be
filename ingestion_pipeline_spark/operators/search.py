"""Keyword retrieval — BM25 scoring over the document corpus.

The reference's retrieval is embedding-only (Pinecone/pgvector cosine,
``chatbot/main.py:68-69``); a production corpus engine also needs the
lexical side of hybrid search. BM25 here is expressed as PURE column
math over one scan of the corpus:

- per-doc stats: ``dl = size(tokens)``, per-term ``tf =
  size(filter(tokens, t -> t = term))`` — no explode, no shuffle, all
  whole-stage codegen;
- corpus stats (N, avgdl, per-term df) reduce to a SINGLE row, which
  broadcast-cross-joins back onto the per-doc frame (a one-row build
  side — free at any corpus size);
- the score sums the per-term contributions in FIXED textual order, so
  the double result is bit-identical to an oracle computing the same
  expression (float addition is not associative; a groupBy-sum over an
  exploded term table would be partition-order dependent).

Cost at 100 TB: one corpus scan + one single-row broadcast + a top-k
(TakeOrdered) — the same envelope as the brute-force cosine scan. For
a standing query workload you would materialize the inverted index
(explode → (term, doc, tf) postings, partitioned by term); for ad-hoc
scoring this scan-side shape avoids the index entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_tokens

K1 = 1.2
B = 0.75


def _eq(w: str):
    # single-arg lambda factory: a default-arg closure (lambda t, w=w: ...)
    # would have arity 2 and PySpark's higher-order-function binding would
    # pass the ARRAY INDEX as the second argument, shadowing the default.
    return lambda t: t == F.lit(w)


def bm25_scores(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
) -> DataFrame:
    """Per-document BM25 score for a bag-of-terms query.

    Output: ``(id_col, score)`` for documents matching >= 1 term.
    """
    toks = docs.select(
        F.col(id_col),
        word_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    per_doc = toks.select(
        id_col,
        F.size("__toks").alias("__dl"),
        *[
            F.size(F.filter("__toks", _eq(w))).alias(f"__tf_{i}")
            for i, w in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg(F.col("__dl").cast("double")).alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).cast("double").alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    # fixed-order sum of per-term contributions (see module docstring)
    contrib = [
        F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df_{i}") + F.lit(0.5))
            / (F.col(f"__df_{i}") + F.lit(0.5))
        )
        * (
            F.col(f"__tf_{i}").cast("double")
            * F.lit(K1 + 1.0)
            / (
                F.col(f"__tf_{i}").cast("double")
                + F.lit(K1)
                * (
                    F.lit(1.0 - B)
                    + F.lit(B) * F.col("__dl").cast("double") / F.col("__avgdl")
                )
            )
        )
        for i in range(len(terms))
    ]
    score = contrib[0]
    for c in contrib[1:]:
        score = score + c
    return (
        scored.withColumn("score", score)
        .filter(sum((F.col(f"__tf_{i}") > 0).cast("int") for i in range(len(terms))) > 0)
        .select(id_col, "score")
    )


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k by (score desc, id) — deterministic under score ties.

    ``orderBy().limit(k)`` compiles to TakeOrdered (per-partition heap
    + k-row driver merge — no global sort, no single-partition window);
    the rank column is then numbered over just k rows."""
    from pyspark.sql.window import Window

    s = bm25_scores(docs, text_col, id_col, terms)
    top = s.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("score").desc(), F.col(id_col))),
    ).select(id_col, "score", "rank")
