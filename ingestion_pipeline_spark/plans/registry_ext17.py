"""Seventeenth registry tranche: corpus selection under a token budget
and unigram-surprisal (perplexity-proxy) scoring — the filtering steps
between raw-corpus scoring and sequence packing.

Token-budget selection is the greedy knapsack every data-mixture run
performs: within each source, admit documents best-quality-first until
the source's token budget is crossed. Expressed as ONE running-sum
window over a deterministic ordering key (rounded quality, doc_id
tie-break), so engines agree on the exact admitted set.

Unigram surprisal is the classic CCNet/KenLM-style perplexity filter
with the corpus itself as the language model: mean -log2 p(word) per
document, where p comes from corpus-wide word frequencies. High
surprisal = unnatural/garbled text, low = boilerplate; both tails get
cut in production. Two aggregation passes (frequency table, per-doc
mean) and one hash join — no model artifact needed, fully
SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet_tables import table
from .registry import register
from .registry_ext import QUALITY_EXPR_SQL, QUALITY_PARTS_SQL, _TOKS

_BUDGET = 800  # tokens per source


@register(
    "pipeline_token_budget_select",
    f"""
    WITH parts AS ({QUALITY_PARTS_SQL}),
    q AS (SELECT doc_id, n_tokens, {QUALITY_EXPR_SQL} AS quality FROM parts),
    j AS (
        SELECT d.doc_id, d.source, q.n_tokens, q.quality
        FROM documents d JOIN q ON d.doc_id = q.doc_id
        WHERE q.n_tokens > 0
    ),
    c AS (
        SELECT doc_id, source, n_tokens, quality,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY quality DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum
        FROM j
    )
    SELECT doc_id, source, n_tokens, quality, cum
    FROM c WHERE cum - n_tokens < {_BUDGET}
    """,
    "Greedy token-budget selection (the data-mixture knapsack): within "
    "each source, documents are admitted best-quality-first until the "
    f"{_BUDGET}-token budget is crossed (a doc enters iff the budget "
    "isn't exhausted when it starts, so the set is deterministic and "
    "the budget is overshot by at most one document). Ordering key is "
    "the ROUNDED quality score + doc_id tie-break — engines agree on "
    "the exact admitted set. One window shuffle on the source key, "
    "same scale shape as sequence packing.",
)
def pipeline_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score, token_count

    docs = table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = q.withColumn("cum", F.sum("n_tokens").over(w))
    return c.filter(F.col("cum") - F.col("n_tokens") < _BUDGET).select(
        "doc_id", "source", "n_tokens", "quality", "cum"
    )


@register(
    "tx_unigram_surprisal",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS w FROM documents
    ),
    freq AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM freq),
    per AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
    terms AS (
        SELECT p.doc_id, p.tf,
               CAST(p.tf AS DOUBLE) * (-log2(f.c / tot.n)) AS term
        FROM per p JOIN freq f ON p.w = f.w CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           ROUND(list_aggregate(list_sort(list(term)), 'sum')
                 / CAST(SUM(tf) AS DOUBLE), 6) AS mean_surprisal
    FROM terms GROUP BY doc_id
    """,
    "Unigram-surprisal scoring (CCNet/KenLM perplexity-filter shape, "
    "with the corpus itself as the LM): mean -log2 p(word) per document "
    "from corpus-wide frequencies. Production cuts both tails — high = "
    "garbled, low = boilerplate. Two aggregations + one hash join on "
    "the token; the frequency table is Zipf-skewed but the join is a "
    "plain shuffle hash join (hot words hash-spread across tasks, and "
    "in practice the head of the vocabulary broadcasts). Lowercased "
    "whitespace tokens, same tokenizer as every tx_* oracle. The "
    "per-doc mean folds the per-word terms in SORTED order on both "
    "engines (the dq_psi_drift sorted-fold discipline) — a bare "
    "AVG(double) would be partition-order dependent and could flake "
    "at a 6-dp rounding boundary.",
)
def tx_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_tokens

    docs = table(spark, sf_dir, "documents")
    # tok feeds BOTH aggregations (corpus frequencies + per-doc tf) and
    # freq feeds the totals AND the term join — without materialization
    # the compiled plan re-ran the full scan+tokenize+explode per
    # branch (r12 scan census: 6 parquet scans). One tokenize pass,
    # skinny (doc_id, w) rows + the vocab-bounded count table
    # checkpointed (guide §2.4).
    tok = docs.select(
        "doc_id", F.explode(word_tokens(F.lower(F.col("text")))).alias("w")
    ).localCheckpoint(eager=False)
    freq = tok.groupBy("w").agg(F.count("*").alias("c")).localCheckpoint(
        eager=False
    )
    tot = freq.agg(F.sum("c").cast("double").alias("n"))
    per = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    terms = per.join(freq, "w").join(F.broadcast(tot)).select(
        "doc_id",
        "tf",
        (F.col("tf").cast("double") * -F.log2(F.col("c") / F.col("n"))).alias("term"),
    )
    folded = F.aggregate(
        F.array_sort(F.collect_list("term")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return terms.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.round(
            folded / F.sum("tf").cast("double"), 6
        ).alias("mean_surprisal"),
    )
