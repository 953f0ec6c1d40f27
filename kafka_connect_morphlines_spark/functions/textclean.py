"""Text cleaning / filtering operators for training-data pipelines: PII
redaction, HTML stripping, repetition statistics (the Gopher/C4-style
quality-filter family), token-distribution entropy.

Scale posture: redaction and stripping are pure codegen ``regexp_replace``
chains (map-only, zero shuffle — the scan is the only cost at 100 TB);
repetition and entropy aggregate an exploded token/shingle frame through
TWO-LEVEL groupBy ((doc, gram) -> doc) so the distinct count never plans an
expand pass and both levels keep map-side partial aggregation.

Regex patterns are deliberately RE2-compatible (no lookarounds) so the same
pattern text runs on Spark (java.util.regex) and external engines (DuckDB
oracles, RE2-based scanners) with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kafka_connect_morphlines_spark.functions.textstats import tokens_codegen

# (pattern, replacement) chain, applied in order.  SSN before phone (3-2-4
# vs 3-3-4 grouping), email first (its local part may contain digits that
# later patterns would chew up).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails / SSNs / phone numbers / IPv4 literals with typed
    placeholder tokens — a codegen ``regexp_replace`` chain, map-only."""
    out = text
    for pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def strip_html(text: Column) -> Column:
    """Drop HTML/XML tags and collapse the whitespace they leave behind
    (the C4-style markup scrub).  Tags become single spaces so adjacent
    words don't fuse; entities are left alone (they're content)."""
    no_tags = F.regexp_replace(text, r"<[^>]+>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def _grams_exploded(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, _g): one row per word n-gram, fully codegen (explode the start
    index, build the gram with array_join(slice(...)); docs shorter than n
    tokens yield no rows)."""
    toks = tokens_codegen(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_t"), (F.size(toks) - (n - 1)).alias("_k"))
    return (
        base.filter(F.col("_k") > 0)
        .select(F.col(id_col), "_t", F.explode(F.sequence(F.lit(1), F.col("_k"))).alias("_i"))
        .select(F.col(id_col), F.array_join(F.slice("_t", F.col("_i"), n), " ").alias("_g"))
    )


def repetition_stats_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """(id, n_grams, dup_gram_frac): fraction of word n-grams that are
    repeats — the Gopher repetition quality signal.  Two-level groupBy:
    (doc, gram) counts first, then per-doc totals; no countDistinct expand,
    both aggregations partial-combine map-side."""
    lvl1 = _grams_exploded(df, text_col, id_col, n).groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    lvl2 = lvl1.groupBy(id_col).agg(F.sum("_c").alias("n_grams"), F.count(F.lit(1)).alias("_distinct"))
    total = F.col("n_grams")
    return lvl2.select(
        F.col(id_col),
        total,
        F.when(total > 0, 1.0 - F.col("_distinct") / total).otherwise(F.lit(0.0)).alias("dup_gram_frac"),
    )


def word_entropy_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, entropy): Shannon entropy of the token distribution in nats,
    computed as ln(n) - sum(c*ln(c))/n so the whole thing is ONE pass over
    the (doc, token) counts — no per-token probability join back."""
    ex = df.select(F.col(id_col), F.explode(tokens_codegen(F.col(text_col))).alias("_t"))
    lvl1 = ex.groupBy(id_col, "_t").agg(F.count(F.lit(1)).cast("double").alias("_c"))
    n = F.sum("_c")
    s = F.sum(F.col("_c") * F.log(F.col("_c")))
    return lvl1.groupBy(id_col).agg((F.log(n) - s / n).alias("entropy"))


def gopher_filter_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    max_tokens: int = 50_000,
    min_stopword_ratio: float = 0.02,
    min_unique_ratio: float = 0.4,
    max_dup_gram_frac: float = 0.05,
) -> DataFrame:
    """Gopher-style composite corpus filter (Rae et al. 2021, §A1.1):
    length, stopword, lexical-diversity, and repetition rules combined into
    one verdict per document, with the failed-rule list kept for audit.

    Output: (id, passed, reasons) — ``reasons`` is a comma-joined,
    fixed-order list of failed rules ('' when passed).

    Shape: the length/stopword/diversity signals are the map-only
    quality_features_df projection; repetition adds its two-level groupBy;
    one join on the doc id reunites them (docs with <2 tokens have no
    bigram row — treated as repetition 0).  Nothing here touches the text
    twice: at 100 TB the cost is one scan + the bigram aggregation.
    """
    from kafka_connect_morphlines_spark.functions.textstats import quality_features_df

    q = quality_features_df(df, text_col, id_col)
    r = repetition_stats_df(df, text_col, id_col, n=2).select(id_col, "dup_gram_frac")
    j = q.join(r, id_col, "left").withColumn(
        "dup_gram_frac", F.coalesce(F.col("dup_gram_frac"), F.lit(0.0))
    )
    rules = [
        ("too_short", F.col("n_tokens") < min_tokens),
        ("too_long", F.col("n_tokens") > max_tokens),
        ("low_stopword", F.col("stopword_ratio") < min_stopword_ratio),
        ("low_diversity", F.col("unique_token_ratio") < min_unique_ratio),
        ("repetitive", F.col("dup_gram_frac") > max_dup_gram_frac),
    ]
    # concat_ws skips NULLs, so the reasons string is the fixed-order list
    # of failed rules with no placeholder handling
    reasons = F.concat_ws(",", *[F.when(cond, F.lit(name)) for name, cond in rules])
    return j.select(
        F.col(id_col),
        (reasons == "").alias("passed"),
        reasons.alias("reasons"),
    )
