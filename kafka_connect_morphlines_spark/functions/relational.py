"""Relational operators Spark lacks natively: as-of join, range join.

Both are built as compositions of existing DataFrame ops (SURVEY.md §7 /
pyspark guide preference order), shaped for scale:

- as-of join: union + window (sort within key) — one shuffle, no join
  explosion, no per-group pandas.  The classic scalable formulation.
- range join: bucketize the range dimension -> equi-join on bucket ->
  residual filter.  Turns an O(n*m) inequality join into a hash join whose
  fan-out is bounded by bucket occupancy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_left: str,
    time_right: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right row with
    ``right.time <= left.time`` within the same ``by`` key (inclusive).

    Implementation: tag and union both sides, then ``last_value(...,
    ignoreNulls)`` over a (key, time)-ordered window.  One shuffle on the key
    — same cost as a groupBy — versus the join-explosion or per-group-pandas
    alternatives.  Ties at equal time: the right row sorts first, so it
    matches (DuckDB ASOF semantics).
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [c for c in right.columns if c not in by and c != time_right]

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(time_left).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in value_cols],
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
        *[F.col(c) for c in by],
        F.col(time_right).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(c + suffix) for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = Window.partitionBy(*by).orderBy(F.col("_t").asc(), F.col("_is_left").asc()).rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.select(
        *[c for c in unioned.columns if not c.endswith(suffix)],
        *[F.last(F.col(c + suffix), ignorenulls=True).over(w).alias(c + suffix) for c in value_cols],
    )
    return filled.filter(F.col("_is_left") == 1).drop("_is_left", "_t")


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_size: float,
) -> DataFrame:
    """Inner join of points against [start, end] ranges (inclusive).

    Each range explodes into the buckets it covers; each point hashes to one
    bucket; the equi-join on bucket + residual BETWEEN filter replaces the
    nested-loop inequality join.  ``bucket_size`` should approximate the
    typical range width so ranges cover O(1) buckets.
    """
    inv = 1.0 / bucket_size
    p = points.withColumn("_bkt", F.floor(F.col(point_col) * inv).cast("long"))
    r = ranges.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) * inv).cast("long"),
                F.floor(F.col(end_col) * inv).cast("long"),
            )
        ),
    )
    joined = p.join(r, "_bkt").filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col)))
    return joined.drop("_bkt")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    max_edit: int = 1,
    q: int = 2,
) -> DataFrame:
    """Edit-distance join without the cross product: q-gram inverted-index
    blocking, length prefilter, exact levenshtein verify.

    Record-linkage staple (vendor-name reconciliation, entity resolution).
    Strings within edit distance k share a q-gram whenever they are longer
    than q*(k+1)-1 — one edit disturbs at most q positional grams — so the
    candidate set from joining on shared grams is recall-complete for all
    but degenerate inputs (near-single-gram strings like "aaaa"; the
    sf0.01 oracle is the exact all-pairs join, so a recall miss would fail
    the hash gate, not hide).

    DEDUP FIRST (SCALE.md lesson 2): pair output is quadratic in
    duplicate-cluster size — 20k rows sharing 64 distinct strings yield
    ~6M zero-distance pairs no blocking can avoid.  Feed each side
    DISTINCT strings (joining ids back afterwards if needed); the operator
    does not collapse duplicates itself because id-level output is the
    record-linkage semantic for near-unique keys.

    100 TB shape (SCALE.md lesson 11): the self/cross join runs on the
    exploded (gram, id) inverted index — the shuffle spreads over the gram
    vocabulary, with the length-compatibility filter inside the join
    condition; the levenshtein verify is candidate-bounded.  Each side's
    gram explode is O(len) codegen; no pair ever materializes text except
    the verified candidates.
    """
    def grams(df: DataFrame, col: str, idc: str, side: str) -> DataFrame:
        s = F.lower(F.trim(F.col(col)))
        g = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(s) - q + 1, F.lit(1))),
                lambda i: s.substr(i, F.lit(q)),
            )
        )
        return df.select(
            F.col(idc).alias(f"{side}_id"),
            s.alias(f"{side}_s"),
            F.length(s).alias(f"{side}_len"),
            F.explode(g).alias("gram"),
        )

    lg = grams(left, left_col, left_id, "l")
    rg = grams(right, right_col, right_id, "r")
    cand = (
        lg.join(
            rg,
            (lg["gram"] == rg["gram"])
            & (F.abs(lg["l_len"] - rg["r_len"]) <= max_edit),
        )
        .select("l_id", "r_id", "l_s", "r_s")
        .distinct()
    )
    return cand.select(
        "l_id",
        "r_id",
        F.levenshtein("l_s", "r_s").alias("edit_dist"),
    ).filter(F.col("edit_dist") <= max_edit)


def jaro_winkler(s1: str, s2: str) -> float:
    """Plain-Python Jaro-Winkler, mirroring the standard definition DuckDB
    implements (jaro_winkler_similarity): match window
    ``max(len)//2 - 1``, transpositions = half the out-of-order matches,
    Winkler prefix boost (up to 4 chars, scale 0.1) only when jaro > 0.7,
    and 0.0 when either string is empty."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    jaro = (matches / l1 + matches / l2 + (matches - t / 2) / matches) / 3.0
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix == 4:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1.0 - jaro)


def jaro_winkler_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    threshold: float = 0.85,
    q: int = 2,
) -> DataFrame:
    """Jaro-Winkler similarity join: q-gram inverted-index blocking, then an
    Arrow-batched JW verify on the candidate pairs only.

    JW is the record-linkage metric for *name* fields (typos early in the
    string cost more than late ones — the Winkler prefix boost); unlike
    levenshtein it has no q-gram recall guarantee, so the blocking is
    heuristic: pairs above a high threshold share a bigram in all but
    adversarial inputs, and the sf0.01 oracle is the exact all-pairs join,
    so a recall miss on real data fails the hash gate rather than hiding.
    Same dedup-first discipline as fuzzy_join: feed DISTINCT strings.

    Scale shape: gram-exploded inverted-index join (shuffle spread over the
    gram vocabulary), candidates deduped, JW computed once per candidate in
    a vectorized pandas UDF — never per cross-product pair.
    """
    def grams(df: DataFrame, col: str, idc: str, side: str) -> DataFrame:
        s = F.lower(F.trim(F.col(col)))
        g = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(s) - q + 1, F.lit(1))),
                lambda i: s.substr(i, F.lit(q)),
            )
        )
        return df.select(
            F.col(idc).alias(f"{side}_id"),
            s.alias(f"{side}_s"),
            F.explode(g).alias("gram"),
        )

    @F.pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    lg = grams(left, left_col, left_id, "l")
    rg = grams(right, right_col, right_id, "r")
    cand = (
        lg.join(rg, lg["gram"] == rg["gram"])
        .select("l_id", "r_id", "l_s", "r_s")
        .distinct()
    )
    return (
        cand.withColumn("jw_sim", jw(F.col("l_s"), F.col("r_s")))
        .filter(F.col("jw_sim") >= threshold)
        .select("l_id", "r_id", F.round("jw_sim", 6).alias("jw_sim"))
    )
