"""Privacy auditing operators: k-anonymity and l-diversity over
quasi-identifier groups, plus rare-group suppression.

Complements the PII redaction pass (textclean.redact_pii): redaction
removes direct identifiers from *content*; these operators audit whether the
*structured* columns still allow re-identification — a release gate a
training-data pipeline runs before publishing any derived table.

Shape at 100 TB: everything is one groupBy on the quasi-identifier tuple
(map-side combine; the class table is equivalence-class-sized, not
row-sized) plus, for suppression, one semi/anti join back — the class table
broadcasts whenever the identifier space is bounded, so the data itself
never shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def anonymity_classes(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Equivalence-class table: one row per distinct quasi-identifier tuple
    with its size (``n``) and, when ``sensitive_col`` is given, the number
    of distinct sensitive values in the class (``n_sensitive``).

    ``n`` < k is a k-anonymity violation; ``n_sensitive`` < l is an
    l-diversity violation (a class can be large yet still reveal the
    sensitive attribute when every member shares one value).
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("n_sensitive"))
    return df.groupBy(*quasi_cols).agg(*aggs)


def anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
    l: int | None = None,
) -> DataFrame:
    """Class table annotated with violation flags (``k_violation`` and,
    with a sensitive column, ``l_violation``)."""
    classes = anonymity_classes(df, quasi_cols, sensitive_col)
    out = classes.withColumn("k_violation", F.col("n") < k)
    if sensitive_col is not None and l is not None:
        out = out.withColumn("l_violation", F.col("n_sensitive") < l)
    return out


def suppress_rare_groups(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Drop every row belonging to a quasi-identifier class smaller than k —
    the suppression step that makes the remaining table k-anonymous.

    One aggregate + one semi join on the class key; the surviving-class
    frame is class-count-sized and broadcasts when small.
    """
    keep = anonymity_classes(df, quasi_cols).filter(F.col("n") >= k).select(*quasi_cols)
    return df.join(keep, quasi_cols, "left_semi")


def generalize_bucket(col: Column, width: float) -> Column:
    """Generalization helper: numeric value -> bucket floor (e.g. age 37
    with width 10 -> 30).  Coarsening quasi-identifiers grows class sizes,
    trading precision for anonymity."""
    return (F.floor(col / width) * width)
