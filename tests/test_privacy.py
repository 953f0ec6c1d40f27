"""k-anonymity / l-diversity audit and suppression tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import privacy


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # (zip, age_decade) class of 3 with diverse diagnosis
        ("94110", 30, "flu"),
        ("94110", 30, "cold"),
        ("94110", 30, "ok"),
        # class of 2 -> k=3 violation
        ("94110", 40, "flu"),
        ("94110", 40, "flu"),
        # class of 3 but single sensitive value -> l=2 violation only
        ("10001", 30, "flu"),
        ("10001", 30, "flu"),
        ("10001", 30, "flu"),
    ]
    return spark.createDataFrame(rows, "zip string, age int, dx string")


def test_audit_flags(people):
    out = {
        (r["zip"], r["age"]): r
        for r in privacy.anonymity_audit(
            people, ["zip", "age"], k=3, sensitive_col="dx", l=2
        ).collect()
    }
    assert not out[("94110", 30)]["k_violation"] and not out[("94110", 30)]["l_violation"]
    assert out[("94110", 40)]["k_violation"]
    assert not out[("10001", 30)]["k_violation"] and out[("10001", 30)]["l_violation"]


def test_suppression_makes_k_anonymous(people):
    sup = privacy.suppress_rare_groups(people, ["zip", "age"], k=3)
    assert sup.count() == 6  # the size-2 class dropped
    # post-suppression audit is violation-free
    audit = privacy.anonymity_audit(sup, ["zip", "age"], k=3)
    assert audit.filter("k_violation").count() == 0


def test_generalize_bucket(spark):
    df = spark.createDataFrame([(37,), (40,), (-5,)], "v int")
    got = [r["b"] for r in df.select(privacy.generalize_bucket(F.col("v"), 10).alias("b")).orderBy("v").collect()]
    assert got == [-10, 30, 40]
