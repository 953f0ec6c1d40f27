"""Regression tests for the round-9 ADVICE fixes.

Each test pins a specific defect the round-8 driver ADVICE reported:

1. anova_value_by_type: the DECIMAL(38,6)/BIGINT ssb_term division was
   engine-dependent (DuckDB resolves it to DOUBLE, Spark to scale-6
   DECIMAL); the fix computes each per-group (Σx)²/n as a deterministic
   double chain quantized to the 6dp grid and sums exact DECIMAL.
2. unigram_lm_encode / unigram_lm_encode_prob: NULL text segmented the
   literal string "None"; must yield 0 pieces.
3. power_component_int oracle: the SQL matvec products s*v overflow
   BIGINT at ~1e5 worst-case rows; the oracle now computes them in
   HUGEINT, matching the Python driver's exact bigints.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.plans.queries import QUERIES


def test_anova_ssb_term_is_6dp_grid_decimal_sum(spark):
    """The fixed ssb_term must equal sum over groups of
    round(double(s)^2 / n, 6) computed in Python — i.e. the per-group
    quantized-double idiom, NOT Spark's DECIMAL-division scale."""
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.col("value").cast("decimal(23,6)").alias("v"))
        .collect()
    )
    from collections import defaultdict
    from decimal import Decimal

    groups: dict[str, list[Decimal]] = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(r["v"])
    ssb_term = Decimal(0)
    for vs in groups.values():
        s = float(sum(vs))
        q = round(s * s / len(vs), 6)  # deterministic double chain + round
        ssb_term += Decimal(f"{q:.6f}")
    got = QUERIES["anova_value_by_type"].build(spark, "/root/testdata/sf0.001").collect()[0]
    # reconstruct ssb from the quantized term exactly as the query does
    all_v = [v for vs in groups.values() for v in vs]
    nt = len(all_v)
    st = float(sum(all_v))
    want_ssb = round(float(ssb_term) - st * st / nt, 4)
    assert got["ss_between"] == pytest.approx(want_ssb, abs=1e-9)


def test_anova_oracle_has_no_decimal_bigint_division(spark):
    """The oracle SQL must not contain the engine-dependent
    DECIMAL/BIGINT division pattern the ADVICE flagged."""
    sql = QUERIES["anova_value_by_type"].oracle
    assert "DECIMAL(38,6)) / n" not in sql
    assert "round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6)" in sql


def test_unigram_encode_null_text_yields_zero_pieces(spark):
    from kafka_connect_morphlines_spark.functions import traindata

    texts = ["low lower lowest low low", "new newer newest new new"] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab = traindata.unigram_lm_train(df, vocab_size=32, n_iter=2)
    with_null = spark.createDataFrame(
        [(100, None), (101, "low low")], "doc_id long, text string"
    )
    enc = {r["doc_id"]: r for r in traindata.unigram_lm_encode(with_null, vocab).collect()}
    assert enc[100]["n_pieces"] == 0 and list(enc[100]["pieces"]) == []
    assert enc[101]["n_pieces"] > 0
    # 'None' must not appear as a segmented word
    assert "None" not in "".join(enc[100]["pieces"])

    vocab_p = traindata.unigram_lm_train_prob(df, vocab_size=32, n_iter=2)
    enc_p = {
        r["doc_id"]: r
        for r in traindata.unigram_lm_encode_prob(with_null, vocab_p).collect()
    }
    assert enc_p[100]["n_pieces"] == 0 and list(enc_p[100]["pieces"]) == []
    assert enc_p[101]["n_pieces"] > 0


def test_power_oracle_matvec_uses_hugeint():
    sql = QUERIES["pca_power_component"].oracle
    assert "CAST(s.s AS HUGEINT) * v.v" in sql
    # the old int64 matvec pattern must be gone
    assert "CAST(sum(s.s * v.v) AS BIGINT)" not in sql


def test_power_oracle_hugeint_survives_large_s(tmp_path):
    """DuckDB replay of one matvec round with S entries sized so the
    products s*v exceed int64 (the exact overflow the ADVICE computed):
    HUGEINT must carry them without error and match Python bigints."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    # s ~ 2^50, v = 2^20 -> product 2^70 > int64
    s_val = 1 << 50
    v_val = 1 << 20
    got = con.execute(
        f"SELECT sum(CAST(s AS HUGEINT) * v) FROM (VALUES ({s_val}, {v_val}), ({s_val}, {v_val})) t(s, v)"
    ).fetchone()[0]
    assert int(got) == 2 * s_val * v_val
