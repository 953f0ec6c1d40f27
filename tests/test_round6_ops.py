"""Round-6 operator tests: binary sign-bit ANN + resampling parallelism."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import similarity as sim


def test_binary_signature_packs_sign_bits(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.0, 3.0]), (2, [-1.0] * 4), (3, [0.5] * 4)],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id", sim.binary_signature(F.col("embedding"), 4).alias("sig")
        ).collect()
    }
    # bit j set iff v[j] > 0 (strict: zeros clear), little-endian packing
    assert rows[1] == [0b1001]
    assert rows[2] == [0]
    assert rows[3] == [0b1111]


def test_binary_signature_wide_vector_words(spark):
    # dim 70 -> two words; bit 69 lands in word 2 bit 5
    vec = [0.0] * 70
    vec[0] = 1.0
    vec[63] = 1.0
    vec[69] = 1.0
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    [r] = df.select(sim.binary_signature(F.col("embedding"), 70).alias("sig")).collect()
    w0, w1 = r["sig"]
    assert w0 == 1 | (1 << 63) - (1 << 64)  # signed long with bit 63 set
    assert w1 == 1 << 5


def test_binary_hamming_topk_finds_exact_match(spark):
    import math

    base = [math.sin(i * 0.7 + j) for i in range(1) for j in range(8)]
    rows = [(0, base)]
    for i in range(1, 30):
        rows.append((i, [x + 0.2 * ((i * 7 + j) % 5 - 2) for j, x in enumerate(base)]))
    # one exact duplicate of the query and one sign-flipped vector
    rows.append((100, list(base)))
    rows.append((101, [-x for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.binary_hamming_topk(
        df.filter(F.col("vec_id") != 0), base, k=5, shortlist=31
    ).collect()
    assert out[0]["vec_id"] == 100  # the exact duplicate reranks to the top
    assert out[0]["hamming"] == 0
    assert abs(out[0]["score"] - 1.0) < 1e-9
    ids = [r["vec_id"] for r in out]
    assert 101 not in ids  # the sign-flip is maximally far in Hamming
    # rerun determinism
    again = sim.binary_hamming_topk(
        df.filter(F.col("vec_id") != 0), base, k=5, shortlist=31
    ).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_resampling_ops_parallelize_single_partition_input(spark):
    """bootstrap/permutation amplify every row b x — a one-file scan must
    not serialize the replicate pass onto one core (ensure_parallelism)."""
    from kafka_connect_morphlines_spark.functions import evalmetrics

    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(500)], "event_id long, value double"
    ).coalesce(1)
    r = evalmetrics.bootstrap_mean_ci(df, F.col("value"), F.col("event_id"), b=20)
    assert r.collect()[0]["n"] == 500
    # the replicate frame should run wider than the 1-partition input
    df2 = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i % 7)) for i in range(200)],
        "event_id long, g string, v double",
    ).coalesce(1)
    p = evalmetrics.permutation_test_diff(
        df2, F.col("v"), F.col("g"), "a", "b", id_col=F.col("event_id"), b=40
    ).collect()[0]
    assert (p["n_a"], p["n_b"]) == (100, 100)


def test_mann_whitney_u_known_values(spark):
    """Hand-computed example with ties: a = [1,2,4,4], b = [3,4,5].
    Ranks: 1->1, 2->2, 3->3, 4->(4+5+6)/3=5, 5->7.
    R_a = 1+2+5+5 = 13, U_a = 13 - 4*5/2 = 3, u2 = 6.
    ties: value 4 has t=3 -> t^3-t = 24.
    var = (4*3/12) * ((7+1) - 24/(7*6)) = 1 * (8 - 0.571428...) = 7.428571...
    z = (3 - 6) / sqrt(var) = -3/2.72554... = -1.100698..."""
    from kafka_connect_morphlines_spark.functions import evalmetrics

    rows = [("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 4.0),
            ("b", 3.0), ("b", 4.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = evalmetrics.mann_whitney_u(df, F.col("v"), F.col("g"), "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["u2"]) == (4, 3, 6)
    assert r["z"] == round(-3.0 / (7.0 + 3.0 / 7.0) ** 0.5, 6)


def test_mann_whitney_u_all_tied_is_null_z(spark):
    from kafka_connect_morphlines_spark.functions import evalmetrics

    df = spark.createDataFrame(
        [("a", 5.0)] * 4 + [("b", 5.0)] * 4, "g string, v double"
    )
    r = evalmetrics.mann_whitney_u(df, F.col("v"), F.col("g"), "a", "b").collect()[0]
    assert r["z"] is None  # zero variance, not a division blowup


def test_interleave_sources_round_robin(spark):
    from kafka_connect_morphlines_spark.functions import traindata

    rows = [(i, ["s1", "s2", "s3"][i % 3]) for i in range(9)] + [(100, "s1"), (101, "s1")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = traindata.interleave_sources(df, "source", "doc_id").orderBy("pos").collect()
    pos = [r["pos"] for r in out]
    assert pos == sorted(pos) and len(set(pos)) == len(pos)  # unique, materializable
    # the first full cycle hits every source once, in src_index order
    first_cycle = [r["source"] for r in out[:3]]
    assert first_cycle == ["s1", "s2", "s3"]
    # within a source the original order is preserved
    s1 = [r["doc_id"] for r in out if r["source"] == "s1"]
    assert s1 == sorted(s1)
    # exhausted sources just leave holes: s1 has 5 docs, cycles 3 and 4
    # contain only s1 rows at pos 3*m
    assert [r["source"] for r in out[-2:]] == ["s1", "s1"]


def test_quantile_normalize_maps_to_pooled_distribution(spark):
    """Two sources with shifted distributions: after quantile
    normalization both sources' values follow the POOLED quantiles —
    the per-source max maps to the pooled max, the min to the pooled min,
    and equal in-source percentiles get equal normalized values."""
    from kafka_connect_morphlines_spark.functions import traindata

    rows = [(i, "a", float(i)) for i in range(11)] + [
        (100 + i, "b", 1000.0 + i) for i in range(11)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, v double")
    out = traindata.quantile_normalize(df, "v", "source", "doc_id", out_col="q").collect()
    byid = {r["doc_id"]: r["q"] for r in out}
    # pooled min/max are 0 and 1010
    assert byid[0] == 0.0 and byid[110] == 1010.0
    assert byid[100] == 0.0 and byid[10] == 1010.0  # source b's min, a's max
    # equal in-source percentile -> equal pooled value across sources
    for i in range(11):
        assert byid[i] == byid[100 + i]
    # the mapped values are pooled quantiles: midpoint -> pooled median
    assert byid[5] == byid[105]
    # singleton group maps to the pooled median
    df2 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (9, "solo", 99.0)],
        "doc_id long, source string, v double",
    )
    out2 = {r["doc_id"]: r["q"] for r in traindata.quantile_normalize(
        df2, "v", "source", "doc_id", out_col="q").collect()}
    assert out2[9] == 2.5  # pooled median of [1,2,3,99]


def test_mrr_at_k_first_relevant_reciprocal(spark):
    from kafka_connect_morphlines_spark.functions import evalmetrics

    rows = [
        # q1: relevant at rank 3 (scores 9,8,7 with rel on 7)
        ("q1", 9.0, 0, 1), ("q1", 8.0, 0, 2), ("q1", 7.0, 1, 3), ("q1", 6.0, 1, 4),
        # q2: relevant at rank 1
        ("q2", 5.0, 1, 5), ("q2", 4.0, 0, 6),
        # q3: no relevant in top-2 (k=2)
        ("q3", 3.0, 0, 7), ("q3", 2.0, 0, 8), ("q3", 1.0, 1, 9),
    ]
    df = spark.createDataFrame(rows, "q string, s double, rel int, tb long")
    out = {r["q"]: r for r in evalmetrics.mrr_at_k(
        df, "q", F.col("s"), F.col("rel"), k=2, tiebreak=F.col("tb")).collect()}
    assert out["q1"]["first_rel_rank"] is None and out["q1"]["rr"] == 0.0
    assert out["q2"]["first_rel_rank"] == 1 and out["q2"]["rr"] == 1.0
    assert out["q3"]["first_rel_rank"] is None and out["q3"]["rr"] == 0.0
    out10 = {r["q"]: r for r in evalmetrics.mrr_at_k(
        df, "q", F.col("s"), F.col("rel"), k=10, tiebreak=F.col("tb")).collect()}
    assert out10["q1"]["first_rel_rank"] == 3 and out10["q1"]["rr"] == round(1 / 3, 6)
    assert out10["q3"]["first_rel_rank"] == 3


def test_gumbel_topk_by_group_quota_and_determinism(spark):
    from kafka_connect_morphlines_spark.functions import dsir

    rows = [(i, ["a", "b", "c"][i % 3], (i * 37) % 500) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = dsir.gumbel_topk_by_group(
        df, k=4, group_col="source", id_col="doc_id", weight_col="n_chars", seed="t"
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r["doc_id"])
    assert {len(v) for v in per.values()} == {4}  # exact quota per group
    again = dsir.gumbel_topk_by_group(
        df, k=4, group_col="source", id_col="doc_id", weight_col="n_chars", seed="t"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))  # derandomized
    # higher weight should dominate: an overwhelming-weight row always wins
    df2 = df.union(spark.createDataFrame([(1000, "a", 10_000_000)], df.schema))
    top_a = dsir.gumbel_topk_by_group(
        df2, k=1, group_col="source", id_col="doc_id", weight_col="n_chars", seed="t"
    ).filter(F.col("source") == "a").collect()
    assert top_a[0]["doc_id"] == 1000


def test_multiclass_prf_hand_computed(spark):
    """actual/predicted pairs with a class that is never predicted (c) and
    one never actual (d): per-class tp/fp/fn and the integer-form F1."""
    from kafka_connect_morphlines_spark.functions import evalmetrics

    rows = [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"),
            ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(rows, "y string, p string")
    out = {r["class"]: r for r in evalmetrics.multiclass_prf(
        df, F.col("y"), F.col("p")).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    # a: tp=2, predicted-a=4 -> fp=2; actual-a=3 -> fn=1
    assert (out["a"]["tp"], out["a"]["fp"], out["a"]["fn"]) == (2, 2, 1)
    assert out["a"]["precision"] == 0.5 and out["a"]["recall"] == round(2 / 3, 6)
    assert out["a"]["f1"] == round(4 / 7, 6)
    # b: tp=1, predicted-b=2 -> fp=1; actual-b=2 -> fn=1
    assert (out["b"]["tp"], out["b"]["fp"], out["b"]["fn"]) == (1, 1, 1)
    # c: never predicted -> precision NULL (0/0), recall 0
    assert (out["c"]["tp"], out["c"]["fp"], out["c"]["fn"]) == (0, 0, 2)
    assert out["c"]["precision"] is None and out["c"]["recall"] == 0.0
    # d: never actual -> recall NULL, precision 0
    assert (out["d"]["tp"], out["d"]["fp"], out["d"]["fn"]) == (0, 1, 0)
    assert out["d"]["recall"] is None and out["d"]["precision"] == 0.0
