"""Round-8 session-2 operators: Krippendorff's alpha, KMV bottom-k sketch,
Bradley-Terry preference strengths.

Each test pins the distributed implementation against an INDEPENDENT
formulation (textbook coincidence-matrix alpha, float-MM Bradley-Terry,
brute-force bottom-k) — the corpus' two-formulations-agree discipline.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import evalmetrics, sketches


# --------------------------------------------------------------------------
# Krippendorff's alpha
# --------------------------------------------------------------------------


def alpha_nominal_reference(units: dict) -> float:
    """Textbook coincidence-matrix alpha (float arithmetic): build the
    o_ck matrix by literally enumerating ordered within-unit pairs with
    weight 1/(m_u-1) — an independent formulation of the closed form the
    engine uses."""
    units = {u: rs for u, rs in units.items() if len(rs) >= 2}
    o: Counter = Counter()
    for rs in units.values():
        m = len(rs)
        for i, c in enumerate(rs):
            for j, k in enumerate(rs):
                if i != j:
                    o[(c, k)] += 1.0 / (m - 1)
    n_c: Counter = Counter()
    for (c, _k), v in o.items():
        n_c[c] += v
    n = sum(n_c.values())
    d_o = sum(v for (c, k), v in o.items() if c != k)
    d_e = sum(n_c[c] * n_c[k] for c in n_c for k in n_c if c != k) / (n - 1)
    return 1.0 - d_o / d_e


def _alpha(spark, units: dict) -> tuple:
    rows = [(u, c) for u, rs in units.items() for c in rs]
    df = spark.createDataFrame(rows, "u string, c string")
    got = evalmetrics.krippendorff_alpha_nominal(df, F.col("u"), F.col("c")).collect()[0]
    return got["n_units"], got["n_ratings"], got["alpha"]


def test_krippendorff_matches_reference_formulation(spark):
    # 3 raters, missing data (u4 has one rating -> excluded), mixed m
    units = {
        "u1": ["en", "en", "en"],
        "u2": ["en", "de", "en"],
        "u3": ["de", "de"],
        "u4": ["fr"],  # unpairable: must be dropped
        "u5": ["fr", "fr", "de"],
        "u6": ["en", "en"],
        "u7": ["de", "en"],
    }
    n_units, n_ratings, alpha = _alpha(spark, units)
    assert n_units == 6
    assert n_ratings == 15  # u4's single rating excluded
    assert alpha == pytest.approx(alpha_nominal_reference(units), abs=5e-7)


def test_krippendorff_perfect_agreement_is_one(spark):
    units = {f"u{i}": ["en", "en", "en"] for i in range(5)}
    units["x"] = ["de", "de"]
    _, _, alpha = _alpha(spark, units)
    assert alpha == 1.0


def test_krippendorff_uniform_mix_two_raters(spark):
    # systematic disagreement worse than chance -> negative alpha,
    # still matching the reference formulation exactly
    units = {f"u{i}": ["a", "b"] for i in range(4)}
    _, _, alpha = _alpha(spark, units)
    assert alpha == pytest.approx(alpha_nominal_reference(units), abs=5e-7)
    assert alpha < 0


# --------------------------------------------------------------------------
# KMV bottom-k sketch
# --------------------------------------------------------------------------


def _kmv_frame(spark, keys: list, group: str = "g"):
    return spark.createDataFrame([(group, str(k)) for k in keys], "g string, k string")


def test_kmv_build_is_bottom_k_of_distinct(spark):
    df = _kmv_frame(spark, list(range(200)) + list(range(50)))  # dups collapse
    sk = sketches.kmv_build(df, F.col("k"), k=16, group_cols=["g"])
    rows = sk.orderBy("pos").collect()
    assert [r["pos"] for r in rows] == list(range(1, 17))
    # independent brute force over the same hash
    brute = sorted(
        {r["hv"] for r in df.select(sketches.kmv_hash(F.col("k")).alias("hv")).collect()}
    )[:16]
    assert [r["hv"] for r in rows] == brute


def test_kmv_prereduce_identical_to_direct(spark):
    df = _kmv_frame(spark, range(500)).repartition(8)
    a = sketches.kmv_build(df, F.col("k"), k=32, group_cols=["g"], prereduce=True)
    b = sketches.kmv_build(df, F.col("k"), k=32, group_cols=["g"], prereduce=False)
    assert sorted(r["hv"] for r in a.collect()) == sorted(r["hv"] for r in b.collect())


def test_kmv_merge_is_lossless(spark):
    all_keys = list(range(400))
    whole = sketches.kmv_build(_kmv_frame(spark, all_keys), F.col("k"), k=24, group_cols=["g"])
    part1 = sketches.kmv_build(_kmv_frame(spark, all_keys[:250]), F.col("k"), k=24, group_cols=["g"])
    part2 = sketches.kmv_build(_kmv_frame(spark, all_keys[150:]), F.col("k"), k=24, group_cols=["g"])
    merged = sketches.kmv_merge(24, part1, part2)
    assert sorted(r["hv"] for r in merged.collect()) == sorted(
        r["hv"] for r in whole.collect()
    )
    est_w = sketches.kmv_estimate(whole, 24, ["g"]).collect()[0]["estimate"]
    est_m = sketches.kmv_estimate(merged, 24, ["g"]).collect()[0]["estimate"]
    assert est_w == est_m  # bit-identical, not approximately


def test_kmv_exact_below_k(spark):
    df = _kmv_frame(spark, range(10))
    sk = sketches.kmv_build(df, F.col("k"), k=64, group_cols=["g"])
    est = sketches.kmv_estimate(sk, 64, ["g"]).collect()[0]["estimate"]
    assert est == 10.0


def test_kmv_estimate_within_theory_error(spark):
    # KMV relative error ~ 1/sqrt(k-2); allow 4 sigma
    n, k = 5000, 256
    df = _kmv_frame(spark, range(n))
    sk = sketches.kmv_build(df, F.col("k"), k=k, group_cols=["g"])
    est = sketches.kmv_estimate(sk, k, ["g"]).collect()[0]["estimate"]
    assert abs(est - n) / n < 4.0 / (k - 2) ** 0.5


# --------------------------------------------------------------------------
# Bradley-Terry
# --------------------------------------------------------------------------


def bt_reference_float(wins: dict, n_iter: int = 3) -> dict:
    """Float MM, same schedule as the engine (no in-loop normalization,
    one final normalize) — the independent formulation; the fixed-point
    engine run must land within lattice quantization of it."""
    items = sorted({a for a, _ in wins} | {b for _, b in wins})
    n = Counter()
    w_tot = Counter()
    for (a, b), c in wins.items():
        w_tot[a] += c
        n[(a, b)] += c
        n[(b, a)] += c
    p = {i: 1.0 for i in items}
    for _ in range(n_iter):
        s = {
            i: sum(n[(i, j)] / (p[i] + p[j]) for j in items if j != i and (i, j) in n)
            for i in items
        }
        p = {i: w_tot[i] / s[i] if s[i] > 0 else p[i] for i in items}
    z = sum(p.values())
    return {i: v / z for i, v in p.items()}


def _duels_df(spark, wins: dict):
    rows = [(a, b) for (a, b), c in wins.items() for _ in range(c)]
    return spark.createDataFrame(rows, "wn string, ls string")


def test_bradley_terry_counts_and_ordering(spark):
    wins = {("a", "b"): 30, ("b", "a"): 10, ("a", "c"): 35, ("c", "a"): 5, ("b", "c"): 25, ("c", "b"): 15}
    out = evalmetrics.bradley_terry_strengths(
        _duels_df(spark, wins), F.col("wn"), F.col("ls")
    ).collect()
    got = {r["item"]: r for r in out}
    assert got["a"]["wins"] == 65 and got["a"]["duels"] == 80
    assert got["b"]["wins"] == 35 and got["c"]["wins"] == 20
    # strengths sum to ~1 and follow the win structure
    assert sum(r["strength"] for r in out) == pytest.approx(1.0, abs=2e-6)
    assert got["a"]["strength"] > got["b"]["strength"] > got["c"]["strength"]
    ref = bt_reference_float(wins, n_iter=3)
    for i in ("a", "b", "c"):
        # same schedule in floats: only lattice quantization apart
        assert got[i]["strength"] == pytest.approx(ref[i], abs=1e-4)


def test_bradley_terry_never_winner_gets_zero(spark):
    wins = {("a", "b"): 10, ("a", "c"): 10, ("b", "c"): 10, ("b", "a"): 2}
    out = {r["item"]: r for r in evalmetrics.bradley_terry_strengths(
        _duels_df(spark, wins), F.col("wn"), F.col("ls")
    ).collect()}
    assert out["c"]["wins"] == 0
    assert out["c"]["strength"] == 0.0


def test_bradley_terry_symmetric_duels_equal_strengths(spark):
    wins = {("a", "b"): 20, ("b", "a"): 20}
    out = {r["item"]: r for r in evalmetrics.bradley_terry_strengths(
        _duels_df(spark, wins), F.col("wn"), F.col("ls")
    ).collect()}
    assert out["a"]["strength"] == out["b"]["strength"]


# --------------------------------------------------------------------------
# Quantized power iteration
# --------------------------------------------------------------------------


def test_power_component_matches_eigh(spark):
    import numpy as np

    from kafka_connect_morphlines_spark.functions import similarity as sim

    rng = np.random.default_rng(7)
    d, n = 16, 400
    # anisotropic cloud -> clear dominant direction
    basis = rng.normal(size=(d, d))
    scales = np.linspace(3.0, 0.1, d)
    x = rng.normal(size=(n, d)) * scales @ basis.T
    x = x / (np.abs(x).max() * 1.05)  # keep |x| < 1 like the corpus
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    out = sim.power_component_int(df, n_iter=6).collect()
    v = np.array([r["loading"] for r in out])
    lam = out[0]["lambda_hat"]

    xq = np.floor(np.stack([np.array(r, dtype=np.float64) for r in
                            df.select("embedding").toPandas()["embedding"]]) * 1024 + 0.5)
    s = xq.T @ xq
    vals, vecs = np.linalg.eigh(s)
    top = vecs[:, -1]
    cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos > 0.999
    # with v L-inf-normalized, max|S v| / unit converges to the top
    # eigenvalue of S itself
    assert lam == pytest.approx(vals[-1], rel=0.05)


def test_power_component_partition_invariant(spark, tmp_path):
    from kafka_connect_morphlines_spark.functions import similarity as sim

    src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sim.power_component_int(src.repartition(1), n_iter=3).collect()
    b = sim.power_component_int(src.repartition(13), n_iter=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# --------------------------------------------------------------------------
# Triangle counting
# --------------------------------------------------------------------------


def test_triangle_count_brute_force(spark):
    import itertools
    import random

    from kafka_connect_morphlines_spark.functions import web

    rng = random.Random(42)
    nodes = list(range(30))
    edges = sorted(
        {(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.25}
    )
    adj = set(edges)
    brute = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    row = web.triangle_count(df).collect()[0]
    assert row["n_triangles"] == brute
    assert row["n_edges"] == len(edges)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(v * (v - 1) // 2 for v in deg.values())
    assert row["gcc"] == pytest.approx(3 * brute / wedges, abs=1e-6)


def test_triangle_count_known_graphs(spark):
    from kafka_connect_morphlines_spark.functions import web

    # K4: 4 triangles, gcc = 1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    row = web.triangle_count(spark.createDataFrame(k4, "src long, dst long")).collect()[0]
    assert row["n_triangles"] == 4 and row["gcc"] == 1.0
    # star graph: 0 triangles
    star = [(0, i) for i in range(1, 6)]
    row = web.triangle_count(spark.createDataFrame(star, "src long, dst long")).collect()[0]
    assert row["n_triangles"] == 0 and row["gcc"] == 0.0


# --------------------------------------------------------------------------
# ACF / fertility sanity
# --------------------------------------------------------------------------


def test_acf_matches_numpy(spark):
    import numpy as np

    from kafka_connect_morphlines_spark.plans.queries import QUERIES

    out = QUERIES["acf_daily_revenue"].build(spark, "/root/testdata/sf0.001").collect()
    daily = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .orderBy("d")
        .collect()
    )
    series = {r["d"]: float(r["rev"]) for r in daily}
    days = sorted(series)
    import datetime

    for r in out:
        lag = r["lag"]
        xs, ys = [], []
        for dday in days:
            nxt = dday + datetime.timedelta(days=lag)
            if nxt in series:
                xs.append(series[dday])
                ys.append(series[nxt])
        ref = np.corrcoef(xs, ys)[0, 1]
        assert r["n"] == len(xs)
        assert r["acf"] == pytest.approx(ref, abs=1e-6)


def test_fertility_counts_toy(spark):
    from kafka_connect_morphlines_spark.plans.queries import QUERIES  # noqa: F401
    from kafka_connect_morphlines_spark.functions import textstats

    df = spark.createDataFrame(
        [("x", "Hello, world! 42")], "lang string, text string"
    )
    row = df.select(
        F.size(textstats.tokens(F.col("text"))).alias("w"),
        F.size(textstats.bpe_ish_tokens(F.col("text"))).alias("t"),
        F.octet_length("text").alias("b"),
    ).collect()[0]
    # words: Hello, | world! | 42 ; bpe-ish: Hello , world ! 42
    assert row["w"] == 3 and row["t"] == 5 and row["b"] == 16


# --------------------------------------------------------------------------
# lang_id exploded-codegen variant (r08 perf path)
# --------------------------------------------------------------------------


def test_lang_id_exploded_exact_parity(spark):
    from kafka_connect_morphlines_spark.functions import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    col_form = {
        r["doc_id"]: r["p"]
        for r in docs.select(
            "doc_id", textstats.lang_id(F.col("text")).alias("p")
        ).collect()
    }
    exploded = {
        r["doc_id"]: r["lang_pred"] for r in textstats.lang_id_exploded(docs).collect()
    }
    assert col_form == exploded


def test_lang_id_exploded_edge_cases(spark):
    from kafka_connect_morphlines_spark.functions import textstats

    edge = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   "), (4, "the the el el"), (5, "el la de the and of")],
        "doc_id long, text string",
    )
    got = sorted(tuple(r) for r in textstats.lang_id_exploded(edge).collect())
    want = sorted(
        tuple(r)
        for r in edge.select("doc_id", textstats.lang_id(F.col("text")).alias("p")).collect()
    )
    assert got == want
    # empty/null/whitespace all keep their row and land on 'und'
    assert dict(got)[1] == "und" and dict(got)[2] == "und" and dict(got)[3] == "und"


# --------------------------------------------------------------------------
# Spearman rho
# --------------------------------------------------------------------------


def spearman_reference(xs: list, ys: list) -> float:
    """Textbook tie-corrected Spearman: average ranks + Pearson."""
    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)) ** 0.5
    return num / den


def test_spearman_matches_reference(spark):
    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    ys = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y long")
    got = evalmetrics.spearman_rho(df, F.col("x"), F.col("y")).collect()[0]
    assert got["n"] == 10
    assert got["rho"] == pytest.approx(spearman_reference(xs, ys), abs=1e-6)


def test_spearman_perfect_and_inverse(spark):
    df = spark.createDataFrame([(i, i * 2) for i in range(20)], "x long, y long")
    assert evalmetrics.spearman_rho(df, F.col("x"), F.col("y")).collect()[0]["rho"] == 1.0
    df2 = spark.createDataFrame([(i, -i) for i in range(20)], "x long, y long")
    assert evalmetrics.spearman_rho(df2, F.col("x"), F.col("y")).collect()[0]["rho"] == -1.0


# --------------------------------------------------------------------------
# Unigram-LM probability-product twin (r08 certified path)
# --------------------------------------------------------------------------


def test_unigram_prob_twin_matches_reference(spark):
    from kafka_connect_morphlines_spark.functions import traindata

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = traindata.unigram_lm_train_prob(docs, vocab_size=64, n_iter=2).orderBy("rank").collect()
    wf = (
        docs.selectExpr("explode(split(trim(text), '\\\\s+')) AS w")
        .filter("w != ''")
        .groupBy("w")
        .count()
        .collect()
    )
    ref = traindata.unigram_lm_reference_prob(
        [(r["w"], int(r["count"])) for r in wf], vocab_size=64, n_iter=2
    )
    assert len(got) == len(ref)
    for g, (p, c, pr) in zip(got, ref):
        assert (g["piece"], g["count"]) == (p, c)
        assert g["prob"] == pytest.approx(pr, abs=1e-6)


def test_unigram_prob_encode_roundtrip(spark):
    from kafka_connect_morphlines_spark.functions import traindata

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = traindata.unigram_lm_train_prob(docs, vocab_size=64, n_iter=2)
    enc = traindata.unigram_lm_encode_prob(docs.filter(F.col("doc_id") < 10), vocab).collect()
    assert len(enc) == 10
    # pieces re-concatenate to the original words (lossless segmentation)
    texts = {r["doc_id"]: r["text"] for r in docs.filter(F.col("doc_id") < 10).collect()}
    for r in enc:
        assert "".join(r["pieces"]) == "".join(texts[r["doc_id"]].split())
        assert r["n_pieces"] == len(r["pieces"])


def test_viterbi_prob_tiebreak_longer_last_piece():
    from kafka_connect_morphlines_spark.functions.traindata import _viterbi_segment_prob

    # 'ab' can split as [a,b] or [ab]; with p(ab) = p(a)*p(b) exactly the
    # scores tie and the longer LAST piece (smaller split point) must win
    ps = {"a": 0.5, "b": 0.5, "ab": 0.25}
    assert _viterbi_segment_prob("ab", ps, 2) == ["ab"]
    # unreachable word -> None
    assert _viterbi_segment_prob("xz", {"a": 1.0}, 2) is None


# --------------------------------------------------------------------------
# Quantized PCA whitening twin
# --------------------------------------------------------------------------


def test_pca_whiten_int_subspace_and_whitening(spark):
    import numpy as np

    from kafka_connect_morphlines_spark.functions import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = sim.pca_whiten_int(emb, out_dim=4).collect()
    n = emb.count()
    y = np.zeros((n, 4))
    ids = sorted({r["vec_id"] for r in out})
    idx = {v: i for i, v in enumerate(ids)}
    for r in out:
        y[idx[r["vec_id"]], r["component"]] = r["value"]
    # whitened components: ~zero mean, ~unit variance, ~uncorrelated
    assert np.all(np.abs(y.mean(axis=0)) < 0.2)
    assert np.all((y.std(axis=0) > 0.5) & (y.std(axis=0) < 2.0))
    corr = np.corrcoef(y.T)
    off = corr[~np.eye(4, dtype=bool)]
    assert np.all(np.abs(off) < 0.2)
    # NOTE: the corpus embeddings have a near-flat spectrum, so "the
    # top-4 eigh subspace" is ill-conditioned there; subspace alignment
    # is asserted on anisotropic data below instead.


def test_pca_whiten_int_subspace_on_anisotropic_data(spark):
    import numpy as np

    from kafka_connect_morphlines_spark.functions import similarity as sim

    rng = np.random.default_rng(11)
    d, n, k = 16, 500, 3
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.array([8.0, 5.0, 3.0] + [0.3] * (d - 3))  # clear spectral gaps
    x = rng.normal(size=(n, d)) * scales @ basis.T
    x = x / (np.abs(x).max() * 1.05)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    out = sim.pca_whiten_int(df, out_dim=k, n_iter=6).collect()
    y = np.zeros((n, k))
    for r in out:
        y[r["vec_id"], r["component"]] = r["value"]
    xq = np.floor(x * 1024 + 0.5)
    mu = np.floor(xq.sum(0) / n)
    c = xq.T @ xq - n * np.outer(mu, mu)
    _, vecs = np.linalg.eigh(c)
    yref = (xq - mu) @ vecs[:, -k:]  # exact top-k projections
    for j in range(k):
        r = np.corrcoef(np.column_stack([y[:, j], yref]).T)[0, 1:]
        assert np.max(np.abs(r)) > 0.98  # each twin axis matches an eigh axis


def test_pca_whiten_int_partition_invariant(spark):
    from kafka_connect_morphlines_spark.functions import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sim.pca_whiten_int(emb.repartition(1), out_dim=2).collect()
    b = sim.pca_whiten_int(emb.repartition(11), out_dim=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# --------------------------------------------------------------------------
# Mann-Kendall + Theil-Sen
# --------------------------------------------------------------------------


def test_mann_kendall_matches_reference(spark):
    import datetime
    import statistics

    from kafka_connect_morphlines_spark.functions import timeseries

    vals = [3.0, 5.0, 2.0, 8.0, 8.0, 9.0, 4.0, 11.0, 12.0, 10.0, 13.0, 13.0]
    base = datetime.date(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=i * 2), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "d date, rev double").select(
        "d", F.col("rev").cast("decimal(23,6)").alias("rev")
    )
    got = timeseries.mann_kendall_trend(df, F.col("d"), F.col("rev")).collect()[0]
    # independent reference
    n = len(vals)
    s = sum(
        (1 if vals[j] > vals[i] else -1 if vals[j] < vals[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tc = Counter(vals)
    tie3 = sum(t * (t - 1) * (2 * t + 5) for t in tc.values())
    var_s = (n * (n - 1) * (2 * n + 5) - tie3) / 18
    z = (s - 1) / var_s**0.5 if s > 0 else (s + 1) / var_s**0.5 if s < 0 else 0.0
    slopes = sorted(
        (vals[j] - vals[i]) / ((j - i) * 2) for i in range(n) for j in range(i + 1, n)
    )
    ts = statistics.median(slopes)
    assert got["n_points"] == n and got["s_stat"] == s
    assert got["var_s"] == pytest.approx(var_s, abs=1e-6)
    assert got["z"] == pytest.approx(z, abs=1e-6)
    assert got["theil_sen_slope"] == pytest.approx(ts, abs=1e-6)
    assert got["z"] > 2.0  # the series genuinely trends up


def test_mann_kendall_flat_series_is_zero(spark):
    import datetime

    from kafka_connect_morphlines_spark.functions import timeseries

    base = datetime.date(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=i), 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, "d date, rev double").select(
        "d", F.col("rev").cast("decimal(23,6)").alias("rev")
    )
    got = timeseries.mann_kendall_trend(df, F.col("d"), F.col("rev")).collect()[0]
    assert got["s_stat"] == 0 and got["z"] == 0.0 and got["theil_sen_slope"] == 0.0


def test_cusum_changepoint_detects_shift(spark):
    import datetime

    from kafka_connect_morphlines_spark.functions import timeseries

    base = datetime.date(2024, 1, 1)
    # level shift at index 30: 10 -> 20
    rows = [
        (base + datetime.timedelta(days=i), 10.0 if i < 30 else 20.0)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "d date, rev double")
    got = timeseries.cusum_changepoint(df, F.col("d"), F.col("rev")).collect()[0]
    # the deviation cumsum bottoms out on the LAST pre-shift day
    assert got["change_point"] == base + datetime.timedelta(days=29)
    assert got["direction"] == 1  # level shifts up afterwards
    # peak = 30 days * |10 - 15| = 150
    assert got["cusum_peak"] == pytest.approx(150.0, abs=1e-6)


# --------------------------------------------------------------------------
# ANOVA + Benford
# --------------------------------------------------------------------------


def test_anova_matches_reference(spark):
    from kafka_connect_morphlines_spark.plans.queries import QUERIES

    got = QUERIES["anova_value_by_type"].build(spark, "/root/testdata/sf0.001").collect()[0]
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(r["value"])
    all_v = [v for vs in groups.values() for v in vs]
    nt, k = len(all_v), len(groups)
    grand = sum(all_v) / nt
    ssb = sum(len(vs) * (sum(vs) / len(vs) - grand) ** 2 for vs in groups.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs)
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    assert got["n_rows"] == nt and got["n_groups"] == k
    assert got["ss_between"] == pytest.approx(ssb, rel=1e-6)
    assert got["ss_within"] == pytest.approx(ssw, rel=1e-6)
    assert got["f_stat"] == pytest.approx(f, rel=1e-6)


def test_benford_chi2_terms(spark):
    import math

    from kafka_connect_morphlines_spark.plans.queries import QUERIES

    out = QUERIES["benford_first_digit_prices"].build(spark, "/root/testdata/sf0.001").collect()
    assert [r["digit"] for r in out] == list(range(1, 10))
    prices = [
        r["o_totalprice"]
        for r in spark.read.parquet("/root/testdata/sf0.001/orders.parquet").collect()
        if r["o_totalprice"] >= 1
    ]
    from collections import Counter

    obs = Counter(int(str(int(math.floor(p)))[0]) for p in prices)
    nt = sum(obs.values())
    for r in out:
        d = r["digit"]
        p = math.log10(1 + 1 / d)
        assert r["observed"] == obs.get(d, 0)
        assert r["expected"] == pytest.approx(nt * p, abs=2e-3)
        assert r["chi2_term"] == pytest.approx((obs.get(d, 0) - nt * p) ** 2 / (nt * p), abs=1e-4)
