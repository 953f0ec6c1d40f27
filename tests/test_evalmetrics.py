"""Evaluation metrics (functions/evalmetrics.py): closed-form parity with
sklearn-style definitions computed by hand on tiny frames, tie handling,
and Naive Bayes train/predict round-trip behavior."""

import math

from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import evalmetrics


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_auc_perfect_and_worst(spark):
    # scores perfectly separate labels -> AUC 1; inverted -> 0.
    rows = [(10, True), (9, True), (2, False), (1, False)]
    df = _df(spark, rows, "s long, y boolean")
    out = evalmetrics.binary_rank_auc(df, F.col("s"), F.col("y")).collect()[0]
    assert (out.n_pos, out.n_neg, out.auc) == (2, 2, 1.0)
    inv = evalmetrics.binary_rank_auc(df, (-F.col("s")).cast("long"), F.col("y"))
    assert inv.collect()[0].auc == 0.0


def test_auc_ties_average_rank(spark):
    # one positive tied with one negative at the same score:
    # ranks: s=1 -> avg rank 1.5 (pos+neg), s=2 -> rank 3 (pos).
    # sum ranks pos = 1.5 + 3 = 4.5; U = 4.5 - 2*3/2 = 1.5; AUC = 1.5/(2*1) = 0.75
    rows = [(1, True), (1, False), (2, True)]
    df = _df(spark, rows, "s long, y boolean")
    out = evalmetrics.binary_rank_auc(df, F.col("s"), F.col("y")).collect()[0]
    assert out.auc == 0.75


def test_auc_random_is_half(spark):
    # every score tied -> AUC must be exactly 0.5 regardless of labels.
    rows = [(7, i % 2 == 0) for i in range(10)]
    df = _df(spark, rows, "s long, y boolean")
    assert evalmetrics.binary_rank_auc(df, F.col("s"), F.col("y")).collect()[0].auc == 0.5


def test_calibration_bins(spark):
    rows = [(0.05, False), (0.05, True), (0.95, True), (0.95, True), (1.0, True)]
    df = _df(spark, rows, "p double, y boolean")
    out = {
        r.bin: r
        for r in evalmetrics.calibration_table(df, F.col("p"), F.col("y"), bins=10).collect()
    }
    assert set(out) == {0, 9}
    assert out[0].n == 2 and out[0].pos_rate == 0.5 and out[0].mean_score == 0.05
    # score 1.0 clamps into the last bin
    assert out[9].n == 3 and out[9].pos_rate == 1.0


def test_threshold_metrics_confusion(spark):
    rows = [(0.9, True), (0.8, False), (0.4, True), (0.1, False)]
    df = _df(spark, rows, "p double, y boolean")
    out = {
        r.threshold: r
        for r in evalmetrics.threshold_metrics(
            df, F.col("p"), F.col("y"), [0.5, 0.95]
        ).collect()
    }
    r5 = out[0.5]
    assert (r5.tp, r5.fp, r5.fn, r5.tn) == (1, 1, 1, 1)
    assert r5.precision == 0.5 and r5.recall == 0.5 and r5.f1 == 0.5
    r95 = out[0.95]
    assert (r95.tp, r95.fp) == (0, 0) and r95.precision is None  # 0/0 -> null


def test_cohens_kappa_known_value(spark):
    # classic 2x2 example: n=50, agree=35, marginals A:(25,25) B:(30,20)
    # pe = (25*30 + 25*20)/2500 = 0.5; po = 0.7; kappa = 0.4
    rows = (
        [("x", "x")] * 20 + [("y", "y")] * 15 + [("x", "y")] * 5 + [("y", "x")] * 10
    )
    df = _df(spark, rows, "a string, b string")
    out = evalmetrics.cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert (out.n, out.agree, out.sum_ab) == (50, 35, 1250)
    assert out.kappa == 0.4


def test_cohens_kappa_perfect(spark):
    df = _df(spark, [("a", "a"), ("b", "b")], "a string, b string")
    assert evalmetrics.cohens_kappa(df, F.col("a"), F.col("b")).collect()[0].kappa == 1.0


def test_nb_train_grid_and_smoothing(spark):
    rows = [
        (1, "spam spam eggs", "s"),
        (2, "eggs toast", "h"),
        (3, "toast toast", "h"),
    ]
    df = _df(spark, rows, "doc_id long, text string, cls string")
    model = evalmetrics.nb_train(
        df, F.col("text"), F.col("cls"), vocab_size=3, alpha=1
    )
    got = {(r.cls, r.token): r for r in model.collect()}
    # dense grid: 2 classes x 3 vocab tokens
    assert len(got) == 6
    # vocab = top-3 by corpus tf: toast(3), spam(2), eggs(2)
    assert {tk for _, tk in got} == {"toast", "spam", "eggs"}
    # class 'h' tokens in vocab: eggs(1), toast(3) -> class_tokens=4, V=3
    assert got[("h", "spam")].cnt == 0
    assert got[("h", "spam")].loglik == round(math.log(1 / 7), 6)
    assert got[("h", "toast")].loglik == round(math.log(4 / 7), 6)
    # class 's': spam(2), eggs(1) -> class_tokens=3
    assert got[("s", "spam")].loglik == round(math.log(3 / 6), 6)


def test_nb_predict_recovers_training_classes(spark):
    rows = [
        (1, "spam spam nigeria prince", "s"),
        (2, "meeting agenda notes", "h"),
        (3, "spam prince spam", "s"),
        (4, "agenda meeting today", "h"),
    ]
    df = _df(spark, rows, "doc_id long, text string, cls string")
    model = evalmetrics.nb_train(df, F.col("text"), F.col("cls"), vocab_size=8)
    pred = evalmetrics.nb_predict(df, F.col("doc_id"), F.col("text"), model)
    got = {r.doc_id: r.pred_cls for r in pred.collect()}
    assert got == {1: "s", 2: "h", 3: "s", 4: "h"}


def test_nb_predict_oov_dropped(spark):
    train = _df(spark, [(1, "aa bb", "x"), (2, "cc dd", "y")], "doc_id long, text string, cls string")
    model = evalmetrics.nb_train(train, F.col("text"), F.col("cls"), vocab_size=4)
    # a doc of only-OOV tokens joins nothing -> absent from output
    test = _df(spark, [(9, "zz qq")], "doc_id long, text string")
    assert evalmetrics.nb_predict(test, F.col("doc_id"), F.col("text"), model).count() == 0


def test_pmi_independent_is_zero(spark):
    # x and y independent and uniform -> every cell PMI = 0.
    rows = [(a, b) for a in ("p", "q") for b in (0, 1) for _ in range(5)]
    df = _df(spark, rows, "x string, y int")
    out = evalmetrics.pmi_table(df, F.col("x"), F.col("y")).collect()
    assert len(out) == 4
    assert all(r.pmi == 0.0 and r.mi_nats == 0.0 for r in out)


def test_pmi_perfect_association(spark):
    # x determines y: p->0, q->1, 4 rows each. PMI = ln(N*n_xy/(n_x*n_y)) = ln(2).
    rows = [("p", 0)] * 4 + [("q", 1)] * 4
    df = _df(spark, rows, "x string, y int")
    out = {(r.x, r.y): r for r in evalmetrics.pmi_table(df, F.col("x"), F.col("y")).collect()}
    assert len(out) == 2
    assert out[("p", 0)].pmi == round(math.log(2), 6)
    # total MI = sum of contributions = ln(2) (1 bit)
    assert round(sum(r.mi_nats for r in out.values()), 6) == round(math.log(2), 6)


def test_robust_outlier_stats(spark):
    from kafka_connect_morphlines_spark.functions import validation

    # group a: median 10, MAD 1; 100 is a screaming outlier, 11 is not.
    rows = [("a", 9.0), ("a", 10.0), ("a", 11.0), ("a", 100.0), ("a", 10.0)]
    # group b: constant values -> MAD 0 -> no outliers by convention
    rows += [("b", 5.0)] * 4 + [("b", 500.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in validation.robust_outlier_stats(df, "g", "v").collect()}
    assert out["a"].median == 10.0 and out["a"].mad == 1.0
    assert out["a"].n_outliers == 1 and out["a"].outlier_rate == 0.2
    assert out["b"].mad == 0.0 and out["b"].n_outliers == 0
