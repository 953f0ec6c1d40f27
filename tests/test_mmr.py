"""MMR diverse top-k (similarity.mmr_topk): parity with a pure-Python
greedy reference, and the diversity property (a duplicate of the best hit
is demoted below a less-relevant-but-novel result)."""

import numpy as np

from kafka_connect_morphlines_spark.functions import similarity


def _ref_mmr(vecs, query, k, lam):
    """Reference greedy MMR over the full candidate list (ids = indices)."""
    v = np.array(vecs, dtype=np.float64)
    q = np.array(query, dtype=np.float64)
    n = v / np.maximum(np.linalg.norm(v, axis=1), 1e-12)[:, None]
    rel = np.round(n @ (q / np.linalg.norm(q)), 6)
    sims = np.round(n @ n.T, 6)
    picked, out = [], []
    cand = set(range(len(vecs)))
    for rank in range(1, k + 1):
        best, best_s = None, None
        for i in sorted(cand):
            red = max((sims[i][j] for j in picked), default=0.0)
            s = round(lam * rel[i] - (1 - lam) * red, 6)
            if best_s is None or s > best_s:
                best, best_s = i, s
        picked.append(best)
        cand.remove(best)
        out.append((rank, best))
    return out


def test_mmr_matches_reference(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8).tolist()
    query = rng.randn(8).tolist()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r.rank, r.vec_id)
        for r in similarity.mmr_topk(df, query, k=6, shortlist=20, lam=0.5)
        .orderBy("rank")
        .collect()
    ]
    # float32 storage: compare against the reference run on the same
    # float32-truncated vectors the Spark side actually sees.
    f32 = [list(np.array(v, dtype=np.float32).astype(np.float64)) for v in vecs]
    assert got == _ref_mmr(f32, query, k=6, lam=0.5)


def test_mmr_demotes_duplicates(spark):
    # two identical highly-relevant vectors + one orthogonal-ish one:
    # plain top-2 would pick the twins; MMR must pick the novel vector 2nd.
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [0.6, 0.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # lam=0.3 weights diversity enough that the exact twin (redundancy 1.0,
    # score -0.4) loses to the novel vector (redundancy 0.6, score -0.24).
    got = [r.vec_id for r in similarity.mmr_topk(df, [1.0, 0.0], k=2, lam=0.3).orderBy("rank").collect()]
    assert got == [1, 3]


def test_textrank_prefers_hub_words(spark):
    from kafka_connect_morphlines_spark.functions import web

    # "alpha" neighbors every other content word -> highest centrality.
    docs = spark.createDataFrame(
        [
            (1, "alpha bravo alpha charlie alpha delta"),
            (2, "bravo alpha echo alpha"),
        ],
        "doc_id long, text string",
    )
    out = web.textrank_keywords(docs, "text", min_len=4, iters=3, k=3).collect()
    assert out[0].token == "alpha"
    assert all(out[0].rank >= r.rank for r in out)


def test_textrank_no_edges_across_filtered_gap(spark):
    from kafka_connect_morphlines_spark.functions import web

    # "aaaa bb cccc": bb is filtered (len<4); aaaa-cccc are NOT adjacent,
    # so no edges exist at all -> empty keyword list.
    docs = spark.createDataFrame([(1, "aaaa bb cccc")], "doc_id long, text string")
    assert web.textrank_keywords(docs, "text", min_len=4).count() == 0
