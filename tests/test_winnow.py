"""Winnowing fingerprints (functions/winnow.py): exact parity with a
pure-Python reference implementation of the SIGMOD'03 scheme, the shared-
substring guarantee, and the C4-style normalized exact dedup."""

import hashlib

from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import winnow


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Reference winnowing: 60-bit md5 k-gram hashes, rightmost min per
    window of w consecutive hashes, dedup selected positions.  1-based
    positions to match the Spark side."""
    hashes = [
        int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(text) - k + 1)
    ]
    sel = set()
    for p in range(len(hashes) - w + 1):
        window = hashes[p : p + w]
        m = min(window)
        # rightmost occurrence of the min
        idx = max(i for i, h in enumerate(window) if h == m)
        sel.add((p + idx + 1, window[idx]))
    return sel


def test_winnow_matches_reference(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "aaaaaaaaaaaaaaaa"),  # degenerate: all grams identical
        (4, "short"),  # shorter than k -> no grams
    ]
    k, w = 5, 4
    df = spark.createDataFrame(texts, "doc_id int, text string")
    got = {
        (r["doc_id"], r["pos"], r["fingerprint"])
        for r in winnow.winnow_fingerprints(df, k=k, w=w).collect()
    }
    want = {
        (doc_id, pos, fp)
        for doc_id, text in texts
        for pos, fp in _ref_winnow(text, k, w)
    }
    assert got == want


def test_winnow_shared_substring_guarantee(spark):
    """Any shared substring of length >= w + k - 1 must produce at least
    one shared fingerprint (the paper's correctness guarantee)."""
    k, w = 5, 4
    shared = "zqxjkvbwpfmg"  # len 12 >= w + k - 1 = 8
    texts = [
        (1, "first document prefix " + shared + " and a suffix"),
        (2, shared + " entirely different remainder here"),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    fp = winnow.winnow_fingerprints(df, k=k, w=w)
    common = (
        fp.groupBy("fingerprint").agg(F.countDistinct("doc_id").alias("n"))
        .filter(F.col("n") == 2)
        .count()
    )
    assert common >= 1


def test_winnow_density(spark):
    """Winnowing selects ~2/(w+1) of gram positions (loose upper check:
    every full window selects one, so density <= 1 and >= 1/w)."""
    k, w = 8, 4
    text = "value part hash table merge batch window scan slow fast " * 20
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    n_grams = len(text) - k + 1
    n_sel = winnow.winnow_fingerprints(df, k=k, w=w).count()
    assert n_grams / (2 * w) <= n_sel <= n_grams / 1.5


def test_overlap_pairs_finds_plagiarism(spark):
    k, w = 5, 4
    boiler = "completely original content with no reuse whatsoever"
    copied = "this exact passage was lifted verbatim between documents"
    texts = [
        (1, "doc one starts here. " + copied + " then diverges."),
        (2, "unrelated beginning. " + copied + " different tail."),
        (3, boiler),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    pairs = winnow.overlap_pairs(df, k=k, w=w, min_shared=2).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


def test_fingerprint_index_counts(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij")], "doc_id int, text string"
    )
    idx = winnow.fingerprint_index(df, k=5, w=4)
    rows = idx.collect()
    assert rows and all(r["n_docs"] == 2 for r in rows)


def test_normalized_exact_dedup(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO WORLD."),
            (4, "goodbye world"),
        ],
        "doc_id int, text string",
    )
    keys = winnow.normalized_exact_dedup(df).orderBy("keep_id").collect()
    assert [(r["keep_id"], r["n_copies"]) for r in keys] == [(1, 3), (4, 1)]


def test_containment_pairs_scores(spark):
    """A document fully contained in another scores ~1.0 containment;
    n_a/n_b are the per-doc fingerprint counts."""
    inner = "the exact shared passage that is fully contained here"
    texts = [
        (1, inner),
        (2, "long prefix before it. " + inner + " and much more trailing content after"),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    rows = winnow.containment_pairs(df, k=5, w=4, min_shared=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["n_a"] < r["n_b"]
    assert r["shared_fingerprints"] <= r["n_a"]
    # the smaller doc is a strict substring: most of its fingerprints recur
    assert r["containment_ppm"] >= 800000
