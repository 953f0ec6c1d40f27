"""Regenerate golden outputs for the rows-only queries (no SQL oracle).

The driver's DuckDB oracle can't express these (engine-specific samplers,
xxhash64 seeds, hyperplane/IVF bucketing, sketch internals), so the hard
equality gate is a committed golden file instead: seed-fixed output at
sf0.01, produced under the same session config the test suite uses
(master local[8], shuffle_partitions 8 — see tests/conftest.py).

Usage: python tools/make_goldens.py [sf_dir]
Writes tests/resources/goldens/<query>.json (sorted rows, stable layout).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_morphlines_spark.session import get_spark  # noqa: E402
from kafka_connect_morphlines_spark.plans.queries import QUERIES  # noqa: E402

GOLDEN_QUERIES = [
    "sample_seeded",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_ann_lsh",
    "embedding_near_dupes",
    "embedding_ivf_topk",
    "multimodal_features",
    "approx_sketches",
    "kmeans_cluster_stats",
    "hll_sketch_rollup",
    "pq_encode_codes",
    "pq_topk_adc",
    "bpe_merge_rules",
    "hll_audience_overlap",
    "bpe_encode_sample",
    "unigram_lm_vocab",
    "unigram_lm_encode_sample",
    "embedding_pca_whiten",
    "hll_rolling_distinct_users",
    "embedding_random_projection",
    # r10: not rows-only (it HAS a SQL oracle) — committed as an exact
    # golden on top so a driver-environment hash mismatch (the
    # CORRECTNESS_r09 episode) localizes to a named cell via pytest
    "weighted_median_price_by_flag",
]

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "resources", "goldens")


def canonical_rows(df) -> list[list]:
    """Rows as sorted JSON-safe lists (column order = sorted names, like the
    driver's compare; bytes hex-encoded, DECIMALs stringified — exact, no
    float round-trip; floats kept as emitted — queries round their own
    floats)."""
    from decimal import Decimal

    cols = sorted(df.columns)
    rows = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        rows.append([
            d[c].hex() if isinstance(d[c], (bytes, bytearray))
            else str(d[c]) if isinstance(d[c], Decimal)
            else d[c]
            for c in cols
        ])
    rows.sort(key=lambda row: json.dumps(row, sort_keys=True, default=str))
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = [n for n in sys.argv[2:] if n in GOLDEN_QUERIES]
    spark = get_spark(app_name="goldens", master="local[8]", shuffle_partitions=8)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in only or GOLDEN_QUERIES:
        df = QUERIES[name].build(spark, sf_dir)
        payload = {"query": name, "sf_dir": sf_dir, "columns": sorted(df.columns), "rows": canonical_rows(df)}
        path = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, indent=1, default=str)
            fh.write("\n")
        print(f"wrote {path} ({len(payload['rows'])} rows)")


if __name__ == "__main__":
    main()
