"""Regenerate the pinned golden parquet that serves as the DuckDB oracle
for compression_ratio_quality (VERDICT r08 next-round #6).

zlib has no SQL analogue, but its output at a pinned level is fully
deterministic for a given zlib build, so the certification gate can be a
committed golden: this tool runs the Spark query at sf0.01 (the driver's
correctness SF by contract) and writes the result as ONE parquet file
that the oracle SQL reads back via read_parquet().  The pin catches any
drift in the Spark-side plumbing (schema, batching, null handling,
rounding) — the semantics zlib itself guarantees are pinned by
tests/test_textclean.py's known-string exact values.

Usage: python tools/make_compression_golden.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = os.path.join(
    REPO, "tests", "resources", "goldens", "compression_ratio_quality_sf001.parquet"
)


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_connect_morphlines_spark.plans.queries import QUERIES
    from kafka_connect_morphlines_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        app_name="make_compression_golden",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    df = QUERIES["compression_ratio_quality"].build(spark, sf)
    pdf = df.toPandas()
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(table, GOLDEN)
    print(f"wrote {len(pdf)} rows -> {GOLDEN}")


if __name__ == "__main__":
    main()
