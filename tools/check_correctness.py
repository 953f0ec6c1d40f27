"""Local correctness gate mimicking the driver's DuckDB-oracle comparison.

For every entry in __spark_entry__.queries(): run the Spark query and the
oracle SQL at the given SF, compare row count + normalized values
(column-name-sorted, row-sorted, stringified; floats rounded).  Queries
without an oracle get a rows-only check (must run and return >= 0 rows).

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def normalize_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(normalize_cell(vals[i]) for i in order))
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from kafka_connect_morphlines_spark import get_spark
    from kafka_connect_morphlines_spark.plans.queries import GOLDEN_SF001_ORACLES

    spark = get_spark(app_name="check_correctness")
    is_sf001 = os.path.normpath(sf_dir).endswith("sf0.01")

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name in qs:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {ex}")
            continue
        if name not in oracles or (name in GOLDEN_SF001_ORACLES and not is_sf001):
            # golden-backed oracles are pinned at sf0.01 by construction
            # (ADVICE r09): at other SFs they degrade to rows-only
            print(f"ok*   {name}: rows-only, {len(srows)} rows ({time.time() - t0:.1f}s)")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {type(ex).__name__}: {ex}")
            continue
        sc, sr = normalize_rows(scols, [tuple(r) for r in srows])
        oc, orr = normalize_rows(ocols, orows)
        if sc != oc:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={sc} oracle={oc}")
            continue
        if len(sr) != len(orr):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            continue
        if sr != orr:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(sr, orr)) if a != b)
            cells = [
                f"{sc[j]}: spark={a!r} oracle={b!r}"
                for j, (a, b) in enumerate(zip(sr[bad], orr[bad]))
                if a != b
            ]
            print(
                f"FAIL  {name}: values differ at sorted-row {bad} "
                f"({len(cells)} cell(s)):\n  " + "\n  ".join(cells)
                + f"\n  spark : {sr[bad]}\n  oracle: {orr[bad]}"
            )
            continue
        print(f"ok    {name}: {len(sr)} rows match ({time.time() - t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
