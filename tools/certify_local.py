"""Self-serve certification: run EVERY registered query against its DuckDB
oracle at sf0.01 and write CORRECTNESS_local.json in the driver's row format
({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}).

The driver samples a bounded (50-entry) prefix of queries() per round, so
with a 168-query corpus the union of CORRECTNESS_r* files always trails new
work by rounds.  A committed local run makes the whole corpus auditable
immediately; for queries the driver later samples, its rows should agree
with these.

Comparison semantics mirror tools/check_correctness.py (and the driver):
column-name-sorted, row-sorted, stringified cells with 9-sig-digit floats;
"hash" here is equality of the canonical frames (same discriminating power
as the driver's value-hash, without needing its exact digest algorithm).

Usage: python tools/certify_local.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES, normalize_rows  # noqa: E402


def main() -> None:
    # --only a,b,c  -> certify just those queries, MERGE into the existing
    # out file (so a spot-run doesn't wipe the committed full run).
    only: set[str] | None = None
    argv = list(sys.argv[1:])
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out_path = argv[1] if len(argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CORRECTNESS_local.json"
    )

    import __spark_entry__ as e
    from kafka_connect_morphlines_spark import get_spark

    spark = get_spark(app_name="certify_local")
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    if only is not None:
        missing = only - set(qs)
        if missing:
            raise SystemExit(f"--only names not registered: {sorted(missing)}")
        qs = {k: v for k, v in qs.items() if k in only}
    results: dict[str, dict] = {}
    if only is not None and os.path.exists(out_path):
        with open(out_path) as fh:
            results.update(json.load(fh))
    t_start = time.time()
    for i, name in enumerate(qs):
        row = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        results[name] = row
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            row["spark_rows"] = len(srows)
        except Exception:
            row["err"] = traceback.format_exc()[-1500:]
            print(f"[{i + 1}/{len(qs)}] ERR   {name} (spark)", file=sys.stderr)
            continue
        if name not in oracles:
            row["err"] = "no_oracle"
            print(f"[{i + 1}/{len(qs)}] rows  {name}: {len(srows)}", file=sys.stderr)
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            row["oracle_rows"] = len(orows)
        except Exception:
            row["err"] = traceback.format_exc()[-1500:]
            print(f"[{i + 1}/{len(qs)}] ERR   {name} (oracle)", file=sys.stderr)
            continue
        sc, sr = normalize_rows(scols, srows)
        oc, orr = normalize_rows(ocols, orows)
        row["rows_match"] = len(sr) == len(orr)
        row["schema_match"] = sc == oc
        row["hash_match"] = bool(row["rows_match"] and row["schema_match"] and sr == orr)
        status = "ok" if row["hash_match"] else "FAIL"
        print(f"[{i + 1}/{len(qs)}] {status:5} {name}", file=sys.stderr)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    n_green = sum(1 for r in results.values() if r["hash_match"])
    n_rows_only = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_fail = sum(
        1 for r in results.values()
        if r["err"] not in (None, "no_oracle") or r["hash_match"] is False
    )
    print(
        f"certified {len(results)} queries in {time.time() - t_start:.0f}s: "
        f"{n_green} green, {n_rows_only} rows-only, {n_fail} failing -> {out_path}"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
