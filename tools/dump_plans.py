"""Dump `.explain("formatted")` output per query to files — the round's
plan-audit artifacts (plans/rN/<query>_<suffix>.txt).

Usage:
    python tools/dump_plans.py OUT_DIR SUFFIX q1 [q2 ...]

Runs from whatever repo checkout the CWD points at (so a git worktree of
an older commit produces that commit's plans).  Environment:
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

The formatted explain is the PRE-execution plan (AdaptiveSparkPlan
isFinalPlan=false) — exactly what `df.explain("formatted")` shows a user;
it exposes Exchange placement, join strategy, PushedFilters/ReadSchema
and the codegen span structure that the round report cites.
"""

from __future__ import annotations

import io
import contextlib
import os
import sys

sys.path.insert(0, os.getcwd())

from kafka_connect_morphlines_spark import get_spark  # noqa: E402
from kafka_connect_morphlines_spark.plans.queries import QUERIES  # noqa: E402


def explain_str(df) -> str:
    try:
        mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return df._jdf.queryExecution().explainString(mode)
    except Exception:  # noqa: BLE001 - fall back to capturing the print
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"dump_plans_{suffix}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not registered in this checkout", file=sys.stderr)
            continue
        try:
            df = QUERIES[name].build(spark, sf_dir)
            txt = explain_str(df)
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR building {name}: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n")
            fh.write(txt)
            if not txt.endswith("\n"):
                fh.write("\n")
        print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
