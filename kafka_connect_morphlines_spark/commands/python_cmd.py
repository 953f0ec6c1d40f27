"""UDF escape hatch — parity with the kite ``java`` inline-code command
(SURVEY.md §2 B.2: imports+code compiled at pipeline-compile time).

The engine spec carries Python instead of Java (SURVEY.md §2 mapping).  Three
tiers, fastest first:

- ``sqlExpr``     — a Spark SQL expression string (pure Catalyst, codegen).
- ``python``      — a snippet defining ``def process(df): ...`` over the whole
                    DataFrame (can use F/T; still declarative if it sticks to
                    Column expressions).
- ``pandasBatch`` — a snippet defining ``def process(pdf): ...`` applied via
                    ``mapInPandas`` (Arrow-vectorized; requires outputSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from kafka_connect_morphlines_spark.commands import command
from kafka_connect_morphlines_spark.pipeline import PipelineSpecError


@command("sqlExpr")
def sql_expr(config, ctx):
    """``sqlExpr { field : "expr" }`` — assign columns from SQL expressions."""
    assignments = {fld: F.expr(str(e)) for fld, e in config.items()}

    def transform(df: DataFrame) -> DataFrame:
        return df.withColumns(assignments)

    return transform


@command("sqlFilter", "where")
def sql_filter(config, ctx):
    """``where { expr : "..." }`` — filter rows by a SQL predicate."""
    expr = config.get("expr", config.get("_value"))
    if not expr:
        raise PipelineSpecError("where/sqlFilter requires 'expr'")

    def transform(df: DataFrame) -> DataFrame:
        return df.filter(F.expr(str(expr)))

    return transform


def _compile_snippet(code: str, entry: str = "process"):
    ns: dict = {"F": F, "T": T}
    exec(compile(code, "<pipeline-python>", "exec"), ns)  # noqa: S102 — explicit UDF escape hatch, like the kite `java` command
    if entry not in ns:
        raise PipelineSpecError(f"python snippet must define {entry}()")
    return ns[entry]


@command("python", "java")
def python_cmd(config, ctx):
    """Inline code over the DataFrame: ``python { code : \"def process(df): ...\" }``.

    Registered under ``java`` too so reference-shaped specs compile; the
    snippet is Python (we are not a JVM host).
    """
    fn = _compile_snippet(str(config.get("code", "")))

    def transform(df: DataFrame) -> DataFrame:
        out = fn(df)
        if not isinstance(out, DataFrame):
            raise PipelineSpecError("python snippet process(df) must return a DataFrame")
        return out

    return transform


@command("pandasBatch")
def pandas_batch(config, ctx):
    """Arrow-batched per-partition transform: ``def process(pdf) -> pdf``
    applied via ``mapInPandas`` (the vectorized slow path — SURVEY.md §7.0)."""
    fn = _compile_snippet(str(config.get("code", "")))
    out_schema = config.get("outputSchema")
    if not out_schema:
        raise PipelineSpecError("pandasBatch requires outputSchema (DDL string)")

    def transform(df: DataFrame) -> DataFrame:
        def mapper(batches):
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(mapper, out_schema)

    return transform
