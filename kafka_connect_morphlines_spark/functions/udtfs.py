"""Python UDTFs (Spark 4 user-defined TABLE functions) — the 1->N leg of
the UDF surface (python_cmd.py covers scalar sqlExpr/python/pandasBatch).

A UDTF is the right tool when one input row yields a variable number of
typed output rows and the logic doesn't decompose into explode(F.split):
the class below is deliberately simple (sentence segmentation) so the
query corpus can certify the MECHANICS — registration, LATERAL join,
column pruning through the generator — against a SQL oracle.

Scale posture: a UDTF runs row-at-a-time in Python workers (slower than
codegen explode; comparable to a python command).  Use it for genuinely
irregular 1->N logic; for regular splits prefer explode of a codegen
split, as every text operator in this repo does.  The split regex is
RE2-compatible (no lookbehind) so the oracle runs the identical pattern.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

SENTENCE_RE = re.compile(r"[^.!?]+[.!?]?")


@udtf(returnType="pos int, sentence string")
class SplitSentences:
    """(text) -> one row per sentence with its position."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        pos = 0
        for m in SENTENCE_RE.findall(text):
            s = m.strip()
            if s:
                yield pos, s
                pos += 1


def register(spark) -> None:
    """Register all library UDTFs for spark.sql use."""
    spark.udtf.register("split_sentences", SplitSentences)
