"""Property-based tests for the math contracts behind the sketch/blocking
operators — pure Python mirrors of the formulas both the Spark side and
the DuckDB oracles evaluate, so no Spark session is needed.

- DDSketch: the log-gamma bucket midpoint must sit within relative error
  alpha of EVERY value the bucket admits (the sketch's defining guarantee;
  if these constants drifted, dd_quantiles would silently lose its bound).
- q-gram blocking: strings within edit distance k that are longer than
  q*(k+1)-1 must share at least one q-gram (the recall precondition
  relational.fuzzy_join's candidate join relies on).
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

ALPHA = 0.01
GAMMA = (1 + ALPHA) / (1 - ALPHA)
LOG_GAMMA = math.log(GAMMA)


@settings(max_examples=300)
@given(st.floats(min_value=1e-6, max_value=1e12, allow_nan=False))
def test_ddsketch_bucket_midpoint_within_alpha(v):
    b = math.ceil(math.log(v) / LOG_GAMMA)
    est = 2.0 * math.exp(b * LOG_GAMMA) / (GAMMA + 1.0)
    assert abs(est - v) / v <= ALPHA + 1e-9


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _grams(s: str, q: int) -> set:
    if len(s) < q:
        return {s}
    return {s[i : i + q] for i in range(len(s) - q + 1)}


@settings(max_examples=300)
@given(
    st.text(alphabet="abcdef", min_size=4, max_size=12),
    st.integers(min_value=0, max_value=11),
    st.sampled_from("abcdef"),
    st.sampled_from(["sub", "del", "ins"]),
)
def test_qgram_blocking_recall_for_edit1(s, pos, ch, op):
    q, k = 2, 1
    pos = min(pos, len(s) - 1)
    if op == "sub":
        t = s[:pos] + ch + s[pos + 1 :]
    elif op == "del":
        t = s[:pos] + s[pos + 1 :]
    else:
        t = s[:pos] + ch + s[pos:]
    if min(len(s), len(t)) <= q * (k + 1) - 1:
        return  # below the documented length precondition
    assert _lev(s, t) <= 1
    assert _grams(s, q) & _grams(t, q), (s, t)
