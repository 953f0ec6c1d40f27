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


@settings(max_examples=300)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=32))
def test_int8_quantization_error_bound(vec):
    """similarity.quantize_int8's defining guarantee: dequantized values sit
    within scale/2 of the original (pure mirror of floor(x/scale + 0.5))."""
    mx = max(abs(x) for x in vec)
    scale = mx / 127.0
    if scale == 0:  # incl. subnormal mx underflowing the division
        return
    for x in vec:
        q = math.floor(x / scale + 0.5)
        assert abs(x - q * scale) <= scale / 2 + 1e-9 * mx
        assert -128 <= q <= 127  # symmetric scheme never overflows int8


@settings(max_examples=200)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 10_000)),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=6),
)
def test_cap_per_group_prefilter_exactness(rows, cap, n_parts):
    """traindata.cap_per_group(prefilter=True)'s correctness precondition:
    the global per-group top-cap is a subset of the union of per-partition
    top-caps, for ANY partitioning of the rows."""
    rows = [(g, s, i) for i, (g, s, _) in enumerate(rows)]  # unique ids
    def topcap(rs):
        out = {}
        for g, s, i in rs:
            out.setdefault(g, []).append((-s, i))
        kept = set()
        for g, lst in out.items():
            kept.update((g, i) for _, i in sorted(lst)[:cap])
        return kept
    global_kept = topcap(rows)
    parts = [rows[k::n_parts] for k in range(n_parts)]
    local_union = [r for p in parts for r in p if (r[0], r[2]) in topcap(p)]
    assert global_kept <= topcap(local_union) | global_kept
    # stronger: the global top-cap computed over the union equals the true one
    assert topcap(local_union) == global_kept


def _waterfill_quota(counts: dict, k: int) -> dict:
    """Pure-Python mirror of the r08 cap-aware apportionment in
    traindata.temperature_quota_sample (w = round-half-up micro-sqrt,
    ascending-n water-filling, integer largest-remainder on the
    unsaturated suffix)."""
    w = {s: math.floor(math.sqrt(n) * 1_000_000 + 0.5) for s, n in counts.items()}
    order = sorted(counts, key=lambda s: (counts[s], s))
    m = len(order)
    prefix_n = 0
    istar = None
    for i, s in enumerate(order):
        a = k - prefix_n
        b = sum(w[t] for t in order[i:])
        if a * w[s] <= counts[s] * b:
            istar = i
            break
        prefix_n += counts[s]
    quota = {}
    if istar is None:
        return dict(counts)  # k >= total: everything
    a = k - sum(counts[s] for s in order[:istar])
    b = sum(w[s] for s in order[istar:])
    for s in order[:istar]:
        quota[s] = counts[s]
    unsat = order[istar:]
    base = {s: (a * w[s]) // b for s in unsat}
    rem = {s: (a * w[s]) % b for s in unsat}
    t = a - sum(base.values())
    for s in sorted(unsat, key=lambda s: (-rem[s], s))[:t]:
        base[s] += 1
    quota.update(base)
    return quota


@settings(max_examples=300, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from([f"s{i}" for i in range(8)]),
        st.integers(min_value=1, max_value=100_000),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=50_000),
)
def test_waterfill_quota_exact_k_and_caps(counts, k):
    """The r08 apportionment contract: quotas never exceed source counts,
    and they sum to exactly min(k, total rows) for EVERY distribution —
    including ones where sqrt upweighting pushes small sources over their
    cap (the r07 defect class)."""
    q = _waterfill_quota(counts, k)
    total = sum(counts.values())
    assert set(q) == set(counts)
    assert all(0 <= q[s] <= counts[s] for s in counts), (counts, k, q)
    assert sum(q.values()) == min(k, total), (counts, k, q)
