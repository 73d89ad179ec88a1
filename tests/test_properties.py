"""Property-based tests (hypothesis) for the pure-python kernels.

These pin algebraic invariants the example-based suites cannot sweep:
KLL rank-error and merge-order invariance, percentile_of_score's
scipy-rank semantics, histogram-quantile monotonicity/bounds, and the
nearest-rank rule. No SparkSession — the kernels run driver-side or
inside Arrow batches, so the properties hold wherever they execute.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gate_spark.kernels import percentile_of_score
from gate_spark.kll import KLLSketch
from gate_spark.sketches import quantiles_from_hist

floats = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


# --------------------------------------------------------------- KLL


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(floats, min_size=1, max_size=4000),
    q=st.floats(min_value=0.0, max_value=1.0),
)
def test_kll_rank_error_bound(data, q):
    """KLL quantile answers land within a 10% rank band of the truth at
    k=200 (the paper bound is O(1/k) w.h.p.; 10% is a loose determinism-
    safe envelope for the derandomized compactor)."""
    sk = KLLSketch(200)
    sk.update_many(np.asarray(data))
    est = sk.quantiles([q])[0]
    sv = np.sort(np.asarray(data, dtype=np.float64))
    lo = sv[int(np.floor(max(0.0, q - 0.1) * (len(sv) - 1)))]
    hi = sv[int(np.ceil(min(1.0, q + 0.1) * (len(sv) - 1)))]
    assert lo <= est <= hi


@settings(max_examples=20, deadline=None)
@given(
    data=st.lists(floats, min_size=2, max_size=2000),
    cut=st.integers(min_value=1, max_value=10),
    q=st.floats(min_value=0.0, max_value=1.0),
)
def test_kll_merge_any_split_within_band(data, cut, q):
    """Merging per-chunk partials — any chunking — stays in the rank
    band: the mergeability contract the two-phase Spark path relies on."""
    arr = np.asarray(data, dtype=np.float64)
    chunks = np.array_split(arr, min(cut, len(arr)))
    merged = KLLSketch(200)
    for c in chunks:
        p = KLLSketch(200)
        p.update_many(c)
        merged.merge(KLLSketch.from_json(p.to_json()))
    assert merged.n == len(arr)
    est = merged.quantiles([q])[0]
    sv = np.sort(arr)
    lo = sv[int(np.floor(max(0.0, q - 0.15) * (len(sv) - 1)))]
    hi = sv[int(np.ceil(min(1.0, q + 0.15) * (len(sv) - 1)))]
    assert lo <= est <= hi


@settings(max_examples=20, deadline=None)
@given(data=st.lists(floats, min_size=1, max_size=1500))
def test_kll_uncompacted_is_exact_nearest_rank(data):
    """With k >= n the sketch never compacts: quantiles equal the exact
    nearest-rank rule (round-half-up of q*(n-1)) bit-for-bit — the
    property the summarize_sketch_quantiles oracle gate rests on."""
    arr = np.asarray(data, dtype=np.float64)
    sk = KLLSketch(max(8, len(arr)))
    sk.update_many(arr)
    sv = np.sort(arr)
    for q in (0.0, 0.25, 0.5, 0.95, 1.0):
        idx = int(np.floor(q * (len(sv) - 1) + 0.5))
        assert sk.quantiles([q])[0] == sv[idx]


# ------------------------------------------- percentile_of_score


@settings(max_examples=50, deadline=None)
@given(
    a=st.lists(floats, min_size=1, max_size=300),
    score_idx=st.integers(min_value=0, max_value=299),
)
def test_percentile_of_score_matches_scipy_rank(a, score_idx):
    """kind='rank' definition: (count_less + count_leq + 1_if_any_equal)
    * 50 / n — checked against the direct formula and bounded in
    [0, 100]; a score drawn FROM the array is never below the fraction
    strictly less than it."""
    arr = np.asarray(a, dtype=np.float64)
    score = float(arr[score_idx % len(arr)])
    p = percentile_of_score(arr, score)
    left = float(np.count_nonzero(arr < score))
    right = float(np.count_nonzero(arr <= score))
    expected = (left + right + (1.0 if right > left else 0.0)) * 50.0 / len(arr)
    assert p == expected
    assert 0.0 <= p <= 100.0
    assert p >= left / len(arr) * 100.0


# ------------------------------------------------ histogram quantiles


@settings(max_examples=50, deadline=None)
@given(
    hist=st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=40),
    qpair=st.tuples(
        st.floats(min_value=0.01, max_value=0.99),
        st.floats(min_value=0.01, max_value=0.99),
    ),
)
def test_hist_quantiles_monotone_and_bounded(hist, qpair):
    """Quantiles from a fixed-edge histogram are monotone in q and, for
    q in (0,1), bounded by [vmin, vmax] when provided (open-bin answers
    resolve to the true extrema, never a clamp to an inner edge)."""
    edges = [float(i) for i in range(len(hist) - 1)]  # inner edges
    qs = sorted(qpair)
    vmin, vmax = -5.0, float(len(hist) + 5)
    out = quantiles_from_hist(hist, edges, qs, vmin=vmin, vmax=vmax)
    if sum(hist) == 0:
        assert all(np.isnan(v) for v in out)
        return
    assert out[0] <= out[1]
    for v in out:
        assert vmin <= v <= vmax
