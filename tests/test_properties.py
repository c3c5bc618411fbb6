"""Property-based tests (hypothesis) for the pure kernels: Gorilla codec
round-trip identity over adversarial series, grid-interp invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from aisdb_spark.operators.codec import (
    decode_ts,
    decode_vals,
    encode_ts,
    encode_vals,
)
from aisdb_spark.operators.interp import _grid_interp


@settings(max_examples=50, deadline=None)
@given(
    deltas=st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=0, max_size=200
    ),
    base=st.integers(min_value=0, max_value=2**50),
)
def test_ts_codec_roundtrip(deltas, base):
    ts = np.cumsum([base] + deltas).astype(np.int64)
    assert np.array_equal(decode_ts(encode_ts(ts)), ts)


@settings(max_examples=50, deadline=None)
@given(
    v=arrays(
        np.float64,
        st.integers(min_value=0, max_value=200),
        elements=st.floats(
            allow_nan=False, allow_infinity=True, width=64
        ),
    )
)
def test_val_codec_roundtrip(v):
    got = decode_vals(encode_vals(v))
    assert np.array_equal(got.view(np.uint64), np.ascontiguousarray(v).view(np.uint64))


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=50),
    step=st.integers(min_value=1, max_value=5000),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_grid_interp_invariants(n, step, seed):
    rng = np.random.default_rng(seed)
    # keep the sampled span bounded so the arange grid stays small
    t = np.cumsum(rng.integers(1, 2000, size=n)).astype(np.int64)
    v = rng.integers(0, 1000, size=n).astype(np.float64)
    grid, out = _grid_interp(t, v, step)
    # grid is arange(t0, tn+step, step): starts at t0, regular, covers tn
    assert grid[0] == t[0]
    assert np.all(np.diff(grid) == step)
    assert grid[-1] >= t[-1] and grid[-1] < t[-1] + step
    # values bounded by sample envelope; exact at sample-aligned points
    assert out.min() >= v.min() - 1e-9 and out.max() <= v.max() + 1e-9
    exact = np.searchsorted(grid, t)
    for gi, ti in zip(exact, range(n)):
        if gi < len(grid) and grid[gi] == t[ti]:
            # duplicate timestamps: last sample wins in _grid_interp's
            # convention (searchsorted right)
            expect = v[np.nonzero(t == t[ti])[0][-1]]
            assert abs(out[gi] - expect) < 1e-9
