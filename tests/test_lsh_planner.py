"""plan_lsh_params: S-curve optimizer properties (pure math, no Spark)."""

import pytest

from py_stringsimjoin_spark.operators.dedup import plan_lsh_params


def _err(b, r, t, w_fp, w_fn, grid=1000):
    fp = fn = 0.0
    for i in range(grid):
        s = (i + 0.5) / grid
        p = 1.0 - (1.0 - s**r) ** b
        if s < t:
            fp += p
        else:
            fn += 1.0 - p
    return w_fp * fp / grid + w_fn * fn / grid


def test_optimal_among_all_divisor_pairs():
    for t in (0.4, 0.8):
        got = plan_lsh_params(t, 64)
        assert got["bands"] * got["rows"] == 64
        best = min(
            _err(b, 64 // b, t, 0.5, 0.5)
            for b in range(1, 65)
            if 64 % b == 0
        )
        assert _err(got["bands"], got["rows"], t, 0.5, 0.5) == pytest.approx(best)


def test_s50_tracks_threshold_and_fp_weighting():
    lo = plan_lsh_params(0.3, 128)
    hi = plan_lsh_params(0.9, 128)
    assert lo["bands"] > hi["bands"]  # lower threshold -> steeper-left curve
    assert lo["s50"] < hi["s50"]
    # up-weighting FP pushes the curve right (fewer candidates)
    strict = plan_lsh_params(0.5, 128, fp_weight=0.9, fn_weight=0.1)
    loose = plan_lsh_params(0.5, 128, fp_weight=0.1, fn_weight=0.9)
    assert strict["fp"] <= loose["fp"]
    assert strict["s50"] >= loose["s50"]


def test_validation():
    with pytest.raises(ValueError):
        plan_lsh_params(0.0)
    with pytest.raises(ValueError):
        plan_lsh_params(1.0)
    with pytest.raises(ValueError):
        plan_lsh_params(0.5, num_perm=1)
