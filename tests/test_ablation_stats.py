"""Unit tests for the ablation statistics helpers.

These helpers gate the repo's headline capability claim (README
"Capability evidence"): the paired-delta bootstrap CI, the sign-flip
permutation p-value, and the power estimate ("seeds needed to resolve").
They are plain NumPy and must behave sanely on tiny n, where a bug would
silently mis-state the intertwiner verdict.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from ablation_check import _paired_bootstrap, _seeds_to_resolve  # noqa: E402


class TestPairedBootstrap:
    def test_strong_consistent_effect_ci_excludes_zero(self):
        # mimics the measured l2 arm: every seed negative, tight spread
        d = np.array([-0.066, -0.069, -0.057, -0.063])
        lo, hi, p = _paired_bootstrap(d)
        assert hi < 0 and lo < 0
        assert lo <= d.mean() <= hi
        # exact sign-flip enumeration at n=4: min two-sided p is 2/16
        assert p == pytest.approx(2 / 16)

    def test_mixed_effect_ci_straddles_zero(self):
        # mimics the measured ot arm: one large positive outlier
        d = np.array([-0.020, -0.030, 0.077])
        lo, hi, p = _paired_bootstrap(d)
        assert lo < 0 < hi
        assert p > 0.05

    def test_deterministic(self):
        d = np.array([0.01, -0.02, 0.03, 0.015])
        assert _paired_bootstrap(d) == _paired_bootstrap(d)

    def test_exact_enumeration_small_n(self):
        # n=2, all positive: the 4 sign patterns give |mean| >= obs in
        # exactly 2 cases (++ and --) -> p = 0.5
        d = np.array([0.1, 0.2])
        _, _, p = _paired_bootstrap(d)
        assert p == pytest.approx(0.5)

    def test_large_n_falls_back_to_sampling(self):
        rng = np.random.RandomState(1)
        d = rng.normal(0.05, 0.01, size=20)  # n>16 path
        lo, hi, p = _paired_bootstrap(d)
        assert lo > 0 and p < 0.01


class TestSeedsToResolve:
    def test_zero_sd_resolves_at_one(self):
        assert _seeds_to_resolve(np.array([0.05, 0.05, 0.05])) == 1

    def test_zero_mean_never_resolves(self):
        out = _seeds_to_resolve(np.array([-0.01, 0.01]))
        assert isinstance(out, str) and out.startswith(">")

    def test_matches_normal_approx_formula(self):
        # mean 0.009, sd 0.0590 -> ceil((1.96*0.0590/0.009)^2) = 166,
        # precomputed by hand so the test cannot share the implementation's
        # formula (ADVICE r3)
        d = np.array([0.009, 0.068, -0.050])
        assert _seeds_to_resolve(d) == 166

    def test_strong_effect_needs_few_seeds(self):
        d = np.array([-0.066, -0.069, -0.057])
        assert _seeds_to_resolve(d) <= 2
