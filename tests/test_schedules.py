"""LR schedules vs torch semantics (train.py:75-80), incl. the shared-StepLR
compat quirk."""
import numpy as np

from contrastiveprosthetics_tpu.train.schedules import (
    cosine_factors,
    schedule_factors,
    step_factors,
)


def test_cosine_matches_torch_formula():
    # torch CosineAnnealingLR(T_max=8, eta_min=0): lr(e)=lr0·(1+cos(πe/8))/2
    f = cosine_factors(8)
    want = (1 + np.cos(np.pi * np.arange(8) / 8)) / 2
    np.testing.assert_allclose(f, want)
    assert f[0] == 1.0
    assert f[-1] > 0.0  # eta_min reached only at e=T_max


def test_step_matches_torch_formula():
    f = step_factors(12, step_size=5, gamma=0.2)
    want = 0.2 ** (np.arange(12) // 5)
    np.testing.assert_allclose(f, want)
    np.testing.assert_allclose([f[0], f[5], f[10]], [1.0, 0.2, 0.04], rtol=1e-12)


def test_shared_steplr_compat():
    # reference bug train.py:79-80: both StepLR handles wrap the glove
    # optimizer → the EMG lr never decays during crossval
    e, g = schedule_factors(12, annealing=False, compat_shared_steplr=True)
    np.testing.assert_allclose(e, np.ones(12))
    np.testing.assert_allclose(g, step_factors(12))
    # fixed default: both decay
    e2, g2 = schedule_factors(12, annealing=False)
    np.testing.assert_allclose(e2, g2)


def test_annealing_uses_cosine():
    e, g = schedule_factors(8, annealing=True)
    np.testing.assert_allclose(e, cosine_factors(8))
    np.testing.assert_allclose(e, g)
