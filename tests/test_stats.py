"""Welford stats vs the reference semantics (utils.py:79-130)."""
import numpy as np

from contrastiveprosthetics_tpu.ops.stats import RunningStats, welford_over_means


def reference_running_stats(windows, complete=False):
    """Literal re-implementation of the reference's streaming update for the
    oracle: Welford over per-window means (utils.py:85-127)."""
    counter = 0
    old_mean = new_mean = old_std = new_std = None
    for w in windows:
        counter += 1
        x = w.mean(0)
        if counter == 1:
            old_mean = new_mean = x
            old_std = np.zeros_like(x)
        else:
            new_mean = old_mean + (x - old_mean) / counter
            new_std = old_std + (x - old_mean) * (x - new_mean)
            old_mean, old_std = new_mean, new_std
    mean = new_mean.mean() if complete else new_mean
    std = np.sqrt(old_std / (counter - 1))
    return mean, std


def test_running_stats_matches_reference(rng):
    windows = rng.standard_normal((50, 100, 12))
    rs = RunningStats()
    for w in windows:
        rs.push(w)
    m, s = rs.mean_std()
    want_m, want_s = reference_running_stats(windows)
    np.testing.assert_allclose(m, want_m, rtol=1e-10)
    np.testing.assert_allclose(s, want_s, rtol=1e-10)


def test_complete_quirk_scalar_mean_vector_std(rng):
    windows = rng.standard_normal((30, 100, 12))
    rs = RunningStats(complete=True)
    for w in windows:
        rs.push(w)
    m, s = rs.mean_std()
    assert np.asarray(m).shape == ()        # scalar mean (emg_mean.npy shape)
    assert np.asarray(s).shape == (12,)     # per-channel std (emg_std.npy)
    want_m, want_s = reference_running_stats(windows, complete=True)
    np.testing.assert_allclose(m, want_m, rtol=1e-10)
    np.testing.assert_allclose(s, want_s, rtol=1e-10)


def test_vectorized_equals_streaming(rng):
    windows = rng.standard_normal((200, 25, 20))
    rs = RunningStats()
    for w in windows:
        rs.push(w)
    m1, s1 = rs.mean_std()
    m2, s2 = welford_over_means(windows)
    np.testing.assert_allclose(m1, m2, rtol=1e-9)
    np.testing.assert_allclose(s1, s2, rtol=1e-9)


def test_normalize_roundtrip(rng):
    windows = rng.standard_normal((40, 100, 12)) * 3 + 1
    rs = RunningStats()
    for w in windows:
        rs.push(w)
    x = rng.standard_normal((7, 100, 12))
    z = rs.normalize(x)
    np.testing.assert_allclose(z * rs.std() + rs.mean(), x, rtol=1e-9)
