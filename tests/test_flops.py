"""FLOP census sanity (utils/flops.py): the bench's MFU numbers hang off
these constants, so pin them against an independent hand count."""
import numpy as np

from contrastiveprosthetics_tpu.utils.flops import (
    emg_forward_flops_per_window,
    mfu,
    peak_flops,
    train_flops_per_window,
)


def test_forward_census_matches_hand_count():
    # canonical architecture (models/emg_net.py; reference models.py:248-315)
    conv1 = 12 * 64 * 9 * 1
    conv2 = 12 * 64 * 9 * 64
    mlp = 768 * 512 + 6 * 512 * 512
    head = 512 * 16
    want = 2 * (conv1 + conv2 + mlp + head)
    assert emg_forward_flops_per_window() == float(want)
    # the VERDICT r1 estimate said ~4.9 MFLOP forward; the census agrees
    assert 4.5e6 < want < 5.2e6


def test_train_is_3x_forward_and_scales_with_width():
    assert train_flops_per_window() == 3.0 * emg_forward_flops_per_window()
    wide = emg_forward_flops_per_window(hidden=1024)
    assert wide > 3 * emg_forward_flops_per_window(hidden=512)


def test_mfu_math_and_unknown_chip():
    p = peak_flops("TPU v5 lite")
    assert p["bf16"] == 197e12
    out = mfu(2.0e6, train_flops_per_window(), "TPU v5 lite")
    np.testing.assert_allclose(
        out["achieved_flops"], 2.0e6 * train_flops_per_window()
    )
    assert 0.0 < out["mfu_bf16"] < 1.0
    # CPU/unknown chips: no peak -> mfu 0, never a division error
    assert mfu(1e6, 1e6, "cpu-thing")["mfu_bf16"] == 0.0
    assert peak_flops("cpu-thing")["f32_highest"] == 0.0
