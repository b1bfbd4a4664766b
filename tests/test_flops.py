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


def test_param_census_matches_live_pytree():
    """contrastive_param_count must equal the real model's trainable
    parameter count (the same census test_models.py pins by hand)."""
    import jax
    import jax.numpy as jnp

    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.utils.flops import contrastive_param_count

    model = ContrastiveModel(d_e=16, adabn=True)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, 41, 12)), jnp.zeros((2, 41, 20)), 0.5, 0.5, True,
    )
    live = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(variables["params"])
    )
    assert contrastive_param_count() == live


def test_hbm_census_floor_matches_the_nogo_note():
    """The irreducible Adam floor (6P words) is the '~50 MB/step' the
    fused-train-step NO-GO note asserts; the expected census sits above
    it (grads + second weight read + activations)."""
    from contrastiveprosthetics_tpu.utils.flops import (
        train_hbm_bytes_per_step,
    )

    c = train_hbm_bytes_per_step(batch_size=8)
    assert c["floor_bytes"] == 6 * c["param_count"] * 4
    assert 45e6 < c["floor_bytes"] < 55e6          # ~48.6 MB
    assert c["total"] > c["floor_bytes"]
    assert c["optimizer_bytes"] == 10 * c["param_count"] * 4
    # activations scale with batch; the floor does not
    c32 = train_hbm_bytes_per_step(batch_size=32)
    assert c32["floor_bytes"] == c["floor_bytes"]
    assert c32["activation_bytes"] == 4 * c["activation_bytes"]


def test_hbm_roofline_math():
    from contrastiveprosthetics_tpu.utils.flops import (
        hbm_roofline,
        peak_hbm_bytes_per_sec,
    )

    assert peak_hbm_bytes_per_sec("TPU v5 lite") == 819e9
    r = hbm_roofline(50e6, 10_000.0, "TPU v5 lite")  # 500 GB/s achieved
    np.testing.assert_allclose(r["achieved_hbm_bytes_per_sec"], 500e9)
    np.testing.assert_allclose(r["roofline_frac"], 500e9 / 819e9)
    np.testing.assert_allclose(r["min_step_us"], 50e6 / 819e9 * 1e6)
    # unknown chip: no peak, no division error
    assert hbm_roofline(1e6, 1.0, "cpu-thing")["roofline_frac"] == 0.0
