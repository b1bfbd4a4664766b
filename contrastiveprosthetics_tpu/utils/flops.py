"""Static FLOP census + MFU accounting for the bench (VERDICT r1 #3).

The model is fixed and tiny, so FLOPs/window are computed by a static
census of its GEMM/conv shapes (the same way ``tests/test_models.py``
census-counts parameters) rather than by runtime cost analysis — the
number is exact for the MXU-relevant ops and independent of backend
support for ``cost_analysis()``.

Peak-FLOPs table: the public TPU v5e figure is 197 TFLOP/s bf16
(jax-ml.github.io/scaling-book). There is no native f32 MXU path: with
JAX's default matmul precision, f32 dots run as one bf16 pass with f32
accumulation (≈ bf16 peak); ``HIGHEST`` precision uses 6 passes (≈ peak/6).
MFU here is reported against the **bf16 peak** — the honest, conservative
denominator for the chip, regardless of the compute dtype in use.
"""
from __future__ import annotations

# device_kind (jax.devices()[0].device_kind) → peak FLOP/s
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}


def peak_flops(device_kind: str) -> dict:
    """{"bf16": peak, "f32_highest": peak/6} for a device kind (0.0 if
    unknown — e.g. the CPU backend, where MFU is not meaningful)."""
    bf16 = _PEAK_BF16.get(device_kind, 0.0)
    return {"bf16": bf16, "f32_highest": bf16 / 6.0 if bf16 else 0.0}


def emg_forward_flops_per_window(
    emg_dim: int = 12,
    conv_features: int = 64,
    n_linear: int = 7,
    hidden: int = 512,
    d_e: int = 16,
) -> float:
    """Forward FLOPs for ONE sEMG window through the contrastive EMG
    encoder (models/emg_net.py; reference models.py:248-315). Counts
    multiply-adds as 2 FLOPs; BN/ReLU/dropout elementwise ops are noise
    (<1 %) next to the GEMMs and are excluded.

    conv1: 1×12 image, 3×3 kernel, 1→64 channels  (12·64·9·1 MACs)
    conv2: 64→64                                   (12·64·9·64 MACs)
    MLP:   Dense(768→512) + (n_linear-1)×Dense(512→512)
    head:  Dense(512→d_e)
    """
    conv = 2 * (emg_dim * conv_features * 9 * 1
                + emg_dim * conv_features * 9 * conv_features)
    flat = emg_dim * conv_features
    mlp = 2 * (flat * hidden + (n_linear - 1) * hidden * hidden)
    head = 2 * hidden * d_e
    return float(conv + mlp + head)


def train_flops_per_window(**kw) -> float:
    """Training FLOPs/window ≈ 3× forward (forward + ~2× for the backward
    pass through the same GEMMs). The class encoder (one-hot → 41×16
    Dense) and the similarity/loss are per-batch-item, not per-window,
    and contribute <0.5 % — excluded, keeping the number conservative."""
    return 3.0 * emg_forward_flops_per_window(**kw)


def mfu(windows_per_sec: float, flops_per_window: float,
        device_kind: str) -> dict:
    """Achieved FLOP/s and model-FLOPs-utilization vs the bf16 peak.
    Returns {"achieved_flops": .., "mfu_bf16": ..} (mfu 0.0 when the chip
    peak is unknown)."""
    achieved = windows_per_sec * flops_per_window
    peak = peak_flops(device_kind)["bf16"]
    return {
        "achieved_flops": achieved,
        "mfu_bf16": achieved / peak if peak else 0.0,
    }


# =================================================== HBM bytes/step census
# device_kind → peak HBM bandwidth, bytes/s (jax-ml.github.io/scaling-book
# hardware table: v5e 819 GB/s, v4 1228, v5p 2765, v6e 1640).
_PEAK_HBM = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v4": 1228e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
}


def peak_hbm_bytes_per_sec(device_kind: str) -> float:
    """Peak HBM bandwidth for a device kind (0.0 if unknown)."""
    return _PEAK_HBM.get(device_kind, 0.0)


def contrastive_param_count(
    emg_dim: int = 12,
    conv_features: int = 64,
    n_linear: int = 7,
    hidden: int = 512,
    d_e: int = 16,
    n_classes: int = 41,
) -> int:
    """Exact trainable-parameter count of the contrastive model (verified
    against the live pytree by tests/test_models.py's census: conv 1→64,
    64→64 3×3 + BNs, Dense(768→512) + (n_linear-1)×Dense(512→512) + BNs,
    no-bias d_e head; one-hot class embed)."""
    flat = emg_dim * conv_features
    emg = (
        (1 * conv_features * 9 + conv_features)
        + (conv_features * conv_features * 9 + conv_features)   # convs
        + 2 * (conv_features * 2)                               # conv BNs
        + (flat * hidden + hidden)
        + (n_linear - 1) * (hidden * hidden + hidden)           # linears
        + n_linear * (hidden * 2)                               # linear BNs
        + hidden * d_e                                          # head
    )
    glove = n_classes * d_e + d_e
    return emg + glove


def train_hbm_bytes_per_step(
    batch_size: int = 8,
    n_tasks: int = 41,
    param_count: int | None = None,
    emg_dim: int = 12,
    conv_features: int = 64,
    n_linear: int = 7,
    hidden: int = 512,
    d_e: int = 16,
    dtype_bytes: int = 4,
) -> dict:
    """Irreducible HBM traffic for ONE Adam train step (the memory-roofline
    census the "HBM/optimizer-bound" claim rests on — VERDICT r2 task 4).

    Weight/optimizer traffic (10 × P words — the floor XLA cannot fuse
    away, since each array must cross HBM at least once per step):
      forward weight read P, backward weight read P, gradient write P,
      Adam update: read {grad, mu, nu, params} 4P + write {mu, nu,
      params} 3P.
    Activation traffic: per window, the inter-layer activations (conv
    outs, n_linear hidden vectors, head) written in forward and re-read in
    backward (2 passes), plus the dropout masks on the last 4 layers
    (write + read). In practice XLA keeps some of this in VMEM/registers
    via fusion, so the census OVERCOUNTS activations slightly and the
    resulting minimum step time is conservative-high (roofline_frac can
    legitimately exceed 1 when fusion beats the 2-pass assumption).
    Batch gather and the class-encoder/similarity/loss terms are counted
    but are <2 % at canonical geometry.

    Returns a dict with the breakdown and the ``total`` bytes.
    """
    if param_count is None:
        param_count = contrastive_param_count(
            emg_dim=emg_dim, conv_features=conv_features,
            n_linear=n_linear, hidden=hidden, d_e=d_e,
        )
    windows = batch_size * n_tasks
    # FLOOR: arrays that must cross HBM at least once per step no matter
    # how aggressively XLA fuses — params read+write, mu read+write,
    # nu read+write = 6P words. (Gradients and the second weight read can
    # in principle fuse into the backward epilogue; activations of this
    # tiny model can stay on-chip.) 6P ≈ 48.6 MB at canonical width — the
    # "~50 MB/step of irreducible Adam traffic" in the fused-train-step
    # NO-GO note (ops/pallas_ops.py) is exactly this floor.
    floor_words = 6 * param_count
    # EXPECTED: what a non-heroic compilation actually moves — backward
    # re-reads weights (P), gradients materialize (write + read = 2P),
    # a second params read by the optimizer fusion (P), plus inter-layer
    # activations written forward / read backward and the dropout masks.
    opt_words = 10 * param_count
    act_words_per_window = (
        2 * (2 * emg_dim * conv_features + n_linear * hidden + d_e)
        + 2 * (4 * hidden)   # dropout masks, last 4 layers
    )
    act_words = windows * act_words_per_window
    # input gather (EMG window + glove row, read + write of the batch)
    gather_words = 2 * windows * (emg_dim + 20)
    # class embed out + similarity logits + CE intermediates (fwd + bwd)
    loss_words = 2 * batch_size * (n_tasks * d_e + 2 * n_tasks * n_tasks)
    total = dtype_bytes * (opt_words + act_words + gather_words + loss_words)
    return {
        "param_count": param_count,
        "floor_bytes": dtype_bytes * floor_words,
        "optimizer_bytes": dtype_bytes * opt_words,
        "activation_bytes": dtype_bytes * act_words,
        "gather_bytes": dtype_bytes * gather_words,
        "loss_bytes": dtype_bytes * loss_words,
        "total": total,
    }


def hbm_roofline(
    bytes_per_step: float, steps_per_sec: float, device_kind: str
) -> dict:
    """Memory-roofline accounting: achieved HBM bytes/s against the chip
    peak, and the bandwidth-implied minimum step time.

    ``roofline_frac`` is the fraction of the *achievable* (bandwidth)
    bound actually reached — the number that tells whether a low MFU is
    near-ceiling (memory-bound workload at roofline_frac ≈ 1) or leaving
    real performance on the table (roofline_frac « 1 AND mfu « 1)."""
    peak = peak_hbm_bytes_per_sec(device_kind)
    achieved = bytes_per_step * steps_per_sec
    return {
        "achieved_hbm_bytes_per_sec": achieved,
        "min_step_us": bytes_per_step / peak * 1e6 if peak else 0.0,
        "roofline_frac": achieved / peak if peak else 0.0,
    }
