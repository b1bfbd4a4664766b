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
