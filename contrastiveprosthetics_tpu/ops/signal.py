"""Signal-processing primitives, JAX-native.

TPU-first rewrites of the reference's scipy-based preprocessing
(reference ``code/utils.py:134-156``):

  * ``butter_bandpass`` — Butterworth coefficient *design* (a tiny, one-time,
    CPU-side computation; we delegate to scipy, which is the numerics oracle
    the reference used via ``scipy.signal.butter`` at ``utils.py:142``).
  * ``lfilter`` — causal IIR application as a ``lax.scan`` over time in
    transposed direct-form II. Vectorized over channels and batched windows,
    so a whole subject's (stim × rep) segments filter in one XLA graph
    instead of the reference's 11,316-iteration Python loop
    (``load.py:135-141``).
  * ``moving_rms`` — window-11 moving RMS (``utils.py:151-156``). The
    reference computes ``uniform_filter1d(x², 11, mode='nearest')`` and trims
    ``WINDOW_EDGE=5`` per side; after the trim every surviving window is a
    *full* window, so this is exactly a valid-mode sliding mean — implemented
    with a cumulative sum (one pass, no convolution).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _scipy_signal

# re-exported here for the signal/serving callers; defined jax-free in
# config.py so the numpy-only ingest oracle can share it
from contrastiveprosthetics_tpu.config import INGEST_PRESCALE  # noqa: E402


def butter_bandpass(
    low_hz: float, high_hz: float, fs: float, order: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Design Butterworth bandpass coefficients (b, a), a0 normalized to 1.

    Mirrors reference ``utils.py:134-147`` (order-4, 20–450 Hz @ 2 kHz).
    """
    nyq = fs / 2.0
    b, a = _scipy_signal.butter(
        order, [low_hz / nyq, high_hz / nyq], btype="bandpass"
    )
    return np.asarray(b, dtype=np.float64), np.asarray(a, dtype=np.float64)


def butter_bandpass_sos(
    low_hz: float, high_hz: float, fs: float, order: int = 4
) -> np.ndarray:
    """Same filter as ``butter_bandpass`` in second-order sections (n_sec, 6).

    SOS is the numerically robust form for float32 application on TPU: an
    order-8 bandpass as a single polynomial recursion loses ~2 decimal digits
    in f32, while the biquad cascade stays within ~1e-5 of the f64 oracle.
    """
    nyq = fs / 2.0
    sos = _scipy_signal.butter(
        order, [low_hz / nyq, high_hz / nyq], btype="bandpass", output="sos"
    )
    return np.asarray(sos, dtype=np.float64)


@jax.jit
def sosfilt(sos: jax.Array, x: jax.Array) -> jax.Array:
    """Causal biquad-cascade IIR along the first axis of ``x``.

    Each section runs transposed direct-form II; the (small, static) section
    loop is unrolled inside a single ``lax.scan`` over time, vectorized over
    all trailing axes (channels, batched windows). Matches
    ``scipy.signal.sosfilt`` with zero initial state.
    """
    sos = jnp.asarray(sos)
    n_sections = sos.shape[0]
    tail_shape = x.shape[1:]

    def step(z, xn):
        y = xn
        new_z = []
        for k in range(n_sections):
            b0, b1, b2, a0, a1, a2 = (sos[k, i] for i in range(6))
            yk = b0 * y + z[k][0]
            z0 = b1 * y - a1 * yk + z[k][1]
            z1 = b2 * y - a2 * yk
            new_z.append(jnp.stack([z0, z1]))
            y = yk
        return tuple(new_z), y

    z_init = tuple(
        jnp.zeros((2,) + tail_shape, dtype=x.dtype) for _ in range(n_sections)
    )
    _, y = jax.lax.scan(step, z_init, x)
    return y


@partial(jax.jit, static_argnames=())
def lfilter(b: jax.Array, a: jax.Array, x: jax.Array) -> jax.Array:
    """Causal IIR filter along the *first* axis of ``x``.

    Transposed direct-form II:
        y[n]   = b0·x[n] + z0[n-1]
        zi[n]  = b(i+1)·x[n] + z(i+1)[n-1] − a(i+1)·y[n]

    ``x``: (T, ...) — remaining axes are vectorized (channels, batch).
    Matches ``scipy.signal.lfilter`` along time to float64 precision.
    """
    b = jnp.asarray(b)
    a = jnp.asarray(a)
    b = b / a[0]
    a = a / a[0]
    order = b.shape[0] - 1
    tail_shape = x.shape[1:]

    b_taps = b[1:].reshape((order,) + (1,) * len(tail_shape))
    a_taps = a[1:].reshape((order,) + (1,) * len(tail_shape))

    def step(z, xn):
        y = b[0] * xn + z[0]
        z_new = b_taps * xn - a_taps * y
        z_new = z_new.at[:-1].add(z[1:])
        return z_new, y

    z0 = jnp.zeros((order,) + tail_shape, dtype=x.dtype)
    _, y = jax.lax.scan(step, z0, x)
    return y


def moving_rms(x: jax.Array, window: int = 11) -> jax.Array:
    """Window-``window`` moving RMS along axis 0, trimmed to full windows.

    Equivalent to the reference's
    ``sqrt(uniform_filter1d(x², size=11, mode='nearest'))[5:-5]``
    (``utils.py:151-156``): after trimming ``(window-1)//2`` per side, every
    output position is the RMS of a complete window, so the 'nearest' edge
    padding never contributes.

    ``x``: (T, ...) → output (T - window + 1, ...).
    """
    sq = jnp.square(x)
    csum = jnp.cumsum(sq, axis=0)
    zero = jnp.zeros_like(csum[:1])
    csum = jnp.concatenate([zero, csum], axis=0)
    # clamp: cumsum differencing can cancel to tiny negatives in f32,
    # and sqrt(-ε) would poison the window with NaN
    window_sums = jnp.maximum(csum[window:] - csum[:-window], 0.0)
    return jnp.sqrt(window_sums / window)


def preprocess_segment(
    seg: jax.Array,
    sos: jax.Array,
    time_mask: jax.Array,
    prescale: float = INGEST_PRESCALE,
    rms_window: int = 11,
) -> jax.Array:
    """Full per-(stim, rep) EMG preprocessing (reference ``load.py:85-101``):

    raw (T_seg, C) → ×2¹⁰ prescale → order-4 bandpass (SOS cascade) →
    window-11 RMS (trimmed) → downsample by ``time_mask`` →
    (len(time_mask), C).

    Jit/vmap-friendly: batch all (stim, rep) segments of a subject and vmap.
    """
    filtered = sosfilt(sos, seg * prescale)
    rms = moving_rms(filtered, window=rms_window)
    return rms[time_mask]
