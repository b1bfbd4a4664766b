"""Signal ops vs scipy oracles (reference numerics: utils.py:134-156).

JAX paths run in float32 (TPU-native); oracles are float64 scipy. The SOS
cascade keeps f32 IIR error within ~1e-4 relative of the f64 oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as ssig
from scipy.ndimage import uniform_filter1d

from contrastiveprosthetics_tpu.ops.signal import (
    butter_bandpass,
    butter_bandpass_sos,
    lfilter,
    moving_rms,
    preprocess_segment,
    sosfilt,
)


def reference_filter(data, f=(20, 450), order=4, hz=2000):
    """The reference's filter() (utils.py:134-147), scipy end-to-end, f64."""
    nyq = hz / 2
    fc = [x / nyq for x in f]
    b, a = ssig.butter(order, fc, btype="bandpass")
    out = data.T.copy()
    for i in range(len(out)):
        out[i] = ssig.lfilter(b, a, out[i])
    return out.T


def reference_rms(data, window=11, edge=5):
    """The reference's rms() (utils.py:151-156)."""
    return np.transpose(
        [
            np.sqrt(uniform_filter1d(np.square(t), size=window, mode="nearest"))[
                edge:-edge
            ]
            for t in data.T
        ]
    )


def test_sosfilt_matches_scipy(rng):
    x = rng.standard_normal((500, 12))
    sos = butter_bandpass_sos(20, 450, 2000, order=4)
    got = np.asarray(sosfilt(jnp.asarray(sos), jnp.asarray(x, dtype=jnp.float32)))
    want = ssig.sosfilt(sos, x, axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sos_equals_ba_form(rng):
    """SOS cascade realizes the same transfer function as the (b, a) form the
    reference applies (utils.py:142-146) — f64 oracle comparison."""
    x = rng.standard_normal((2010, 12))
    sos = butter_bandpass_sos(20, 450, 2000)
    b, a = butter_bandpass(20, 450, 2000)
    np.testing.assert_allclose(
        ssig.sosfilt(sos, x, axis=0),
        ssig.lfilter(b, a, x, axis=0),
        rtol=1e-7,
        atol=1e-9,
    )


def test_sosfilt_batched(rng):
    # (T, C, B) batched windows — one scan, all channels/windows at once
    x = rng.standard_normal((200, 12, 7))
    sos = butter_bandpass_sos(20, 450, 2000)
    got = np.asarray(sosfilt(jnp.asarray(sos), jnp.asarray(x, dtype=jnp.float32)))
    want = ssig.sosfilt(sos, x, axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_lfilter_matches_scipy_f32(rng):
    """Generic polynomial-form IIR (kept for API parity); low-order filters
    are fine in f32 — production EMG preprocessing uses sosfilt."""
    x = rng.standard_normal((200, 4))
    b, a = ssig.butter(2, 0.2)
    got = np.asarray(
        lfilter(jnp.asarray(b), jnp.asarray(a), jnp.asarray(x, dtype=jnp.float32))
    )
    want = ssig.lfilter(b, a, x, axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_moving_rms_matches_reference(rng):
    x = rng.standard_normal((2010, 12))
    got = np.asarray(moving_rms(jnp.asarray(x, dtype=jnp.float32), window=11))
    want = reference_rms(x)
    assert got.shape == want.shape == (2000, 12)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_preprocess_segment_end_to_end(rng):
    seg = rng.standard_normal((2010, 12)) * 1e-4  # EMG-scale volts
    sos = butter_bandpass_sos(20, 450, 2000)
    tm = np.arange(0, 2000, 20)
    got = np.asarray(
        preprocess_segment(
            jnp.asarray(seg, dtype=jnp.float32), jnp.asarray(sos), jnp.asarray(tm)
        )
    )
    want = reference_rms(reference_filter(seg * 2**10))[tm]
    assert got.shape == (100, 12)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-6)


def test_preprocess_vmaps_over_segments():
    # own seeded rng (NOT the session fixture): the data must not depend on
    # which tests ran before, or tolerances silently become order-dependent
    segs = np.random.default_rng(77).standard_normal(
        (5, 2010, 12)
    ).astype(np.float32)
    sos = jnp.asarray(butter_bandpass_sos(20, 450, 2000))
    tm = jnp.arange(0, 2000, 20)
    fn = jax.jit(jax.vmap(lambda s: preprocess_segment(s, sos, tm)))
    out = np.asarray(fn(jnp.asarray(segs)))
    assert out.shape == (5, 100, 12)
    single = np.asarray(preprocess_segment(jnp.asarray(segs[2]), sos, tm))
    # vmapped vs single lowering reorders f32 accumulations through the
    # 2010-step order-4 IIR; measured relative deviation ≤ 2e-4 over seeds
    np.testing.assert_allclose(out[2], single, rtol=1e-3, atol=1e-3)
