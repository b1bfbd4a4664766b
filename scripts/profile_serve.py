"""Dissect the serve tick's device cost on real TPU (component replays).

Companion to the §2/§3 fused-kernel A/Bs (ops/pallas_ops.py): measures the
marginal per-tick cost of (a) the full XLA tick chain, (b) an IIR+RMS-only
chain (no encoder), (c) an encoder-only chain (no DSP), (d) the fused
§3 tick-chain kernel, and (e)/(f) the S-session batched replay (vmapped
XLA vs the §4 batched kernel) — each as the slope between two
one-dispatch chain lengths, timed to host readback (the repo's
measurement discipline; the fixed tunnel RTT cancels in the slope).

Usage: python scripts/profile_serve.py  (requires the TPU tunnel)
       python scripts/profile_serve.py --platform cpu --quick  (smoke test)
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    from contrastiveprosthetics_tpu.utils.platform import (
        add_platform_flag, select_platform,
    )

    parser = argparse.ArgumentParser(description=__doc__)
    add_platform_flag(parser)
    parser.add_argument(
        "--quick", action="store_true",
        help="tiny chain lengths / one rep — correctness smoke, not timing",
    )
    args = parser.parse_args(argv)
    select_platform(args.platform)
    k_lo, k_hi, reps = (2, 4, 1) if args.quick else (250, 2000, 3)

    from contrastiveprosthetics_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.serve.stream import StreamingEngine

    print(f"device: {jax.devices()[0]}")
    model = ContrastiveModel(d_e=16, adabn=False, n_classes=cfg.max_tasks)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, cfg.max_tasks, cfg.emg_dim)),
        jnp.zeros((2, cfg.max_tasks, cfg.glove_dim)),
        0.5, 0.5, True,
    )
    mk = lambda fused: StreamingEngine(
        cfg, model, variables,
        emg_mean=np.zeros(cfg.emg_dim, np.float32),
        emg_std=np.ones(cfg.emg_dim, np.float32),
        use_fused_encoder=fused,
    )
    eng, eng_f = mk(False), mk(True)
    rng = np.random.default_rng(0)
    block = rng.standard_normal((cfg.factor, cfg.emg_dim)).astype(np.float32)

    def slope_us(run, base=None):
        base_block = block if base is None else base

        def t(K):
            blocks = jax.device_put(jnp.asarray(np.broadcast_to(
                base_block, (K,) + base_block.shape
            )))
            v = run(blocks)
            np.asarray(v)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                v = run(blocks)
                np.asarray(v)
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(k_hi) - t(k_lo)) / (k_hi - k_lo) * 1e6

    # (a) full XLA tick chain
    full = slope_us(lambda b: eng.steps(eng.init_carry(), b)[2])
    print(f"full XLA tick chain:      {full:8.1f} us/tick")

    # (b) IIR+RMS only: scan of the DSP front half, encoder skipped
    sos, mean, std = eng._sos, eng._mean, eng._std

    def dsp_chain(blocks, iir0, tail0):
        def tick(carry, raw):
            z, tail = carry
            x = raw * 2.0**10

            def iir_step(zc, xn):
                y = xn
                new_z = []
                for k in range(sos.shape[0]):
                    b0, b1, b2, _, a1, a2 = (sos[k, i] for i in range(6))
                    yk = b0 * y + zc[k, 0]
                    z0 = b1 * y - a1 * yk + zc[k, 1]
                    z1 = b2 * y - a2 * yk
                    new_z.append(jnp.stack([z0, z1]))
                    y = yk
                return jnp.stack(new_z), y

            z, filtered = jax.lax.scan(iir_step, z, x)
            window = jnp.concatenate([tail, filtered], axis=0)[
                -cfg.rms_window:
            ]
            frame = jnp.sqrt(jnp.mean(jnp.square(window), axis=0))
            frame = (frame - mean) / std
            return (z, window[1:]), jnp.sum(frame)

        carry, sums = jax.lax.scan(tick, (iir0, tail0), blocks)
        return sums

    dsp_jit = jax.jit(dsp_chain)
    c0 = eng.init_carry()
    dsp = slope_us(lambda b: dsp_jit(b, c0.iir_state, c0.tail))
    print(f"IIR+RMS-only chain:       {dsp:8.1f} us/tick")

    # (c) encoder-only chain: one frame per tick through encode+similarity
    vars_dev = eng._dev_vars
    class_emb = eng._dev_class_emb

    def enc_chain(frames, variables, cemb):
        def tick(_, frame):
            emb = model.apply(
                variables, frame[None, :], False,
                method=ContrastiveModel.encode_emg, mutable=False,
            )[0]
            return None, jnp.argmax(cemb @ emb)

        _, preds = jax.lax.scan(tick, None, frames)
        return preds

    enc_jit = jax.jit(enc_chain)
    frames_of = lambda b: b[:, 0, :]
    enc = slope_us(lambda b: enc_jit(frames_of(b), vars_dev, class_emb))
    print(f"encoder-only chain:       {enc:8.1f} us/tick")

    # (d) fused §3 tick-chain kernel
    fused = slope_us(lambda b: eng_f.steps(eng_f.init_carry(), b)[2])
    print(f"fused tick-chain kernel:  {fused:8.1f} us/tick")
    print(f"\nsummary: full {full:.1f} = dsp {dsp:.1f} + enc {enc:.1f} "
          f"(+ vote/glue {full - dsp - enc:.1f}); fused {fused:.1f} "
          f"({full / max(fused, 1e-9):.1f}x)")

    # (e)/(f) batched replay at S sessions: vmapped XLA scan vs the §4
    # batched fused kernel (shared weights + per-session BN affines)
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    S = 4 if args.quick else 64
    mkb = lambda fused: BatchedStreamingEngine(
        cfg, model, variables,
        emg_mean=np.zeros(cfg.emg_dim, np.float32),
        emg_std=np.ones(cfg.emg_dim, np.float32),
        n_sessions=S,
        use_fused_encoder=fused,
    )
    bx, bf = mkb(False), mkb(True)
    block_b = rng.standard_normal(
        (S, cfg.factor, cfg.emg_dim)
    ).astype(np.float32)
    bx_us = slope_us(lambda b: bx.steps(bx.init_carries(), b)[2], block_b)
    print(f"batched XLA chain (S={S}):   {bx_us:8.1f} us/tick")
    bf_us = slope_us(lambda b: bf.steps(bf.init_carries(), b)[2], block_b)
    print(f"batched fused kernel (S={S}):{bf_us:8.1f} us/tick "
          f"({bx_us / max(bf_us, 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
