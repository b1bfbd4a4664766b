"""Fwd/bwd decomposition of the fused train chain's recorded loss
(VERDICT r4 task 3, second measurement).

The per-call census (scripts/pallas_call_overhead.py) measured the fixed
pallas_call cost at ~0.7 µs and the real interleaved dependency pattern
at ~4.9 µs/call — 14 calls ≈ 68 µs, far short of the ~284 µs/step gap
the bs=128 A/B recorded (docs/ab_fused_train_r04.jsonl). So the deficit
is INSIDE the kernels, not between them. This script splits it: the real
7-block chain (``fused_dense_chain``, prng mask mode — the shipping
config) vs the XLA formulation with in-step rbg mask draws, forward-only
and forward+backward, at the bs=128 bf16 peak geometry.

Marginal slopes between two scan lengths, iteration-dependent inputs so
nothing hoists, timed to host readback; legs alternate, best-of-3.

Output: one JSON line; append to docs/fused_chain_decompose_r05.json.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    from contrastiveprosthetics_tpu.utils.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from contrastiveprosthetics_tpu.ops.train_fused import (
        dense_chain_reference,
        fused_dense_chain,
    )

    L, F, rows = 7, 512, 128 * 41
    dtype = jnp.bfloat16
    rate = jnp.float32(0.5)
    dropout_from = L - 4
    rng = np.random.default_rng(0)
    ws = tuple(
        jax.device_put((rng.standard_normal((F, F)) / np.sqrt(F))
                       .astype(np.float32)) for _ in range(L)
    )
    bs = tuple(jax.device_put(np.zeros(F, np.float32)) for _ in range(L))
    gammas = tuple(
        jax.device_put(np.ones(F, np.float32)) for _ in range(L)
    )
    betas = tuple(
        jax.device_put(np.zeros(F, np.float32)) for _ in range(L)
    )
    x0 = jax.device_put(
        rng.standard_normal((rows, F)).astype(np.float32).astype(dtype)
    )
    root = jax.random.key(0, impl="rbg")

    def fused_step(params, x, key):
        w, b, g, be = params
        h, mu, var = fused_dense_chain(
            x, w, b, g, be, key, rate, mask_mode="prng",
            compute_dtype=dtype,
        )
        return jnp.sum(h.astype(jnp.float32))

    def xla_step(params, x, key):
        # the engine's real XLA shape: per-block rbg mask draws in-step,
        # then the oracle chain (identical math to flax Dense+BN+dropout)
        w, b, g, be = params
        keys = jax.random.split(key, L - dropout_from)
        masks = tuple(
            jax.random.bernoulli(k, 1.0 - rate, (rows, F)).astype(
                jnp.float32
            )
            for k in keys
        )
        h, mu, var = dense_chain_reference(
            x, w, b, g, be, masks, 1.0 - rate,
            dropout_from=dropout_from, compute_dtype=dtype,
        )
        return jnp.sum(h.astype(jnp.float32))

    params = (ws, bs, gammas, betas)

    def chain_fwd(step):
        def run(params, x0, keys):
            def body(acc, args):
                i, key = args
                x = x0 + (i * jnp.float32(1e-6)).astype(dtype)
                return acc + step(params, x, key), None

            n = keys.shape[0]
            acc, _ = lax.scan(
                body, jnp.float32(0.0),
                (jnp.arange(n, dtype=jnp.float32), keys),
            )
            return acc

        return jax.jit(run)

    def chain_grad(step):
        g = jax.grad(step, argnums=0)

        def run(params, x0, keys):
            def body(acc, args):
                i, key = args
                x = x0 + (i * jnp.float32(1e-6)).astype(dtype)
                grads = g(params, x, key)
                return (
                    jax.tree_util.tree_map(jnp.add, acc, grads), None
                )

            n = keys.shape[0]
            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            acc, _ = lax.scan(
                body, zero,
                (jnp.arange(n, dtype=jnp.float32), keys),
            )
            return jnp.sum(acc[0][0])

        return jax.jit(run)

    legs = {
        "fused_fwd": chain_fwd(fused_step),
        "xla_fwd": chain_fwd(xla_step),
        "fused_fwdbwd": chain_grad(fused_step),
        "xla_fwdbwd": chain_grad(xla_step),
    }
    n_lo, n_hi = 20, 120
    keys = {n: jax.random.split(root, n) for n in (n_lo, n_hi)}

    for name, fn in legs.items():  # compile + warm
        for n in (n_lo, n_hi):
            float(fn(params, x0, keys[n]))
    t_best = {(k, n): np.inf for k in legs for n in (n_lo, n_hi)}
    for trial in range(3):
        for name, fn in legs.items():
            for n in (n_lo, n_hi):
                t0 = time.perf_counter()
                float(fn(params, x0, keys[n]))
                t_best[(name, n)] = min(
                    t_best[(name, n)], time.perf_counter() - t0
                )

    out = {"rows": rows, "L": L, "F": F, "dtype": "bfloat16",
           "mask_mode": "prng/rbg", "n_lo": n_lo, "n_hi": n_hi}
    for name in legs:
        us = (t_best[(name, n_hi)] - t_best[(name, n_lo)]) / (
            n_hi - n_lo
        ) * 1e6
        out[f"{name}_us"] = round(us, 1)
    out["fwd_gap_us"] = round(
        out["fused_fwd_us"] - out["xla_fwd_us"], 1
    )
    out["bwd_gap_us"] = round(
        (out["fused_fwdbwd_us"] - out["fused_fwd_us"])
        - (out["xla_fwdbwd_us"] - out["xla_fwd_us"]), 1
    )
    print(
        f"fwd: fused {out['fused_fwd_us']} vs xla {out['xla_fwd_us']} µs "
        f"(gap {out['fwd_gap_us']}); fwd+bwd: fused "
        f"{out['fused_fwdbwd_us']} vs xla {out['xla_fwdbwd_us']} µs "
        f"(bwd-only gap {out['bwd_gap_us']})",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
