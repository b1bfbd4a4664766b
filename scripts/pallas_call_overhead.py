"""Per-`pallas_call` overhead census (VERDICT r4 task 3a).

The round-4 fused-training-chain A/B recorded a LOSS at every geometry
(docs/ab_fused_train_r04.jsonl) and attributed it to 14 pallas_calls/step
of choreography while the per-byte fusion demonstrably worked
(convert_reduce_fusion 19.4 % → 1.9 %). This script tests that
attribution with direct measurements at the step's own shapes:

1. ``empty_call_us``  — marginal cost of a passthrough pallas_call
   (copy x→out through the fwd-block row tiling). Contains the HBM
   round-trip PLUS the per-call fixed cost (entry/exit sync, stream
   setup, Mosaic prologue).
2. ``xla_copy_us``    — marginal cost of the same bytes through one XLA
   elementwise op (x+1). The HBM round-trip alone.
   → fixed per-call overhead ≈ empty_call − xla_copy.
3. ``pallas_gemm_us`` vs ``xla_gemm_us`` — the same (rows,512)@(512,512)
   GEMM as a single-kernel pallas_call vs XLA dot: the Mosaic-vs-XLA
   GEMM-quality gap per block, separate from the fixed call cost.

All marginal slopes between two `lax.scan` chain lengths (the fixed
dispatch+readback RTT cancels; CLAUDE.md sync discipline: timed to host
readback of a scalar that data-depends on every iteration). Legs
alternate inside each trial; best-of-3 per (leg, length).

Geometries: bs=128 peak (rows = 128·41 = 5248, bf16 — where the 252 µs
prize lives) and canonical bs=8 (rows = 328, f32).

Output: one JSON line; append to docs/pallas_call_overhead_r05.json.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure_geometry(jax, rows: int, dtype_name: str, n_lo: int,
                     n_hi: int) -> dict:
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from contrastiveprosthetics_tpu.ops.train_fused import _tile_rows

    F = 512
    dtype = jnp.dtype(dtype_name)
    tile = _tile_rows(rows)
    n_tiles = -(-rows // tile)
    rows_p = n_tiles * tile

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def copy_call(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((tile, F), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((tile, F), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows_p, F), dtype),
        )(x)

    def gemm_kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(
            x_ref[...], w_ref[...], preferred_element_type=jnp.float32
        ).astype(dtype)

    def gemm_call(x, w):
        return pl.pallas_call(
            gemm_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, F), lambda i: (i, 0)),
                pl.BlockSpec((F, F), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tile, F), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows_p, F), dtype),
        )(x, w)

    def chain(step):
        def run(x, w, n):
            def body(c, _):
                return step(c, w), None

            y, _ = lax.scan(body, x, None, length=n)
            return jnp.sum(y.astype(jnp.float32))

        return jax.jit(run, static_argnums=(2,))

    # Interleaved leg: the REAL inter-call dependency pattern — each
    # pallas_call also emits a (1, F) reduction, tiny XLA glue turns it
    # into an affine, and the NEXT call consumes that affine. This is
    # the structure the fused train chain has between every pair of
    # blocks (stats → μ/rstd → a/c → next block), and it can serialize
    # the pipeline in a way back-to-back independent kernels don't.
    def glue_kernel(x_ref, a_ref, c_ref, o_ref, s_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            s_ref[...] = jnp.zeros_like(s_ref)

        z = x_ref[...] * a_ref[...] + c_ref[...]
        o_ref[...] = z
        s_ref[...] += jnp.sum(
            z.astype(jnp.float32), axis=0, keepdims=True
        )

    def glue_call(x, a, c):
        return pl.pallas_call(
            glue_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, F), lambda i: (i, 0)),
                pl.BlockSpec((1, F), lambda i: (0, 0)),
                pl.BlockSpec((1, F), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tile, F), lambda i: (i, 0)),
                pl.BlockSpec((1, F), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows_p, F), dtype),
                jax.ShapeDtypeStruct((1, F), jnp.float32),
            ],
        )(x, a, c)

    def interleaved_step(x, w):
        a = jnp.ones((1, F), dtype)
        c = jnp.zeros((1, F), dtype)
        y, s = glue_call(x, a, c)
        # the glue XLA ops: stats → affine for the next call (folded
        # into THIS step so each scan iteration = call + glue)
        mu = s / rows
        a2 = (1.0 / jnp.sqrt(jnp.abs(mu) + 1.0)).astype(dtype)
        c2 = (-mu * a2.astype(jnp.float32)).astype(dtype)
        y2, _ = glue_call(y, a2, c2)
        return y2

    def interleaved_xla(x, w):
        a = jnp.ones((1, F), dtype)
        c = jnp.zeros((1, F), dtype)
        z = x * a + c
        s = jnp.sum(z.astype(jnp.float32), axis=0, keepdims=True)
        mu = s / rows
        a2 = (1.0 / jnp.sqrt(jnp.abs(mu) + 1.0)).astype(dtype)
        c2 = (-mu * a2.astype(jnp.float32)).astype(dtype)
        return z * a2 + c2

    legs = {
        "empty_call": chain(lambda x, w: copy_call(x)),
        "xla_copy": chain(lambda x, w: x + jnp.asarray(1, dtype)),
        "pallas_gemm": chain(gemm_call),
        "xla_gemm": chain(
            lambda x, w: jnp.dot(
                x, w, preferred_element_type=jnp.float32
            ).astype(dtype)
        ),
        # two calls + glue per scan step → report halved below
        "interleaved_pallas": chain(interleaved_step),
        "interleaved_xla": chain(interleaved_xla),
    }

    rng = np.random.default_rng(0)
    x = jax.device_put(
        (rng.standard_normal((rows_p, F)) * 0.5).astype(dtype_name)
    )
    # spectral norm ~1 so a 4k-deep GEMM chain neither explodes nor
    # denormalizes (timing must measure the MXU, not NaN plumbing)
    w_np = rng.standard_normal((F, F)).astype(np.float32)
    w_np /= np.linalg.norm(w_np, 2)
    w = jax.device_put(w_np.astype(dtype_name))

    t_best = {(k, n): np.inf for k in legs for n in (n_lo, n_hi)}
    for name, fn in legs.items():  # compile/warm pass, untimed
        for n in (n_lo, n_hi):
            float(fn(x, w, n))
    for trial in range(3):
        for name, fn in legs.items():
            for n in (n_lo, n_hi):
                t0 = time.perf_counter()
                float(fn(x, w, n))
                t_best[(name, n)] = min(
                    t_best[(name, n)], time.perf_counter() - t0
                )

    out = {"rows": rows, "rows_padded": rows_p, "tile": tile,
           "dtype": dtype_name, "n_lo": n_lo, "n_hi": n_hi}
    for name in legs:
        us = (t_best[(name, n_hi)] - t_best[(name, n_lo)]) / (
            n_hi - n_lo
        ) * 1e6
        out[f"{name}_us"] = round(us, 3)
    out["fixed_call_overhead_us"] = round(
        out["empty_call_us"] - out["xla_copy_us"], 3
    )
    out["gemm_gap_us"] = round(
        out["pallas_gemm_us"] - out["xla_gemm_us"], 3
    )
    # per-call choreography in the real dependency pattern (2 calls per
    # scan step; the XLA floor carries one reduction to the pallas leg's
    # two, so this slightly OVERSTATES the overhead — conservative
    # against the closure conclusion)
    out["interleave_overhead_us_per_call"] = round(
        (out["interleaved_pallas_us"] - out["interleaved_xla_us"]) / 2, 3
    )
    print(f"rows={rows} {dtype_name}: empty_call {out['empty_call_us']} "
          f"xla_copy {out['xla_copy_us']} → fixed overhead "
          f"{out['fixed_call_overhead_us']} µs/call; gemm pallas "
          f"{out['pallas_gemm_us']} vs xla {out['xla_gemm_us']} → gap "
          f"{out['gemm_gap_us']} µs/call", file=sys.stderr)
    return out


def main() -> None:
    from contrastiveprosthetics_tpu.utils.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import jax

    dev = jax.devices()[0]
    out = {"device_kind": dev.device_kind}
    # peak geometry first (the 252 µs prize lives at bs=128 bf16)
    out["peak_bs128"] = measure_geometry(jax, 128 * 41, "bfloat16",
                                         n_lo=512, n_hi=4608)
    out["canonical_bs8"] = measure_geometry(jax, 8 * 41, "float32",
                                            n_lo=512, n_hi=4608)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
