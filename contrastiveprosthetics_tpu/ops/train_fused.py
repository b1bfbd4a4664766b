"""Training-grade fused Pallas chain for the EMGNet dense stack.

WHY (the round-3 peak-geometry attribution, docs/SCALING.md): at the
bs=128 bf16 peak the train step's device time is 690 µs, of which 252 µs
(36.5 %) is ``convert_reduce_fusion`` — the BatchNorm statistics
reductions. They are HBM-bound activation *re-reads*: XLA's schedule
writes each Dense/ReLU output to HBM, then re-reads it to compute the
forward mean/E[x²], and in the backward re-reads dy and the normalized
activations for the Σdy / Σdy·x̂ reductions (~206 MB/step total). The
GEMMs themselves are already at the MXU floor (330 vs ~323 µs). The fix
is fusion that keeps the tile in VMEM — this module.

WHAT: the dense stack of ``EMGNet`` (models/emg_net.py:53-58; reference
``models.py:266-298``) is, per block i in 0..L-1:

    y_i = h_i @ W_i + b_i
    r_i = relu(y_i)
    z_i = BN_i(r_i)            # batch stats μ_i, v_i over rows
    h_{i+1} = dropout_i(z_i)   if i >= L-4 else z_i

with h_0 = the flattened conv-stack output (already batch-normalized by
the conv path) and h_L the head input. This module computes the whole
stack as one fused kernel per block plus tiny XLA glue:

* ``_fwd_block_kernel`` — ONE pallas_call per block: the *previous*
  block's BN affine (z = a·r + c) and dropout are applied to the input
  tile while it is in VMEM, the GEMM+bias+ReLU produce r_i, and the
  epilogue accumulates the masked Σr_i / Σr_i² into (1, F) f32
  accumulators across the (sequential) row-tile grid — the BN statistics
  are a free by-product of the GEMM's own output tile, never an HBM
  re-read. Between kernels XLA turns (Σr, Σr²) into (μ, rstd, a, c)
  — a few KB of work.
* ``_bwd_block_kernel`` — the custom-VJP backward, one call per block,
  walking the chain top-down: finalize dy_i from the incoming dz_i and
  the two BN-backward sums (dy = a_i·(dz − Σdz/N − x̂·Σdz·x̂/N)·1[r>0]),
  then dgrad (dy @ Wᵀ), wgrad (h_iᵀ @ dy, accumulated across the grid),
  db, and — the key fusion — the *next* BN's two backward reductions
  (Σdz_{i-1}, Σdz_{i-1}·x̂_{i-1}) computed as the epilogue of this
  kernel while dz_{i-1} and r_{i-1} are still in VMEM.

Dropout masks are never materialized in HBM: the forward kernel draws
them from the TPU hardware PRNG (two-word ``pltpu.prng_seed`` with the
(block, tile) coordinates mixed into the seed words — see ``_draw_mask``
— + ``prng_random_bits``) and the backward kernel REGENERATES the same
bits with the same seeds (``mask_mode="prng"``). For hermetic CPU tests
(interpret mode stubs the PRNG to zeros) and for exact differential
tests against an XLA oracle, ``mask_mode="input"`` feeds explicit
{0,1} float masks through the same kernel bodies instead.

BN semantics mirror flax exactly (flax.linen.normalization): statistics
in f32 over the *stored-precision* activations, fast variance
``max(0, E[r²] − E[r]²)``, ``lax.rsqrt(var + eps)``, running updates
``m·ra + (1−m)·batch`` with the biased batch variance. The (μ, v) the
chain returns are for the plain-BN running-average update only and are
``stop_gradient``-ed by the caller — gradients flow through the batch
statistics *inside* the custom VJP (the s1b/s2b terms), exactly like
autodiff through flax's BatchNorm.

The conv stack (2 layers) stays on XLA in this phase: its banded-matmul
training form costs ~3× extra MXU work for a similar-sized stat saving
(see the §2 inference-kernel notes in pallas_ops.py) — measured
judgment, revisit with a dedicated 3-tap conv kernel if the A/B asks.

Every function has a pure-XLA oracle (``dense_chain_reference``) with
identical math; interpret-mode equality against it (values AND grads) is
the test contract, and scripts/tpu_kernel_check.sh compiles the kernels
on hardware.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_U32_MAX = 0xFFFFFFFF
# largest f32 strictly below 1.0: keep·2³² then stays below 2³² in f32
# (numpy, not jnp: this module is imported lazily from inside jitted
# functions, where a module-level jnp op would capture a live tracer)
_KEEP_CLIP = float(np.nextafter(np.float32(1.0), np.float32(0.0)))


def _keep_threshold(keep: jax.Array) -> jax.Array:
    """uint32 threshold t such that P(bits <= t) ≈ keep, exact at keep=1.

    The kernel draws 32 random bits per element and keeps the element iff
    ``bits <= t`` — an integer compare, no float conversion on the VPU.
    Probability error vs the true ``keep`` is < 2⁻²⁴ (f32 rounding of
    keep·2³²), exactly 0 at keep=1 (rate 0 must be a no-op bit-for-bit).
    """
    keep = keep.astype(jnp.float32)
    t = (jnp.clip(keep, 0.0, _KEEP_CLIP) * jnp.float32(2.0**32)).astype(
        jnp.uint32
    )
    return jnp.where(keep >= 1.0, jnp.uint32(_U32_MAX), t)


def _tile_rows(n: int) -> int:
    """Row-tile size: a multiple of 32 (sublane-aligned for f32/bf16/int8)
    in [32, 512] minimizing pad waste for the static row count ``n``."""
    if n <= 512:
        return -(-n // 32) * 32
    best, best_pad = 256, None
    for r in range(512, 223, -32):
        pad = (-n) % r
        if best_pad is None or pad < best_pad:
            best, best_pad = r, pad
            if pad == 0:
                break
    return best


@dataclasses.dataclass(frozen=True)
class ChainCfg:
    """Static configuration of one fused dense chain (hashable: it is a
    ``nondiff_argnums`` of the custom VJP and part of jit cache keys)."""

    n_linear: int          # L: number of dense blocks (reference: 7)
    dropout_from: int      # first block whose OUTPUT is dropped (L-4)
    mask_mode: str         # "prng" (TPU hardware RNG) | "input" (explicit)
    dtype: str             # compute/storage dtype name ("float32"/"bfloat16")
    n_rows: int            # N: real (unpadded) rows, static
    eps: float = 1e-5
    interpret: bool = False

    @property
    def cdtype(self):
        return jnp.dtype(self.dtype)

    def has_dropout(self, block: int) -> bool:
        """Dropout on block ``block``'s output (emg_net.py:57-58)."""
        return block >= self.dropout_from


# ---------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------


def _draw_mask(shape, seed0, seed1, block: int, tile, thr_biased):
    """{0,1} f32 dropout mask from the TPU hardware PRNG. Seeded per
    (step-seed, block, row-tile) so the backward regenerates the exact
    forward bits by construction.

    ``thr_biased`` is the uint32 keep-threshold sign-biased into int32
    (``_seed_smem``): Mosaic's ``tpu.bitcast`` only accepts VECTOR
    operands (hardware check, round 3), so the scalar SMEM word cannot
    be re-bitcast to uint32 in-kernel — instead both sides of the
    compare ride the order-preserving map u ↦ int32(u ^ 0x80000000)
    (u ≤ᵤ t  ⟺  bias(u) ≤ₛ bias(t)), bit-identical masks.

    The deployed libtpu's ``tpu.prng_set_seed_32`` accepts at most TWO
    seed words (hardware check, round 4: "Setting seed with more than 2
    values is not supported" — the 4-word form compiled in interpret
    mode only), so the (block, tile) stream coordinates are folded into
    the words with injective odd-multiplier mixes: distinct blocks move
    word 0, distinct tiles move word 1, so (block, tile) ↦ (s0, s1) is
    collision-free for fixed step seeds, and the backward — calling this
    same function with the same coordinates — regenerates the exact
    forward bits."""
    b = jnp.int32(block)
    s0 = seed0 ^ (b * jnp.int32(0x61C88647) + jnp.int32(0x165667B1))
    s1 = seed1 ^ (tile * jnp.int32(0x27D4EB2F) + b)
    pltpu.prng_seed(s0, s1)
    bits = pltpu.prng_random_bits(shape)
    if bits.dtype != jnp.int32:
        bits = lax.bitcast_convert_type(bits, jnp.int32)  # vector: allowed
    return ((bits ^ jnp.int32(-(2**31))) <= thr_biased).astype(jnp.float32)


def _valid_rows(i, rows: int, n_real: int):
    """(rows, 1) f32 mask of real (non-pad) rows in tile ``i``."""
    ids = i * rows + lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    return (ids < n_real).astype(jnp.float32)


def _fwd_block_kernel(*refs, block: int, n_real: int, has_affine: bool,
                      drop_mode: str, cdtype):
    """One row tile of block ``block``: input affine+dropout → GEMM+bias →
    ReLU → store r + accumulate masked (Σr, Σr²).

    Ref order: x, W, b, [a, c], [seed (SMEM) | mask], [keep (SMEM)],
    then outputs r, s1, s2.
    """
    it = iter(refs)
    x_ref, w_ref, b_ref = next(it), next(it), next(it)
    a_ref = c_ref = seed_ref = mask_ref = keep_ref = None
    if has_affine:
        a_ref, c_ref = next(it), next(it)
    if drop_mode == "prng":
        seed_ref, keep_ref = next(it), next(it)
    elif drop_mode == "input":
        mask_ref, keep_ref = next(it), next(it)
    r_ref, s1_ref, s2_ref = next(it), next(it), next(it)

    i = pl.program_id(0)
    z = x_ref[...].astype(jnp.float32)
    if has_affine:
        z = z * a_ref[...] + c_ref[...]
    if drop_mode != "none":
        if drop_mode == "prng":
            # seed coordinate = the DROPPED block's index (block - 1: this
            # kernel drops its input, block-1's output) — the same
            # coordinate the backward kernel and extract_prng_masks use.
            # The first hardware run caught the fwd side passing `block`
            # here (off by one vs bwd/extraction): interpret mode stubs
            # the PRNG to zero bits, so only the on-TPU check
            # (scripts/tpu_kernel_check.sh) could see it.
            m = _draw_mask(z.shape, seed_ref[0, 0], seed_ref[1, 0],
                           block - 1, i, seed_ref[2, 0])
        else:
            m = mask_ref[...]
        z = jnp.where(m > 0.0, z / keep_ref[0, 0], 0.0)

    h = z.astype(cdtype)
    y = lax.dot(h, w_ref[...], preferred_element_type=jnp.float32)
    r = jnp.maximum(y + b_ref[...], 0.0)
    r_ref[...] = r.astype(cdtype)

    # statistics on the STORED precision (what the next layer — and flax's
    # BatchNorm — actually sees), masked to real rows
    rs = r_ref[...].astype(jnp.float32) * _valid_rows(i, r.shape[0], n_real)

    @pl.when(i == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[...] += jnp.sum(rs, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(rs * rs, axis=0, keepdims=True)


def _bwd_block_kernel(*refs, block: int, n_real: int, has_affine: bool,
                      drop_mode: str, emit_in_stats: bool, cdtype):
    """One row tile of block ``block``'s backward.

    Ref order: dz, r, x(in), W, s1b, s2b, aI, mu, rstd,
    [ain, cin, muin, rstdin], [seed | mask], [keep],
    outputs: dx, dW, db, [s1o, s2o].
    """
    it = iter(refs)
    dz_ref, r_ref, x_ref, w_ref = next(it), next(it), next(it), next(it)
    s1b_ref, s2b_ref = next(it), next(it)
    aI_ref, mu_ref, rstd_ref = next(it), next(it), next(it)
    ain_ref = cin_ref = muin_ref = rstdin_ref = None
    if has_affine:
        ain_ref, cin_ref = next(it), next(it)
        muin_ref, rstdin_ref = next(it), next(it)
    seed_ref = mask_ref = keep_ref = None
    if drop_mode == "prng":
        seed_ref, keep_ref = next(it), next(it)
    elif drop_mode == "input":
        mask_ref, keep_ref = next(it), next(it)
    dx_ref, dw_ref, db_ref = next(it), next(it), next(it)
    s1o_ref = s2o_ref = None
    if emit_in_stats:
        s1o_ref, s2o_ref = next(it), next(it)

    i = pl.program_id(0)
    inv_n = jnp.float32(1.0 / n_real)
    dz = dz_ref[...].astype(jnp.float32)
    r = r_ref[...].astype(jnp.float32)
    xnorm = (r - mu_ref[...]) * rstd_ref[...]
    valid = _valid_rows(i, r.shape[0], n_real)
    # BN backward finalize + ReLU mask (padded rows zeroed: the -Σ/N terms
    # are nonzero constants that would otherwise leak into pad rows)
    dy = (
        aI_ref[...]
        * (dz - s1b_ref[...] * inv_n - xnorm * (s2b_ref[...] * inv_n))
        * (r > 0.0).astype(jnp.float32)
        * valid
    )

    # recompute this block's GEMM input h (affine+dropout of the stored
    # r_{i-1}) — elementwise on a tile already needed for the epilogue
    x = x_ref[...].astype(jnp.float32)
    z = x * ain_ref[...] + cin_ref[...] if has_affine else x
    m = None
    if drop_mode == "prng":
        m = _draw_mask(z.shape, seed_ref[0, 0], seed_ref[1, 0], block - 1,
                       i, seed_ref[2, 0])
    elif drop_mode == "input":
        m = mask_ref[...]
    if m is not None:
        z = jnp.where(m > 0.0, z / keep_ref[0, 0], 0.0)
    h = z.astype(cdtype)

    dyc = dy.astype(cdtype)

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        if emit_in_stats:
            s1o_ref[...] = jnp.zeros_like(s1o_ref)
            s2o_ref[...] = jnp.zeros_like(s2o_ref)

    db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    # wgrad: hᵀ @ dy, accumulated across the sequential row-tile grid
    dw_ref[...] += lax.dot_general(
        h, dyc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dgrad: dy @ Wᵀ
    dh = lax.dot_general(
        dyc, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if m is not None:
        dh = jnp.where(m > 0.0, dh / keep_ref[0, 0], 0.0)
    dx_ref[...] = dh.astype(dx_ref.dtype)

    if emit_in_stats:
        # the NEXT (lower) BN's two backward reductions, fused here while
        # dz_{i-1} (= dh) and r_{i-1} (= x) are still in VMEM
        xnin = (x - muin_ref[...]) * rstdin_ref[...]
        s1o_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
        s2o_ref[...] += jnp.sum(dh * xnin, axis=0, keepdims=True)


# ---------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------


def _interpret_arg(interpret: bool, drop_mode: str):
    """Plain interpret mode has no rule for the TPU PRNG primitives;
    the TPU-semantics interpreter stubs them (deterministic zero bits —
    all-keep masks, exercised for the 1/keep scaling; real bit diversity
    is covered by mask_mode="input" tests and the on-hardware check)."""
    if interpret and drop_mode == "prng":
        return pltpu.InterpretParams()
    return interpret


def _const_spec(a):
    return pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _row_spec(rows, width):
    return pl.BlockSpec((rows, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _smem_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _pad_rows(x, rows_padded):
    n = x.shape[0]
    return jnp.pad(x, ((0, rows_padded - n), (0, 0))) if rows_padded != n \
        else x


def _fwd_block_call(cfg: ChainCfg, block: int, x, w, b, affine, seed_smem,
                    mask, keep):
    """Run block ``block``'s forward kernel. Returns (r, s1, s2)."""
    n, din = x.shape
    f = w.shape[1]
    rows = _tile_rows(n)
    grid = -(-n // rows)
    np_ = grid * rows
    drop_mode = "none"
    ins = [_pad_rows(x, np_), w, b]
    specs = [_row_spec(rows, din), _const_spec(w), _const_spec(b)]
    if affine is not None:
        a, c = affine
        ins += [a, c]
        specs += [_const_spec(a), _const_spec(c)]
    if block > 0 and cfg.has_dropout(block - 1):
        if cfg.mask_mode == "prng":
            drop_mode = "prng"
            ins += [seed_smem]
            specs += [_smem_spec()]
        else:
            drop_mode = "input"
            ins += [_pad_rows(mask, np_)]
            specs += [_row_spec(rows, din)]
        ins += [keep.reshape(1, 1)]
        specs += [_smem_spec()]
    kernel = functools.partial(
        _fwd_block_kernel, block=block, n_real=n,
        has_affine=affine is not None, drop_mode=drop_mode,
        cdtype=cfg.cdtype,
    )
    r, s1, s2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=specs,
        out_specs=[
            _row_spec(rows, f),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, f), cfg.cdtype),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
        interpret=_interpret_arg(cfg.interpret, drop_mode),
    )(*ins)
    return r[:n], s1, s2


def _bwd_block_call(cfg: ChainCfg, block: int, dz, r, x, w, s1b, s2b, aI,
                    mu, rstd, in_affine, in_stats, seed_smem, mask, keep,
                    dx_dtype):
    """Run block ``block``'s backward kernel.

    Returns (dx, dW, db, s1o, s2o) — s1o/s2o are None unless
    ``in_stats`` is given (i.e. block > 0).
    """
    n, f = dz.shape
    din = x.shape[1]
    rows = _tile_rows(n)
    grid = -(-n // rows)
    np_ = grid * rows
    drop_mode = "none"
    ins = [_pad_rows(dz, np_), _pad_rows(r, np_), _pad_rows(x, np_), w,
           s1b, s2b, aI, mu, rstd]
    specs = [_row_spec(rows, f), _row_spec(rows, f), _row_spec(rows, din),
             _const_spec(w), _const_spec(s1b), _const_spec(s2b),
             _const_spec(aI), _const_spec(mu), _const_spec(rstd)]
    if in_affine is not None:
        ain, cin = in_affine
        muin, rstdin = in_stats
        ins += [ain, cin, muin, rstdin]
        specs += [_const_spec(ain), _const_spec(cin), _const_spec(muin),
                  _const_spec(rstdin)]
    if block > 0 and cfg.has_dropout(block - 1):
        if cfg.mask_mode == "prng":
            drop_mode = "prng"
            ins += [seed_smem]
            specs += [_smem_spec()]
        else:
            drop_mode = "input"
            ins += [_pad_rows(mask, np_)]
            specs += [_row_spec(rows, din)]
        ins += [keep.reshape(1, 1)]
        specs += [_smem_spec()]
    emit = in_affine is not None
    kernel = functools.partial(
        _bwd_block_kernel, block=block, n_real=n,
        has_affine=in_affine is not None, drop_mode=drop_mode,
        emit_in_stats=emit, cdtype=cfg.cdtype,
    )
    out_specs = [
        _row_spec(rows, din),
        pl.BlockSpec((din, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((np_, din), dx_dtype),
        jax.ShapeDtypeStruct((din, f), jnp.float32),
        jax.ShapeDtypeStruct((1, f), jnp.float32),
    ]
    if emit:
        out_specs += [
            pl.BlockSpec((1, din), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, din), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((1, din), jnp.float32),
            jax.ShapeDtypeStruct((1, din), jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret_arg(cfg.interpret, drop_mode),
    )(*ins)
    if emit:
        dx, dw, db, s1o, s2o = out
        return dx[:n], dw, db, s1o, s2o
    dx, dw, db = out
    return dx[:n], dw, db, None, None


# ---------------------------------------------------------------------
# stats glue (XLA, tiny) — flax.linen.normalization parity
# ---------------------------------------------------------------------


def _finalize_stats(s1, s2, n, eps):
    """(Σr, Σr²) → (μ, v, rstd) with flax's fast-variance clamp."""
    mu = s1 / n
    var = jnp.maximum(0.0, s2 / n - mu * mu)
    return mu, var, lax.rsqrt(var + eps)


def _affine(gamma, beta, mu, rstd):
    a = gamma * rstd
    return a, beta - mu * a


def _last_mask(key_bits_f32, impl: str, keep, shape):
    """The last block's dropout mask, drawn in XLA (its consumer — the
    head GEMM — is outside the kernels). Regenerated identically in the
    backward from the same key bits."""
    bits = lax.bitcast_convert_type(key_bits_f32, jnp.uint32)
    key = jax.random.wrap_key_data(bits, impl=impl)
    return jax.random.bernoulli(key, keep, shape)


# ---------------------------------------------------------------------
# the fused chain: custom VJP
# ---------------------------------------------------------------------
#
# Differentiable args: x0, Ws, bs, gammas, betas. Non-differentiable
# traced args (seeds, thresholds, PRNG key bits) ride as f32 *bitcasts*
# so every cotangent is an ordinary f32 zero — no float0 plumbing.
# ``ext_masks`` (input mode, tests) get zero cotangents.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _chain(cfg: ChainCfg, key_impl: str, x0, ws, bs, gammas, betas,
           seed_f32, keep, ext_masks, key_last_f32):
    out, _ = _chain_fwd(cfg, key_impl, x0, ws, bs, gammas, betas,
                        seed_f32, keep, ext_masks, key_last_f32)
    return out


def _seed_smem(cfg: ChainCfg, seed_f32, keep):
    """(3, 1) int32 SMEM payload: two seed words + the keep-threshold
    SIGN-BIASED into int32 (u ↦ u ^ 0x80000000; see ``_draw_mask`` —
    Mosaic cannot bitcast the scalar SMEM word in-kernel)."""
    if cfg.mask_mode != "prng":
        return None
    seeds = lax.bitcast_convert_type(seed_f32, jnp.int32).reshape(2, 1)
    thr = lax.bitcast_convert_type(
        _keep_threshold(keep) ^ jnp.uint32(2**31), jnp.int32
    )
    return jnp.concatenate([seeds, thr.reshape(1, 1)], axis=0)


def _ext_mask(cfg: ChainCfg, ext_masks, block: int):
    """Explicit mask for dropout on ``block``'s output (input mode)."""
    if cfg.mask_mode != "input" or block < cfg.dropout_from:
        return None
    return ext_masks[block - cfg.dropout_from]


def _key_words(key):
    """(uint32 data words, impl name) for typed OR legacy uint32 keys."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        impl = jax.random.key_impl(key)
        name = getattr(impl, "name", None) or str(impl)
        return jax.random.key_data(key).reshape(-1).astype(jnp.uint32), name
    # legacy raw-array key: data is the array; impl is the process default
    name = str(jax.config.jax_default_prng_impl)
    return key.reshape(-1).astype(jnp.uint32), name


def _chain_fwd(cfg: ChainCfg, key_impl: str, x0, ws, bs, gammas, betas,
               seed_f32, keep, ext_masks, key_last_f32):
    L = cfg.n_linear
    n = cfg.n_rows
    keep = keep.astype(jnp.float32)
    smem = _seed_smem(cfg, seed_f32, keep)
    wsc = tuple(w.astype(cfg.cdtype) for w in ws)
    bsr = tuple(b.reshape(1, -1).astype(jnp.float32) for b in bs)

    rs, mus, vars_, rstds, affs = [], [], [], [], []
    x = x0
    affine = None
    for i in range(L):
        r, s1, s2 = _fwd_block_call(
            cfg, i, x, wsc[i], bsr[i], affine, smem,
            _ext_mask(cfg, ext_masks, i - 1) if i > 0 else None, keep,
        )
        mu, var, rstd = _finalize_stats(s1, s2, n, cfg.eps)
        a, c = _affine(gammas[i].reshape(1, -1), betas[i].reshape(1, -1),
                       mu, rstd)
        rs.append(r)
        mus.append(mu)
        vars_.append(var)
        rstds.append(rstd)
        affs.append((a, c))
        x = r
        affine = (a, c)

    # last block's BN affine + dropout in XLA (consumer = head GEMM)
    zL = rs[-1].astype(jnp.float32) * affs[-1][0] + affs[-1][1]
    if cfg.has_dropout(L - 1):
        if cfg.mask_mode == "prng":
            m = _last_mask(key_last_f32, key_impl, keep, zL.shape)
        else:
            m = ext_masks[-1] > 0.0
        zL = jnp.where(m, zL / keep, 0.0)
    hL = zL.astype(cfg.cdtype)

    means = jnp.concatenate([m[0] for m in mus]).reshape(L, -1)
    variances = jnp.concatenate([v[0] for v in vars_]).reshape(L, -1)
    out = (hL, means, variances)
    res = (x0, tuple(rs), ws, gammas, tuple(mus), tuple(rstds),
           tuple(affs), seed_f32, keep, ext_masks, key_last_f32)
    return out, res


def _chain_bwd(cfg: ChainCfg, key_impl: str, res, cts):
    """Walk the chain top-down. ``cts`` for the (means, variances)
    outputs are ignored by design: they feed only the (never
    differentiated) running-average update and are stop_gradient-ed by
    the caller."""
    (x0, rs, ws, gammas, mus, rstds, affs, seed_f32, keep, ext_masks,
     key_last_f32) = res
    dhL = cts[0]
    L = cfg.n_linear
    n = cfg.n_rows
    smem = _seed_smem(cfg, seed_f32, keep)
    wsc = tuple(w.astype(cfg.cdtype) for w in ws)

    # XLA prologue: through the last dropout, then the top BN's two
    # backward reductions (on f32 copies of tiles XLA is reading anyway)
    dzL = dhL.astype(jnp.float32)
    if cfg.has_dropout(L - 1):
        if cfg.mask_mode == "prng":
            m = _last_mask(key_last_f32, key_impl, keep, dzL.shape)
        else:
            m = ext_masks[-1] > 0.0
        dzL = jnp.where(m, dzL / keep, 0.0)
    rL = rs[L - 1].astype(jnp.float32)
    xnormL = (rL - mus[L - 1]) * rstds[L - 1]
    s1b = jnp.sum(dzL, axis=0, keepdims=True)
    s2b = jnp.sum(dzL * xnormL, axis=0, keepdims=True)

    dz = dzL.astype(cfg.cdtype)
    dws, dbs, dgs, dbetas = [None] * L, [None] * L, [None] * L, [None] * L
    dx0 = None
    for i in range(L - 1, -1, -1):
        dgs[i] = s2b[0]
        dbetas[i] = s1b[0]
        x_in = x0 if i == 0 else rs[i - 1]
        in_aff = None if i == 0 else affs[i - 1]
        in_stats = None if i == 0 else (mus[i - 1], rstds[i - 1])
        dx, dw, db, s1o, s2o = _bwd_block_call(
            cfg, i, dz, rs[i], x_in, wsc[i], s1b, s2b,
            affs[i][0], mus[i], rstds[i], in_aff, in_stats, smem,
            _ext_mask(cfg, ext_masks, i - 1) if i > 0 else None, keep,
            cfg.cdtype if i > 0 else x0.dtype,
        )
        dws[i] = dw.astype(ws[i].dtype)
        dbs[i] = db[0].astype(jnp.float32)
        if i > 0:
            dz, s1b, s2b = dx, s1o, s2o
        else:
            dx0 = dx

    zero_masks = jax.tree_util.tree_map(jnp.zeros_like, ext_masks)
    return (dx0, tuple(dws), tuple(dbs), tuple(dgs), tuple(dbetas),
            jnp.zeros_like(seed_f32), jnp.zeros_like(keep), zero_masks,
            jnp.zeros_like(key_last_f32))


_chain.defvjp(_chain_fwd, _chain_bwd)


def fused_dense_chain(x0, ws, bs, gammas, betas, dropout_key, rate, *,
                      mask_mode: str = "prng", ext_masks=(),
                      compute_dtype=jnp.float32, eps: float = 1e-5,
                      interpret: bool = False):
    """The EMGNet dense stack as fused Pallas kernels with a custom VJP.

    Args:
      x0: (N, D0) chain input (the flattened, batch-normalized conv
        output), in the compute dtype.
      ws/bs/gammas/betas: per-block Dense kernels (D_in, F), biases (F,),
        BN scales (F,), BN biases (F,) — float32 params, length L.
      dropout_key: PRNG key for the step's dropout masks.
      rate: traced dropout probability (reference ``RateDropout``).
      mask_mode: "prng" — masks drawn in-kernel from the TPU hardware
        PRNG and regenerated in the backward (zero HBM mask traffic);
        "input" — explicit {0,1} f32 masks in ``ext_masks`` (one per
        dropped block, shapes (N, F); the last entry is the final
        block's), for hermetic tests and exact oracles.
      interpret: Pallas interpret mode (CPU tests).

    Returns ``(h_L, means, variances)``: the head input (N, F) in the
    compute dtype, and the per-block batch statistics (L, F) f32 for the
    plain-BN running-average update (stop_gradient them — gradients
    through the batch statistics already flow inside the VJP).
    """
    L = len(ws)
    cfg = ChainCfg(
        n_linear=L,
        dropout_from=max(0, L - 4),
        mask_mode=mask_mode,
        dtype=jnp.dtype(compute_dtype).name,
        n_rows=x0.shape[0],
        eps=eps,
        interpret=interpret,
    )
    k_chain, k_last = jax.random.split(dropout_key)
    kd, impl = _key_words(k_chain)
    seed_words = jnp.concatenate([kd, jnp.zeros((2,), kd.dtype)])[:2]
    seed_f32 = lax.bitcast_convert_type(seed_words, jnp.float32)
    key_last_f32 = lax.bitcast_convert_type(_key_words(k_last)[0],
                                            jnp.float32)
    keep = (1.0 - rate).astype(jnp.float32) if hasattr(rate, "astype") \
        else jnp.float32(1.0 - rate)
    return _chain(cfg, impl, x0, tuple(ws), tuple(bs), tuple(gammas),
                  tuple(betas), seed_f32, keep, tuple(ext_masks),
                  key_last_f32)


# ---------------------------------------------------------------------
# XLA oracle (identical math, no Pallas) — the test contract
# ---------------------------------------------------------------------


def dense_chain_reference(x0, ws, bs, gammas, betas, masks, keep, *,
                          dropout_from: int, compute_dtype=jnp.float32,
                          eps: float = 1e-5):
    """Pure-XLA chain with explicit {0,1} masks, mirroring the kernel
    math operation-for-operation (f32 affine/dropout, compute-dtype GEMM
    with f32 accumulation, stats on the stored precision). Differentiable
    by autodiff; interpret-mode equality of values AND grads against
    :func:`fused_dense_chain` is the correctness contract."""
    cdtype = jnp.dtype(compute_dtype)
    L = len(ws)
    x = x0
    means, variances = [], []
    mi = 0
    affine = None
    for i in range(L):
        z = x.astype(jnp.float32)
        if affine is not None:
            z = z * affine[0] + affine[1]
        if i > 0 and i - 1 >= dropout_from:
            z = jnp.where(masks[mi] > 0.0, z / keep, 0.0)
            mi += 1
        h = z.astype(cdtype)
        y = lax.dot(h, ws[i].astype(cdtype),
                    preferred_element_type=jnp.float32)
        r = jnp.maximum(y + bs[i].reshape(1, -1), 0.0).astype(cdtype)
        rf = r.astype(jnp.float32)
        mu = jnp.mean(rf, axis=0, keepdims=True)
        var = jnp.maximum(0.0, jnp.mean(rf * rf, axis=0, keepdims=True)
                          - mu * mu)
        rstd = lax.rsqrt(var + eps)
        a = gammas[i].reshape(1, -1) * rstd
        c = betas[i].reshape(1, -1) - mu * a
        means.append(mu[0])
        variances.append(var[0])
        x = r
        affine = (a, c)

    z = x.astype(jnp.float32) * affine[0] + affine[1]
    if L - 1 >= dropout_from:
        z = jnp.where(masks[mi] > 0.0, z / keep, 0.0)
    hL = z.astype(cdtype)
    return hL, jnp.stack(means), jnp.stack(variances)


# ---------------------------------------------------------------------
# debug: extract the PRNG-drawn masks (tests / hardware checks)
# ---------------------------------------------------------------------


def _mask_kernel(seed_ref, m_ref, *, block: int):
    i = pl.program_id(0)
    m_ref[...] = _draw_mask(m_ref.shape, seed_ref[0, 0], seed_ref[1, 0],
                            block, i, seed_ref[2, 0])


def extract_prng_masks(x0_rows: int, widths, dropout_key, rate, *,
                       n_linear: int, interpret: bool = False):
    """Replay the exact in-kernel PRNG draws of a ``mask_mode="prng"``
    chain (same seeds, same tile geometry) and return the masks as
    arrays — the bridge that lets the XLA oracle reproduce a hardware
    run bit-for-bit. ``widths``: per-dropped-block mask widths (the
    last entry is the final block's, drawn in XLA)."""
    L = n_linear
    dropout_from = max(0, L - 4)
    k_chain, k_last = jax.random.split(dropout_key)
    kd, impl = _key_words(k_chain)
    seed_words = jnp.concatenate([kd, jnp.zeros((2,), kd.dtype)])[:2]
    seed_f32 = lax.bitcast_convert_type(seed_words, jnp.float32)
    keep = (1.0 - rate).astype(jnp.float32) if hasattr(rate, "astype") \
        else jnp.float32(1.0 - rate)
    cfg = ChainCfg(n_linear=L, dropout_from=dropout_from,
                   mask_mode="prng", dtype="float32", n_rows=x0_rows,
                   interpret=interpret)
    smem = _seed_smem(cfg, seed_f32, keep)

    masks = []
    widths = list(widths)
    # in-kernel masks: dropout on blocks dropout_from .. L-2 (the mask for
    # block b's output is drawn inside block b+1's kernel with seed b)
    for j, b in enumerate(range(dropout_from, L - 1)):
        n = x0_rows
        rows = _tile_rows(n)
        grid = -(-n // rows)
        m = pl.pallas_call(
            functools.partial(_mask_kernel, block=b),
            grid=(grid,),
            in_specs=[_smem_spec()],
            out_specs=_row_spec(rows, widths[j]),
            out_shape=jax.ShapeDtypeStruct((grid * rows, widths[j]),
                                           jnp.float32),
            interpret=_interpret_arg(interpret, "prng"),
        )(smem)
        masks.append(m[:n])
    key_last_f32 = lax.bitcast_convert_type(_key_words(k_last)[0],
                                            jnp.float32)
    mlast = _last_mask(key_last_f32, impl, keep,
                       (x0_rows, widths[-1])).astype(jnp.float32)
    masks.append(mlast)
    return tuple(masks)


# ---------------------------------------------------------------------
# full-encoder composition: XLA conv stack + fused dense chain + head
# ---------------------------------------------------------------------


def _bn_train(x, scale, bias, eps):
    """Training-mode BatchNorm over all-but-last axes, mirroring flax
    (f32 fast-variance stats, rsqrt, output cast back to x.dtype).
    Returns (y, mean, var) — mean/var f32 feature vectors."""
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axes)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axes) - mu * mu)
    mul = lax.rsqrt(var + eps) * scale
    y = (x - mu) * mul + bias
    return y.astype(x.dtype), mu, var


def _running_update(old, mean, var, momentum):
    return {
        "mean": momentum * old["mean"] + (1.0 - momentum) * mean,
        "var": momentum * old["var"] + (1.0 - momentum) * var,
    }


def fused_emg_embed(emg_params, frames, rate, dropout_key, *,
                    compute_dtype=jnp.float32, mask_mode: str = "prng",
                    ext_masks=(), batch_stats=None, adabn: bool = True,
                    momentum: float = 0.9, eps: float = 1e-5,
                    interpret: bool = False):
    """EMGNet training forward with the fused dense chain.

    Semantics mirror ``EMGNet.__call__`` with ``train=True``
    (models/emg_net.py:39-68; reference ``models.py:266-343``): conv
    stack on XLA (2× Conv→ReLU→BN, exact flax math), the 7-block dense
    stack through :func:`fused_dense_chain`, head GEMM on XLA, output
    cast to f32. Dropout masks come from the TPU hardware PRNG (a
    different — equally valid — stream than the flax path's
    ``jax.random`` masks; rate=0 is bit-for-bit mask-free).

    ``emg_params``: the ``emg_net`` param subtree. ``batch_stats``: the
    ``emg_net`` batch_stats subtree; with ``adabn=False`` the flax
    running-average updates are returned (stop_gradient-ed), else None.

    Returns ``(embeddings (rows, d_e) f32, new_batch_stats | None)``.
    """
    p = emg_params["emg_net"] if "emg_net" in emg_params else emg_params
    dt = jnp.dtype(compute_dtype)
    n_dense = len([k for k in p if k.startswith("TorchDense_")])
    L = n_dense - 1  # hidden blocks; the last TorchDense is the head

    emg_dim = frames.shape[-1]
    x = frames.astype(dt).reshape(-1, 1, emg_dim, 1)
    means, variances = [], []
    for i in range(2):
        cv = p[f"TorchConv_{i}"]["Conv_0"]
        x = lax.conv_general_dilated(
            x, cv["kernel"].astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + cv["bias"].astype(dt)
        x = jnp.maximum(x, 0.0)
        bn = p[f"BatchNorm_{i}"]["BatchNorm_0"]
        x, mu, var = _bn_train(x, bn["scale"], bn["bias"], eps)
        means.append(mu)
        variances.append(var)
    x0 = x.reshape(x.shape[0], -1)

    ws = tuple(p[f"TorchDense_{i}"]["Dense_0"]["kernel"] for i in range(L))
    bs = tuple(p[f"TorchDense_{i}"]["Dense_0"]["bias"] for i in range(L))
    gammas = tuple(p[f"BatchNorm_{i + 2}"]["BatchNorm_0"]["scale"]
                   for i in range(L))
    betas = tuple(p[f"BatchNorm_{i + 2}"]["BatchNorm_0"]["bias"]
                  for i in range(L))
    hL, d_means, d_vars = fused_dense_chain(
        x0, ws, bs, gammas, betas, dropout_key, rate,
        mask_mode=mask_mode, ext_masks=ext_masks, compute_dtype=dt,
        eps=eps, interpret=interpret,
    )

    wh = p[f"TorchDense_{L}"]["Dense_0"]["kernel"]
    e = jnp.dot(hL, wh.astype(dt)).astype(jnp.float32)

    new_stats = None
    if not adabn:
        s = batch_stats["emg_net"] if "emg_net" in batch_stats \
            else batch_stats
        new_stats = {}
        for i in range(2):
            new_stats[f"BatchNorm_{i}"] = {"BatchNorm_0": _running_update(
                s[f"BatchNorm_{i}"]["BatchNorm_0"],
                lax.stop_gradient(means[i]),
                lax.stop_gradient(variances[i]), momentum)}
        for i in range(L):
            new_stats[f"BatchNorm_{i + 2}"] = {
                "BatchNorm_0": _running_update(
                    s[f"BatchNorm_{i + 2}"]["BatchNorm_0"],
                    lax.stop_gradient(d_means[i]),
                    lax.stop_gradient(d_vars[i]), momentum)}
    return e, new_stats
