#!/usr/bin/env bash
# Compile-and-validate the Pallas kernels on real TPU hardware (the test
# suite runs them in interpret mode on CPU).
set -e
cd "$(dirname "$0")/.."
python - <<'PY'
import numpy as np, jax, jax.numpy as jnp
from contrastiveprosthetics_tpu.ops.pallas_ops import (
    fused_contrastive_loss, fused_contrastive_reference, on_tpu)
assert on_tpu(), f"not on TPU: {jax.default_backend()}"
rng = np.random.default_rng(0)
e = rng.standard_normal((12,41,16)).astype(np.float32)
g = rng.standard_normal((12,41,16)).astype(np.float32)
e /= np.linalg.norm(e,axis=-1,keepdims=True); g /= np.linalg.norm(g,axis=-1,keepdims=True)
lp, cp = jax.jit(lambda e,g: fused_contrastive_loss(e,g,False))(jnp.asarray(e), jnp.asarray(g))
lr, cr = fused_contrastive_reference(jnp.asarray(e), jnp.asarray(g))
assert np.allclose(float(lp), float(lr), rtol=1e-4) and float(cp)==float(cr)
lg = jax.jit(jax.grad(lambda e,g: fused_contrastive_loss(e,g,False)[0], argnums=(0,1)))
ge, gg = lg(jnp.asarray(e), jnp.asarray(g))
rge, rgg = jax.grad(lambda e,g: fused_contrastive_reference(e,g)[0], argnums=(0,1))(jnp.asarray(e), jnp.asarray(g))
assert np.allclose(np.asarray(ge), np.asarray(rge), rtol=1e-3, atol=1e-6)
assert np.allclose(np.asarray(gg), np.asarray(rgg), rtol=1e-3, atol=1e-6)

# fused whole-encoder inference kernel (reference-width architecture)
from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
from contrastiveprosthetics_tpu.ops.pallas_ops import (
    fold_encoder_params, fused_encoder_logits, fused_encoder_logits_reference)
model = ContrastiveModel(adabn=False)
variables = model.init({"params": jax.random.PRNGKey(3)},
                       jnp.zeros((1,41,12)), jnp.zeros((1,41,20)), 0.0, 0.0, False)
class_emb = model.apply(variables, method=ContrastiveModel.encode_classes)
folded = fold_encoder_params(variables["params"], variables["batch_stats"], class_emb)
frames = jnp.asarray(rng.standard_normal((1000,12)).astype(np.float32))
# Logic check under f32 matmul passes: kernel and XLA agree to float eps.
# (At DEFAULT precision both paths use MXU bf16 passes but round through
# different fusion schedules — measured max diff 3.3e-3 on ~0.7-scale
# logits on v5e, argmax-identical; that is MXU rounding, not kernel logic.)
with jax.default_matmul_precision("highest"):
    got_h = jax.jit(lambda f, w: fused_encoder_logits(f, w, False))(frames, folded)
    want_h = jax.jit(lambda f, w: fused_encoder_logits_reference(f, w))(frames, folded)
assert np.allclose(np.asarray(got_h), np.asarray(want_h), rtol=2e-4, atol=2e-5), (
    np.abs(np.asarray(got_h)-np.asarray(want_h)).max())
# Serving-path check at DEFAULT precision: the decisions must agree.
got = jax.jit(lambda f, w: fused_encoder_logits(f, w, False))(frames, folded)
want = fused_encoder_logits_reference(frames, folded)
assert np.allclose(np.asarray(got), np.asarray(want), atol=8e-3), (
    np.abs(np.asarray(got)-np.asarray(want)).max())
# ≥99.9% decision agreement: MXU rounding may legitimately flip a rare
# near-tie frame (top-2 logits within the ~3.3e-3 rounding band)
am = np.asarray(got).argmax(-1) == np.asarray(want).argmax(-1)
assert am.mean() >= 0.999, f"argmax agreement {am.mean()}"

# fused serve tick chain (whole recording as one kernel) vs the XLA scan
from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as CFG
from contrastiveprosthetics_tpu.serve.stream import StreamingEngine
mk = lambda fused: StreamingEngine(CFG, model, variables,
    emg_mean=np.zeros(12, np.float32), emg_std=np.ones(12, np.float32),
    use_fused_encoder=fused)
eng, eng_f = mk(False), mk(True)
blocks = rng.standard_normal((50, CFG.factor, 12)).astype(np.float32) * 2.0
_, p_x, v_x = eng.steps(eng.init_carry(), blocks)
_, p_f, v_f = eng_f.steps(eng_f.init_carry(), blocks)
assert np.array_equal(np.asarray(p_x), np.asarray(p_f)), "chain preds diverge"
assert np.array_equal(np.asarray(v_x), np.asarray(v_f)), "chain votes diverge"

# batched fused tick chain (§4: S sessions, shared weights + per-session
# BN affines) vs the vmapped XLA scan, with one session calibrated
from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine
S = 8
mkb = lambda fused, **kw: BatchedStreamingEngine(CFG, model, variables,
    emg_mean=np.zeros(12, np.float32), emg_std=np.ones(12, np.float32),
    n_sessions=S, use_fused_encoder=fused, **kw)
bx, bf = mkb(False), mkb(True)
calib = (rng.standard_normal((2000, 12)) * 4 + 2).astype(np.float32)
bx.calibrate_session(1, calib); bf.calibrate_session(1, calib)
blocks_b = rng.standard_normal((50, S, CFG.factor, 12)).astype(np.float32) * 2.0
_, p_x, v_x = bx.steps(bx.init_carries(), blocks_b)
_, p_f, v_f = bf.steps(bf.init_carries(), blocks_b)
assert np.array_equal(np.asarray(p_x), np.asarray(p_f)), "batched preds diverge"
assert np.array_equal(np.asarray(v_x), np.asarray(v_f)), "batched votes diverge"

# §4 session-BLOCKED grid (round 4: capacity beyond the VMEM gate) — force
# a 3-block geometry (20 sessions, block 8, pad in the last) vs XLA,
# through the PUBLIC session_block override so its sublane/shard clamping
# is exercised on hardware too (ADVICE r4)
S = 20
bx, bf = mkb(False), mkb(True, session_block=8)
bx.calibrate_session(13, calib); bf.calibrate_session(13, calib)
blocks_b = rng.standard_normal((20, S, CFG.factor, 12)).astype(np.float32) * 2.0
c_x, c_f = bx.init_carries(), bf.init_carries()
for chunk in (blocks_b[:9], blocks_b[9:]):   # threaded carry across calls
    c_x, p_x, v_x = bx.steps(c_x, chunk)
    c_f, p_f, v_f = bf.steps(c_f, chunk)
    assert np.array_equal(np.asarray(p_x), np.asarray(p_f)), "blocked preds diverge"
    assert np.array_equal(np.asarray(v_x), np.asarray(v_f)), "blocked votes diverge"
print("TPU kernel check OK")
PY

# Fused TRAINING chain (ops/train_fused.py): hardware-only properties —
# the backward's PRNG mask REGENERATION identity (same seeds → same bits;
# a mismatch would blow up the gradient differential), real-bit mask
# statistics, determinism, and the full-encoder composition vs flax.
python - <<'PY'
import numpy as np, jax, jax.numpy as jnp
from contrastiveprosthetics_tpu.ops.train_fused import (
    fused_dense_chain, dense_chain_reference, extract_prng_masks,
    fused_emg_embed)
from contrastiveprosthetics_tpu.models.emg_net import EMGNet
assert jax.default_backend() == "tpu"

L, D0, F, N = 7, 768, 512, 328   # reference width, canonical rows
key = jax.random.key(11)
ks = jax.random.split(key, 2 * L + 3)
ws = tuple(jax.random.normal(ks[i], (D0 if i == 0 else F, F)) * 0.05
           for i in range(L))
bs = tuple(jax.random.normal(ks[L + i], (F,)) * 0.05 for i in range(L))
gs = tuple(jnp.ones((F,)) for _ in range(L))
betas = tuple(jnp.zeros((F,)) for _ in range(L))
x0 = jax.random.normal(ks[-3], (N, D0))
dkey = ks[-2]
rate = jnp.float32(0.5)

run = jax.jit(lambda *a: fused_dense_chain(*a, dkey, rate,
                                           mask_mode="prng"))
h1, m1, v1 = run(x0, ws, bs, gs, betas)
h2, m2, v2 = run(x0, ws, bs, gs, betas)
assert np.array_equal(np.asarray(h1), np.asarray(h2)), "nondeterministic"

# extracted hardware masks: statistics + the REGENERATION IDENTITY —
# the same kernels fed the extracted masks explicitly must reproduce the
# prng run BIT-FOR-BIT (this is the property the backward's mask
# regeneration rests on; it caught the fwd/bwd seed-coordinate
# off-by-one in round 4) — then oracle equality of values/grads
em = extract_prng_masks(N, [F] * L, dkey, rate, n_linear=L)
for j, m in enumerate(em):
    mean = float(np.asarray(m).mean())
    sigma = (0.25 / m.size) ** 0.5
    assert abs(mean - 0.5) < 6 * sigma, (j, mean)
h1i, _, _ = jax.jit(lambda *a: fused_dense_chain(
    *a, dkey, rate, mask_mode="input", ext_masks=em))(x0, ws, bs, gs, betas)
assert np.array_equal(np.asarray(h1), np.asarray(h1i)), (
    "prng chain != same kernels with extracted masks",
    np.abs(np.asarray(h1) - np.asarray(h1i)).max())

# LOGIC checks vs the XLA f32 oracle run under "highest" matmul
# precision on BOTH sides (the §2 technique): at DEFAULT precision the
# MXU's split-bf16 f32 passes drift ~3e-3 of the activation scale
# through 7 BN layers (measured 0.052 on |h|max 15.0) and the sin-probe
# grad differential amplifies that to ~0.19 worst-element — all of
# which collapses to 1.2e-5 / 5.3e-3 under highest precision (round-4
# measurement), i.e. rounding, not logic.
args = (x0, ws, bs, gs, betas)
with jax.default_matmul_precision("highest"):
    hh, _, _ = jax.jit(lambda a: fused_dense_chain(
        *a, dkey, rate, mask_mode="input", ext_masks=em))(args)
    hr, mr, vr = dense_chain_reference(x0, ws, bs, gs, betas, em, 0.5,
                                       dropout_from=L - 4)
    assert np.allclose(np.asarray(hh), np.asarray(hr),
                       rtol=1e-4, atol=1e-3), (
        np.abs(np.asarray(hh) - np.asarray(hr)).max())
    gf = jax.jit(jax.grad(lambda a: jnp.sum(jnp.sin(fused_dense_chain(
        *a, dkey, rate, mask_mode="prng")[0]))))(args)
    gr = jax.jit(jax.grad(lambda a: jnp.sum(jnp.sin(dense_chain_reference(
        *a, em, 0.5, dropout_from=L - 4)[0]))))(args)
worst = 0.0
for got, want in zip(jax.tree_util.tree_leaves(gf),
                     jax.tree_util.tree_leaves(gr)):
    scale = max(float(jnp.abs(want).max()), 1e-3)
    d = float(jnp.abs(got - want).max()) / scale
    worst = max(worst, d)
    assert d < 2e-2, d   # residual non-matmul rounding band
print(f"fused-train prng regen + oracle grads OK (worst rel {worst:.1e})")

# full composition vs flax at rate=0 on hardware (f32 + bf16 compile);
# the logic comparison runs under "highest" matmul precision — at
# default precision the two schedules' MXU passes drift ~1.2e-2
# (round-4 measurement, same class as the chain checks above)
model = EMGNet(d_e=16, adabn=False, n_linear=7, hidden=512)
frames = jax.random.normal(jax.random.key(2), (328, 12))
variables = model.init({"params": key, "dropout": key}, frames, 0.0, True)
params, bstats = variables["params"], variables["batch_stats"]
with jax.default_matmul_precision("highest"):
    ef, _ = jax.jit(lambda p: model.apply(
        {"params": p, "batch_stats": bstats}, frames, 0.0, True,
        rngs={"dropout": dkey}, mutable=["batch_stats"]))(params)
    eg, _ = jax.jit(lambda p: fused_emg_embed(
        p, frames, jnp.float32(0.0), dkey, batch_stats=bstats,
        adabn=False))(params)
assert np.allclose(np.asarray(ef), np.asarray(eg), rtol=5e-3, atol=5e-3), (
    np.abs(np.asarray(ef) - np.asarray(eg)).max())
eb, _ = jax.jit(lambda p: fused_emg_embed(
    p, frames, jnp.float32(0.5), dkey, batch_stats=bstats,
    adabn=False, compute_dtype=jnp.bfloat16))(params)
assert np.all(np.isfinite(np.asarray(eb)))
print("fused-train encoder composition OK (f32 + bf16)")
PY
echo "tpu_kernel_check complete"
