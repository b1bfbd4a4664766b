#!/usr/bin/env bash
# Compile-and-validate the Pallas kernels on real TPU hardware (the test
# suite runs them in interpret mode on CPU).
set -e
cd "$(dirname "$0")/.."
python - <<'PY'
import numpy as np, jax, jax.numpy as jnp
from contrastiveprosthetics_tpu.ops.pallas_ops import (
    fused_contrastive_loss, fused_contrastive_reference,
    gather_normalize, gather_normalize_reference, on_tpu)
assert on_tpu(), f"not on TPU: {jax.default_backend()}"
rng = np.random.default_rng(0)
e = rng.standard_normal((12,41,16)).astype(np.float32)
g = rng.standard_normal((12,41,16)).astype(np.float32)
e /= np.linalg.norm(e,axis=-1,keepdims=True); g /= np.linalg.norm(g,axis=-1,keepdims=True)
lp, cp = jax.jit(lambda e,g: fused_contrastive_loss(e,g,False))(jnp.asarray(e), jnp.asarray(g))
lr, cr = fused_contrastive_reference(jnp.asarray(e), jnp.asarray(g))
assert np.allclose(float(lp), float(lr), rtol=1e-4) and float(cp)==float(cr)
src = jnp.asarray(rng.standard_normal((1000,12)).astype(np.float32))
idx = jnp.asarray(rng.integers(0,1000,size=(64,)).astype(np.int32))
m = jnp.zeros(12); s = jnp.ones(12)
out = jax.jit(lambda a,b: gather_normalize(a,b,m,s,False))(src, idx)
assert np.allclose(np.asarray(out), gather_normalize_reference(np.asarray(src), np.asarray(idx), np.asarray(m), np.asarray(s)))
print("TPU kernel check OK")
PY
