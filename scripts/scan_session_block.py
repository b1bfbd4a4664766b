"""Session-block-size scan for the §4 blocked serve kernel.

One block size per PROCESS (cross-program contamination rule), bench.py
measurement discipline: device-resident inputs before timing, an untimed
warm run, best-of-3 timed runs per chain length, marginal ms/tick between
K=3 and K=10 (negative slopes print as nan, never published).

    for sb in auto 32 48 56 64; do
      python scripts/scan_session_block.py 32768 $sb
    done

Recorded v5e scan at S=32768 (f32 reference-width model, 2026-08-20):
16 → 11.54, 32 → 9.35, 40 → 8.59, 48 → 8.42, 56 → 7.58, 64 → 6.08
ms/tick, 72 → Mosaic scoped-vmem OOM (+140 KB over the 16.00 MB stack).
Since round 5 the auto gate COMPILE-PROBES the tuned candidates
(2×/1.75× the worst-case census — 64/56 at reference width) on the
first fused steps() call and keeps the largest that compiles, falling
back to the census block 32 where Mosaic rejects them (e.g. S=4096;
docs/serve_phase_r04_sb56.json) and demoting at call time if a promoted
block later fails (serve/stream.py). `session_block=` remains the
explicit override. A bench-phase re-measurement of Sb=56 at the S=32768
capacity point read 6.76 ms/tick — slightly better than this scan's
7.58; the probed auto gate recorded 6.37-7.10 ms at block 64
(docs/serve_phase_r05_final.json). All figures in docs/SCALING.md
"Session-block tuning".
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    from contrastiveprosthetics_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    sb = (None if len(sys.argv) < 3 or sys.argv[2] == "auto"
          else int(sys.argv[2]))

    model = ContrastiveModel(adabn=False)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, cfg.max_tasks, 12)),
        jnp.zeros((1, cfg.max_tasks, 20)), 0.0, 0.0, False,
    )
    rng = np.random.default_rng(0)
    base = rng.standard_normal((S, cfg.factor, cfg.emg_dim)).astype(
        np.float32
    )
    eng = BatchedStreamingEngine(
        cfg, model, variables,
        emg_mean=np.zeros(cfg.emg_dim, np.float32),
        emg_std=np.ones(cfg.emg_dim, np.float32),
        n_sessions=S, use_fused_encoder=True, session_block=sb,
    )

    def chain_once(K: int) -> float:
        blocks = jax.device_put(
            jnp.asarray(np.broadcast_to(base, (K,) + base.shape))
        )
        _, _, v = eng.steps(eng.init_carries(), blocks)
        np.asarray(v)                    # warm: compile + process history
        t0 = time.perf_counter()
        _, _, v = eng.steps(eng.init_carries(), blocks)
        np.asarray(v)                    # readback = the only reliable sync
        return time.perf_counter() - t0

    tb: dict = {}
    for _trial in range(3):
        for K in (3, 10):
            tb[K] = min(tb.get(K, float("inf")), chain_once(K))
    d = tb[10] - tb[3]
    ms = d / 7 * 1e3 if d > 0 else float("nan")
    print(f"S={S} session_block={eng._session_block}: {ms:.3f} ms/tick "
          f"({ms / S * 1e3:.3f} us/session)  "
          f"[t3={tb[3]:.3f}s t10={tb[10]:.3f}s]")


if __name__ == "__main__":
    main()
