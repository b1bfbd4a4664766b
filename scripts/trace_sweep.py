"""Op-level attribution of the sweep's wall time: run the vmapped sweep
under jax.profiler with a perfetto trace, then aggregate TPU op durations
by HLO category. Prints the top-k ops by total device time."""
from __future__ import annotations

import glob
import gzip
import json
import re
import sys
from collections import defaultdict

from contrastiveprosthetics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
from contrastiveprosthetics_tpu.data.store import DeviceStore
from contrastiveprosthetics_tpu.data.synthetic import make_processed_dataset
from contrastiveprosthetics_tpu.train.crossval import sample_hyperparams
from contrastiveprosthetics_tpu.train.engine import Trainer

N_CFG, EPOCHS, BS = 150, 1, 8
LOGDIR = "/tmp/sweep_trace_perfetto"


def main():
    emg, pos, glove = make_processed_dataset(cfg)
    store = DeviceStore(cfg, emg, pos, glove)
    trainer = Trainer(cfg, store, adabn=False, batch_size=BS,
                      use_pallas_loss=False)
    hypers = sample_hyperparams(N_CFG, seed=7)
    key = jax.random.PRNGKey(0)
    init_keys = jax.random.split(jax.random.fold_in(key, 0), N_CFG)
    states = jax.jit(jax.vmap(trainer.init_state))(init_keys)
    ep_keys = jnp.stack(
        [jax.random.split(jax.random.fold_in(key, 100 + e), N_CFG)
         for e in range(EPOCHS)], axis=1,
    )
    ones = jnp.ones((EPOCHS,), jnp.float32)
    fn = jax.jit(jax.vmap(
        lambda s, ek, h, tv: trainer._train_epochs(s, ek, h, ones, ones, tv),
        in_axes=(0, 0, 0, None),
    ))
    out = fn(states, ep_keys, hypers, trainer.view_train)
    jax.block_until_ready(out)

    jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
    out = fn(states, ep_keys, hypers, trainer.view_train)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    paths = glob.glob(f"{LOGDIR}/**/*.json.gz", recursive=True)
    if not paths:
        print("no perfetto trace found", file=sys.stderr)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    # find TPU op tracks (XLA Ops): aggregate complete events by name
    per_op = defaultdict(float)
    total = 0.0
    for ev in events:
        if not isinstance(ev, dict) or ev.get("ph") != "X":
            continue
        dur = ev.get("dur", 0) / 1e6  # µs → s
        name = ev.get("name", "")
        cat = ev.get("args", {}).get("long_name", "") if ev.get("args") else ""
        if dur <= 0:
            continue
        # keep likely-XLA-op events (fusion.NNN, op names); skip runtime rows
        if re.match(r"^(fusion|copy|dynamic|loop_|while|convolution|dot|"
                    r"custom-call|all-|reduce|scatter|gather|select|rng|"
                    r"transpose|broadcast|iota|add|sub|mul|bitcast|convert|"
                    r"slice|concatenate|cumsum|tuple|get-tuple)", name):
            base = re.sub(r"[.\d]+$", "", name)
            per_op[base] += dur
            total += dur
    print(f"total attributed device time: {total:.3f}s")
    for name, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t:8.3f}s  {100*t/total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
