"""Test configuration: run the whole suite hermetically on CPU with a virtual
8-device mesh so sharding tests need no TPU hardware."""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: CPU compiles of the big jitted epoch programs
# dominate suite time; cache them across runs. The cache lives INSIDE the
# repo (gitignored) because /tmp is wiped between driver sessions — a
# repo-local cache keeps later rounds' suites warm (~10 min vs ~50 cold).
_CACHE = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# NOTE: x64 is deliberately NOT enabled — float64 on this XLA CPU backend is
# pathologically slow (>100s for a trivial op). JAX paths are float32; the
# float64 oracles are numpy/scipy, with tolerances set accordingly.

import jax  # noqa: E402

# The environment's 'axon' TPU plugin force-prepends itself to jax_platforms,
# overriding the JAX_PLATFORMS env var — force CPU via the config API.
jax.config.update("jax_platforms", "cpu")

# jax 0.9.0 IGNORES the JAX_COMPILATION_CACHE_DIR/JAX_PERSISTENT_CACHE_*
# env vars (verified empirically) — the config API is the only thing that
# actually enables the persistent cache.
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    """Function-scoped so every test draws the SAME data no matter which
    other tests ran first — a session-scoped generator made each test's
    data depend on the whole suite's draw history, so adding a test
    anywhere could push a tight f32-vs-f64 tolerance elsewhere over the
    line (test_moving_rms_matches_reference, observed 2026-08-18)."""
    return np.random.default_rng(1234)
