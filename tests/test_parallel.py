"""Multi-device SPMD: dp×mp-sharded step equals the single-device step;
config-sharded crossval epoch runs on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG
from contrastiveprosthetics_tpu.data.store import DeviceStore
from contrastiveprosthetics_tpu.data.synthetic import make_processed_dataset
from contrastiveprosthetics_tpu.parallel.mesh import make_mesh, state_shardings
from contrastiveprosthetics_tpu.parallel.spmd import (
    make_sharded_crossval_epoch,
    make_sharded_train_step,
)
from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer

CFG = DEFAULT_CONFIG

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
    ),
    pytest.mark.slow,  # GSPMD/shard_map compiles: fast tier skips these
]


@pytest.fixture(scope="module")
def trainer():
    emg, pos, glove = make_processed_dataset(CFG, people_positions=[40])
    store = DeviceStore(CFG, emg, pos, glove)
    return Trainer(CFG, store, adabn=True, batch_size=8)


@pytest.fixture(scope="module")
def hyper():
    return Hyper.single(1e-3, 1e-6, 0.5, 1e-3, 1e-6, 0.3)


def test_mesh_shapes():
    mesh = make_mesh(n_dp=4, n_mp=2)
    assert mesh.shape == {"dp": 4, "mp": 2}
    with pytest.raises(ValueError):
        make_mesh(n_dp=16, n_mp=2)


def test_tp_shards_wide_kernels(trainer):
    mesh = make_mesh(n_dp=4, n_mp=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    sh = state_shardings(mesh, state)
    # at least one 512×512 kernel sharded over mp
    specs = [
        s.spec
        for s in jax.tree_util.tree_leaves(
            sh.params, is_leaf=lambda x: hasattr(x, "spec")
        )
    ]
    assert any("mp" in str(spec) for spec in specs)


def test_tp_alternates_hidden_kernels(trainer):
    """Consecutive 512×512 kernels must get alternating column/row specs
    (megatron pairs); the layer index lives in TorchDense_<i>, not the
    inner Dense_0."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_dp=4, n_mp=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    sh = state_shardings(mesh, state)
    specs = {}
    for name, sub in sh.params["emg_net"].items():
        if name.startswith("TorchDense_"):
            kernel = state.params["emg_net"][name]["Dense_0"]["kernel"]
            if kernel.shape == (512, 512):
                specs[int(name.split("_")[1])] = sub["Dense_0"]["kernel"].spec
    assert len(specs) >= 4  # the 7-layer MLP has 6 hidden 512×512 kernels
    for i, spec in specs.items():
        assert spec == (P("mp", None) if i % 2 else P(None, "mp"))
    idxs = sorted(specs)
    for a, b in zip(idxs, idxs[1:]):
        assert specs[a] != specs[b], "consecutive kernels must alternate"


def test_sharded_step_matches_single_device(trainer, hyper):
    mesh = make_mesh(n_dp=4, n_mp=2)
    step, place_state = make_sharded_train_step(trainer, mesh)
    state = trainer.init_state(jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    B, T = 8, CFG.max_tasks
    emg_b = jnp.asarray(rng.standard_normal((B, T, 12)), jnp.float32)
    glove_b = jnp.asarray(rng.standard_normal((B, T, 20)), jnp.float32)
    key = jax.random.PRNGKey(2)
    lr = jnp.float32(1e-3)

    # single-device reference
    s_ref, loss_ref, acc_ref = jax.jit(trainer._sgd_step)(
        state, emg_b, glove_b, hyper, lr, lr, key
    )
    # sharded
    s_sh, loss_sh, acc_sh = step(
        place_state(state), emg_b, glove_b, hyper, lr, lr, key
    )
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-4)
    # Adam's first-step update is ≈ sign(m)·lr, so coordinates with ~zero
    # gradient can flip sign under the sharded reduction order; require the
    # overwhelming majority of coordinates to match tightly and bound the
    # rest by the lr-scale flip.
    lr_f = 1e-3
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.params),
        jax.tree_util.tree_leaves(s_sh.params),
    ):
        a, b = np.asarray(a), np.asarray(b)
        close = np.isclose(a, b, rtol=5e-3, atol=1e-5)
        assert close.mean() > 0.98, f"only {close.mean():.3f} close"
        np.testing.assert_allclose(a, b, atol=2.5 * lr_f)


def test_config_sharded_crossval_epoch(trainer, hyper):
    """The config-sharded epoch executes on the 8-device mesh AND equals the
    single-device vmapped epoch. Narrow model (n_linear=2, hidden=64):
    XLA:CPU executes/compiles wide models pathologically slowly here; the
    sharding semantics being tested are width-independent."""
    mesh = make_mesh(n_dp=8, n_mp=1)
    # batch_size=D → the epoch scan has ONE step, keeping the (expensive)
    # GSPMD-through-vmap CPU compile small
    tr = Trainer(
        CFG, trainer.store, adabn=True, batch_size=300, n_linear=2, hidden=64
    )
    n_cfg = 8
    hypers = Hyper(*[jnp.full((n_cfg,), float(x), jnp.float32) for x in hyper])
    keys = jax.random.split(jax.random.PRNGKey(3), n_cfg)
    states = jax.vmap(tr.init_state)(keys)
    epoch_fn, place = make_sharded_crossval_epoch(tr, mesh)
    states, losses, accs = epoch_fn(
        place(states), keys, hypers, jnp.float32(1.0), jnp.float32(1.0)
    )
    assert losses.shape == (n_cfg,)
    assert np.isfinite(np.asarray(losses)).all()
    # correctness: sharded == single-device vmapped epoch
    states2 = jax.vmap(tr.init_state)(keys)
    vmapped = jax.vmap(tr._train_epoch, in_axes=(0, 0, 0, None, None))
    _, losses_ref, _ = jax.jit(vmapped)(
        states2, keys, hypers, jnp.float32(1.0), jnp.float32(1.0)
    )
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses_ref), rtol=1e-4, atol=1e-5
    )


def test_cross_validate_with_mesh_matches_unsharded(trainer, hyper):
    """cross_validate(mesh=...) (the --spmd_crossval path) must reproduce
    the unsharded sweep's values, including a config count that does NOT
    divide the dp size (pad-and-discard)."""
    from contrastiveprosthetics_tpu.train.crossval import (
        cross_validate,
        sample_hyperparams,
    )

    tr = Trainer(
        CFG, trainer.store, adabn=False, batch_size=300, n_linear=2, hidden=64
    )
    h = sample_hyperparams(6, seed=5)  # 6 configs over dp=8 → pad 2
    mesh = make_mesh(n_dp=8, n_mp=1)
    v_sharded = cross_validate(
        tr, h, epochs=1, key=jax.random.PRNGKey(9), verbose=False, mesh=mesh
    )
    v_plain = cross_validate(
        tr, h, epochs=1, key=jax.random.PRNGKey(9), verbose=False
    )
    assert v_sharded.shape == (6, 2)
    np.testing.assert_allclose(v_sharded[:, 0], v_plain[:, 0], rtol=1e-4)
    np.testing.assert_allclose(v_sharded[:, 1], v_plain[:, 1], atol=1e-6)
