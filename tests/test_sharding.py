"""Multi-device (8-way virtual CPU mesh) data-parallel tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hpfg_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from hpfg_tpu.train.algorithms import build_algorithm
from tests.helpers import tiny_cfg, tiny_model_block


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_shard_batch_spreads_leading_axis():
    mesh = make_mesh()
    batch = {"x": np.ones((16, 4, 4, 1), np.float32)}
    sharded = shard_batch(mesh, batch)
    x = sharded["x"]
    assert x.shape == (16, 4, 4, 1)
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape[0] == 2


def test_shard_cached_shards_batch_axis_only():
    """Device-cache arrays [E, B, ...]: epoch axis replicated, batch axis
    sharded (train/trainer.py device_cache mode)."""
    from hpfg_tpu.parallel.mesh import shard_cached

    mesh = make_mesh()
    mega = shard_cached(mesh, {"x": np.ones((3, 16, 4, 4, 1), np.float32)})
    x = mega["x"]
    assert x.shape == (3, 16, 4, 4, 1)
    shard = x.addressable_shards[0].data
    assert shard.shape[0] == 3      # epoch axis replicated
    assert shard.shape[1] == 2      # batch axis split 8 ways


def test_device_cache_trainer_on_mesh(synthetic_acdc, tmp_path):
    """The cached step (batch = mega[state.step % E] in-jit) runs under the
    8-device mesh and trains."""
    from hpfg_tpu.train.trainer import Trainer

    cfg = tiny_cfg(synthetic_acdc, datasets="sup_acdc", batch_size=8,
                   total_itrs=6, step_size=3, device_cache=2,
                   device_augment=True)
    algo = build_algorithm("supervised", cfg)
    trainer = Trainer(cfg, algo, workdir=str(tmp_path / "run"),
                      enable_tb=False)
    state = trainer.fit()
    assert int(np.asarray(state.step)) == 6


def test_mean_teacher_step_on_mesh(synthetic_acdc):
    """The SSL step jit-compiles and executes with batches sharded over an
    8-device mesh; loss matches the single-device result (global BN stats and
    global loss reductions under GSPMD)."""
    cfg = tiny_cfg(synthetic_acdc, batch_size=8, unlabel_batch_size=16)
    algo = build_algorithm("mean_teacher", cfg)
    state = algo.init_state(jax.random.PRNGKey(0))

    batch = {
        "label_img": np.random.default_rng(0).normal(
            size=(8, 32, 32, 1)).astype(np.float32),
        "label": np.zeros((8, 32, 32), np.int32),
        "unlabel_img": np.random.default_rng(1).normal(
            size=(16, 32, 32, 1)).astype(np.float32),
    }
    step = jax.jit(algo.step)

    _, metrics_single = step(state, jax.tree.map(jnp.asarray, batch))

    mesh = make_mesh()
    sharded = shard_batch(mesh, batch)
    _, metrics_sharded = step(state, sharded)

    np.testing.assert_allclose(float(np.asarray(metrics_single["loss"])),
                               float(np.asarray(metrics_sharded["loss"])),
                               rtol=2e-3)


def test_hpfg_step_on_mesh(synthetic_acdc):
    cfg = tiny_cfg(synthetic_acdc, batch_size=8, unlabel_batch_size=16)
    cfg.model1 = tiny_model_block(model="unet_plus")
    cfg.model2 = tiny_model_block(model="unet_plus")
    algo = build_algorithm("hpfg", cfg)
    algo.label_bs, algo.unlabel_bs = 8, 16
    state = algo.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "label_img": rng.normal(size=(8, 32, 32, 1)).astype(np.float32),
        "label": np.zeros((8, 32, 32), np.int32),
        "label_img1": rng.normal(size=(8, 32, 32, 1)).astype(np.float32),
        "label1": np.zeros((8, 32, 32), np.int32),
        "unlabel_img": rng.normal(size=(16, 32, 32, 1)).astype(np.float32),
    }
    mesh = make_mesh()
    sharded = shard_batch(mesh, batch)
    step = jax.jit(algo.step, donate_argnums=(0,))
    state, metrics = step(state, sharded)
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    assert int(np.asarray(state.step)) == 1
