"""Multi-device (8-way virtual CPU mesh) data-parallel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _make_algo(name, synthetic_acdc):
    """Tiny 8-labeled/16-unlabeled setup for every SSL algorithm."""
    cfg = tiny_cfg(synthetic_acdc, batch_size=8, unlabel_batch_size=16)
    if name == "ict":
        cfg.ict_alpha = 0.2
    if name in ("cps", "ctct", "s4cvnet"):
        cfg.model1 = tiny_model_block(model="unet")
        cfg.model2 = tiny_model_block(model="unet")
    if name == "hpfg":
        cfg.model1 = tiny_model_block(model="unet_plus")
        cfg.model2 = tiny_model_block(model="unet_plus")
    return build_algorithm(name, cfg)


def _ssl_batch(dual: bool = False) -> dict:
    rng = np.random.default_rng(0)
    batch = {
        "label_img": rng.normal(size=(8, 32, 32, 1)).astype(np.float32),
        "label": rng.integers(0, 4, (8, 32, 32)).astype(np.int32),
        "unlabel_img": rng.normal(size=(16, 32, 32, 1)).astype(np.float32),
    }
    if dual:
        batch["label_img1"] = rng.normal(
            size=(8, 32, 32, 1)).astype(np.float32)
        batch["label1"] = rng.integers(0, 4, (8, 32, 32)).astype(np.int32)
    return batch


@pytest.mark.parametrize("name", ["hpfg", "uamt", "ict", "cps", "ssnet"])
def test_sharded_loss_matches_single_device(name, synthetic_acdc):
    """Data parallelism must not change step semantics: the jitted step on
    an 8-device-sharded batch produces the same loss (global BN stats,
    global loss reductions, all_gather'd contrastive batches under GSPMD)
    as the identical step on one device. ssnet additionally pins the
    memory-bank contents — its top-k selection over the global batch is
    the likeliest place GSPMD silently diverges (VERDICT r2 #6)."""
    algo = _make_algo(name, synthetic_acdc)
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = _ssl_batch(dual=(name == "hpfg"))
    step = jax.jit(algo.step)  # NOT donated: state reused for both runs

    new_single, metrics_single = step(state, jax.tree.map(jnp.asarray, batch))

    mesh = make_mesh()
    sharded = shard_batch(mesh, batch)
    new_sharded, metrics_sharded = step(state, sharded)

    np.testing.assert_allclose(float(np.asarray(metrics_single["loss"])),
                               float(np.asarray(metrics_sharded["loss"])),
                               rtol=2e-3, atol=1e-5)
    if name == "ssnet":
        # atol covers sharded-reduction ordering noise in the projection
        # normalizations feeding the bank (observed max 2.1e-5 on near-zero
        # entries); a wrong top-k selection or mis-sharded update swaps whole
        # feature rows (O(0.1) entries), far above this band
        np.testing.assert_allclose(np.asarray(new_single.memory),
                                   np.asarray(new_sharded.memory),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(new_single.memory_valid),
                                      np.asarray(new_sharded.memory_valid))
