"""Entry-script / config-file end-to-end smoke (tiny synthetic run)."""

import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_run_py_supervised_end_to_end(synthetic_acdc, tmp_path):
    from run import run

    cfg = {
        "algorithm": "supervised",
        "datasets": "sup_acdc",
        "num_classes": 4,
        "data_path": synthetic_acdc,
        "save_path": str(tmp_path / "ckpt"),
        "name": "smoke",
        "precision": "fp32",
        "train_crop_size": [32, 32],
        "test_crop_size": [32, 32],
        "batch_size": 8,
        "in_channels": 1,
        "model": "unet",
        "feature_chns": [4, 8, 16, 32, 64],
        "seed": 0,
        "total_itrs": 6,
        "step_size": 3,
        "opt": "sgd",
        "lr": 0.05,
        "weight_decay": 1e-4,
        "momentum": 0.9,
        "sched": "medical",
        "warmup_epochs": 0,
        "warmup_lr": 1e-4,
        "min_lr": 1e-6,
    }
    cfg_path = tmp_path / "smoke.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    trainer = run(str(cfg_path), argv=["--set", "total_itrs=6"])
    assert len(trainer.history) == 2  # eval at 3 and 6
    assert trainer.ckpt.exists("last")
    # tensorboard event files written
    tb_dir = os.path.join(str(tmp_path / "ckpt"), "tensorboardX")
    assert any(f.startswith("events") for f in os.listdir(tb_dir))


def test_ccnet_flat_schema_one_step(synthetic_acdc):
    """A real ccnet YAML (flat single-model schema, reference
    config/ccnet_unet_30k_224x224_ACDC.yaml) builds the HPFG trainer via the
    DualAlgorithm fallback and executes one training step."""
    import jax
    import jax.numpy as jnp

    from hpfg_tpu.config import load_config
    from hpfg_tpu.train.algorithms import build_algorithm

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "ccnet_unet_30k_224x224_ACDC.yaml")
    cfg = load_config(cfg_path)
    # tiny overrides for CPU (schema untouched: still flat, no model1/2)
    cfg.train_crop_size = [32, 32]
    cfg.test_crop_size = [32, 32]
    cfg.batch_size, cfg.unlabel_batch_size = 4, 8
    cfg.feature_chns = [4, 8, 16, 32, 64]
    cfg.dropout = [0.05, 0.1, 0.2, 0.3, 0.5]
    assert cfg.get("model1") is None and cfg.get("model2") is None

    algo = build_algorithm(cfg.algorithm, cfg)
    assert algo.name == "hpfg"
    state = algo.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    hw = 32
    batch = {
        "label_img": rng.normal(size=(4, hw, hw, 1)).astype(np.float32),
        "label": rng.integers(0, 4, (4, hw, hw)).astype(np.int32),
        "label_img1": rng.normal(size=(4, hw, hw, 1)).astype(np.float32),
        "label1": rng.integers(0, 4, (4, hw, hw)).astype(np.int32),
        "unlabel_img": rng.normal(size=(8, hw, hw, 1)).astype(np.float32),
    }
    state, metrics = jax.jit(algo.step)(state, batch)
    assert np.isfinite(float(np.asarray(metrics["loss"])))


def test_ccnet_featureless_model_fails_fast():
    """ccnet_transunet names plain transunet, which returns logits only —
    upstream this crashes deep inside main.py:160 (3-way unpack); here the
    trainer build raises a clear ValueError naming the *_plus requirement."""
    import pytest

    from hpfg_tpu.config import load_config
    from hpfg_tpu.train.algorithms import build_algorithm

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "ccnet_transunet_30k_224x224_ACDC.yaml")
    cfg = load_config(cfg_path)
    with pytest.raises(ValueError, match=r"\*_plus"):
        build_algorithm(cfg.algorithm, cfg)


def test_config_yaml_files_parse():
    from hpfg_tpu.config import load_config

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    names = [f for f in os.listdir(cfg_dir) if f.endswith(".yaml")]
    assert len(names) >= 10
    for name in names:
        cfg = load_config(os.path.join(cfg_dir, name))
        assert "algorithm" in cfg, name
        assert "total_itrs" in cfg, name
        if "model1" in cfg:
            assert "opt" in cfg.model1 and "lr" in cfg.model1, name


def test_every_config_builds_optimizer_and_schedule():
    """YAML 1.1 parses dot-less scientific notation (``warmup_lr: 1e-05``,
    as in the reference's ccnet configs) as a STRING; the optimizer build
    must coerce, not crash at trace time (caught driving ccnet_cmt)."""
    from hpfg_tpu.config import load_config
    from hpfg_tpu.train.optim import build_optimizer

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in sorted(f for f in os.listdir(cfg_dir)
                       if f.endswith(".yaml")):
        cfg = load_config(os.path.join(cfg_dir, name))
        for sub in ([cfg.model1, cfg.model2] if "model1" in cfg else [{}]):
            merged = cfg.merged(sub)
            merged.setdefault("step_size", 100)
            tx, schedule = build_optimizer(merged)
            lr0 = float(np.asarray(schedule(0)))
            assert np.isfinite(lr0), (name, lr0)
