"""Data-tree preflight (hpfg_tpu/data/preflight.py): synthetic fixtures
bit-matching each reference layout must pass; broken trees must fail with
actionable messages naming the offending path (VERDICT r3 #8)."""

import os

import h5py
import numpy as np
import pytest

from hpfg_tpu.data.preflight import (
    DataPreflightError,
    preflight_or_raise,
    validate_data_tree,
)
from hpfg_tpu.data.synthetic import (
    make_synthetic_acdc,
    make_synthetic_building,
    make_synthetic_isic,
    make_synthetic_lidc,
    make_synthetic_synapse,
)


@pytest.mark.parametrize("maker,dataset,ncls", [
    (make_synthetic_acdc, "acdc", 4),
    (make_synthetic_lidc, "lidc", 2),
    (make_synthetic_isic, "isic", 2),
    (make_synthetic_synapse, "synapse", 9),
    (make_synthetic_building, "sup_building", 2),
])
def test_valid_tree_passes(tmp_path, maker, dataset, ncls):
    root = str(tmp_path / dataset)
    maker(root)
    assert validate_data_tree(root, dataset, ncls) == []


def test_every_builder_dataset_has_a_validator():
    """ADVICE r4 (high): preflight_or_raise runs before any model is built,
    so every dataset name build_loader accepts MUST have a validator — a
    missing entry aborts valid training runs at startup. The accepted names
    are extracted from builder.py's literal dispatch to stay in sync."""
    import inspect
    import re

    from hpfg_tpu.data import builder
    from hpfg_tpu.data.preflight import _VALIDATORS

    src = inspect.getsource(builder.build_loader)
    accepted = set(re.findall(r'name == "([a-z_]+)"', src))
    assert accepted, "failed to extract dataset names from builder.py"
    missing = accepted - set(_VALIDATORS)
    assert not missing, f"builder datasets without preflight: {missing}"
    orphans = set(_VALIDATORS) - accepted
    assert not orphans, f"preflight keys builder.py rejects: {orphans}"


def test_missing_root_and_unknown_dataset(tmp_path):
    issues = validate_data_tree(str(tmp_path / "nope"), "acdc")
    assert len(issues) == 1 and "not a directory" in issues[0]
    issues = validate_data_tree(str(tmp_path), "imagenet")
    assert "unknown dataset" in issues[0]


def test_missing_list_file_is_actionable(tmp_path):
    root = str(tmp_path / "acdc")
    make_synthetic_acdc(root)
    os.remove(os.path.join(root, "train_slices.list"))
    issues = validate_data_tree(root, "acdc")
    assert any("train_slices.list" in s and "data_path" in s for s in issues)


def test_listed_file_missing(tmp_path):
    root = str(tmp_path / "acdc")
    make_synthetic_acdc(root)
    with open(os.path.join(root, "train_slices.list")) as f:
        first = f.readline().strip()
    os.remove(os.path.join(root, "data", "slices", f"{first}.h5"))
    issues = validate_data_tree(root, "acdc")
    assert any(f"{first}.h5" in s and "does not exist" in s for s in issues)


def test_wrong_h5_keys_and_label_range(tmp_path):
    root = str(tmp_path / "acdc")
    make_synthetic_acdc(root)
    with open(os.path.join(root, "train_slices.list")) as f:
        first = f.readline().strip()
    path = os.path.join(root, "data", "slices", f"{first}.h5")
    os.remove(path)
    with h5py.File(path, "w") as h5f:  # wrong key name
        h5f["img"] = np.zeros((8, 8), np.float32)
    issues = validate_data_tree(root, "acdc")
    assert any("no dataset 'image'" in s for s in issues)

    with h5py.File(path, "w") as h5f:  # out-of-range labels
        h5f["image"] = np.zeros((8, 8), np.float32)
        h5f["label"] = np.full((8, 8), 7, np.uint8)
    issues = validate_data_tree(root, "acdc")
    assert any("label max 7 >= num_classes 4" in s for s in issues)


def test_volume_dimensionality_checked(tmp_path):
    root = str(tmp_path / "acdc")
    make_synthetic_acdc(root)
    with open(os.path.join(root, "val.list")) as f:
        first = f.readline().strip()
    path = os.path.join(root, "data", f"{first}.h5")
    os.remove(path)
    with h5py.File(path, "w") as h5f:  # 2-D where a volume is expected
        h5f["image"] = np.zeros((8, 8), np.float32)
        h5f["label"] = np.zeros((8, 8), np.uint8)
    issues = validate_data_tree(root, "acdc")
    assert any("expected 3-D" in s for s in issues)


def test_preflight_or_raise_collects_everything(tmp_path):
    from hpfg_tpu.config import Config

    root = str(tmp_path / "acdc")
    make_synthetic_acdc(root)
    os.remove(os.path.join(root, "val.list"))
    os.remove(os.path.join(root, "test.list"))
    cfg = Config(data_path=root, datasets="acdc", num_classes=4)
    with pytest.raises(DataPreflightError) as exc:
        preflight_or_raise(cfg)
    msg = str(exc.value)
    assert "val.list" in msg and "test.list" in msg and "preflight=0" in msg
    # opt-out honored
    preflight_or_raise(Config(data_path=root, datasets="acdc",
                              num_classes=4, preflight=0))
