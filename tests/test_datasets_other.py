"""LIDC / ISIC / Synapse / Building loader tests over synthetic fixtures."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def lidc_root(tmp_path_factory):
    from hpfg_tpu.data.synthetic import make_synthetic_lidc

    return make_synthetic_lidc(str(tmp_path_factory.mktemp("lidc")), n=16,
                               hw=(48, 48))


@pytest.fixture(scope="module")
def isic_root(tmp_path_factory):
    from hpfg_tpu.data.synthetic import make_synthetic_isic

    return make_synthetic_isic(str(tmp_path_factory.mktemp("isic")), n=12,
                               hw=(48, 48))


@pytest.fixture(scope="module")
def synapse_root(tmp_path_factory):
    from hpfg_tpu.data.synthetic import make_synthetic_synapse

    return make_synthetic_synapse(str(tmp_path_factory.mktemp("syn")),
                                  n_train=12, n_vols=2, hw=(48, 48))


@pytest.fixture(scope="module")
def building_root(tmp_path_factory):
    from hpfg_tpu.data.synthetic import make_synthetic_building

    return make_synthetic_building(str(tmp_path_factory.mktemp("bld")), n=12,
                                   hw=(48, 48))


class TestLIDC:
    def test_ssl_loaders(self, lidc_root):
        from hpfg_tpu.data.lidc import get_ssl_lidc_loader

        label, unlabel, test = get_ssl_lidc_loader(lidc_root, 2, 4, (32, 32),
                                                   label_num=0.5)
        images, masks = next(iter(label))
        assert images.shape == (2, 32, 32, 3)
        assert images.dtype == np.float32 and images.max() <= 1.0
        assert set(np.unique(masks)).issubset({0, 1})
        timages, tmasks = next(iter(test))
        assert timages.shape[1:] == (32, 32, 3)

    def test_sup_loader(self, lidc_root):
        from hpfg_tpu.data.lidc import get_lidc_loader

        train, test = get_lidc_loader(lidc_root, 2, (32, 32))
        images, masks = next(iter(train))
        assert images.shape == (2, 32, 32, 3)


class TestISIC:
    def test_ssl_loaders(self, isic_root):
        from hpfg_tpu.data.isic import get_ssl_isic_loader

        label, unlabel, test = get_ssl_isic_loader(isic_root, 2, 4, (32, 32),
                                                   label_num=0.5)
        images, masks = next(iter(unlabel))
        assert images.shape == (4, 32, 32, 3)
        assert set(np.unique(masks)).issubset({0, 1})


class TestSynapse:
    def test_loaders_and_volumes(self, synapse_root):
        from hpfg_tpu.data.synapse import SynapseDataset, get_ssl_synapse_loader

        label, unlabel, test = get_ssl_synapse_loader(
            synapse_root, 2, 4, (32, 32), label_num=0.5)
        images, masks = next(iter(label))
        assert images.shape == (2, 32, 32, 1)
        vol_img, vol_msk = SynapseDataset(synapse_root, "test",
                                          cache=False).load(0)
        assert vol_img.shape == (4, 48, 48)

    def test_builder_dispatch(self, synapse_root):
        from hpfg_tpu.config import Config
        from hpfg_tpu.data import build_loader

        cfg = Config(datasets="synapse", data_path=synapse_root, batch_size=2,
                     unlabel_batch_size=4, train_crop_size=[32, 32],
                     label_num=0.5, seed=0)
        assert len(build_loader(cfg)) == 3


class TestBuilding:
    def test_three_loaders(self, building_root):
        from hpfg_tpu.data.building import get_building_loader

        train, val, test = get_building_loader(building_root, 2, (32, 32))
        images, masks = next(iter(train))
        assert images.shape[1:] == (32, 32, 3)
        vimages, vmasks = next(iter(val))
        assert vimages.shape[0] == 2
        timages, _ = next(iter(test))
        assert timages.shape[-1] == 3


class TestBinaryEval:
    def test_evaluate_images_full_metrics(self, lidc_root):
        import jax.numpy as jnp

        from hpfg_tpu.data.lidc import get_lidc_loader
        from hpfg_tpu.evals.volume import SliceForward, evaluate_images

        _, test = get_lidc_loader(lidc_root, 2, (32, 32))

        def oracle(variables, x):
            # phantom: class-1 region is brighter (mean channel > 0.28)
            bright = jnp.mean(x, axis=-1, keepdims=True)
            return jnp.concatenate([0.3 - bright, bright - 0.3], axis=-1) * 60

        fwd = SliceForward(oracle, chunk=4)
        dice, hd95, jac, asd = evaluate_images(fwd, {}, test,
                                               full_metrics=True)
        assert 0.4 < dice <= 1.0
        assert 0 <= jac <= 1.0
