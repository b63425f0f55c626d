"""Data layer tests: loaders, transforms, on-device augmentation, cutmix."""

import numpy as np
import pytest

from hpfg_tpu.config import Config
from hpfg_tpu.data import build_loader
from hpfg_tpu.data.acdc import ACDCDataset, get_ssl_acdc_loader, label_to_img
from hpfg_tpu.data.loader import (
    BatchLoader,
    TwoStreamBatchLoader,
    patients_to_slices,
    random_split,
)


class TestACDC:
    def test_layout_and_shapes(self, synthetic_acdc):
        train = ACDCDataset(synthetic_acdc, "train")
        assert len(train) == 24
        image, mask = train.load(0)
        assert image.shape == (64, 56) and mask.shape == (64, 56)
        test = ACDCDataset(synthetic_acdc, "test", cache=False)
        vol_img, vol_msk = test.load(0)
        assert vol_img.shape == (4, 64, 56)

    def test_palette_render(self):
        label = np.array([[0, 1], [2, 255]])
        img = label_to_img(label)
        assert img.shape == (2, 2, 3)
        assert tuple(img[0, 1]) == (0, 0, 255)
        assert tuple(img[1, 1]) == (0, 0, 0)  # 255 → background

    def test_ssl_split_sizes(self, synthetic_acdc):
        label_loader, unlabel_loader, test_loader = get_ssl_acdc_loader(
            synthetic_acdc, 4, 8, (32, 32), label_num=0.25)
        assert len(label_loader.source) == 6
        assert len(unlabel_loader.source) == 18
        images, masks = next(iter(label_loader))
        assert images.shape == (4, 32, 32, 1)
        assert masks.shape == (4, 32, 32)
        assert masks.dtype == np.int32

    def test_device_augment_loader_is_deterministic_resize(self, synthetic_acdc):
        # two fresh loaders, same seed: no host-side randomness remains
        l1, _, _ = get_ssl_acdc_loader(synthetic_acdc, 4, 8, (32, 32), 0.5,
                                       device_augment=True)
        l2, _, _ = get_ssl_acdc_loader(synthetic_acdc, 4, 8, (32, 32), 0.5,
                                       device_augment=True)
        np.testing.assert_array_equal(next(iter(l1))[0], next(iter(l2))[0])


class TestLoaders:
    def test_drop_last_and_cycle(self, synthetic_acdc):
        src = ACDCDataset(synthetic_acdc, "train")
        loader = BatchLoader(src, batch_size=10, shuffle=True, drop_last=True)
        assert len(loader) == 2
        it = loader.cycle()
        for _ in range(5):
            images, masks = next(it)
            assert images.shape[0] == 10

    def test_random_split_disjoint(self, synthetic_acdc):
        src = ACDCDataset(synthetic_acdc, "train")
        a, b = random_split(src, 6, seed=3)
        assert len(a) == 6 and len(b) == 18
        assert set(a.indices).isdisjoint(b.indices)

    def test_two_stream_loader(self, synthetic_acdc):
        src = ACDCDataset(synthetic_acdc, "train")
        tsl = TwoStreamBatchLoader(src, list(range(6)), list(range(6, 24)),
                                   batch_size=8, secondary_batch_size=6)
        batches = list(tsl)
        assert len(batches) == 3
        images, masks, label_mask = batches[0]
        assert images.shape[0] == 8
        assert label_mask[:2].all() and not label_mask[2:].any()

    def test_patients_to_slices(self):
        assert patients_to_slices("ACDC", 7) == 136
        assert patients_to_slices("Prostate", 8) == 120


class TestBuilderDispatch:
    def test_acdc_ssl(self, synthetic_acdc):
        cfg = Config(datasets="acdc", data_path=synthetic_acdc, batch_size=4,
                     unlabel_batch_size=8, train_crop_size=[32, 32],
                     label_num=0.4, seed=0)
        loaders = build_loader(cfg)
        assert len(loaders) == 3

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            build_loader(Config(datasets="nope", data_path="/tmp",
                                batch_size=1, train_crop_size=[8, 8]))


class TestDeviceAugment:
    def test_batched_random_generator_contract(self):
        import jax
        import jax.numpy as jnp

        from hpfg_tpu.ops.augment import batched_random_generator

        rng = jax.random.PRNGKey(0)
        images = jnp.asarray(
            np.random.default_rng(0).random((8, 32, 32, 1)).astype(np.float32))
        masks = jnp.asarray(
            np.random.default_rng(1).integers(0, 4, (8, 32, 32)).astype(np.int32))
        out_img, out_msk = batched_random_generator(rng, images, masks)
        assert out_img.shape == images.shape
        assert out_msk.shape == masks.shape
        # masks stay integer-valued in range
        vals = np.unique(np.asarray(out_msk))
        assert set(vals).issubset(set(range(4)))
        # deterministic in the key
        again = batched_random_generator(rng, images, masks)
        np.testing.assert_array_equal(np.asarray(out_img), np.asarray(again[0]))

    def test_geometry_shared_between_image_and_mask(self):
        import jax
        import jax.numpy as jnp

        from hpfg_tpu.ops.augment import batched_random_generator

        # encode the mask into the image so any shared transform keeps them
        # equal
        masks = jnp.asarray(
            np.random.default_rng(2).integers(0, 4, (6, 16, 16)).astype(np.int32))
        images = masks[..., None].astype(jnp.float32)
        out_img, out_msk = batched_random_generator(
            jax.random.PRNGKey(7), images, masks)
        np.testing.assert_array_equal(
            np.asarray(out_img[..., 0]).astype(np.int32), np.asarray(out_msk))

    def test_rot_flip_decomposition_equals_switch_form(self):
        """_rot_flip_batch (one batch transpose + flag selects) is bitwise
        equal to the vmapped rot90-switch + flip form for every (k, axis)
        and for mixed per-sample draws."""
        import jax
        import jax.numpy as jnp

        from hpfg_tpu.ops.augment import (_flip_axis, _rot90_k,
                                          _rot_flip_batch)

        g = np.random.default_rng(0)
        imgs = jnp.asarray(g.random((6, 10, 10, 2)), jnp.float32)
        msks = jnp.asarray(g.integers(0, 4, (6, 10, 10)), jnp.int32)

        def oracle(ks, axes):
            oi = jax.vmap(lambda im, k, a: _flip_axis(_rot90_k(im, k), a))(
                imgs, ks, axes)
            om = jax.vmap(lambda m, k, a: _flip_axis(_rot90_k(m, k), a))(
                msks, ks, axes)
            return oi, om

        cases = [(jnp.full((6,), k), jnp.full((6,), a))
                 for k in range(4) for a in range(2)]
        cases.append((jnp.asarray(g.integers(0, 4, (6,))),
                      jnp.asarray(g.integers(0, 2, (6,)))))
        for ks, axes in cases:
            ni, nm = _rot_flip_batch(imgs, msks, ks, axes)
            oi, om = oracle(ks, axes)
            np.testing.assert_array_equal(np.asarray(ni), np.asarray(oi))
            np.testing.assert_array_equal(np.asarray(nm), np.asarray(om))

    def test_rotation_matches_scipy_semantics(self):
        from hpfg_tpu.ops.augment import _rotate_nearest
        import jax.numpy as jnp
        from scipy import ndimage

        img = np.zeros((15, 15), np.float32)
        img[4:8, 6:10] = 1.0
        for angle in (-17, 9, 19):
            want = ndimage.rotate(img, angle, order=0, reshape=False)
            got = np.asarray(_rotate_nearest(jnp.asarray(img),
                                             jnp.asarray(angle)))
            # nearest-neighbor rounding can differ on boundary pixels;
            # demand >=93% agreement
            agree = (got == want).mean()
            assert agree > 0.93, (angle, agree)
