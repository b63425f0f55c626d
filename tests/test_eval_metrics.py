"""Metric and volume-evaluation tests."""

import numpy as np
import pytest

from hpfg_tpu.evals.metrics import (
    AverageMeter,
    MedicalMetric,
    SegMetrics,
    binary_asd,
    binary_dice,
    binary_hd95,
    binary_jaccard,
    calculate_metric_percase,
    calculate_metric_percase_full,
)


class TestBinaryMetrics:
    def test_dice_identical(self):
        mask = np.zeros((10, 10), bool)
        mask[2:6, 3:8] = True
        assert binary_dice(mask, mask) == pytest.approx(1.0)
        assert binary_jaccard(mask, mask) == pytest.approx(1.0)

    def test_dice_hand_value(self):
        a = np.zeros((4, 4), bool)
        b = np.zeros((4, 4), bool)
        a[0, :2] = True  # |A| = 2
        b[0, 1:3] = True  # |B| = 2, intersection 1
        assert binary_dice(a, b) == pytest.approx(0.5)
        assert binary_jaccard(a, b) == pytest.approx(1 / 3)

    def test_dice_empty_both(self):
        z = np.zeros((4, 4), bool)
        assert binary_dice(z, z) == 0.0

    def test_hd95_identical_is_zero(self):
        mask = np.zeros((16, 16), bool)
        mask[4:10, 4:10] = True
        assert binary_hd95(mask, mask) == 0.0

    def test_hd95_shifted_square(self):
        a = np.zeros((32, 32), bool)
        b = np.zeros((32, 32), bool)
        a[8:16, 8:16] = True
        b[11:19, 8:16] = True  # shifted 3 rows
        hd = binary_hd95(a, b)
        assert 2.0 <= hd <= 4.0

    def test_asd_positive(self):
        a = np.zeros((16, 16), bool)
        b = np.zeros((16, 16), bool)
        a[4:8, 4:8] = True
        b[6:10, 4:8] = True
        assert binary_asd(a, b) > 0

    def test_percase_empty_pred_rule(self):
        """reference val.py:376-387: empty prediction → (0, 0)."""
        gt = np.zeros((8, 8))
        gt[2:4, 2:4] = 1
        assert calculate_metric_percase(np.zeros((8, 8)), gt) == (0.0, 0.0)

    def test_percase_pred_only_middle_branch(self):
        """reference val.py:376-387 middle branch: pred>0 ∧ gt==0 → (1, 0)
        (reachable: an early checkpoint hallucinating a class absent from a
        test volume)."""
        pred = np.zeros((8, 8))
        pred[1:3, 1:3] = 1
        assert calculate_metric_percase(pred, np.zeros((8, 8))) == (1.0, 0.0)

    def test_dice_from_sums_middle_branch(self):
        """On-device confusion-sum path agrees with the 3-branch rule."""
        from hpfg_tpu.evals.volume import dice_from_sums

        sums = np.array([
            [4, 4, 4],   # perfect overlap → 1
            [0, 5, 0],   # pred only → 1 (middle branch)
            [0, 0, 5],   # gt only → 0
            [0, 0, 0],   # both empty → 0
        ], dtype=np.int64)
        np.testing.assert_allclose(dice_from_sums(sums), [1.0, 1.0, 0.0, 0.0])

    def test_percase_full_pred_only(self):
        pred = np.zeros((8, 8))
        pred[1:3, 1:3] = 1
        out = calculate_metric_percase_full(pred, np.zeros((8, 8)))
        assert out == (1.0, 0.0, 1.0, 0.0)


class TestAccumulators:
    def test_medical_metric(self):
        m = MedicalMetric(num_classes=3)
        pred = np.zeros((2, 8, 8), np.int32)
        pred[:, 2:5, 2:5] = 1
        pred[:, 5:7, 5:7] = 2
        m.update(pred, pred)
        out = m.compute()
        assert out["dice"] == pytest.approx(1.0)
        assert out["hd95"] == pytest.approx(0.0)

    def test_seg_metrics_perfect(self):
        s = SegMetrics(num_classes=3)
        labels = np.random.default_rng(0).integers(0, 3, (2, 8, 8))
        s.update(labels, labels)
        out = s.compute()
        assert out["overall_acc"] == pytest.approx(1.0)
        assert out["mean_iou"] == pytest.approx(1.0)

    def test_average_meter(self):
        a = AverageMeter()
        a.update(1.0, n=2)
        a.update(4.0, n=1)
        assert a.avg == pytest.approx(2.0)


class TestVolumeEval:
    def test_zoom_index_map_matches_scipy(self):
        from scipy.ndimage import zoom as scipy_zoom

        from hpfg_tpu.evals.volume import _zoom_index_map

        arr = np.arange(17 * 13, dtype=np.float32).reshape(17, 13)
        expected = scipy_zoom(arr, (8 / 17, 24 / 13), order=0)
        ys = _zoom_index_map(17, 8)
        xs = _zoom_index_map(13, 24)
        got = arr[ys[:, None], xs[None, :]]
        np.testing.assert_array_equal(got, expected)

    def test_evaluate_volumes_on_perfect_model(self, synthetic_acdc):
        """A 'model' that predicts class from the (noise-free) phantom rings
        should score reasonable dice through the full eval path."""
        import jax.numpy as jnp

        from hpfg_tpu.data.acdc import ACDCDataset
        from hpfg_tpu.data.loader import VolumeLoader
        from hpfg_tpu.evals.volume import SliceForward, evaluate_volumes

        def oracle_apply(variables, x):
            # map the synthetic intensity bands back to classes:
            # image = clip(0.2 + 0.15*mask + noise) → thresholds between bands
            img = x[..., 0]
            logits = jnp.stack([
                -jnp.abs(img - 0.2), -jnp.abs(img - 0.35),
                -jnp.abs(img - 0.5), -jnp.abs(img - 0.65)], axis=-1)
            return logits * 50

        fwd = SliceForward(oracle_apply, chunk=4)
        vols = VolumeLoader(ACDCDataset(synthetic_acdc, "test", cache=False))
        dice, hd95, per_class, first = evaluate_volumes(
            fwd, {}, vols, num_classes=4, patch_size=(32, 32))
        assert 0.3 < dice <= 1.0  # noisy phantom, far above chance
        assert np.isfinite(hd95)
        assert per_class.shape == (3, 2)

    def test_evaluate_volumes_multi_matches_single(self, synthetic_acdc):
        """evaluate_volumes_multi (shared uploads, on-device dice accum,
        gt-EDT cache — EVAL_COST_r05) must reproduce per-model
        evaluate_volumes results for models that differ."""
        import jax.numpy as jnp

        from hpfg_tpu.data.acdc import ACDCDataset
        from hpfg_tpu.data.loader import VolumeLoader
        from hpfg_tpu.evals.volume import (SliceForward, evaluate_volumes,
                                           evaluate_volumes_multi)

        def apply_fn(variables, x):
            img = x[..., 0] * variables["gain"]
            logits = jnp.stack([
                -jnp.abs(img - 0.2), -jnp.abs(img - 0.35),
                -jnp.abs(img - 0.5), -jnp.abs(img - 0.65)], axis=-1)
            return logits * 50

        fwd = SliceForward(apply_fn, chunk=4)
        named = {"good": {"gain": jnp.float32(1.0)},
                 "skewed": {"gain": jnp.float32(1.3)}}

        def vols():
            return VolumeLoader(
                ACDCDataset(synthetic_acdc, "test", cache=False))

        multi = evaluate_volumes_multi(fwd, named, vols(), num_classes=4,
                                       patch_size=(32, 32))
        for name, variables in named.items():
            dice, hd95, per_class, first = evaluate_volumes(
                fwd, variables, vols(), num_classes=4, patch_size=(32, 32))
            m_dice, m_hd95, m_pc, m_first = multi[name]
            assert abs(m_dice - dice) < 1e-5, (name, m_dice, dice)
            assert abs(m_hd95 - hd95) < 1e-9, (name, m_hd95, hd95)
            np.testing.assert_allclose(m_pc, per_class, atol=1e-5)
            np.testing.assert_array_equal(m_first[2], first[2])
        # the two models genuinely differ (the test discriminates)
        assert multi["good"][0] != multi["skewed"][0]

    def test_hd95_gt_cache_matches_uncached(self):
        from hpfg_tpu.evals.metrics import binary_hd95, gt_surface_cache

        rng = np.random.default_rng(7)
        gt = np.zeros((4, 24, 24), bool)
        gt[:, 6:14, 6:14] = True
        pred = np.zeros_like(gt)
        pred[:, 8:17, 7:15] = True
        cache = gt_surface_cache(gt)
        assert binary_hd95(pred, gt, gt_cache=cache) == binary_hd95(pred, gt)
        pred2 = rng.random(gt.shape) > 0.6
        assert binary_hd95(pred2, gt, gt_cache=cache) == binary_hd95(pred2, gt)
