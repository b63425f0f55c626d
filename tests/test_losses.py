"""Loss unit tests against hand-computed values and independent numpy math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpfg_tpu.ops import losses as L


class TestDice:
    def test_perfect_prediction_near_zero(self):
        labels = jnp.array([[[0, 1], [2, 3]]], dtype=jnp.int32)
        probs = jax.nn.one_hot(labels, 4)
        loss = L.dice_loss_multiclass(probs, labels, 4)
        assert float(loss) < 1e-4

    def test_hand_computed_binary(self):
        # 1 pixel predicted 1.0 on the true class, 1 pixel on the wrong class
        probs = jnp.array([[[[1.0, 0.0], [0.0, 1.0]]]])  # [1,1,2,2cls]
        labels = jnp.array([[[0, 0]]], dtype=jnp.int32)
        # class0: I=1, z=1, y=2 -> 1 - (2+s)/(3+s); class1: I=0, z=1, y=0 -> 1 - s/(1+s)
        s = 1e-5
        expected = 0.5 * ((1 - (2 + s) / (3 + s)) + (1 - s / (1 + s)))
        got = float(L.dice_loss_multiclass(probs, labels, 2))
        assert got == pytest.approx(expected, rel=1e-5)

    def test_ignore_255_one_hots_to_zero(self):
        labels = jnp.full((1, 2, 2), 255, dtype=jnp.int32)
        oh = L.one_hot_labels(labels, 4)
        assert float(jnp.sum(oh)) == 0.0

    def test_matches_reference_formula_random(self, np_rng):
        probs = np_rng.random((2, 8, 8, 3)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        labels = np_rng.integers(0, 3, (2, 8, 8)).astype(np.int32)
        # independent numpy reimplementation of reference _dice_loss
        total = 0.0
        for c in range(3):
            t = (labels == c).astype(np.float32)
            p = probs[..., c]
            inter, z, y = (p * t).sum(), (p * p).sum(), (t * t).sum()
            total += 1 - (2 * inter + 1e-5) / (z + y + 1e-5)
        expected = total / 3
        got = float(L.dice_loss_multiclass(jnp.asarray(probs), jnp.asarray(labels), 3))
        assert got == pytest.approx(expected, rel=1e-5)


class TestCrossEntropy:
    def test_uniform_logits(self):
        logits = jnp.zeros((1, 2, 2, 4))
        labels = jnp.zeros((1, 2, 2), jnp.int32)
        assert float(L.cross_entropy_loss(logits, labels)) == pytest.approx(
            np.log(4), rel=1e-6)

    def test_ignore_index_excluded(self):
        logits = jnp.zeros((1, 1, 2, 4))
        labels = jnp.array([[[0, 255]]], dtype=jnp.int32)
        # only the first pixel counts
        assert float(L.cross_entropy_loss(logits, labels)) == pytest.approx(
            np.log(4), rel=1e-6)

    def test_all_ignored_is_finite(self):
        logits = jnp.zeros((1, 1, 1, 4))
        labels = jnp.full((1, 1, 1), 255, jnp.int32)
        assert np.isfinite(float(L.cross_entropy_loss(logits, labels)))


class TestConsistency:
    def test_softmax_mse_is_map(self):
        a = jnp.zeros((2, 4, 4, 3))
        b = jnp.zeros((2, 4, 4, 3))
        out = L.softmax_mse_loss(a, b)
        assert out.shape == (2, 4, 4, 3)
        assert float(jnp.sum(out)) == 0.0

    def test_softmax_mse_value(self):
        a = jnp.array([[[[10.0, -10.0]]]])  # ~ (1, 0)
        b = jnp.array([[[[-10.0, 10.0]]]])  # ~ (0, 1)
        out = L.softmax_mse_loss(a, b)
        assert float(jnp.mean(out)) == pytest.approx(1.0, rel=1e-3)

    def test_kl_matches_torch_mean_semantics(self, np_rng):
        a = np_rng.normal(size=(2, 3, 3, 4)).astype(np.float32)
        b = np_rng.normal(size=(2, 3, 3, 4)).astype(np.float32)
        import torch
        import torch.nn.functional as F

        ta = torch.tensor(a).permute(0, 3, 1, 2)
        tb = torch.tensor(b).permute(0, 3, 1, 2)
        expected = F.kl_div(F.log_softmax(ta, dim=1), F.softmax(tb, dim=1),
                            reduction="mean").item()
        got = float(L.softmax_kl_loss(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(expected, rel=1e-4)


class TestMedSup:
    def test_matches_components(self, np_rng):
        logits = jnp.asarray(np_rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
        labels = jnp.asarray(np_rng.integers(0, 3, (2, 4, 4)).astype(np.int32))
        ce = L.cross_entropy_loss(logits, labels)
        dl = L.dice_loss_multiclass(jax.nn.softmax(logits, -1), labels, 3)
        got = L.med_sup_loss(logits, labels, 3)
        assert float(got) == pytest.approx(0.5 * float(ce) + 0.5 * float(dl),
                                           rel=1e-6)


class TestDense:
    def test_matches_torch_reference_math(self, np_rng):
        """Independent torch reimplementation of the NT-Xent formula
        (reference utils/loss/dense_loss.py:17-40) as the oracle."""
        import torch
        import torch.nn.functional as F

        b, d, s = 4, 8, 5
        g1 = np_rng.normal(size=(b, d)).astype(np.float32)
        g2 = np_rng.normal(size=(b, d)).astype(np.float32)
        d1 = np_rng.normal(size=(b, s, d)).astype(np.float32)
        d2 = np_rng.normal(size=(b, s, d)).astype(np.float32)

        def torch_ntxent(x1, x2, temp=0.7):
            x1 = F.normalize(x1, dim=1).flatten(1)
            x2 = F.normalize(x2, dim=1).flatten(1)
            out = torch.cat([x1, x2], 0)
            sim = torch.exp(out @ out.t() / temp)
            mask = (torch.ones_like(sim) - torch.eye(2 * b)).bool()
            sim = sim.masked_select(mask).view(2 * b, -1)
            pos = torch.exp((x1 * x2).sum(-1) / temp)
            pos = torch.cat([pos, pos], 0)
            return (-torch.log(pos / sim.sum(-1))).mean().item()

        # torch keeps dense as [B, D, S]; ours is [B, S, D]
        expected = 0.5 * (
            torch_ntxent(torch.tensor(g1), torch.tensor(g2))
            + torch_ntxent(torch.tensor(d1).transpose(1, 2),
                           torch.tensor(d2).transpose(1, 2)))
        got = float(L.dense_contrastive_loss(
            (jnp.asarray(g1), jnp.asarray(d1)),
            (jnp.asarray(g2), jnp.asarray(d2))))
        assert got == pytest.approx(expected, rel=1e-3)

    def test_gradient_flows_to_student_only(self):
        g = jnp.ones((2, 4))
        d = jnp.ones((2, 3, 4))

        def f(sg):
            return L.dense_contrastive_loss((sg, d), (g * 2.0, d * 2.0))

        grad = jax.grad(f)(g)
        assert np.all(np.isfinite(np.asarray(grad)))


class TestBinaryLosses:
    def test_dice_binary_perfect(self):
        t = jnp.ones((2, 4, 4, 1))
        assert float(L.dice_loss_binary(t, t)) < 1e-4

    def test_bce_dice_finite(self, np_rng):
        logits = jnp.asarray(np_rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
        targets = jnp.asarray((np_rng.random((2, 4, 4, 1)) > 0.5).astype(np.float32))
        assert np.isfinite(float(L.bce_dice_loss(logits, targets)))
        assert np.isfinite(float(L.bce_dice_l1_loss(logits, targets)))


class TestEntropyFocal:
    def test_entropy_uniform_is_one(self):
        p = jnp.full((1, 2, 2, 4), 0.25)
        assert float(L.entropy_loss(p, 4)) == pytest.approx(1.0, rel=1e-4)

    def test_focal_reduces_easy_examples(self, np_rng):
        logits = jnp.asarray(np_rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
        labels = jnp.asarray(np_rng.integers(0, 3, (1, 4, 4)).astype(np.int32))
        f = float(L.focal_loss(logits, labels))
        ce = float(L.cross_entropy_loss(logits, labels))
        assert 0 < f < ce
