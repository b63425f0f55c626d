"""Auxiliary contrastive/KD losses vs independent torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpfg_tpu.ops import contrastive as C


@pytest.fixture(scope="module")
def torch():
    import torch

    return torch


class TestSimCLR:
    def test_matches_torch_formula(self, torch, np_rng):
        import torch.nn.functional as F

        b, d = 5, 16
        a = np_rng.normal(size=(b, d)).astype(np.float32)
        bb = np_rng.normal(size=(b, d)).astype(np.float32)

        t1, t2 = torch.tensor(a), torch.tensor(bb)
        o1, o2 = F.normalize(t1, dim=1), F.normalize(t2, dim=1)
        out = torch.cat([o1, o2], 0)
        sim = torch.exp(out @ out.t() / 0.5)
        mask = (torch.ones_like(sim) - torch.eye(2 * b)).bool()
        sim = sim.masked_select(mask).view(2 * b, -1)
        pos = torch.exp((o1 * o2).sum(-1) / 0.5)
        pos = torch.cat([pos, pos], 0)
        expected = (-torch.log(pos / sim.sum(-1))).mean().item()

        got = float(C.simclr_loss(jnp.asarray(a), jnp.asarray(bb)))
        assert got == pytest.approx(expected, rel=1e-4)


class TestNTXentDistributed:
    def test_single_process_matches_ce_form(self, torch, np_rng):
        """world=1: must equal the reference NT_Xent CE formulation
        (utils/loss/NT_Xent.py:44-69)."""
        b, d = 4, 8
        zi = np_rng.normal(size=(b, d)).astype(np.float32)
        zj = np_rng.normal(size=(b, d)).astype(np.float32)

        import torch.nn.functional as F

        ti, tj = torch.tensor(zi), torch.tensor(zj)
        n = 2 * b
        z = torch.cat([ti, tj], 0)
        sim = F.cosine_similarity(z.unsqueeze(1), z.unsqueeze(0), dim=2) / 0.5
        pos = torch.cat([torch.diag(sim, b), torch.diag(sim, -b)]).reshape(n, 1)
        mask = torch.ones((n, n), dtype=bool).fill_diagonal_(0)
        for i in range(b):
            mask[i, b + i] = 0
            mask[b + i, i] = 0
        neg = sim[mask].reshape(n, -1)
        logits = torch.cat([pos, neg], dim=1)
        labels = torch.zeros(n, dtype=torch.long)
        expected = (torch.nn.CrossEntropyLoss(reduction="sum")(logits, labels)
                    / n).item()

        got = float(C.nt_xent_distributed(jnp.asarray(zi), jnp.asarray(zj)))
        assert got == pytest.approx(expected, rel=1e-4)

    def test_all_gather_inside_shard_map(self):
        """The distributed path gathers across the mesh axis — the TPU-native
        GatherLayer (reference utils/loss/NT_Xent.py:5-21)."""
        import jax
        from jax.sharding import Mesh, PartitionSpec as P

        devs = np.array(jax.devices()[:4])
        mesh = Mesh(devs, ("data",))
        b, d = 8, 4
        rng = np.random.default_rng(0)
        zi = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        zj = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))

        def local_loss(zi_l, zj_l):
            return C.nt_xent_distributed(zi_l, zj_l, axis_name="data")

        sharded = jax.shard_map(local_loss, mesh=mesh,
                                in_specs=(P("data"), P("data")),
                                out_specs=P(), check_vma=False)
        got = float(sharded(zi, zj))
        want = float(C.nt_xent_distributed(zi, zj))
        assert got == pytest.approx(want, rel=1e-4)


class TestOtherLosses:
    def test_simsiam_perfect_alignment(self):
        z = jnp.ones((4, 8))
        assert float(C.simsiam_loss(z, z, z, z)) == pytest.approx(-1.0)

    def test_info_nce_runs(self, np_rng):
        f = jnp.asarray(np_rng.normal(size=(8, 16)).astype(np.float32))
        out = float(C.info_nce_loss(f, batch_size=4))
        assert np.isfinite(out) and out > 0

    def test_structural_kd_zero_for_identical(self, np_rng):
        f = jnp.asarray(np_rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        assert float(C.structural_kd_loss(f, f)) == pytest.approx(0.0, abs=1e-6)

    def test_cross_image_pair_matches_torch(self, torch, np_rng):
        import torch.nn.functional as F

        b, h, w, c = 2, 4, 4, 3
        fs = np_rng.normal(size=(b, h, w, c)).astype(np.float32)
        ft = np_rng.normal(size=(b, h, w, c)).astype(np.float32)

        ts = F.normalize(torch.tensor(fs).permute(0, 3, 1, 2), p=2, dim=1)
        tt = F.normalize(torch.tensor(ft).permute(0, 3, 1, 2), p=2, dim=1)
        total = 0.0
        for i in range(b):
            for j in range(b):
                s0 = ts[i].reshape(c, -1).t() @ ts[j].reshape(c, -1)
                t0 = tt[i].reshape(c, -1).t() @ tt[j].reshape(c, -1)
                total += F.kl_div(F.log_softmax(s0 / 0.7, dim=1),
                                  F.softmax(t0 / 0.7, dim=1),
                                  reduction="batchmean").item()
        expected = total / (b * b)
        got = float(C.cross_image_pair_kd(jnp.asarray(fs), jnp.asarray(ft),
                                          pooling=None))
        assert got == pytest.approx(expected, rel=1e-3)

    def test_entropy_and_symmetric_kl(self, np_rng):
        p = jnp.asarray(np_rng.random((2, 4, 4, 3)).astype(np.float32))
        p = p / p.sum(-1, keepdims=True)
        assert float(C.entropy_minimization(p)) > 0
        logits = jnp.asarray(np_rng.normal(size=(2, 3)).astype(np.float32))
        assert float(C.compute_kl_loss(logits, logits)) == pytest.approx(
            0.0, abs=1e-6)


class TestPixelClassContrastive:
    def test_zero_when_not_enough_pixels(self, np_rng):
        import jax.numpy as jnp

        b, h, w, c = 1, 8, 8, 4
        out = C.pixel_class_contrastive_loss(
            jnp.asarray(np_rng.normal(size=(b, h, w, c)).astype(np.float32)),
            jnp.asarray(np_rng.normal(size=(b, h, w, c)).astype(np.float32)),
            jnp.zeros((b, h, w), jnp.int32),
            jnp.asarray(np_rng.normal(size=(b, h, w, 4)).astype(np.float32)),
            jnp.asarray(np_rng.normal(size=(b, h, w, 4)).astype(np.float32)),
            num_classes=4, length=1024)
        assert float(out) == 0.0

    def test_positive_when_enough_pixels(self, np_rng):
        import jax.numpy as jnp

        # all pixels of class 1, perfectly predicted, small lengths
        b, h, w, c = 1, 96, 96, 8
        labels = np.ones((b, h, w), np.int32)
        labels[:, :, :48] = 2  # half class 2 for negatives
        logits = np.zeros((b, h, w, 4), np.float32)
        logits[..., 1] = (labels == 1) * 10.0
        logits[..., 2] = (labels == 2) * 10.0
        out = C.pixel_class_contrastive_loss(
            jnp.asarray(np_rng.normal(size=(b, h, w, c)).astype(np.float32)),
            jnp.asarray(np_rng.normal(size=(b, h, w, c)).astype(np.float32)),
            jnp.asarray(labels), jnp.asarray(logits), jnp.asarray(logits),
            num_classes=4, length=512)
        assert np.isfinite(float(out)) and float(out) > 0


class TestFreeze:
    def test_freeze_subtrees_zero_updates(self):
        import jax.numpy as jnp
        import optax

        from hpfg_tpu.ops.freeze import freeze_subtrees

        params = {"encoder": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
        tx = freeze_subtrees(optax.sgd(0.1), params, ["encoder"])
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert float(np.abs(np.asarray(updates["encoder"]["w"])).sum()) == 0.0
        assert float(np.abs(np.asarray(updates["head"]["w"])).sum()) > 0.0

    def test_unfreeze_after_threshold(self):
        import jax.numpy as jnp
        import optax

        from hpfg_tpu.ops.freeze import unfreeze_after

        params = {"encoder": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
        tx = unfreeze_after(optax.sgd(0.1), params, ["encoder"],
                            unfreeze_itrs=2)
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        for step in range(4):
            updates, state = tx.update(grads, state, params)
            frozen = float(np.abs(np.asarray(updates["encoder"]["w"])).sum())
            if step < 2:
                assert frozen == 0.0, step
            else:
                assert frozen > 0.0, step
