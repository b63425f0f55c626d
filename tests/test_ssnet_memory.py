"""SS-Net prototype memory bank semantics (reference utils/loss/ssnet_loss.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hpfg_tpu.ops.ssnet_memory import (
    contrastive_class_to_class_learned_memory,
    update_memory,
)


def _bank(c=3, k=4, f=8):
    return jnp.zeros((c, k, f)), jnp.zeros((c, k), bool)


class TestUpdateMemory:
    def test_fills_slots_and_validity(self):
        memory, valid = _bank()
        n, f = 10, 8
        feats = jnp.arange(n * f, dtype=jnp.float32).reshape(n, f)
        labels = jnp.array([0, 1, 1, 1, 2, 2, 0, 1, 1, 1])
        candidate = jnp.ones(n, bool)
        scores = jnp.zeros((3, n))
        mem, val = update_memory(feats, labels, candidate, scores, memory,
                                 valid, 3)
        # class 1 has 6 candidates > k=4 → exactly 4 valid slots
        assert int(val[1].sum()) == 4
        # class 2 has 2 candidates → 2 valid slots
        assert int(val[2].sum()) == 2

    def test_empty_class_retains_old_bank(self):
        memory = jnp.ones((3, 4, 8)) * 7.0
        valid = jnp.ones((3, 4), bool)
        feats = jnp.ones((5, 8))
        labels = jnp.zeros(5, jnp.int32)  # only class 0 present
        candidate = jnp.ones(5, bool)
        scores = jnp.zeros((3, 5))
        mem, val = update_memory(feats, labels, candidate, scores, memory,
                                 valid, 3)
        np.testing.assert_allclose(np.asarray(mem[1]), 7.0)  # untouched
        assert bool(val[1].all())
        np.testing.assert_allclose(np.asarray(mem[0][0]), 1.0)  # refreshed

    def test_lowest_scores_kept(self):
        """The reference sorts selector scores ascending and keeps the head
        (utils/loss/ssnet_loss.py:33-43)."""
        memory, valid = _bank(c=1, k=2, f=2)
        feats = jnp.array([[1., 1], [2., 2], [3., 3], [4., 4]])
        labels = jnp.zeros(4, jnp.int32)
        candidate = jnp.ones(4, bool)
        scores = jnp.array([[0.9, 0.1, 0.5, 0.2]])  # lowest: rows 1 and 3
        mem, val = update_memory(feats, labels, candidate, scores, memory,
                                 valid, 1)
        kept = set(map(tuple, np.asarray(mem[0])))
        assert kept == {(2.0, 2.0), (4.0, 4.0)}


class TestContrastiveMemoryLoss:
    def test_gated_off_without_memory(self):
        memory, valid = _bank()
        feats = jnp.ones((6, 8))
        labels = jnp.array([0, 0, 1, 1, 2, 2])
        out = contrastive_class_to_class_learned_memory(
            feats, labels, 3, memory, valid,
            lambda c, f: jnp.ones((f.shape[0], 1)),
            lambda c, f: jnp.ones((f.shape[0], 1)))
        assert float(out) == 0.0

    def test_positive_with_populated_bank(self, np_rng):
        c, k, f = 3, 4, 8
        memory = jnp.asarray(np_rng.normal(size=(c, k, f)).astype(np.float32))
        valid = jnp.ones((c, k), bool)
        feats = jnp.asarray(np_rng.normal(size=(12, f)).astype(np.float32))
        labels = jnp.asarray(np_rng.integers(0, 3, 12).astype(np.int32))
        out = contrastive_class_to_class_learned_memory(
            feats, labels, 3, memory, valid,
            lambda c_, x: jnp.zeros((x.shape[0], 1)),
            lambda c_, x: jnp.zeros((x.shape[0], 1)))
        assert np.isfinite(float(out))
        # cosine distances ∈ [0, 2]; non-degenerate inputs → strictly > 0
        assert float(out) > 0.0
