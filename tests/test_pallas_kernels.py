"""Pallas TPU kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from hpfg_tpu.ops.pallas.window_attention import (
    window_attention,
    window_attention_reference,
)


class TestWindowAttention:
    def _data(self, bn=6, l=9, heads=2, head_dim=4, seed=0):
        rng = np.random.default_rng(seed)
        c = heads * head_dim
        q = rng.normal(size=(bn, l, c)).astype(np.float32)
        k = rng.normal(size=(bn, l, c)).astype(np.float32)
        v = rng.normal(size=(bn, l, c)).astype(np.float32)
        bias = rng.normal(size=(heads, l, l)).astype(np.float32)
        mask = np.where(rng.random((bn, l, l)) > 0.8, -100.0, 0.0
                        ).astype(np.float32)
        return map(jnp.asarray, (q, k, v, bias, mask))

    def test_matches_reference_no_mask(self):
        q, k, v, bias, _ = self._data()
        zero_mask = jnp.zeros((q.shape[0], q.shape[1], q.shape[1]))
        got = window_attention(q, k, v, bias, zero_mask, heads=2,
                               interpret=True)
        want = window_attention_reference(q, k, v, bias, zero_mask, heads=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_matches_reference_with_mask(self):
        q, k, v, bias, mask = self._data(seed=1)
        got = window_attention(q, k, v, bias, mask, heads=2, interpret=True)
        want = window_attention_reference(q, k, v, bias, mask, heads=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_padding_path(self):
        """Bn not a multiple of the window block still returns exact rows."""
        q, k, v, bias, mask = self._data(bn=19, seed=2)
        got = window_attention(q, k, v, bias, mask, heads=2, interpret=True)
        want = window_attention_reference(q, k, v, bias, mask, heads=2)
        assert got.shape == want.shape == (19, 9, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_grad_matches_reference(self):
        """Custom-VJP backward (recompute-softmax Pallas kernel) against
        jax.grad of the jnp oracle — all four differentiable inputs."""
        q, k, v, bias, mask = self._data(seed=3)

        def loss_pl(q, k, v, bias):
            o = window_attention(q, k, v, bias, mask, heads=2,
                                 interpret=True)
            return jnp.sum(jnp.sin(o))

        def loss_ref(q, k, v, bias):
            o = window_attention_reference(q, k, v, bias, mask, heads=2)
            return jnp.sum(jnp.sin(o))

        got = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(q, k, v, bias)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for g, w, name in zip(got, want, ("dq", "dk", "dv", "dbias")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=5e-4, atol=5e-5, err_msg=name)

    def test_grad_padding_path(self):
        """Window-axis padding must not pollute dbias (padded windows have
        zero do, hence zero ds)."""
        q, k, v, bias, mask = self._data(bn=19, seed=4)

        def loss(fn):
            def f(q, k, v, bias):
                kw = dict(interpret=True) if fn is window_attention else {}
                return jnp.sum(fn(q, k, v, bias, mask, heads=2, **kw) ** 2)
            return f

        got = jax.grad(loss(window_attention), argnums=(0, 3))(q, k, v, bias)
        want = jax.grad(loss(window_attention_reference),
                        argnums=(0, 3))(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   rtol=5e-4, atol=5e-5)

    def test_swin_attention_module_grad_pallas(self):
        """Grad through the WindowAttention module with use_pallas forced on
        (the exact path that crashed at trace time in round 2 — s4cvnet /
        supervised-swinunet configs train model2=swinunet on TPU)."""
        from hpfg_tpu.models.swinunet import WindowAttention
        import importlib

        x = jnp.asarray(np.random.default_rng(5).normal(
            size=(2, 6, 6, 8)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0)}
        mod_ref = WindowAttention(dim=8, window_size=3, num_heads=2,
                                  shift=True, use_pallas=False)
        variables = mod_ref.init(rngs, x, train=True)

        wa = importlib.import_module("hpfg_tpu.ops.pallas.window_attention")
        orig = wa.window_attention
        wa.window_attention = lambda *a, **k: orig(*a, interpret=True, **k)
        try:
            mod_pl = WindowAttention(dim=8, window_size=3, num_heads=2,
                                     shift=True, use_pallas=True)

            def loss(fn):
                return lambda p: jnp.sum(
                    fn.apply({"params": p}, x, train=True) ** 2)

            g_pl = jax.grad(loss(mod_pl))(variables["params"])
        finally:
            wa.window_attention = orig
        g_ref = jax.grad(loss(mod_ref))(variables["params"])
        flat_pl = jax.tree_util.tree_leaves_with_path(g_pl)
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(g_ref))
        for path, leaf in flat_pl:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_ref[path]),
                rtol=5e-4, atol=5e-5, err_msg=str(path))

    def _dropout_oracle(self, q, k, v, bias, mask, drop_mask, heads):
        """jnp oracle of attention with a pre-scaled dropout mask applied to
        the softmax probabilities (reference swinunet.py:171,237)."""
        bn, l, c = q.shape
        head_dim = c // heads
        scale = head_dim ** -0.5
        qh = q.reshape(bn, l, heads, head_dim).transpose(0, 2, 1, 3)
        kh = k.reshape(bn, l, heads, head_dim).transpose(0, 2, 1, 3)
        vh = v.reshape(bn, l, heads, head_dim).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhld,bhmd->bhlm", qh * scale, kh)
        s = s + bias[None] + mask[:, None]
        p = jax.nn.softmax(s, axis=-1) * drop_mask
        o = jnp.einsum("bhlm,bhmd->bhld", p, vh)
        return o.transpose(0, 2, 1, 3).reshape(bn, l, c)

    def test_in_kernel_attn_dropout_matches_oracle(self):
        from hpfg_tpu.ops.pallas.window_attention import (
            attn_drop_mask_reference)

        q, k, v, bias, mask = self._data(bn=6, seed=6)
        keep, seed = 0.9, 1234.0
        dm = attn_drop_mask_reference(int(seed), 6, 2, 9, keep)
        got = window_attention(q, k, v, bias, mask, heads=2, interpret=True,
                               drop=keep, seed=jnp.float32(seed))
        want = self._dropout_oracle(q, k, v, bias, mask, dm, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-5)
        # the hash mask actually drops ~10% (pre-scaled 1/keep entries)
        frac = float((np.asarray(dm) == 0).mean())
        assert 0.03 < frac < 0.25

    def test_in_kernel_attn_dropout_multiblock(self):
        # bn=19 > WINDOW_BLOCK=16 -> two grid programs, so the pid>0 arm of
        # the hash row ids (pid*blk + win) is checked against the oracle's
        # block decomposition; the single-block tests (bn=6) never reach it
        # and the production path (hundreds of windows at 224²) always does
        from hpfg_tpu.ops.pallas.window_attention import (
            WINDOW_BLOCK, attn_drop_mask_reference)

        bn = WINDOW_BLOCK + 3
        q, k, v, bias, mask = self._data(bn=bn, seed=11)
        keep, seed = 0.9, 4321.0
        dm = attn_drop_mask_reference(int(seed), bn, 2, 9, keep)
        got = window_attention(q, k, v, bias, mask, heads=2, interpret=True,
                               drop=keep, seed=jnp.float32(seed))
        want = self._dropout_oracle(q, k, v, bias, mask, dm, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-5)
        # masks must differ across blocks (a pid-insensitive hash would
        # repeat block 0's pattern)
        dm_np = np.asarray(dm)
        assert not np.array_equal(dm_np[:3], dm_np[WINDOW_BLOCK:])

    def test_in_kernel_attn_dropout_grad(self):
        from hpfg_tpu.ops.pallas.window_attention import (
            attn_drop_mask_reference)

        q, k, v, bias, mask = self._data(bn=6, seed=7)
        keep, seed = 0.8, 77.0
        dm = attn_drop_mask_reference(int(seed), 6, 2, 9, keep)

        def loss_pl(q, k, v, bias):
            o = window_attention(q, k, v, bias, mask, heads=2,
                                 interpret=True, drop=keep,
                                 seed=jnp.float32(seed))
            return jnp.sum(o ** 2)

        def loss_ref(q, k, v, bias):
            return jnp.sum(
                self._dropout_oracle(q, k, v, bias, mask, dm, 2) ** 2)

        got = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(q, k, v, bias)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for g, w, name in zip(got, want, ("dq", "dk", "dv", "dbias")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-3, atol=1e-4, err_msg=name)

    def test_swin_model_pallas_flag_matches_jnp(self):
        """SwinUNet with use_pallas (interpret via CPU default backend is
        skipped — flag off on CPU); here directly compare the attention
        module's two paths."""
        from hpfg_tpu.models.swinunet import WindowAttention

        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 6, 6, 8)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0)}
        mod_ref = WindowAttention(dim=8, window_size=3, num_heads=2,
                                  shift=True, use_pallas=False)
        variables = mod_ref.init(rngs, x, train=False)
        out_ref = mod_ref.apply(variables, x, train=False)

        import importlib

        # the package __init__ re-exports the function under the same name,
        # shadowing the submodule attribute — resolve the real module
        wa = importlib.import_module("hpfg_tpu.ops.pallas.window_attention")
        orig = wa.window_attention
        wa.window_attention = lambda *a, **k: orig(*a, interpret=True, **k)
        try:
            mod_pl = WindowAttention(dim=8, window_size=3, num_heads=2,
                                     shift=True, use_pallas=True)
            out_pl = mod_pl.apply(variables, x, train=False)
        finally:
            wa.window_attention = orig
        np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                                   rtol=2e-4, atol=2e-5)
