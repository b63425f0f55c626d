"""Fused Pallas ConvBlock: kernel correctness (interpret mode) + flax
module integration equality.

The packed-lane kernel design is validated against the pure-jnp reference
(conv_block_reference) and against the flax module path that serves as
init/fallback — same parameter tree, same BN/dropout semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpfg_tpu.models import layers
from hpfg_tpu.ops.pallas.conv_block import (
    ConvBlockParams,
    FusedStats,
    _forward,
    conv_block_reference,
    fused_conv_block,
    supported,
)

rng_np = np.random.default_rng(42)


def _params(c, f, scale=0.2):
    g = lambda *s: jnp.asarray(rng_np.normal(size=s) * scale, jnp.float32)
    return ConvBlockParams(
        w1=g(3, 3, c, f), b1=g(f), scale1=1.0 + 0.1 * g(f), bias1=0.1 * g(f),
        w2=g(3, 3, f, f), b2=g(f), scale2=1.0 + 0.1 * g(f), bias2=0.1 * g(f))


@pytest.mark.parametrize("c,f", [(1, 16), (16, 16), (16, 32), (32, 32),
                                 (64, 32), (64, 64), (128, 128)])  # pix 8,8,8,4,4,2,2
def test_fused_forward_matches_reference(c, f):
    params = _params(c, f)
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, c)), jnp.float32)
    mask = jnp.asarray((rng_np.random((2, 16, 16, f)) > 0.3) / 0.7, jnp.float32)
    y_ref, st_ref = conv_block_reference(x, params, mask, True, None)
    pm = None if mask is None else mask.reshape(mask.shape[0], mask.shape[1], -1)
    y, _, _, st = _forward(x, params, pm, None, True, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3)
    for a, b in zip(st, st_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_fused_eval_mode_matches_reference():
    params = _params(16, 16)
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, 16)), jnp.float32)
    run = FusedStats(jnp.zeros(16), jnp.ones(16), jnp.zeros(16), jnp.ones(16))
    y_ref, _ = conv_block_reference(x, params, None, False, run)
    y, _, _, _ = _forward(x, params, None, run, False, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3)


@pytest.mark.parametrize("c,f,with_mask", [(16, 16, True), (1, 16, True),
                                           (32, 16, False), (64, 64, True),
                                           (128, 64, False)])
def test_fused_custom_vjp_matches_autodiff(c, f, with_mask):
    params = _params(c, f)
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, c)), jnp.float32)
    mask = (jnp.asarray((rng_np.random((2, 16, 16, f)) > 0.3) / 0.7,
                        jnp.float32) if with_mask else None)
    pm = None if mask is None else mask.reshape(2, 16, -1)  # packed form
    dy = jnp.asarray(rng_np.normal(size=(2, 16, 16, f)), jnp.float32)

    gx_r, gp_r = jax.grad(
        lambda x, p: jnp.sum(conv_block_reference(x, p, mask, True, None)[0] * dy),
        argnums=(0, 1))(x, params)
    gx_f, gp_f = jax.grad(
        lambda x, p: jnp.sum(fused_conv_block(x, p, pm, None, True, True, None, None)[0] * dy),
        argnums=(0, 1))(x, params)

    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-3)
    gscale = max(float(jnp.max(jnp.abs(getattr(gp_r, n))))
                 for n in params._fields)
    for name in params._fields:
        a, b = np.asarray(getattr(gp_r, name)), np.asarray(getattr(gp_f, name))
        assert np.max(np.abs(a - b)) < 1e-4 * gscale + 1e-6, name


def _dual_data(ca, cb, f, seed):
    """Local per-test rng: (a) keeps the module-level rng_np stream of the
    OLDER tests unchanged, (b) pins data whose pre-activations stay clear
    of the LeakyReLU kink — an element with |z| below the ~1e-5 kernel
    noise flips branches between the fused and reference BACKWARD and
    produces O(0.1) pointwise grad differences that are not a bug."""
    g = np.random.default_rng(seed)
    j = lambda *s: jnp.asarray(g.normal(size=s) * 0.2, jnp.float32)
    params = ConvBlockParams(
        w1=j(3, 3, ca + cb, f), b1=j(f), scale1=1.0 + 0.1 * j(f),
        bias1=0.1 * j(f), w2=j(3, 3, f, f), b2=j(f),
        scale2=1.0 + 0.1 * j(f), bias2=0.1 * j(f))
    xa = jnp.asarray(g.normal(size=(2, 16, 16, ca)), jnp.float32)
    xb = jnp.asarray(g.normal(size=(2, 16, 16, cb)), jnp.float32)
    mask = jnp.asarray((g.random((2, 16, 16, f)) > 0.3) / 0.7, jnp.float32)
    dy = jnp.asarray(g.normal(size=(2, 16, 16, f)), jnp.float32)
    return params, xa, xb, mask, dy


@pytest.mark.parametrize("ca,cb,f", [(16, 16, 16), (32, 16, 16),
                                     (32, 32, 32), (64, 64, 64)])
def test_dual_input_forward_matches_concat_reference(ca, cb, f):
    """conv1(concat(a, b)) == the dual-im2col kernel fed (a, b) — the
    UpBlock skip-concat fold (the interleave never materializes)."""
    params, xa, xb, _, _ = _dual_data(ca, cb, f, seed=ca * 100 + f)
    xcat = jnp.concatenate([xa, xb], axis=-1)
    y_ref, st_ref = conv_block_reference(xcat, params, None, True, None)
    y, _, _, st = _forward((xa, xb), params, None, None, True, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3)
    for a, b in zip(st, st_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.mark.parametrize("ca,cb,f,with_mask", [(16, 16, 16, True),
                                               (32, 32, 32, False),
                                               (64, 64, 64, False)])
def test_dual_input_vjp_matches_autodiff(ca, cb, f, with_mask):
    params, xa, xb, mask, dy = _dual_data(ca, cb, f, seed=ca * 10 + f)
    if not with_mask:
        mask = None
    pm = None if mask is None else mask.reshape(2, 16, -1)

    ga_r, gb_r, gp_r = jax.grad(
        lambda a, b, p: jnp.sum(conv_block_reference(
            jnp.concatenate([a, b], axis=-1), p, mask, True, None)[0] * dy),
        argnums=(0, 1, 2))(xa, xb, params)
    (ga_f, gb_f), gp_f = jax.grad(
        lambda pair, p: jnp.sum(fused_conv_block(
            pair, p, pm, None, True, True, None, None)[0] * dy),
        argnums=(0, 1))((xa, xb), params)

    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_r),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_r),
                               atol=1e-4, rtol=1e-3)
    gscale = max(float(jnp.max(jnp.abs(getattr(gp_r, n))))
                 for n in params._fields)
    for name in params._fields:
        a, b = np.asarray(getattr(gp_r, name)), np.asarray(getattr(gp_f, name))
        assert np.max(np.abs(a - b)) < 1e-4 * gscale + 1e-6, name


class TestDualBwdFolds:
    """Round-4 backward folds (HPFG_DUAL_BWD / HPFG_FOLD_REDUCE): both must
    be numerically interchangeable with the unfused baseline — same
    contractions in the same per-element order, so the tolerance is tiny."""

    @pytest.mark.parametrize("ca,cb,f", [(16, 16, 16), (32, 16, 16),
                                         (64, 64, 64)])
    def test_dual_bwd_matches_baseline(self, ca, cb, f):
        from hpfg_tpu.ops.pallas import conv_block as cbm

        params, xa, xb, mask, dy = _dual_data(ca, cb, f, seed=ca + 7 * f)
        pm = mask.reshape(2, 16, -1)
        grad = jax.grad(
            lambda pair, p: jnp.sum(fused_conv_block(
                pair, p, pm, None, True, True, None, None)[0] * dy),
            argnums=(0, 1))
        (ga0, gb0), gp0 = grad((xa, xb), params)
        cbm.set_bwd_flags(dual=True)
        try:
            (ga1, gb1), gp1 = grad((xa, xb), params)
        finally:
            cbm.set_bwd_flags(dual=False)
        np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga0),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb0),
                                   atol=1e-6)
        for name in params._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(gp1, name)),
                np.asarray(getattr(gp0, name)), atol=1e-6, err_msg=name)

    @pytest.mark.parametrize("c,f,with_mask", [(16, 16, True),
                                               (32, 32, False)])
    def test_fold_reduce_matches_baseline(self, c, f, with_mask):
        from hpfg_tpu.ops.pallas import conv_block as cbm

        params = _params(c, f)
        g = np.random.default_rng(c * 3 + f)
        x = jnp.asarray(g.normal(size=(2, 16, 16, c)), jnp.float32)
        mask = (jnp.asarray((g.random((2, 16, 16, f)) > 0.3) / 0.7,
                            jnp.float32) if with_mask else None)
        pm = None if mask is None else mask.reshape(2, 16, -1)
        dy = jnp.asarray(g.normal(size=(2, 16, 16, f)), jnp.float32)
        grad = jax.grad(
            lambda x, p: jnp.sum(fused_conv_block(
                x, p, pm, None, True, True, None, None)[0] * dy),
            argnums=(0, 1))
        gx0, gp0 = grad(x, params)
        cbm.set_bwd_flags(fold=True)
        try:
            gx1, gp1 = grad(x, params)
        finally:
            cbm.set_bwd_flags(fold=False)
        # gscale-relative: the fold changes XLA's fusion groups in interpret
        # mode, so fp32 reductions reassociate at the ulp level (the values
        # entering the sums are identical; Mosaic executes them verbatim)
        gs = max(float(jnp.max(jnp.abs(gx0))), 1.0)
        assert float(jnp.max(jnp.abs(gx1 - gx0))) < 1e-5 * gs + 1e-6
        for name in params._fields:
            a = np.asarray(getattr(gp0, name))
            b = np.asarray(getattr(gp1, name))
            gs = max(np.max(np.abs(a)), 1.0)
            assert np.max(np.abs(a - b)) < 1e-5 * gs + 1e-6, name

    def test_dual_bwd_with_hash_dropout_and_fold(self):
        """Both flags together, in-kernel hash dropout active (the bench
        configuration the A/B will run)."""
        from hpfg_tpu.ops.pallas import conv_block as cbm

        params, xa, xb, _, dy = _dual_data(16, 16, 16, seed=99)
        seed = jnp.asarray(1234.0, jnp.float32)
        grad = jax.grad(
            lambda pair, p: jnp.sum(fused_conv_block(
                pair, p, None, seed, True, True, 0.7, None)[0] * dy),
            argnums=(0, 1))
        (ga0, gb0), gp0 = grad((xa, xb), params)
        cbm.set_bwd_flags(dual=True, fold=True)
        try:
            (ga1, gb1), gp1 = grad((xa, xb), params)
        finally:
            cbm.set_bwd_flags(dual=False, fold=False)
        for a, b in ((ga0, ga1), (gb0, gb1)):
            gs = max(float(jnp.max(jnp.abs(a))), 1.0)
            assert float(jnp.max(jnp.abs(b - a))) < 1e-5 * gs + 1e-6
        for name in params._fields:
            a = np.asarray(getattr(gp0, name))
            b = np.asarray(getattr(gp1, name))
            gs = max(np.max(np.abs(a)), 1.0)
            assert np.max(np.abs(a - b)) < 1e-5 * gs + 1e-6, name


class TestPackrwIm2col:
    """HPFG_IM2COL=packrw: roll-construction operands contracted in shift's
    4-pass structure (expand_weights_packrw row permutation) — must be
    numerically interchangeable with the roll form across fwd, custom VJP,
    the C=1 stem, hash dropout, and the pair (dual-input) block whose
    conv2/dgrads take the packrw path."""

    @staticmethod
    def _with_form(fn):
        from hpfg_tpu.ops.pallas import conv_block as cbm

        cbm.set_im2col_form("packrw")
        try:
            return fn()
        finally:
            cbm.set_im2col_form("roll")

    @pytest.mark.parametrize("c,f", [(16, 16), (1, 16), (32, 32), (64, 64)])
    def test_forward_and_vjp_match_roll(self, c, f):
        params = _params(c, f)
        g = np.random.default_rng(5 * c + f)
        x = jnp.asarray(g.normal(size=(2, 16, 16, c)), jnp.float32)
        dy = jnp.asarray(g.normal(size=(2, 16, 16, f)), jnp.float32)
        seed = jnp.asarray(77.0, jnp.float32)

        def run():
            def loss(x, p):
                y, st = fused_conv_block(x, p, None, seed, True, True, 0.8,
                                         None)
                return jnp.sum(y * dy) + jnp.sum(st.mean2)
            l, grads = jax.value_and_grad(loss, argnums=(0, 1))(x, params)
            return (l,) + grads

        l0, gx0, gp0 = run()
        l1, gx1, gp1 = self._with_form(run)
        # identical contractions regrouped: outer fp32 adds reassociate at
        # the ulp level only
        assert abs(float(l1) - float(l0)) < 1e-4 * max(abs(float(l0)), 1.0)
        gs = max(float(jnp.max(jnp.abs(gx0))), 1.0)
        assert float(jnp.max(jnp.abs(gx1 - gx0))) < 1e-5 * gs + 1e-6
        for name in params._fields:
            a = np.asarray(getattr(gp0, name))
            b = np.asarray(getattr(gp1, name))
            gs = max(np.max(np.abs(a)), 1.0)
            assert np.max(np.abs(a - b)) < 1e-5 * gs + 1e-6, name

    def test_pair_block_matches_roll(self):
        params, xa, xb, mask, dy = _dual_data(16, 16, 16, seed=321)
        pm = mask.reshape(2, 16, -1)

        def run():
            def loss(pair, p):
                y, st = fused_conv_block(pair, p, pm, None, True, True,
                                         None, None)
                return jnp.sum(y * dy) + jnp.sum(st.var1)
            return jax.value_and_grad(loss, argnums=(0, 1))((xa, xb), params)

        l0, (g0, gp0) = run()
        l1, (g1, gp1) = self._with_form(run)
        assert abs(float(l1) - float(l0)) < 1e-4 * max(abs(float(l0)), 1.0)
        for a, b in zip(g0, g1):
            gs = max(float(jnp.max(jnp.abs(a))), 1.0)
            assert float(jnp.max(jnp.abs(b - a))) < 1e-5 * gs + 1e-6
        for name in params._fields:
            a = np.asarray(getattr(gp0, name))
            b = np.asarray(getattr(gp1, name))
            gs = max(np.max(np.abs(a)), 1.0)
            assert np.max(np.abs(a - b)) < 1e-5 * gs + 1e-6, name

    def test_packrw_with_dual_bwd_flags(self):
        """packrw + HPFG_DUAL_BWD together (the combined A/B leg)."""
        from hpfg_tpu.ops.pallas import conv_block as cbm

        params, xa, xb, _, dy = _dual_data(32, 32, 32, seed=654)

        def run():
            def loss(pair, p):
                y, _ = fused_conv_block(pair, p, None, None, True, True,
                                        None, None)
                return jnp.sum(y * dy)
            return jax.value_and_grad(loss, argnums=(0, 1))((xa, xb), params)

        l0, (g0, gp0) = run()
        cbm.set_im2col_form("packrw")
        cbm.set_bwd_flags(dual=True, fold=True)
        try:
            l1, (g1, gp1) = run()
        finally:
            cbm.set_im2col_form("roll")
            cbm.set_bwd_flags(dual=False, fold=False)
        assert abs(float(l1) - float(l0)) < 1e-4 * max(abs(float(l0)), 1.0)
        for a, b in zip(g0, g1):
            gs = max(float(jnp.max(jnp.abs(a))), 1.0)
            assert float(jnp.max(jnp.abs(b - a))) < 1e-5 * gs + 1e-6
        for name in params._fields:
            a = np.asarray(getattr(gp0, name))
            b = np.asarray(getattr(gp1, name))
            gs = max(np.max(np.abs(a)), 1.0)
            assert np.max(np.abs(a - b)) < 1e-5 * gs + 1e-6, name


class TestShiftIm2col:
    """HPFG_IM2COL=shift: the group-reshape/sublane-halo im2col construction
    (no lane rolls, packed [M, 6C] halo matmul) must be numerically
    interchangeable with the validated roll form — forward, custom VJP,
    the C=1 stem and the plain packed conv all reuse _conv_rows."""

    @pytest.fixture(autouse=True)
    def _shift_mode(self):
        from hpfg_tpu.ops.pallas import conv_block as cb

        cb.set_im2col_form("shift")
        yield
        cb.set_im2col_form("roll")

    @pytest.mark.parametrize("c,f", [(1, 16), (16, 16), (16, 32), (64, 64)])
    def test_forward_and_vjp_match_reference(self, c, f):
        params = _params(c, f)
        x = jnp.asarray(rng_np.normal(size=(2, 16, 16, c)), jnp.float32)
        mask = jnp.asarray((rng_np.random((2, 16, 16, f)) > 0.3) / 0.7,
                           jnp.float32)
        pm = mask.reshape(2, 16, -1)
        y_ref, st_ref = conv_block_reference(x, params, mask, True, None)
        y, _, _, st = _forward(x, params, pm, None, True, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-3)
        for a, b in zip(st, st_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)

        dy = jnp.asarray(rng_np.normal(size=(2, 16, 16, f)), jnp.float32)
        gx_r, gp_r = jax.grad(
            lambda x, p: jnp.sum(
                conv_block_reference(x, p, mask, True, None)[0] * dy),
            argnums=(0, 1))(x, params)
        gx_f, gp_f = jax.grad(
            lambda x, p: jnp.sum(fused_conv_block(
                x, p, pm, None, True, True, None, None)[0] * dy),
            argnums=(0, 1))(x, params)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   atol=1e-4, rtol=1e-3)
        gscale = max(float(jnp.max(jnp.abs(getattr(gp_r, n))))
                     for n in params._fields)
        for name in params._fields:
            a = np.asarray(getattr(gp_r, name))
            b = np.asarray(getattr(gp_f, name))
            assert np.max(np.abs(a - b)) < 1e-4 * gscale + 1e-6, name

    def test_plain_conv_matches_oracle(self):
        from hpfg_tpu.ops.pallas.conv_block import (_conv3x3,
                                                    fused_conv3x3_plain)

        g = np.random.default_rng(11)
        x = jnp.asarray(g.normal(size=(2, 16, 16, 16)), jnp.float32)
        w = jnp.asarray(g.normal(size=(3, 3, 16, 16)) * 0.2, jnp.float32)
        bias = jnp.asarray(g.normal(size=(16,)) * 0.1, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(fused_conv3x3_plain(x, w, bias, True)),
            np.asarray(_conv3x3(x, w) + bias), atol=1e-3)
        got = jax.grad(lambda x, w, b: jnp.sum(
            fused_conv3x3_plain(x, w, b, True) ** 2),
            argnums=(0, 1, 2))(x, w, bias)
        want = jax.grad(lambda x, w, b: jnp.sum((_conv3x3(x, w) + b) ** 2),
                        argnums=(0, 1, 2))(x, w, bias)
        for a, b_, name in zip(got, want, ("dx", "dw", "db")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-3, rtol=1e-3, err_msg=name)

    def test_ext_bf16_fast_path_is_exact(self):
        """HPFG_EXT_BF16 (shift form only): skipping the fp32 ext roundtrip
        on identity-transform paths (conv1 fwd, dgrad, wgrad-identity, dual
        fwd) is bit-exact for bf16 inputs — the fp32 trip was a numeric
        no-op. Compares flag on vs off through fwd + stats + full VJP with
        in-kernel hash dropout active, and the dual forward."""
        from hpfg_tpu.ops.pallas import conv_block as cb

        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), _params(16, 32))
        x = jnp.asarray(rng_np.normal(size=(2, 16, 16, 16)), jnp.bfloat16)
        dy = jnp.asarray(rng_np.normal(size=(2, 16, 16, 32)), jnp.bfloat16)
        seed = jnp.float32(7.0)

        def run_single():
            y, st = fused_conv_block(x, params, None, seed, True, True,
                                     0.8, None)
            gx, gp = jax.grad(
                lambda xx, pp: jnp.sum(
                    fused_conv_block(xx, pp, None, seed, True, True,
                                     0.8, None)[0].astype(jnp.float32)
                    * dy.astype(jnp.float32)),
                argnums=(0, 1))(x, params)
            return (y, st, gx, gp)

        pd = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), _dual_data(16, 16, 16, 3)[0])
        xa = jnp.asarray(rng_np.normal(size=(2, 16, 16, 16)), jnp.bfloat16)
        xb = jnp.asarray(rng_np.normal(size=(2, 16, 16, 16)), jnp.bfloat16)

        def run_dual():
            return fused_conv_block((xa, xb), pd, None, None, True, True,
                                    None, None)[0]

        cb.set_im2col_form("shift", ext_bf16=False)
        base_s, base_d = run_single(), run_dual()
        cb.set_im2col_form("shift", ext_bf16=True)
        try:
            fast_s, fast_d = run_single(), run_dual()
        finally:
            cb.set_im2col_form("shift", ext_bf16=False)

        for a, b in zip(jax.tree.leaves(base_s), jax.tree.leaves(fast_s)):
            np.testing.assert_array_equal(np.asarray(a, np.float32),
                                          np.asarray(b, np.float32))
        np.testing.assert_array_equal(np.asarray(base_d, np.float32),
                                      np.asarray(fast_d, np.float32))

    @pytest.mark.parametrize("ca,cb,f", [(16, 16, 16), (32, 16, 32)])
    def test_dual_input_forward_and_vjp_match_reference(self, ca, cb, f):
        """The dual-input (concat-fold) path in SHIFT form: forward via
        _shift_chunk_conv_cat + expand_weights_shift_cat, backward via the
        per-half single-input shift dgrad/wgrad — both must match the
        concat reference exactly."""
        params, xa, xb, mask, dy = _dual_data(ca, cb, f, seed=77 + ca + f)
        xcat = jnp.concatenate([xa, xb], axis=-1)
        y_ref, st_ref = conv_block_reference(xcat, params, None, True, None)
        y, _, _, st = _forward((xa, xb), params, None, None, True,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-3)
        for a, b in zip(st, st_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)

        pm = mask.reshape(mask.shape[0], mask.shape[1], -1)
        ga_r, gb_r, gp_r = jax.grad(
            lambda a, b, p: jnp.sum(conv_block_reference(
                jnp.concatenate([a, b], axis=-1), p, mask, True, None)[0]
                * dy),
            argnums=(0, 1, 2))(xa, xb, params)
        (ga_f, gb_f), gp_f = jax.grad(
            lambda pair, p: jnp.sum(fused_conv_block(
                pair, p, pm, None, True, True, None, None)[0] * dy),
            argnums=(0, 1))((xa, xb), params)
        np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_r),
                                   atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_r),
                                   atol=1e-4, rtol=1e-3)
        for name in ("w1", "w2", "scale1", "bias1", "scale2", "bias2"):
            np.testing.assert_allclose(
                np.asarray(getattr(gp_f, name)),
                np.asarray(getattr(gp_r, name)),
                atol=2e-3, rtol=1e-3, err_msg=name)


def test_supported_shapes():
    assert supported(224, 224, 16, 16)
    assert supported(224, 224, 1, 16)
    assert supported(112, 112, 64, 32)
    assert not supported(224, 224, 24, 16)   # unaligned C (stride 192)
    assert not supported(224, 220, 16, 16)   # W not a group multiple
    assert not supported(56, 56, 256, 256)   # wide channels stay on XLA
    assert supported(28, 28, 64, 128)        # pix=2 groups (w%8 != 0 is ok)
    assert supported(56, 56, 128, 64)        # pix=2
    assert supported(14, 14, 128, 128)       # pix=2 groups


def test_convblock_module_fused_equals_flax():
    """The flax ConvBlock with fused dispatch forced on (interpret mode on
    CPU) matches the plain module path: forward, batch_stats update and
    gradients. Dropout off — the two paths draw masks differently."""
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, 16)), jnp.float32)
    block = layers.ConvBlock(features=16, dropout_p=0.0, dtype=jnp.float32)
    variables = block.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=True)

    def run(train):
        outs = {}
        for fused in (False, True):
            layers.set_fused_conv(fused)
            try:
                if train:
                    y, mut = block.apply(
                        variables, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(2)},
                        mutable=["batch_stats"])
                    outs[fused] = (y, mut["batch_stats"])
                else:
                    outs[fused] = (block.apply(variables, x, train=False), None)
            finally:
                layers.set_fused_conv(None)
        return outs

    for train in (True, False):
        outs = run(train)
        y0, st0 = outs[False]
        y1, st1 = outs[True]
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-3)
        if train:
            for a, b in zip(jax.tree.leaves(st0), jax.tree.leaves(st1)):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           atol=1e-3)

    # gradient equality through the module path
    def loss(params, fused):
        layers.set_fused_conv(fused)
        try:
            y, _ = block.apply({"params": params,
                                "batch_stats": variables["batch_stats"]},
                               x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(2)},
                               mutable=["batch_stats"])
            return jnp.sum(y ** 2)
        finally:
            layers.set_fused_conv(None)

    g0 = jax.grad(lambda p: loss(p, False))(variables["params"])
    g1 = jax.grad(lambda p: loss(p, True))(variables["params"])
    # tolerance scaled to the gradient magnitude (same convention as
    # test_fused_custom_vjp_matches_autodiff): the conv-bias gradients are
    # mathematically ZERO in train mode (a constant shift moves the batch
    # mean by the same amount) — the fused path returns the exact zero
    # while flax autodiff returns fp32 cancellation noise whose size
    # tracks the O(1..10) weight-gradient scale, not an absolute 1e-3
    # (it deterministically lands at ~1.2e-3 for some rng_np stream
    # positions, which is why this test is draw-order sensitive).
    gscale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g0))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-3 * max(1.0, gscale), rtol=1e-3)


def test_convblock_module_c1_stem_flag_paths_agree(monkeypatch):
    """C=1 stem through the module with HPFG_FUSED_STEM on (in-kernel lane
    expand) vs off (HBM channel pad): identical forward, stats and grads —
    both against the plain flax path."""
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, 1)), jnp.float32)
    block = layers.ConvBlock(features=16, dropout_p=0.0, dtype=jnp.float32)
    variables = block.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=True)

    def run(fused, stem_flag):
        monkeypatch.setattr(layers, "_FUSED_STEM", stem_flag)
        layers.set_fused_conv(fused)
        try:
            y, mut = block.apply(variables, x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(2)},
                                 mutable=["batch_stats"])
            g = jax.grad(lambda p: jnp.sum(block.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])[0] ** 2))(variables["params"])
            return y, mut["batch_stats"], g
        finally:
            layers.set_fused_conv(None)

    y_ref, st_ref, g_ref = run(fused=False, stem_flag=False)
    for stem_flag in (False, True):
        y, st, g = run(fused=True, stem_flag=stem_flag)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-3)
        for a, b in zip(jax.tree.leaves(st_ref), jax.tree.leaves(st)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-3)
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                                jax.tree.leaves(g)):
            # conv biases under train-mode BN have ANALYTICALLY zero grad
            # (the bias shifts the batch mean, which BN subtracts): the
            # fused custom VJP returns the exact 0 while flax autodiff
            # leaves O(1e-3) cancellation residue — tolerance, not truth
            name = jax.tree_util.keystr(path)
            atol = 5e-3 if "bias" in name and "conv" in name else 1e-3
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=atol, rtol=1e-3, err_msg=name)


class TestPlainConv:
    """fused_conv3x3_plain (packed plain conv for stem/out_conv/1x1 sites)
    against the jnp conv oracle, forward and VJP."""

    def _data(self, c, f, hw=16, b=2, seed=3):
        g = np.random.default_rng(seed)
        x = jnp.asarray(g.normal(size=(b, hw, hw, c)), jnp.float32)
        w = jnp.asarray(g.normal(size=(3, 3, c, f)) * 0.2, jnp.float32)
        bias = jnp.asarray(g.normal(size=(f,)) * 0.1, jnp.float32)
        return x, w, bias

    @pytest.mark.parametrize("c,f", [(16, 16), (32, 16), (16, 32)])
    def test_forward_and_grad_match_oracle(self, c, f):
        from hpfg_tpu.ops.pallas.conv_block import (_conv3x3,
                                                    fused_conv3x3_plain)

        x, w, bias = self._data(c, f)

        def loss_pl(x, w, bias):
            return jnp.sum(fused_conv3x3_plain(x, w, bias, True) ** 2)

        def loss_ref(x, w, bias):
            return jnp.sum((_conv3x3(x, w) + bias) ** 2)

        np.testing.assert_allclose(
            np.asarray(fused_conv3x3_plain(x, w, bias, True)),
            np.asarray(_conv3x3(x, w) + bias), atol=1e-3)
        got = jax.grad(loss_pl, argnums=(0, 1, 2))(x, w, bias)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
        for a, b_, name in zip(got, want, ("dx", "dw", "db")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-3, rtol=1e-3, err_msg=name)

    def test_upblock_1x1_dispatch_equals_flax(self):
        """UpBlock with the packed 1x1-as-3x3 dispatch forced on matches
        the plain module path (fwd + grads)."""
        g = np.random.default_rng(4)
        x = jnp.asarray(g.normal(size=(2, 16, 16, 32)), jnp.float32)
        skip = jnp.asarray(g.normal(size=(2, 32, 32, 16)), jnp.float32)
        block = layers.UpBlock(skip_features=16, features=16,
                               dtype=jnp.float32)
        variables = block.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               x, skip, train=True)

        def out(params, fused):
            layers.set_fused_conv(fused)
            try:
                y, _ = block.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]}, x, skip,
                    train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                    mutable=["batch_stats"])
                return y
            finally:
                layers.set_fused_conv(None)

        y0 = out(variables["params"], False)
        y1 = out(variables["params"], True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-3)
        g0 = jax.grad(lambda p: jnp.sum(out(p, False) ** 2))(
            variables["params"])
        g1 = jax.grad(lambda p: jnp.sum(out(p, True) ** 2))(
            variables["params"])
        ref = dict(jax.tree_util.tree_leaves_with_path(g0))
        for path, b in jax.tree_util.tree_leaves_with_path(g1):
            keys = [getattr(k, "key", "") for k in path]
            if keys[-1] == "bias" and keys[-2] in ("conv1", "conv2"):
                # conv biases feed BN: d(bias) is EXACTLY zero in train
                # mode; the fused VJP returns that zero while flax autodiff
                # leaves ~1e-6-relative cancellation noise — don't compare
                np.testing.assert_allclose(np.asarray(b), 0.0, atol=1e-6)
                continue
            want = np.asarray(ref[path])
            # atol scaled to the leaf's magnitude: accumulation-order noise
            # in the packed kernels is relative to the largest grads, and a
            # leaf spanning |g|~50 legitimately differs by ~3e-3 absolute
            # on its near-zero elements
            np.testing.assert_allclose(
                np.asarray(b), want, rtol=2e-3,
                atol=2e-4 * max(1.0, float(np.abs(want).max())),
                err_msg=str(path))

    def test_unet_head_dispatch_equals_flax(self):
        """Full UNet forward with every dispatch (stem pad, 1x1, head
        F-pad) forced on matches the flax path."""
        from hpfg_tpu.models.unet import UNet

        g = np.random.default_rng(5)
        x = jnp.asarray(g.normal(size=(2, 32, 32, 1)), jnp.float32)
        model = UNet(in_channels=1, num_classes=4,
                     feature_chns=(16, 16, 32, 32, 64),
                     dropout=(0.0,) * 5, dtype=jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, x,
                               train=False)

        def out(fused):
            layers.set_fused_conv(fused)
            try:
                return model.apply(variables, x, train=False)
            finally:
                layers.set_fused_conv(None)

        np.testing.assert_allclose(np.asarray(out(True)),
                                   np.asarray(out(False)), atol=3e-3)


class TestHashDropout:
    """In-kernel hash dropout == reference path fed the oracle mask
    (hash_mask_reference reproduces the kernels' per-(image,row,lane)
    hash exactly)."""

    def _oracle_mask(self, seed, b, h, w, f, keep):
        from hpfg_tpu.ops.pallas.conv_block import hash_mask_reference

        rows = [hash_mask_reference(seed, i, h, w * f, keep)
                for i in range(b)]
        return jnp.stack(rows)  # packed [B, H, W*F], pre-scaled

    def test_forward_matches_reference_with_oracle_mask(self):
        from hpfg_tpu.ops.pallas.conv_block import fused_conv_block

        c = f = 16
        keep, seed = 0.8, 12345.0
        params = _params(c, f)
        x = jnp.asarray(rng_np.normal(size=(2, 16, 16, c)), jnp.float32)
        pm = self._oracle_mask(seed, 2, 16, 16, f, keep)
        y_ref, st_ref = conv_block_reference(
            x, params, pm.reshape(2, 16, 16, f), True, None)
        y, st = fused_conv_block(x, params, None,
                                 jnp.float32(seed), True, True, keep, None)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-3)
        for a, b in zip(st, st_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)

    def test_vjp_matches_reference_with_oracle_mask(self):
        from hpfg_tpu.ops.pallas.conv_block import fused_conv_block

        c = f = 16
        keep, seed = 0.7, 777.0
        params = _params(c, f)
        x = jnp.asarray(rng_np.normal(size=(2, 16, 16, c)), jnp.float32)
        pm = self._oracle_mask(seed, 2, 16, 16, f, keep)
        mask4 = pm.reshape(2, 16, 16, f)
        dy = jnp.asarray(rng_np.normal(size=(2, 16, 16, f)), jnp.float32)

        gx_r, gp_r = jax.grad(
            lambda x, p: jnp.sum(
                conv_block_reference(x, p, mask4, True, None)[0] * dy),
            argnums=(0, 1))(x, params)
        gx_f, gp_f = jax.grad(
            lambda x, p: jnp.sum(fused_conv_block(
                x, p, None, jnp.float32(seed), True, True, keep,
                None)[0] * dy),
            argnums=(0, 1))(x, params)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   atol=1e-4, rtol=1e-3)
        gscale = max(float(jnp.max(jnp.abs(getattr(gp_r, n))))
                     for n in params._fields)
        for name in params._fields:
            a = np.asarray(getattr(gp_r, name))
            b = np.asarray(getattr(gp_f, name))
            assert np.max(np.abs(a - b)) < 1e-4 * gscale + 1e-6, name

    def test_mask_statistics(self):
        from hpfg_tpu.ops.pallas.conv_block import hash_mask_reference

        keep = 0.75
        m = np.asarray(hash_mask_reference(99.0, 0, 64, 512, keep))
        frac = (m > 0).mean()
        assert abs(frac - keep) < 0.02
        np.testing.assert_allclose(m[m > 0], 1.0 / keep)
        # different images/seeds decorrelate
        m2 = np.asarray(hash_mask_reference(99.0, 1, 64, 512, keep))
        assert 0.5 < ((m > 0) == (m2 > 0)).mean() < 0.75


def test_unet_all_perf_flags_wiring(monkeypatch):
    """Full-model guard for the round-3 perf-flag COMBINATION at UNet level
    (interpret mode, dropout zeroed). Two invariants hold on arbitrary data:

    * FORWARD + batch stats with every flag on (forced fused + pair fold +
      in-kernel C=1 stem + SHIFT im2col) match the plain flax path — the
      forward is kink-continuous, so tight tolerances are well-posed.
    * GRADIENTS with the pair fold and stem expand on are EXACTLY those of
      the same-im2col-form fused baseline, for both roll and shift forms —
      these flags are algebraic reorganizations with identical summation
      order, so any wiring bug (UpBlock pair routing, stem expand, shift
      cat weight layout) shows as a nonzero diff.

    Grad-vs-flax (and shift-vs-roll grad) equality is deliberately NOT
    asserted at model level: fp32 summation-order differences flip LeakyReLU
    kink branches on random data and produce legitimate O(0.1) subgradient
    differences (measured; the per-kernel tests pin those equalities on
    kink-safe data instead)."""
    from hpfg_tpu.models.unet import UNet
    from hpfg_tpu.ops.pallas import conv_block as cb

    model = UNet(in_channels=1, num_classes=4, dropout=(0.0,) * 5,
                 dtype=jnp.float32)
    x = jnp.asarray(rng_np.normal(size=(2, 32, 32, 1)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=True)

    def run(fused, pair, stem, form):
        layers.set_fused_conv(fused)
        monkeypatch.setattr(layers, "_FUSED_PAIR", pair)
        monkeypatch.setattr(layers, "_FUSED_STEM", stem)
        cb.set_im2col_form(form)
        try:
            y, mut = model.apply(variables, x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(2)},
                                 mutable=["batch_stats"])
            g = jax.grad(lambda p: jnp.sum(model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])[0] ** 2))(variables["params"])
            return y, mut["batch_stats"], g
        finally:
            layers.set_fused_conv(None)
            cb.set_im2col_form("roll")

    y_flax, st_flax, _ = run(None, False, False, "roll")
    y_all, st_all, _ = run(True, True, True, "shift")
    np.testing.assert_allclose(np.asarray(y_all), np.asarray(y_flax),
                               atol=2e-3)
    for a, b in zip(jax.tree.leaves(st_flax), jax.tree.leaves(st_all)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3)

    for form in ("roll", "shift"):
        _, _, g_base = run(True, False, False, form)
        _, _, g_flags = run(True, True, True, form)
        base = jax.tree_util.tree_leaves_with_path(g_base)
        flags = dict(jax.tree_util.tree_leaves_with_path(g_flags))
        for path, a in base:
            a = np.asarray(a)
            # leaf-scale-normalized: the in-kernel stem expand computes the
            # stem forward in a different fp32 order than the padded form,
            # giving ~1e-7-relative grad noise — far below any wiring bug
            tol = 1e-5 * max(float(np.max(np.abs(a))), 1e-3)
            np.testing.assert_allclose(
                np.asarray(flags[path]), a, atol=tol, rtol=0,
                err_msg=f"{form}:{jax.tree_util.keystr(path)}")
