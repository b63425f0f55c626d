"""Swin-MAE → SwinUNet encoder transfer (reference intent:
model/swin_mae.py:440-557 fine-tunable SwinUnet + sup_ACDC.py:37
pretrain_save_path, which upstream never actually loads)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hpfg_tpu.models.swin_mae import SwinMAE
from hpfg_tpu.models.swinunet import SwinUNet
from hpfg_tpu.utils.pretrain import (extract_mae_params,
                                     load_pretrained_encoder,
                                     transfer_mae_encoder)

TINY = dict(in_channels=1, embed_dim=8, num_heads=(1, 2, 4, 8),
            window_size=2)


def _tiny_mae():
    return SwinMAE(img_size=64, decoder_embed_dim=64, **TINY)


def _tiny_swinunet(depths=(2, 2, 2, 2)):
    return SwinUNet(num_classes=4, patch_size=4, depths=depths, **TINY)


def _flat(tree, prefix=()):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flat(v, prefix + (k,)))
        return out
    return {prefix: tree}


def _init(model, shape, extra_rngs=()):
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    for name in extra_rngs:
        rngs[name] = jax.random.PRNGKey(2)
    return model.init(rngs, jnp.zeros(shape), train=True)


class TestTransfer:
    def test_encoder_subtree_equality(self):
        mae = _tiny_mae()
        mae_params = _init(mae, (1, 64, 64, 1), ("mask",))["params"]
        unet = _tiny_swinunet()
        variables = _init(unet, (1, 64, 64, 1))
        new_params, report = transfer_mae_encoder(mae_params,
                                                  variables["params"])
        assert report["transferred"] and not report["missing_target"] \
            and not report["skipped_shape"]
        # every transferred leaf equals the MAE source leaf
        src = _flat(mae_params)
        tgt = _flat(new_params["encoder"])
        n_checked = 0
        for path, v in src.items():
            if path[0] == "patch_embed" or (path[0].startswith("layer")
                                            and "up" not in path[0]):
                np.testing.assert_array_equal(np.asarray(tgt[path]),
                                              np.asarray(v))
                n_checked += 1
        assert n_checked == len(report["transferred"]) > 20
        # decoder untouched
        np.testing.assert_array_equal(
            np.asarray(_flat(new_params["decoder"])[
                ("head", "kernel")]),
            np.asarray(_flat(variables["params"]["decoder"])[
                ("head", "kernel")]))

    def test_depth_mismatch_transfers_intersection(self):
        """SwinUNet default depths (2,2,6,2) vs MAE (2,2,2,2): the shared
        blocks transfer, the extra layer2 blocks keep fresh init."""
        mae_params = _init(_tiny_mae(), (1, 64, 64, 1), ("mask",))["params"]
        unet = _tiny_swinunet(depths=(2, 2, 6, 2))
        variables = _init(unet, (1, 64, 64, 1))
        new_params, report = transfer_mae_encoder(mae_params,
                                                  variables["params"])
        assert report["transferred"]
        fresh = _flat(variables["params"]["encoder"])
        new = _flat(new_params["encoder"])
        # block5 of layer2 does not exist in the MAE encoder -> unchanged
        key = ("layer2", "block5", "attn", "qkv", "kernel")
        np.testing.assert_array_equal(np.asarray(new[key]),
                                      np.asarray(fresh[key]))
        # block0 of layer2 transferred
        key0 = ("layer2", "block0", "attn", "qkv", "kernel")
        np.testing.assert_array_equal(
            np.asarray(new[key0]),
            np.asarray(_flat(mae_params)[key0]))

    def test_pretrain_then_checkpoint_then_forward(self, tmp_path):
        """5 pretraining steps → checkpoint → transfer → the segmentation
        forward actually consumes the pretrained weights."""
        mae = _tiny_mae()
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 64, 64, 1)), jnp.float32)
        variables = _init(mae, (2, 64, 64, 1), ("mask",))
        params = variables["params"]
        tx = optax.adamw(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                pred, mask = mae.apply(
                    {"params": p}, x, train=True,
                    rngs={"dropout": key, "mask": key})
                return jnp.mean((pred - x) ** 2 * mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        losses = []
        for i in range(5):
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()

        from hpfg_tpu.utils.checkpoint import CheckpointManager

        ckpt_dir = str(tmp_path / "pretrain")
        CheckpointManager(ckpt_dir).save(
            "last", {"model": {"params": params}}, block=True)

        unet = _tiny_swinunet()
        uvars = _init(unet, (1, 64, 64, 1))
        new_params, report = load_pretrained_encoder(ckpt_dir,
                                                     uvars["params"])
        assert len(report["transferred"]) > 20
        # the transferred encoder changes the segmentation forward
        x_eval = jnp.ones((1, 64, 64, 1))
        out_fresh = unet.apply(uvars, x_eval, train=False)
        out_pre = unet.apply({"params": new_params}, x_eval, train=False)
        assert not np.allclose(np.asarray(out_fresh), np.asarray(out_pre))
        # param-leaf equality on the encoder subtree
        np.testing.assert_array_equal(
            np.asarray(_flat(new_params["encoder"])[
                ("patch_embed", "proj", "kernel")]),
            np.asarray(_flat(params)[("patch_embed", "proj", "kernel")]))

    def test_extract_mae_params_variants(self):
        p = {"patch_embed": {"k": np.ones(1)}}
        assert extract_mae_params(p) is p
        assert extract_mae_params({"params": p}) is p
        assert extract_mae_params({"model": {"params": p}}) is p
