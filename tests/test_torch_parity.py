"""Weight-port parity vs the PyTorch reference (torch CPU oracle).

Ports fixed weights from the reference models (imported at test time from
the read-only mount, /root/reference/model/unet.py:155-206) into the flax
rebuild and asserts the two compute the same function — the only feasible
stand-in for the ±0.5-dice parity criterion in this environment.
"""

from __future__ import annotations

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"


def _load_reference(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_unet_mod():
    return _load_reference("ref_unet", f"{REFERENCE_ROOT}/model/unet.py")


# ---------------------------------------------------------------------------
# torch → flax weight mapping
# ---------------------------------------------------------------------------

def _np(t):
    # COPY out of torch: on the CPU backend jnp.asarray can alias the torch
    # buffer via the numpy view, so later in-place torch mutations (e.g. BN
    # running-stat updates) would silently corrupt the ported pytree.
    return np.array(t.detach().numpy())


def _conv(sd, key):
    return {"kernel": jnp.asarray(_np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(_np(sd[f"{key}.bias"]))}


def _linear(sd, key):
    return {"kernel": jnp.asarray(_np(sd[f"{key}.weight"]).T),
            "bias": jnp.asarray(_np(sd[f"{key}.bias"]))}


def _bn(sd, key):
    params = {"scale": jnp.asarray(_np(sd[f"{key}.weight"])),
              "bias": jnp.asarray(_np(sd[f"{key}.bias"]))}
    stats = {"mean": jnp.asarray(_np(sd[f"{key}.running_mean"])),
             "var": jnp.asarray(_np(sd[f"{key}.running_var"]))}
    return params, stats


def _conv_block(sd, prefix):
    """Reference ConvBlock = Sequential(conv, bn, lrelu, dropout, conv, bn,
    lrelu) (reference model/unet.py:12-28) → our ConvBlock {conv1,bn1,conv2,bn2}."""
    bn1_p, bn1_s = _bn(sd, f"{prefix}.1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.5")
    params = {"conv1": _conv(sd, f"{prefix}.0"), "bn1": bn1_p,
              "conv2": _conv(sd, f"{prefix}.4"), "bn2": bn2_p}
    stats = {"bn1": bn1_s, "bn2": bn2_s}
    return params, stats


def _neck(sd, prefix):
    """Reference projection_conv (model/unet.py:120-152) → ProjectionNeck."""
    return {"mlp1": _linear(sd, f"{prefix}.mlp.0"),
            "mlp2": _linear(sd, f"{prefix}.mlp.2"),
            "conv1": _conv(sd, f"{prefix}.mlp_conv.0"),
            "conv2": _conv(sd, f"{prefix}.mlp_conv.2")}


def port_unet_weights(sd) -> tuple[dict, dict]:
    """Reference UNet state_dict → (params, batch_stats) for models.unet.UNet."""
    params = {"encoder": {}, "decoder": {}}
    stats = {"encoder": {}, "decoder": {}}
    p, s = _conv_block(sd, "encoder.in_conv.conv_conv")
    params["encoder"]["in_conv"], stats["encoder"]["in_conv"] = p, s
    for i in range(1, 5):
        p, s = _conv_block(sd, f"encoder.down{i}.maxpool_conv.1.conv_conv")
        params["encoder"][f"down{i}"] = {"conv": p}
        stats["encoder"][f"down{i}"] = {"conv": s}
    for i in range(1, 5):
        p, s = _conv_block(sd, f"decoder.up{i}.conv.conv_conv")
        params["decoder"][f"up{i}"] = {
            "conv1x1": _conv(sd, f"decoder.up{i}.conv1x1"), "conv": p}
        stats["decoder"][f"up{i}"] = {"conv": s}
    params["decoder"]["out_conv"] = _conv(sd, "decoder.out_conv")
    return params, stats


def port_unet_plus_weights(sd) -> tuple[dict, dict]:
    params, stats = port_unet_weights(sd)
    params["dense_projection_high"] = _neck(sd, "dense_projection_high")
    params["dense_projection_head"] = _neck(sd, "dense_projection_head")
    return params, stats


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fixed_input():
    x = np.random.default_rng(42).normal(size=(2, 1, 64, 64)).astype(np.float32)
    return x


def test_unet_logits_parity(ref_unet_mod, fixed_input):
    """Ported-weight flax UNet == reference torch UNet (eval mode, fp32)."""
    from hpfg_tpu.models.unet import UNet

    tmodel = ref_unet_mod.UNet(in_channels=1, num_classes=4)
    tmodel.eval()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(fixed_input)).numpy()

    params, stats = port_unet_weights(tmodel.state_dict())
    model = UNet(in_channels=1, num_classes=4, dtype=jnp.float32)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(fixed_input.transpose(0, 2, 3, 1)),
                      train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_unet_plus_full_forward_parity(ref_unet_mod, fixed_input):
    """UNet_Plus (logits, high, head) parity incl. both DenseCL necks
    (reference model/unet.py:178-206)."""
    from hpfg_tpu.models.unet import UNetPlus

    tmodel = ref_unet_mod.UNet_Plus(in_channels=1, num_classes=4)
    tmodel.eval()
    with torch.no_grad():
        t_out, (t_g_high, t_d_high), (t_g_head, t_d_head) = tmodel(
            torch.from_numpy(fixed_input))

    params, stats = port_unet_plus_weights(tmodel.state_dict())
    model = UNetPlus(in_channels=1, num_classes=4, dtype=jnp.float32)
    out, (g_high, d_high), (g_head, d_head) = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(fixed_input.transpose(0, 2, 3, 1)), train=False)

    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               t_out.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_high), t_g_high.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_head), t_g_head.numpy(),
                               atol=2e-4, rtol=1e-3)
    # our dense map is [B, s*s, out_dim]; reference keeps [B, out_dim, s*s]
    np.testing.assert_allclose(np.asarray(d_high).transpose(0, 2, 1),
                               t_d_high.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_head).transpose(0, 2, 1),
                               t_d_head.numpy(), atol=2e-4, rtol=1e-3)


def _ln(sd, key):
    return {"scale": jnp.asarray(_np(sd[f"{key}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{key}.bias"]))}


def _dense_nobias(sd, key):
    return {"kernel": jnp.asarray(_np(sd[f"{key}.weight"]).T)}


def _swin_block(sd, prefix):
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
            "relative_position_bias_table": jnp.asarray(
                _np(sd[f"{prefix}.attn.relative_position_bias_table"])),
        },
        "mlp": {"fc1": _linear(sd, f"{prefix}.mlp.fc1"),
                "fc2": _linear(sd, f"{prefix}.mlp.fc2")},
    }


def port_swinunet_weights(sd, depths=(2, 2, 6, 2)) -> dict:
    """Reference SwinUnet state_dict (model/swinunet.py:690-779) →
    models.swinunet.SwinUNet params (no batch stats: LN only)."""
    enc = {"patch_embed": {"proj": _conv(sd, "encoder.patch_embed.proj"),
                           "norm": _ln(sd, "encoder.patch_embed.norm")}}
    n = len(depths)
    for i in range(n):
        layer = {f"block{j}": _swin_block(sd, f"encoder.layers.{i}.blocks.{j}")
                 for j in range(depths[i])}
        if i != n - 1:
            layer["downsample"] = {
                "norm": _ln(sd, f"encoder.layers.{i}.downsample.norm"),
                "reduction": _dense_nobias(
                    sd, f"encoder.layers.{i}.downsample.reduction")}
        enc[f"layer{i}"] = layer
    dec = {
        "first_patch_expanding": {
            "expand": _dense_nobias(sd, "decoder.first_patch_expanding.expand"),
            "norm": _ln(sd, "decoder.first_patch_expanding.norm")},
        "norm_up": _ln(sd, "decoder.norm_up"),
        "final_patch_expanding": {
            "expand": _dense_nobias(sd, "decoder.final_patch_expanding.expand"),
            "norm": _ln(sd, "decoder.final_patch_expanding.norm")},
        "head": {"kernel": jnp.asarray(
            _np(sd["decoder.head.weight"]).transpose(2, 3, 1, 0))},
    }
    for i in range(n - 1):
        # BasicBlockUp remaps index -> len(depths)-index-2 (swinunet.py:348)
        depth_up = depths[n - i - 2]
        layer = {f"block{j}": _swin_block(
            sd, f"decoder.layers_up.{i}.blocks.{j}") for j in range(depth_up)}
        if i < n - 2:
            layer["upsample"] = {
                "expand": _dense_nobias(sd, f"decoder.layers_up.{i}.upsample.expand"),
                "norm": _ln(sd, f"decoder.layers_up.{i}.upsample.norm")}
        dec[f"layer_up{i}"] = layer
        dec[f"skip{i}"] = _linear(sd, f"decoder.skip_connection_layers.{i}")
    return {"encoder": enc, "decoder": dec}


def test_swinunet_logits_parity():
    """Ported-weight flax SwinUNet == reference torch SwinUnet @224² (eval
    mode, fp32, W/SW-MSA + rel-pos bias + patch merge/expand + skips;
    reference model/swinunet.py:405-530, 690-779)."""
    ref_swin = _load_reference("ref_swinunet",
                               f"{REFERENCE_ROOT}/model/swinunet.py")
    from hpfg_tpu.models.swinunet import SwinUNet

    torch.manual_seed(7)
    tmodel = ref_swin.SwinUnet(num_classes=4)
    tmodel.eval()
    x = np.random.default_rng(3).normal(size=(1, 3, 224, 224)).astype(
        np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    params = port_swinunet_weights(tmodel.state_dict())
    model = SwinUNet(in_channels=3, num_classes=4, dtype=jnp.float32,
                     drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0)
    out = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    # fp32 accumulation-order noise compounds over 25 transformer blocks:
    # 99.9% of logits agree within 5e-4, the tail within 2e-3
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


def test_supervised_50iter_loss_curve_parity(ref_unet_mod):
    """50 SGD iterations of supervised UNet training from IDENTICAL ported
    weights on identical batches: the torch reference loop (Med_Sup_Loss =
    0.5·CE + 0.5·Dice, reference utils/loss/medloss.py:44-57; SGD momentum
    0.9) and the flax rebuild must trace the same loss curve — the
    trainable-dynamics counterpart of the logits-parity tests."""
    from hpfg_tpu.models.unet import UNet
    from hpfg_tpu.ops.losses import med_sup_loss
    import optax

    medloss = _load_reference("ref_medloss",
                              f"{REFERENCE_ROOT}/utils/loss/medloss.py")

    torch.manual_seed(0)
    tmodel = ref_unet_mod.UNet(in_channels=1, num_classes=4)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    params, stats = port_unet_weights(tmodel.state_dict())

    rng = np.random.default_rng(11)
    batches = [(rng.normal(size=(4, 1, 32, 32)).astype(np.float32),
                rng.integers(0, 4, (4, 32, 32)).astype(np.int64))
               for _ in range(50)]

    # torch loop
    t_loss_fn = medloss.Med_Sup_Loss(4)
    opt = torch.optim.SGD(tmodel.parameters(), lr=0.01, momentum=0.9)
    tmodel.train()
    t_losses = []
    for img, lab in batches:
        opt.zero_grad()
        loss = t_loss_fn(tmodel(torch.from_numpy(img)),
                         torch.from_numpy(lab))
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    # flax loop (same ported init, same batches, same optimizer semantics)
    model = UNet(in_channels=1, num_classes=4,
                 dropout=(0.0,) * 5, dtype=jnp.float32)
    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, img, lab):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, img, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return med_sup_loss(out, lab, 4), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    f_losses = []
    for img, lab in batches:
        params, stats, opt_state, loss = step(
            params, stats, opt_state,
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(lab.astype(np.int32)))
        f_losses.append(float(loss))

    t_losses, f_losses = np.asarray(t_losses), np.asarray(f_losses)
    # the curves must coincide (small fp drift compounds over 50 steps)
    np.testing.assert_allclose(f_losses[:10], t_losses[:10], atol=2e-3)
    assert np.max(np.abs(f_losses - t_losses)) < 0.03
    # and both move the same direction (random labels train slowly; the
    # parity claim is the curve match above, not the rate)
    assert np.mean(t_losses[-10:]) < np.mean(t_losses[:10])
    assert np.mean(f_losses[-10:]) < np.mean(f_losses[:10])


def test_unet_train_mode_bn_stats_parity(ref_unet_mod, fixed_input):
    """One train-mode forward: flax batch_stats update matches torch's
    running-stat EMA (momentum 0.9 ↔ torch momentum 0.1) on bn1 of the
    stem — guards the BN semantics the SSL algorithms rely on."""
    from hpfg_tpu.models.unet import UNet

    tmodel = ref_unet_mod.UNet(in_channels=1, num_classes=4)
    # port BEFORE the torch forward mutates the running stats
    params, stats = port_unet_weights(tmodel.state_dict())
    # zero all dropout for a deterministic comparison of statistics
    tmodel.train()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    with torch.no_grad():
        tmodel(torch.from_numpy(fixed_input))
    t_mean = tmodel.encoder.in_conv.conv_conv[1].running_mean.numpy()

    model = UNet(in_channels=1, num_classes=4,
                 dropout=(0.0, 0.0, 0.0, 0.0, 0.0), dtype=jnp.float32)
    _, mut = model.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(fixed_input.transpose(0, 2, 3, 1)),
                         train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(0)})
    f_mean = np.asarray(mut["batch_stats"]["encoder"]["in_conv"]["bn1"]["mean"])
    # both took one EMA step from the same running stats toward the same
    # batch mean; values must agree to float tolerance
    np.testing.assert_allclose(f_mean, t_mean, atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# SegFormer / MiT (reference model/segformer.py:92-433) — CTCT's model2
# ---------------------------------------------------------------------------

def port_segformer_weights(sd, depths=(2, 2, 2, 2)) -> tuple[dict, dict]:
    """Reference SegFormer state_dict → (params, batch_stats) for
    models.segformer.SegFormer/SegFormerPlus.

    Name map: encoder.patch_embed{s}/block{s}.{i}/norm{s}
    (reference segformer.py:222-243) → patch_embed{s}/block{s}_{i}/norm{s};
    decoder.linear_c{i}.proj (FFN, :276-284) → linear_c{i};
    decoder.linear_fuse.{conv,bn} (ConvModule, :287-295) → linear_fuse + bn;
    decoder.linear_pred (:306) → linear_pred.
    """
    enc = {}
    for s in range(1, 5):
        enc[f"patch_embed{s}"] = {
            "proj": _conv(sd, f"encoder.patch_embed{s}.proj"),
            "norm": _ln(sd, f"encoder.patch_embed{s}.norm")}
        for i in range(depths[s - 1]):
            pre = f"encoder.block{s}.{i}"
            attn = {"q": _linear(sd, f"{pre}.attn.q"),
                    "kv": _linear(sd, f"{pre}.attn.kv"),
                    "proj": _linear(sd, f"{pre}.attn.proj")}
            if f"{pre}.attn.sr.weight" in sd:  # sr_ratio > 1 stages only
                attn["sr"] = _conv(sd, f"{pre}.attn.sr")
                attn["norm"] = _ln(sd, f"{pre}.attn.norm")
            enc[f"block{s}_{i}"] = {
                "norm1": _ln(sd, f"{pre}.norm1"),
                "attn": attn,
                "norm2": _ln(sd, f"{pre}.norm2"),
                "mlp": {"fc1": _linear(sd, f"{pre}.mlp.fc1"),
                        # torch depthwise [O,1,kh,kw] → flax [kh,kw,1,O]
                        "dwconv": _conv(sd, f"{pre}.mlp.dwconv.dwconv"),
                        "fc2": _linear(sd, f"{pre}.mlp.fc2")}}
        enc[f"norm{s}"] = _ln(sd, f"encoder.norm{s}")

    dec = {f"linear_c{i}": _linear(sd, f"decoder.linear_c{i}.proj")
           for i in range(1, 5)}
    dec["linear_fuse"] = {"kernel": jnp.asarray(
        _np(sd["decoder.linear_fuse.conv.weight"]).transpose(2, 3, 1, 0))}
    bn_p, bn_s = _bn(sd, "decoder.linear_fuse.bn")
    dec["bn"] = bn_p
    dec["linear_pred"] = _conv(sd, "decoder.linear_pred")
    return ({"encoder": enc, "decoder": dec},
            {"decoder": {"bn": bn_s}})


def test_segformer_logits_parity():
    """Ported-weight flax SegFormer-B0 == reference torch SegFormer @224²
    (eval mode, fp32: overlap patch embeds, spatial-reduction attention,
    MixFFN DWConv, all-MLP head with reversed-stage concat + BN fuse,
    align_corners=False bilinear; reference model/segformer.py:92-321,
    385-399 — the CTCT model2 family)."""
    ref_seg = _load_reference("ref_segformer",
                              f"{REFERENCE_ROOT}/model/segformer.py")
    from hpfg_tpu.models.segformer import SegFormer

    torch.manual_seed(11)
    tmodel = ref_seg.SegFormer(in_channels=3, num_classes=4,
                               model_name="B0")
    tmodel.eval()
    x = np.random.default_rng(5).normal(size=(1, 3, 224, 224)).astype(
        np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    params, stats = port_segformer_weights(tmodel.state_dict())
    model = SegFormer(image_size=(224, 224), in_channels=3, num_classes=4,
                      model_name="B0", dtype=jnp.float32)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_segformer_plus_full_forward_parity():
    """SegFormer_Plus-B1 (logits, high, head) parity incl. both DenseCL
    necks on the bottleneck feature and the logits map (reference
    segformer.py:402-433)."""
    ref_seg = _load_reference("ref_segformer",
                              f"{REFERENCE_ROOT}/model/segformer.py")
    from hpfg_tpu.models.segformer import SegFormerPlus

    torch.manual_seed(13)
    tmodel = ref_seg.SegFormer_Plus(image_size=[96, 96], in_channels=3,
                                    num_classes=4, model_name="B1")
    tmodel.eval()
    x = np.random.default_rng(9).normal(size=(1, 3, 96, 96)).astype(
        np.float32)
    with torch.no_grad():
        t_out, (t_g_high, t_d_high), (t_g_head, t_d_head) = tmodel(
            torch.from_numpy(x))

    sd = tmodel.state_dict()
    params, stats = port_segformer_weights(sd)
    params["dense_projection_high"] = _neck(sd, "dense_projection_high")
    params["dense_projection_head"] = _neck(sd, "dense_projection_head")
    model = SegFormerPlus(image_size=(96, 96), in_channels=3, num_classes=4,
                          model_name="B1", dtype=jnp.float32)
    out, (g_high, d_high), (g_head, d_head) = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               t_out.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_high), t_g_high.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_head), t_g_head.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_high).transpose(0, 2, 1),
                               t_d_high.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_head).transpose(0, 2, 1),
                               t_d_head.numpy(), atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# TransUNet (reference model/transunet.py:265-298) — sup/semi ACDC families
# ---------------------------------------------------------------------------

def _conv_nobias(sd, key):
    return {"kernel": jnp.asarray(
        _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0))}


def _transunet_qkv(sd, key, head_num):
    """Reference qkv_layer columns are laid out by the einops pattern
    'b t (d k h)' (transunet.py:20): torch feature f = d*3*H + k*H + h.
    Our kernel reshapes as (3, H, hd): f = k*H*hd + h*hd + d. Permute."""
    w = _np(sd[f"{key}.weight"])            # [3*dim, dim]
    dim = w.shape[1]
    hd = dim // head_num
    k, rem = np.divmod(np.arange(3 * dim), head_num * hd)
    h, d = np.divmod(rem, hd)
    perm = d * (3 * head_num) + k * head_num + h
    return {"kernel": jnp.asarray(w.T[:, perm])}


def _transunet_bottleneck(sd, prefix):
    """EncoderBottleneck (transunet.py:141-179) → our encoder{i} scope."""
    params, stats = {}, {}
    params["down_conv"] = _conv_nobias(sd, f"{prefix}.downsample.0")
    params["down_bn"], stats["down_bn"] = _bn(sd, f"{prefix}.downsample.1")
    for j in (1, 2, 3):
        params[f"conv{j}"] = _conv_nobias(sd, f"{prefix}.conv{j}")
        params[f"norm{j}"], stats[f"norm{j}"] = _bn(sd, f"{prefix}.norm{j}")
    return params, stats


def port_transunet_weights(sd, block_num=8, head_num=4) -> tuple[dict, dict]:
    """Reference TransUNet state_dict → (params, batch_stats) for
    models.transunet.TransUNet (name map: encoder.* flattened to the top
    scope, vit.transformer.layer_blocks.{i} → vit/block{i},
    decoder.decoder{i}.layer.{0,1,3,4} → decoder{i}/{conv1,bn1,conv2,bn2},
    decoder.conv1 → head)."""
    params, stats = {}, {}
    params["conv1"] = _conv_nobias(sd, "encoder.conv1")
    params["norm1"], stats["norm1"] = _bn(sd, "encoder.norm1")
    for i in (1, 2, 3):
        p, s = _transunet_bottleneck(sd, f"encoder.encoder{i}")
        params[f"encoder{i}"], stats[f"encoder{i}"] = p, s

    vit = {"projection": _linear(sd, "encoder.vit.projection"),
           "cls_token": jnp.asarray(_np(sd["encoder.vit.cls_token"])),
           "embedding": jnp.asarray(_np(sd["encoder.vit.embedding"]))}
    for i in range(block_num):
        pre = f"encoder.vit.transformer.layer_blocks.{i}"
        vit[f"block{i}"] = {
            "attn": {"qkv": _transunet_qkv(
                         sd, f"{pre}.multi_head_attention.qkv_layer",
                         head_num),
                     "out": _dense_nobias(
                         sd, f"{pre}.multi_head_attention.out_attention")},
            "norm1": _ln(sd, f"{pre}.layer_norm1"),
            "norm2": _ln(sd, f"{pre}.layer_norm2"),
            "fc1": _linear(sd, f"{pre}.mlp.mlp_layers.0"),
            "fc2": _linear(sd, f"{pre}.mlp.mlp_layers.3")}
    params["vit"] = vit

    params["conv2"] = _conv(sd, "encoder.conv2")
    params["norm2"], stats["norm2"] = _bn(sd, "encoder.norm2")
    for i in (1, 2, 3, 4):
        pre = f"decoder.decoder{i}"
        bn1_p, bn1_s = _bn(sd, f"{pre}.layer.1")
        bn2_p, bn2_s = _bn(sd, f"{pre}.layer.4")
        params[f"decoder{i}"] = {"conv1": _conv(sd, f"{pre}.layer.0"),
                                 "bn1": bn1_p,
                                 "conv2": _conv(sd, f"{pre}.layer.3"),
                                 "bn2": bn2_p}
        stats[f"decoder{i}"] = {"bn1": bn1_s, "bn2": bn2_s}
    params["head"] = _conv(sd, "decoder.conv1")
    return params, stats


def test_transunet_logits_parity():
    """Ported-weight flax TransUNet == reference torch TransUNet @96²
    (eval mode, fp32: ResNet-bottleneck encoder with torch symmetric
    padding on the strided convs, sqrt-multiplied post-norm ViT with the
    einops '(d k h)' qkv layout, align-corners decoder;
    reference model/transunet.py:265-298 — get_transunet)."""
    ref_tu = _load_reference("ref_transunet",
                             f"{REFERENCE_ROOT}/model/transunet.py")
    from hpfg_tpu.models.transunet import TransUNet

    torch.manual_seed(17)
    tmodel = ref_tu.get_transunet(image_size=96, num_classes=4,
                                  in_channels=3)
    tmodel.eval()
    x = np.random.default_rng(23).normal(size=(2, 3, 96, 96)).astype(
        np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    params, stats = port_transunet_weights(tmodel.state_dict())
    model = TransUNet(image_size=96, num_classes=4, in_channels=3,
                      dtype=jnp.float32)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# CMT / CMT_Plus (reference model/cmt.py:154-477) — CTCT's cmt families
# ---------------------------------------------------------------------------

def _install_timm_stub():
    """Reference cmt.py/uniformer.py import timm (absent here) only for
    DropPath/to_2tuple/trunc_normal_/register_model/_cfg — stub them."""
    if "timm" in sys.modules:
        return
    import types
    import torch.nn as tnn

    class _DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity (tests run eval)
            return x

    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = _DropPath
    layers.to_2tuple = lambda v: tuple(v) if isinstance(v, (tuple, list)) \
        else (v, v)
    layers.trunc_normal_ = (
        lambda t, mean=0.0, std=1.0, a=-2.0, b=2.0:
        torch.nn.init.trunc_normal_(t, mean, std, a, b))
    helpers = types.ModuleType("timm.models.helpers")
    helpers.load_pretrained = lambda *a, **k: None
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    vt = types.ModuleType("timm.models.vision_transformer")
    vt._cfg = lambda url="", **kw: dict(url=url, **kw)
    models = types.ModuleType("timm.models")
    models.layers, models.helpers, models.registry = layers, helpers, registry
    models.vision_transformer = vt
    timm = types.ModuleType("timm")
    timm.models = models
    sys.modules.update({
        "timm": timm, "timm.models": models,
        "timm.models.layers": layers, "timm.models.helpers": helpers,
        "timm.models.registry": registry,
        "timm.models.vision_transformer": vt})


_CMT_STAGE = "abcd"


def port_cmt_weights(sd, depths, sr_ratios=(8, 4, 2, 1)) -> tuple[dict, dict]:
    """Reference CMT_S/CMT_Plus state_dict → (params, batch_stats).

    Name map (reference cmt.py:176-233): stem_conv{i}/stem_norm{i} keep
    their names; patch_embed_{a..d}.{proj,norm} → patch_embed_{s} +
    patch_norm_{s}; relative_pos_{a..d} → relative_pos_{s};
    blocks_{a..d}.{i}.{proj,norm1,attn,norm2,mlp} → block{s}_{i}/
    {lpu,norm1,attn,norm2,mlp} with attn.sr.{0,1} → sr_conv/sr_bn and
    mlp.conv1.{0,2}/proj/proj_bn/conv2.{0,1} → conv1/bn1/proj/proj_bn/
    conv2/bn2; the SegFormerHead decoder maps as in port_segformer_weights
    (cmt.py:380-404)."""
    enc, enc_s = {}, {}
    for i in (1, 2, 3):
        enc[f"stem_conv{i}"] = _conv(sd, f"encoder.stem_conv{i}")
        enc[f"stem_norm{i}"], enc_s[f"stem_norm{i}"] = _bn(
            sd, f"encoder.stem_norm{i}")
    for s in range(4):
        tag = _CMT_STAGE[s]
        enc[f"patch_embed_{s}"] = _conv(sd, f"encoder.patch_embed_{tag}.proj")
        enc[f"patch_norm_{s}"] = _ln(sd, f"encoder.patch_embed_{tag}.norm")
        enc[f"relative_pos_{s}"] = jnp.asarray(
            _np(sd[f"encoder.relative_pos_{tag}"]))
        for i in range(depths[s]):
            pre = f"encoder.blocks_{tag}.{i}"
            attn = {"q": _linear(sd, f"{pre}.attn.q"),
                    "k": _linear(sd, f"{pre}.attn.k"),
                    "v": _linear(sd, f"{pre}.attn.v"),
                    "proj": _linear(sd, f"{pre}.attn.proj")}
            blk_s = {}
            if sr_ratios[s] > 1:
                attn["sr_conv"] = _conv(sd, f"{pre}.attn.sr.0")
                attn["sr_bn"], sr_s = _bn(sd, f"{pre}.attn.sr.1")
                blk_s["attn"] = {"sr_bn": sr_s}
            bn1_p, bn1_s = _bn(sd, f"{pre}.mlp.conv1.2")
            pbn_p, pbn_s = _bn(sd, f"{pre}.mlp.proj_bn")
            bn2_p, bn2_s = _bn(sd, f"{pre}.mlp.conv2.1")
            enc[f"block{s}_{i}"] = {
                "lpu": _conv(sd, f"{pre}.proj"),
                "norm1": _ln(sd, f"{pre}.norm1"),
                "norm2": _ln(sd, f"{pre}.norm2"),
                "attn": attn,
                "mlp": {"conv1": _conv(sd, f"{pre}.mlp.conv1.0"), "bn1": bn1_p,
                        "proj": _conv(sd, f"{pre}.mlp.proj"),
                        "proj_bn": pbn_p,
                        "conv2": _conv(sd, f"{pre}.mlp.conv2.0"),
                        "bn2": bn2_p}}
            blk_s["mlp"] = {"bn1": bn1_s, "proj_bn": pbn_s, "bn2": bn2_s}
            enc_s[f"block{s}_{i}"] = blk_s

    dec = {f"linear_c{i}": _linear(sd, f"decoder.linear_c{i}.proj")
           for i in range(1, 5)}
    dec["linear_fuse"] = {"kernel": jnp.asarray(
        _np(sd["decoder.linear_fuse.conv.weight"]).transpose(2, 3, 1, 0))}
    bn_p, bn_s = _bn(sd, "decoder.linear_fuse.bn")
    dec["bn"] = bn_p
    dec["linear_pred"] = _conv(sd, "decoder.linear_pred")
    return ({"encoder": enc, "decoder": dec},
            {"encoder": enc_s, "decoder": {"bn": bn_s}})


@pytest.fixture(scope="module")
def ref_cmt_mod():
    _install_timm_stub()
    return _load_reference("ref_cmt", f"{REFERENCE_ROOT}/model/cmt.py")


def test_cmt_s_logits_parity(ref_cmt_mod):
    """Ported-weight flax CMT_S (cmt_xs encoder + SegFormerHead) ==
    reference torch CMT_S @96² (eval, fp32: symmetric-padded GELU+BN stem,
    2x2 patch embeds, LPU residual, SR attention with learned relative-pos
    bias, inverted-residual MixFFN; reference cmt.py:316-324, 440-458)."""
    torch.manual_seed(3)
    tmodel = ref_cmt_mod.CMT_S(image_size=[96, 96], in_channels=3,
                               num_classes=4)
    tmodel.eval()
    x = np.random.default_rng(7).normal(size=(2, 3, 96, 96)).astype(
        np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    from hpfg_tpu.models.cmt import CMTSeg
    params, stats = port_cmt_weights(tmodel.state_dict(),
                                     depths=(3, 3, 12, 3))
    model = CMTSeg(image_size=(96, 96), in_channels=3, num_classes=4,
                   dtype=jnp.float32)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-3, rtol=1e-3)


def test_cmt_plus_full_forward_parity(ref_cmt_mod):
    """CMT_Plus (cmt_tiny encoder; logits + DenseCL necks on the last stage
    feature and the logits map) parity (reference cmt.py:461-477)."""
    torch.manual_seed(5)
    tmodel = ref_cmt_mod.CMT_Plus(image_size=[96, 96], in_channels=3,
                                  num_classes=4)
    tmodel.eval()
    x = np.random.default_rng(11).normal(size=(1, 3, 96, 96)).astype(
        np.float32)
    with torch.no_grad():
        t_out, (t_g_high, t_d_high), (t_g_head, t_d_head) = tmodel(
            torch.from_numpy(x))

    from hpfg_tpu.models.cmt import CMTPlus
    sd = tmodel.state_dict()
    params, stats = port_cmt_weights(sd, depths=(2, 2, 10, 2))
    params["dense_projection_high"] = _neck(sd, "dense_projection_high")
    params["dense_projection_head"] = _neck(sd, "dense_projection_head")
    model = CMTPlus(image_size=(96, 96), in_channels=3, num_classes=4,
                    dtype=jnp.float32)
    out, (g_high, d_high), (g_head, d_head) = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               t_out.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_high), t_g_high.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_head), t_g_head.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_high).transpose(0, 2, 1),
                               t_d_high.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_head).transpose(0, 2, 1),
                               t_d_head.numpy(), atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# UniFormer_Plus (reference model/uniformer.py:202-527) — ccnet_uniformer
# ---------------------------------------------------------------------------

def port_uniformer_weights(sd, depth=(3, 4, 8, 3)) -> tuple[dict, dict]:
    """Reference Uniformer_Plus state_dict → (params, batch_stats).

    Name map (reference uniformer.py:202-331): patch_embed{s}.{proj,norm} →
    patch_embed{s}/patch_norm{s}; blocks{s}.{i} → block{s}_{i} with CBlock
    (stages 1-2: pos_embed, BN norms, conv1/attn/conv2 convs, CMlp 1x1 fc1/
    fc2 → mlp_fc1/mlp_fc2) and SABlock (stages 3-4: LN norms, attn.qkv/
    attn.proj → qkv/proj, Linear fc1/fc2); stage-end BatchNorm norm{s};
    SegFormerHead decoder + DenseCL necks as in port_cmt_weights."""
    enc, enc_s = {}, {}
    for s in range(1, 5):
        enc[f"patch_embed{s}"] = _conv(sd, f"encoder.patch_embed{s}.proj")
        enc[f"patch_norm{s}"] = _ln(sd, f"encoder.patch_embed{s}.norm")
        for i in range(depth[s - 1]):
            pre = f"encoder.blocks{s}.{i}"
            blk = {"pos_embed": _conv(sd, f"{pre}.pos_embed")}
            if s <= 2:
                n1_p, n1_s = _bn(sd, f"{pre}.norm1")
                n2_p, n2_s = _bn(sd, f"{pre}.norm2")
                blk.update(norm1=n1_p, norm2=n2_p,
                           conv1=_conv(sd, f"{pre}.conv1"),
                           attn=_conv(sd, f"{pre}.attn"),
                           conv2=_conv(sd, f"{pre}.conv2"),
                           mlp_fc1=_conv(sd, f"{pre}.mlp.fc1"),
                           mlp_fc2=_conv(sd, f"{pre}.mlp.fc2"))
                enc_s[f"block{s}_{i}"] = {"norm1": n1_s, "norm2": n2_s}
            else:
                blk.update(norm1=_ln(sd, f"{pre}.norm1"),
                           norm2=_ln(sd, f"{pre}.norm2"),
                           qkv=_linear(sd, f"{pre}.attn.qkv"),
                           proj=_linear(sd, f"{pre}.attn.proj"),
                           mlp_fc1=_linear(sd, f"{pre}.mlp.fc1"),
                           mlp_fc2=_linear(sd, f"{pre}.mlp.fc2"))
            enc[f"block{s}_{i}"] = blk
        sn_p, sn_s = _bn(sd, f"encoder.norm{s}")
        enc[f"norm{s}"] = sn_p
        enc_s[f"norm{s}"] = sn_s

    dec = {f"linear_c{i}": _linear(sd, f"decoder.linear_c{i}.proj")
           for i in range(1, 5)}
    dec["linear_fuse"] = {"kernel": jnp.asarray(
        _np(sd["decoder.linear_fuse.conv.weight"]).transpose(2, 3, 1, 0))}
    bn_p, bn_s = _bn(sd, "decoder.linear_fuse.bn")
    dec["bn"] = bn_p
    dec["linear_pred"] = _conv(sd, "decoder.linear_pred")
    return ({"encoder": enc, "decoder": dec},
            {"encoder": enc_s, "decoder": {"bn": bn_s}})


def test_uniformer_plus_full_forward_parity():
    """Ported-weight flax UniformerPlus == reference torch Uniformer_Plus
    @96² (eval, fp32: uniformer_small — conv blocks in stages 1-2, global
    attention in 3-4, stage-end BatchNorms — + SegFormerHead + both DenseCL
    necks; reference uniformer.py:332-338, 508-527)."""
    _install_timm_stub()
    ref_uf = _load_reference("ref_uniformer",
                             f"{REFERENCE_ROOT}/model/uniformer.py")
    from hpfg_tpu.models.uniformer import UniformerPlus

    torch.manual_seed(19)
    tmodel = ref_uf.Uniformer_Plus(image_size=[96, 96], in_channels=3,
                                   num_classes=4)
    tmodel.eval()
    x = np.random.default_rng(29).normal(size=(1, 3, 96, 96)).astype(
        np.float32)
    with torch.no_grad():
        t_out, (t_g_high, t_d_high), (t_g_head, t_d_head) = tmodel(
            torch.from_numpy(x))

    sd = tmodel.state_dict()
    params, stats = port_uniformer_weights(sd)
    params["dense_projection_high"] = _neck(sd, "dense_projection_high")
    params["dense_projection_head"] = _neck(sd, "dense_projection_head")
    model = UniformerPlus(img_size=96, in_channels=3, num_classes=4,
                          dtype=jnp.float32)
    out, (g_high, d_high), (g_head, d_head) = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               t_out.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_high), t_g_high.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_head), t_g_head.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_high).transpose(0, 2, 1),
                               t_d_high.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_head).transpose(0, 2, 1),
                               t_d_head.numpy(), atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# SS-Net (reference model/ss_net.py:116-169) — ssnet algorithm's model
# ---------------------------------------------------------------------------

def _mlp_head(sd, prefix):
    """torch Sequential(Linear, BatchNorm1d, act, Linear) → our MLPHead
    {Dense_0, BatchNorm_0, Dense_1} (+ stats)."""
    bn_p, bn_s = _bn(sd, f"{prefix}.1")
    return ({"Dense_0": _linear(sd, f"{prefix}.0"), "BatchNorm_0": bn_p,
             "Dense_1": _linear(sd, f"{prefix}.3")},
            {"BatchNorm_0": bn_s})


def port_ssnet_weights(sd, num_classes=4) -> tuple[dict, dict]:
    """Reference SSNet state_dict → (params, batch_stats): UNet-style
    encoder/decoder (ss_net.py:58-114, same ConvBlock scheme as unet.py)
    plus projection/prediction heads and the per-class selector MLPs
    (ss_net.py:129-158)."""
    params, stats = {"encoder": {}, "decoder": {}}, \
                    {"encoder": {}, "decoder": {}}
    p, s = _conv_block(sd, "encoder.in_conv.conv_conv")
    params["encoder"]["in_conv"], stats["encoder"]["in_conv"] = p, s
    for i in range(1, 5):
        p, s = _conv_block(sd, f"encoder.down{i}.maxpool_conv.1.conv_conv")
        params["encoder"][f"down{i}"] = {"conv": p}
        stats["encoder"][f"down{i}"] = {"conv": s}
    for i in range(1, 5):
        p, s = _conv_block(sd, f"decoder.up{i}.conv.conv_conv")
        params["decoder"][f"up{i}"] = {
            "conv1x1": _conv(sd, f"decoder.up{i}.conv1x1"), "conv": p}
        stats["decoder"][f"up{i}"] = {"conv": s}
    params["decoder"]["out_conv"] = _conv(sd, "decoder.out_conv")
    for head in ("projection_head", "prediction_head"):
        params[head], stats[head] = _mlp_head(sd, head)
    for c in range(num_classes):
        for tag in (f"contrastive_class_selector_{c}",
                    f"contrastive_class_selector_memory{c}"):
            params[tag], stats[tag] = _mlp_head(sd, tag)
    return params, stats


def test_ssnet_full_parity(fixed_input):
    """Ported-weight flax SSNet == reference torch SSNet (eval, fp32):
    (logits, last-feature) pair plus the projection → prediction head chain
    and one per-class selector of each family on real feature rows
    (reference ss_net.py:116-169)."""
    ref_ss = _load_reference("ref_ssnet", f"{REFERENCE_ROOT}/model/ss_net.py")
    from hpfg_tpu.models.ssnet import SSNet

    torch.manual_seed(23)
    tmodel = ref_ss.SSNet(in_channels=1, num_classes=4)
    tmodel.eval()
    x = fixed_input
    with torch.no_grad():
        t_out, t_feat = tmodel(torch.from_numpy(x))
        t_rows = t_feat.permute(0, 2, 3, 1).reshape(-1, 16)[:64]
        t_proj = tmodel.forward_projection_head(t_rows)
        t_pred = tmodel.forward_prediction_head(t_proj)
        t_sel = tmodel.contrastive_class_selector_1(t_pred)
        t_sel_mem = tmodel.contrastive_class_selector_memory2(t_pred)

    params, stats = port_ssnet_weights(tmodel.state_dict())
    model = SSNet(in_channels=1, num_classes=4, dtype=jnp.float32)
    variables = {"params": params, "batch_stats": stats}
    out, feat = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                            train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               t_out.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(feat).transpose(0, 3, 1, 2), t_feat.numpy(),
        atol=1e-4, rtol=1e-3)

    rows = np.asarray(feat).reshape(-1, 16)[:64]
    proj = model.apply(variables, jnp.asarray(rows), False,
                       method="project")
    pred = model.apply(variables, proj, False, method="predict")
    sel = model.apply(variables, 1, pred, False, method="select")
    sel_mem = model.apply(variables, 2, pred, False, method="select_memory")
    np.testing.assert_allclose(np.asarray(proj), t_proj.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pred), t_pred.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sel), t_sel.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sel_mem), t_sel_mem.numpy(),
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# UNet_Large (reference model/unet_large.py:62-97) — builder 'unet_large'
# ---------------------------------------------------------------------------

def port_unet_large_weights(sd) -> tuple[dict, dict]:
    """Reference UNet_Large state_dict → (params, batch_stats): Sequential
    DoubleConv indices {0,1,4,5} → {conv1,bn1,conv2,bn2}; Down = maxpool +
    DoubleConv at .1; Up's DoubleConv at .conv; OutConv at .0."""
    params, stats = {}, {}

    def dc(prefix):
        bn1_p, bn1_s = _bn(sd, f"{prefix}.1")
        bn2_p, bn2_s = _bn(sd, f"{prefix}.5")
        return ({"conv1": _conv_nobias(sd, f"{prefix}.0"), "bn1": bn1_p,
                 "conv2": _conv_nobias(sd, f"{prefix}.4"), "bn2": bn2_p},
                {"bn1": bn1_s, "bn2": bn2_s})

    params["in_conv"], stats["in_conv"] = dc("in_conv")
    for i in range(1, 5):
        params[f"down{i}"], stats[f"down{i}"] = dc(f"down{i}.1")
    for i in range(1, 5):
        params[f"up{i}"], stats[f"up{i}"] = dc(f"up{i}.conv")
    params["out_conv"] = _conv(sd, "out_conv.0")
    return params, stats


def test_unet_large_logits_parity(fixed_input):
    """Ported-weight flax UNetLarge == reference torch UNet_Large (eval,
    fp32: bias-free ReLU DoubleConvs, factor-2 bottleneck, align-corners
    bilinear up path without 1x1 convs, mid=concat//2 reductions, 1x1
    head; reference model/unet_large.py:62-97, base_c=32)."""
    ref_ul = _load_reference("ref_unet_large",
                             f"{REFERENCE_ROOT}/model/unet_large.py")
    from hpfg_tpu.models.unet import UNetLarge

    torch.manual_seed(29)
    tmodel = ref_ul.UNet_Large(in_channels=1, num_classes=4, base_c=32)
    tmodel.eval()
    x = fixed_input
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    params, stats = port_unet_large_weights(tmodel.state_dict())
    model = UNetLarge(in_channels=1, num_classes=4, base_c=32,
                      dtype=jnp.float32)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Swin-MAE (reference model/swin_mae.py:560-810) — MAE pretraining model
# ---------------------------------------------------------------------------

def port_swin_mae_weights(sd, depths=(2, 2, 2, 2)) -> dict:
    """Reference SwinMAE state_dict → models.swin_mae.SwinMAE params
    (LN only, no batch stats). Same per-block scheme as
    port_swinunet_weights but without the encoder./decoder. prefixes
    and with mask_token + decoder_pred (swin_mae.py:590-600)."""
    n = len(depths)
    p = {"patch_embed": {"proj": _conv(sd, "patch_embed.proj"),
                         "norm": _ln(sd, "patch_embed.norm")},
         "mask_token": jnp.asarray(_np(sd["mask_token"])),
         "first_patch_expanding": {
             "expand": _dense_nobias(sd, "first_patch_expanding.expand"),
             "norm": _ln(sd, "first_patch_expanding.norm")},
         "norm_up": _ln(sd, "norm_up"),
         "decoder_pred": _linear(sd, "decoder_pred")}
    for i in range(n):
        layer = {f"block{j}": _swin_block(sd, f"layers.{i}.blocks.{j}")
                 for j in range(depths[i])}
        if i != n - 1:
            layer["downsample"] = {
                "norm": _ln(sd, f"layers.{i}.downsample.norm"),
                "reduction": _dense_nobias(
                    sd, f"layers.{i}.downsample.reduction")}
        p[f"layer{i}"] = layer
    for i in range(n - 1):
        depth_up = depths[n - i - 2]
        layer = {f"block{j}": _swin_block(sd, f"layers_up.{i}.blocks.{j}")
                 for j in range(depth_up)}
        if i < n - 2:
            layer["upsample"] = {
                "expand": _dense_nobias(sd, f"layers_up.{i}.upsample.expand"),
                "norm": _ln(sd, f"layers_up.{i}.upsample.norm")}
        p[f"layer_up{i}"] = layer
    return p


def test_swin_mae_reconstruction_parity():
    """Ported-weight flax SwinMAE == reference torch SwinMAE @224² with
    mask_ratio=0 (the only deterministic masking setting — keep-all), eval
    fp32: patch embed, 4 swin stages, patch-expand decoder, linear
    per-patch prediction, unpatchify (reference swin_mae.py:803-810)."""
    ref_sm = _load_reference("ref_swin_mae",
                             f"{REFERENCE_ROOT}/model/swin_mae.py")
    from hpfg_tpu.models.swin_mae import SwinMAE

    # the reference uses the np.int/np.float aliases numpy>=1.24 removed
    # (swin_mae.py window_masking / sincos table); restore them briefly
    restored = [a for a in ("int", "float") if not hasattr(np, a)]
    for a in restored:
        setattr(np, a, {"int": int, "float": float}[a])
    try:
        torch.manual_seed(31)
        tmodel = ref_sm.swin_mae(in_channels=3, mask_ratio=0.0)
        tmodel.eval()
        x = np.random.default_rng(37).normal(size=(1, 3, 224, 224)).astype(
            np.float32)
        with torch.no_grad():
            t_pred, t_mask = tmodel(torch.from_numpy(x))
    finally:
        for a in restored:
            if hasattr(np, a):
                delattr(np, a)

    params = port_swin_mae_weights(tmodel.state_dict())
    model = SwinMAE(in_channels=3, mask_ratio=0.0, dtype=jnp.float32)
    pred, mask = model.apply({"params": params},
                             jnp.asarray(x.transpose(0, 2, 3, 1)),
                             train=False)
    assert float(jnp.abs(mask).max()) == 0.0 and float(
        t_mask.abs().max()) == 0.0
    np.testing.assert_allclose(np.asarray(pred).transpose(0, 3, 1, 2),
                               t_pred.numpy(), atol=2e-3, rtol=1e-3)
