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
