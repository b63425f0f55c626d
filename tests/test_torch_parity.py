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
