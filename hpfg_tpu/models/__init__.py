"""Model zoo registry (reference: model/builder.py:14-62).

`build_model(cfg)` maps the same registry strings the reference accepts
(unet, unet_plus, unet_large, unet_lidc, swinunet, swinunet_plus,
swinunet_lidc, transunet, transunet_lidc, segformer, segformer_plus, cmt,
cmt_plus, uniformer_plus, ssnet, swinmae) to Flax modules.

Output conventions (same as the reference, model/builder.py docnotes):
  * plain models: __call__(x, train) -> logits [B, H, W, C]
  * *_plus models: __call__ -> (logits, (g_high, d_high), (g_head, d_head)),
    with a `.val(x)` method returning logits only
  * ssnet: (logits, last_feature) plus projection/prediction/selector heads
  * swinmae: (reconstruction, mask)
"""

from __future__ import annotations

import jax.numpy as jnp

from hpfg_tpu.registry import Registry
from hpfg_tpu.models.unet import UNet, UNetLIDC, UNetLarge, UNetPlus

MODELS = Registry("model")

#: registry names whose __call__ returns the *_plus 3-tuple
#: (logits, (g_high, d_high), (g_head, d_head)) that feature-contrastive
#: algorithms (hpfg/ccnet) unpack (reference main.py:160 `ema_output,
#: ema_h1, ema_h2 = ema_model(...)`)
FEATURE_MODELS = frozenset({
    "unet_plus", "swinunet_plus", "segformer_plus", "cmt_plus",
    "uniformer_plus",
})


def returns_features(name: str) -> bool:
    """True when the registry model returns (logits, h1, h2)."""
    return str(name).lower() in FEATURE_MODELS

MODELS.register("unet")(UNet)
MODELS.register("unet_plus")(UNetPlus)
MODELS.register("unet_large")(UNetLarge)
MODELS.register("unet_lidc")(UNetLIDC)


def _image_size(cfg) -> int:
    size = cfg.get("train_crop_size", 224)
    if isinstance(size, (list, tuple)):
        return int(size[0])
    return int(size)


def build_model(cfg, dtype=jnp.float32):
    """Instantiate a model module from a config block
    (reference build_model, model/builder.py:14-62).

    ``cfg`` is either the top-level config or a model1:/model2: sub-block with
    keys: model, in_channels, num_classes (+ train_crop_size for
    size-dependent transformers, mask_ratio for swinmae).
    """
    name = str(cfg.model).lower()
    in_channels = int(cfg.get("in_channels", 1))
    num_classes = int(cfg.get("num_classes", 4))

    if name in ("unet", "unet_plus", "unet_lidc"):
        kwargs = {}
        # test/bench hooks: scale the network down/up from config
        if "feature_chns" in cfg:
            kwargs["feature_chns"] = tuple(cfg.feature_chns)
        if "dropout" in cfg and not isinstance(cfg.get("dropout"), (int, float)):
            kwargs["dropout"] = tuple(cfg.dropout)
        return MODELS.get(name)(in_channels=in_channels,
                                num_classes=num_classes, dtype=dtype, **kwargs)
    if name == "unet_large":
        # base_c=32 (model/unet_large.py); base_c=64 reproduces the
        # unregistered unet_large_LIDC variant (model/unet_large_LIDC.py)
        return UNetLarge(in_channels=in_channels, num_classes=num_classes,
                         base_c=int(cfg.get("base_c", 32)), dtype=dtype)
    if name in ("swinunet", "swinunet_plus", "swinunet_lidc"):
        from hpfg_tpu.models.swinunet import build_swinunet

        return build_swinunet(name, img_size=_image_size(cfg),
                              in_channels=in_channels,
                              num_classes=num_classes, dtype=dtype)
    if name in ("segformer", "segformer_plus"):
        from hpfg_tpu.models.segformer import build_segformer

        return build_segformer(name, img_size=_image_size(cfg),
                               in_channels=in_channels,
                               num_classes=num_classes, dtype=dtype)
    if name in ("transunet", "transunet_lidc"):
        from hpfg_tpu.models.transunet import build_transunet

        return build_transunet(name, img_size=_image_size(cfg),
                               in_channels=in_channels,
                               num_classes=num_classes, dtype=dtype)
    if name in ("cmt", "cmt_plus"):
        from hpfg_tpu.models.cmt import build_cmt

        return build_cmt(name, img_size=_image_size(cfg),
                         in_channels=in_channels,
                         num_classes=num_classes, dtype=dtype)
    if name == "uniformer_plus":
        from hpfg_tpu.models.uniformer import UniformerPlus

        return UniformerPlus(img_size=_image_size(cfg),
                             in_channels=in_channels,
                             num_classes=num_classes, dtype=dtype)
    if name in ("resunet", "resunet_plusplus", "resunetplusplus"):
        # shipped-but-unregistered in the reference (model/resunet.py,
        # model/resunet_plus.py); registered here for completeness
        from hpfg_tpu.models.resunet import ResUNet, ResUNetPlusPlus

        cls = ResUNet if name == "resunet" else ResUNetPlusPlus
        return cls(in_channels=in_channels, num_classes=num_classes,
                   dtype=dtype)
    if name == "uctransnet":
        from hpfg_tpu.models.uctransnet import UCTransNet

        return UCTransNet(img_size=_image_size(cfg), in_channels=in_channels,
                          num_classes=num_classes, dtype=dtype)
    if name == "ssnet":
        from hpfg_tpu.models.ssnet import SSNet

        return SSNet(in_channels=in_channels, num_classes=num_classes,
                     dtype=dtype)
    if name == "swinmae":
        from hpfg_tpu.models.swin_mae import SwinMAE

        kwargs = {}
        # test/dryrun hooks: scale the geometry down from config (same
        # pattern as unet's feature_chns hook above)
        for key in ("window_size", "embed_dim", "decoder_embed_dim"):
            if key in cfg:
                kwargs[key] = int(cfg[key])
        if "num_heads" in cfg:
            kwargs["num_heads"] = tuple(cfg.num_heads)
        import jax as _jax

        return SwinMAE(in_channels=in_channels, img_size=_image_size(cfg),
                       mask_ratio=float(cfg.get("mask_ratio", 0.75)),
                       use_pallas=_jax.default_backend() not in ("cpu",),
                       dtype=dtype, **kwargs)
    raise NotImplementedError(f"unknown model {name!r}")
