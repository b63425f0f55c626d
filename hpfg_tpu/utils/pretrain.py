"""Swin-MAE → SwinUNet encoder weight transfer.

The reference ships a fine-tunable SwinUnet INSIDE the MAE file
(reference model/swin_mae.py:440-557) whose encoder modules are the same
classes as the MAE encoder, and every entry script reserves a
``pretrain_save_path`` (sup_ACDC.py:37, 2022_12_CVPR_Swin-MAE.py:43) — but
the load itself is dead code (nothing ever reads the path). Here the
transfer is a real, tested utility: copy the MAE encoder subtrees
(``patch_embed`` + ``layer{i}``) into a SwinUNet-family params tree by
matching paths/shapes.

Depth mismatch is handled the natural way: SwinMAE pretrains with depths
(2, 2, 2, 2) while SwinUNet defaults to (2, 2, 6, 2) — blocks that exist in
both (by name and shape) transfer; the rest keep their fresh initialization.
The returned report makes the transfer auditable.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: tuple = ()) -> dict[tuple, Any]:
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
        return out
    return {prefix: tree}


def _set_path(tree: dict, path: tuple, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


_ENCODER_SUBTREES = ("patch_embed",)  # + layer{i} via prefix match


def transfer_mae_encoder(mae_params: Any, swinunet_params: Any):
    """Copy SwinMAE encoder weights into a SwinUNet params tree.

    mae_params:      SwinMAE "params" collection (top-level keys
                     ``patch_embed``, ``layer0..3``, decoder keys ignored)
    swinunet_params: SwinUNet/SwinUNetPlus "params" collection (encoder under
                     ``encoder``)

    Returns (new_params, report) where report = {"transferred": [...],
    "skipped_shape": [...], "missing_target": [...]} with dotted paths.
    """
    import jax

    def is_encoder_key(key: str) -> bool:
        return key in _ENCODER_SUBTREES or (
            key.startswith("layer") and not key.startswith("layer_up"))

    src = {p: v for p, v in _flatten(mae_params).items()
           if is_encoder_key(p[0])}
    new_params = jax.tree_util.tree_map(lambda x: x, swinunet_params)  # copy
    if not isinstance(new_params, dict):
        new_params = dict(new_params)
    tgt_flat = _flatten(new_params.get("encoder", {}))

    report = {"transferred": [], "skipped_shape": [], "missing_target": []}
    for path, value in sorted(src.items()):
        dotted = ".".join(path)
        if path not in tgt_flat:
            report["missing_target"].append(dotted)
            continue
        tgt = tgt_flat[path]
        if tuple(np.shape(value)) != tuple(np.shape(tgt)):
            report["skipped_shape"].append(dotted)
            continue
        _set_path(new_params["encoder"], path,
                  jnp.asarray(value, dtype=jnp.asarray(tgt).dtype))
        report["transferred"].append(dotted)
    return new_params, report


def extract_mae_params(saved: Any) -> Any:
    """Pull the SwinMAE params collection out of a restored object: accepts a
    raw params dict, a {"params": ...} variables dict, or a saved SwinMAE
    train-state pytree ({"model": {"params": ...}, ...})."""
    if hasattr(saved, "model"):  # live state pytree
        return saved.model.params
    if isinstance(saved, dict):
        if "model" in saved and isinstance(saved["model"], dict) \
                and "params" in saved["model"]:
            return saved["model"]["params"]
        if "params" in saved:
            return saved["params"]
    return saved


def load_pretrained_encoder(ckpt_dir: str, swinunet_params: Any,
                            tag: str = "last"):
    """Restore a Swin-MAE checkpoint and transfer its encoder into
    ``swinunet_params``. ``ckpt_dir`` is the CheckpointManager directory of
    the pretraining run (config key ``pretrain_ckpt``)."""
    from hpfg_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(ckpt_dir)
    saved = ckpt.restore(tag)
    return transfer_mae_encoder(extract_mae_params(saved), swinunet_params)
