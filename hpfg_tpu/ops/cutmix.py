"""CutMix box-mask generation, pure JAX.

Reference: BoxMaskGenerator (utils/utils.py:98-173) generates masks with
numpy on the host every iteration ("Box masks can be generated quickly on the
CPU so do it there", utils/utils.py:117) and ships them to the device. Here
mask generation is a jit-compiled device function driven by a `jax.random`
key, so it fuses into the train step and costs no host→device transfer.

Defaults mirror the HPFG trainer's generator config (main.py:102-115):
prop_range=(0.25, 0.5), n_boxes=4, random aspect ratio, proportion by area,
within bounds, inverted masks (mask==1 inside the boxes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_masks(rng: jax.Array, n_masks: int, mask_shape: tuple[int, int],
              prop_range: tuple[float, float] = (0.25, 0.5),
              n_boxes: int = 4,
              random_aspect_ratio: bool = True,
              prop_by_area: bool = True,
              within_bounds: bool = True,
              invert: bool = True) -> jnp.ndarray:
    """Sample CutMix masks of shape [n_masks, H, W, 1] (float32 in {0, 1}).

    Overlapping boxes toggle the mask exactly like the reference's in-place
    ``m = 1 - m`` rectangle flips (utils/utils.py:170-172): a pixel covered by
    k boxes ends at parity k (invert=True starts from zeros).
    """
    h, w = mask_shape
    k_prop, k_aspect, k_pos = jax.random.split(rng, 3)
    shape = (n_masks, n_boxes)

    lo, hi = prop_range
    if prop_by_area:
        mask_props = jax.random.uniform(k_prop, shape, minval=lo, maxval=hi)
        if random_aspect_ratio:
            u = jax.random.uniform(k_aspect, shape)
            y_props = jnp.exp(u * jnp.log(jnp.maximum(mask_props, 1e-12)))
            x_props = mask_props / jnp.maximum(y_props, 1e-12)
        else:
            y_props = x_props = jnp.sqrt(mask_props)
        zero = mask_props == 0.0
        y_props = jnp.where(zero, 0.0, y_props)
        x_props = jnp.where(zero, 0.0, x_props)
    else:
        if random_aspect_ratio:
            y_props = jax.random.uniform(k_prop, shape, minval=lo, maxval=hi)
            x_props = jax.random.uniform(k_aspect, shape, minval=lo, maxval=hi)
        else:
            y_props = x_props = jax.random.uniform(k_prop, shape, minval=lo, maxval=hi)

    fac = jnp.sqrt(1.0 / n_boxes)
    y_props = y_props * fac
    x_props = x_props * fac

    sizes_y = jnp.round(y_props * h)
    sizes_x = jnp.round(x_props * w)

    ky, kx = jax.random.split(k_pos)
    if within_bounds:
        y0 = jnp.round((h - sizes_y) * jax.random.uniform(ky, shape))
        x0 = jnp.round((w - sizes_x) * jax.random.uniform(kx, shape))
        y1, x1 = y0 + sizes_y, x0 + sizes_x
    else:
        cy = jnp.round(h * jax.random.uniform(ky, shape))
        cx = jnp.round(w * jax.random.uniform(kx, shape))
        y0, y1 = cy - sizes_y * 0.5, cy + sizes_y * 0.5
        x0, x1 = cx - sizes_x * 0.5, cx + sizes_x * 0.5

    # rasterize: [N, B, H, W] indicator, then parity over boxes
    y0i = y0.astype(jnp.int32)[..., None, None]
    y1i = y1.astype(jnp.int32)[..., None, None]
    x0i = x0.astype(jnp.int32)[..., None, None]
    x1i = x1.astype(jnp.int32)[..., None, None]
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h, w), 2)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h, w), 3)
    inside = ((ys >= y0i) & (ys < y1i) & (xs >= x0i) & (xs < x1i))
    count = jnp.sum(inside.astype(jnp.int32), axis=1)  # [N, H, W]
    parity = count % 2
    mask = parity if invert else (1 - parity)
    return mask.astype(jnp.float32)[..., None]  # NHWC
