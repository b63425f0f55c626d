"""On-device batched augmentation (TPU replacement for the host-side
RandomGenerator, reference datasets/utils.py:99-117).

The reference augments every sample on CPU worker processes with scipy
(rot90/flip or ±20° nearest rotation, then nearest zoom). Here the loader only
delivers fixed-size raw batches (one cached nearest resize per sample) and the
random geometry runs as ONE jitted device program over the whole batch:

  * with p=0.5: k·90° rotation + random axis flip,
  * else with p=0.5: ±20° nearest-neighbor rotation about the center,
  * else: identity

— per sample, driven by a jax.random key. Rotation is a nearest-neighbor
gather with a traced angle (static shapes); rot90/flip are lax.switch over
four static layouts. Images and masks share the same geometry; masks stay
integer (order-0 everywhere, matching the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rot90_k(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """jnp.rot90 with a traced k in 0..3 (H == W required)."""
    return jax.lax.switch(k, [
        lambda x: x,
        lambda x: jnp.rot90(x, 1),
        lambda x: jnp.rot90(x, 2),
        lambda x: jnp.rot90(x, 3),
    ], img)


def _flip_axis(img: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.cond(axis == 0,
                        lambda x: jnp.flip(x, axis=0),
                        lambda x: jnp.flip(x, axis=1), img)


def _rotate_nearest(img: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor rotation about the center, constant-0 fill
    (scipy.ndimage.rotate(order=0, reshape=False) equivalent,
    reference datasets/utils.py:86-90)."""
    h, w = img.shape[0], img.shape[1]
    theta = jnp.deg2rad(angle_deg.astype(jnp.float32))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # inverse map: output (y, x) samples input (y', x')
    src_y = cos * ys - sin * xs + cy
    src_x = sin * ys + cos * xs + cx
    yi = jnp.round(src_y).astype(jnp.int32)
    xi = jnp.round(src_x).astype(jnp.int32)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    out = img[yi, xi]
    mask = valid if img.ndim == 2 else valid[..., None]
    return jnp.where(mask, out, jnp.zeros_like(out))


def _augment_one(key: jax.Array, image: jnp.ndarray, mask: jnp.ndarray):
    """image [H, W, C] float, mask [H, W] int — reference RandomGenerator
    branch structure (datasets/utils.py:103-106)."""
    k_p1, k_p2, k_rot, k_flip, k_angle = jax.random.split(key, 5)
    p1 = jax.random.uniform(k_p1)
    p2 = jax.random.uniform(k_p2)
    k = jax.random.randint(k_rot, (), 0, 4)
    axis = jax.random.randint(k_flip, (), 0, 2)
    angle = jax.random.randint(k_angle, (), -20, 20)

    def rot_flip(args):
        img, msk = args
        img = _flip_axis(_rot90_k(img, k), axis)
        msk = _flip_axis(_rot90_k(msk, k), axis)
        return img, msk

    def maybe_rotate(args):
        img, msk = args

        def rotate(a):
            i, m = a
            return (_rotate_nearest(i, angle),
                    _rotate_nearest(m, angle))

        return jax.lax.cond(p2 > 0.5, rotate, lambda a: a, (img, msk))

    return jax.lax.cond(p1 > 0.5, rot_flip, maybe_rotate, (image, mask))


@functools.partial(jax.jit, donate_argnums=())
def batched_random_generator(rng: jax.Array, images: jnp.ndarray,
                             masks: jnp.ndarray):
    """images [B, H, W, C], masks [B, H, W] → augmented pair (one XLA call)."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(_augment_one)(keys, images, masks)


@jax.jit
def batched_random_generator_images(rng: jax.Array, images: jnp.ndarray):
    """Unlabeled stream: same geometry, image only."""
    dummy = jnp.zeros(images.shape[:3], jnp.int32)
    out, _ = jax.vmap(_augment_one)(
        jax.random.split(rng, images.shape[0]), images, dummy)
    return out


def _rotation_index_maps(h: int, w: int, angle_deg: jnp.ndarray):
    theta = jnp.deg2rad(angle_deg.astype(jnp.float32))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_y = cos * ys - sin * xs + cy
    src_x = sin * ys + cos * xs + cx
    yi = jnp.round(src_y).astype(jnp.int32)
    xi = jnp.round(src_x).astype(jnp.int32)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    return jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1), valid


def _rot_flip_batch(images: jnp.ndarray, masks: jnp.ndarray,
                    ks: jnp.ndarray, axes: jnp.ndarray):
    """Per-sample rot90(k) + flip(axis) over a square batch WITHOUT the
    vmapped lax.switch (under vmap every rot90 branch executes for every
    sample — 4 transposed copies of the batch per stream). Decomposition:
    rot90(x, k) = maybe-transpose (k odd) then row-reverse (k in {1,2})
    then col-reverse (k in {2,3}); the subsequent flip toggles the matching
    reverse flag. ONE batch transpose + three flag-driven selects, outputs
    identical to the switch form (tests pin equality per (k, axis))."""
    kodd = (ks % 2) == 1
    rowf = ((ks == 1) | (ks == 2)) ^ (axes == 0)
    colf = ((ks == 2) | (ks == 3)) ^ (axes == 1)

    def apply(x, t, nd):
        sh = (-1,) + (1,) * nd
        x = jnp.where(kodd.reshape(sh), t, x)
        x = jnp.where(rowf.reshape(sh), x[:, ::-1], x)
        return jnp.where(colf.reshape(sh), x[:, :, ::-1], x)

    return (apply(images, jnp.swapaxes(images, 1, 2), 3),
            apply(masks, jnp.swapaxes(masks, 1, 2), 2))


def _augment_stream_fast(rng: jax.Array, images: jnp.ndarray,
                         masks: jnp.ndarray):
    """Batched RandomGenerator with a SHARED per-batch rotation angle.

    Per-sample dynamic-gather rotations under vmap cost ~37 ms for a 40-image
    call on v5e (both cond branches execute under vmap); sharing the angle
    across the batch turns the rotation into one shared-index gather.
    Per-sample branch choice / rot90 k / flip axis remain independent —
    only the rotation ANGLE is batch-shared (documented deviation from
    reference datasets/utils.py:86-90's per-sample angle).
    """
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    k_p1, k_p2, k_rot, k_flip, k_angle = jax.random.split(rng, 5)
    p1 = jax.random.uniform(k_p1, (b,))
    p2 = jax.random.uniform(k_p2, (b,))
    ks = jax.random.randint(k_rot, (b,), 0, 4)
    axes = jax.random.randint(k_flip, (b,), 0, 2)
    angle = jax.random.randint(k_angle, (), -20, 20)

    if h != w:
        # odd-k rot90 changes an HxW sample to WxH, so the per-sample switch
        # could never trace either — the device augment has always required
        # square crops (the reference resizes to a square train_crop_size
        # before augmenting, datasets/utils.py:99-117). Fail loudly.
        raise ValueError(
            f"device augmentation requires square crops, got {h}x{w}")
    rf_img, rf_msk = _rot_flip_batch(images, masks, ks, axes)

    yi, xi, valid = _rotation_index_maps(h, w, angle)
    rot_img = jnp.where(valid[None, :, :, None], images[:, yi, xi, :], 0.0)
    rot_msk = jnp.where(valid[None, :, :], masks[:, yi, xi],
                        jnp.zeros((), masks.dtype))

    use_rf = (p1 > 0.5)
    use_rot = (~use_rf) & (p2 > 0.5)
    img = jnp.where(use_rf[:, None, None, None], rf_img,
                    jnp.where(use_rot[:, None, None, None], rot_img, images))
    msk = jnp.where(use_rf[:, None, None], rf_msk,
                    jnp.where(use_rot[:, None, None], rot_msk, masks))
    return img, msk


@jax.jit
def augment_batch_dict(rng: jax.Array, counter: jnp.ndarray,
                       batch: dict) -> dict:
    """Augment every image stream of a train batch in one XLA call.

    ``counter`` folds the iteration number into the base key INSIDE the jit —
    host-side jax.random.split would be an eager device op per iteration
    (a full tunnel round-trip on this setup).

    Recognized keys: (image, label), (label_img, label),
    (label_img1, label1), unlabel_img — the batch layouts produced by the
    algorithm iterators.
    """
    out = dict(batch)
    rng = jax.random.fold_in(rng, counter)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    if "image" in batch and "label" in batch:
        out["image"], out["label"] = _augment_stream_fast(
            k1, batch["image"], batch["label"])
    if "label_img" in batch:
        out["label_img"], out["label"] = _augment_stream_fast(
            k2, batch["label_img"], batch["label"])
    if "label_img1" in batch:
        out["label_img1"], out["label1"] = _augment_stream_fast(
            k3, batch["label_img1"], batch["label1"])
    if "unlabel_img" in batch:
        dummy = jnp.zeros(batch["unlabel_img"].shape[:3], jnp.int32)
        out["unlabel_img"], _ = _augment_stream_fast(
            k4, batch["unlabel_img"], dummy)
    return out
