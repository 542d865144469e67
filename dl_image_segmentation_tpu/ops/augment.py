"""On-device batch augmentation for segmentation pairs.

The reference sketches augmentation with Keras preprocessing layers
(RandomFlip / RandomRotation / custom RandomInvert,
/root/reference/parse_tfrecords.ipynb cells 47-56) applied on the host.
Here augmentation is a pure jittable function over device batches, so
it fuses into the input pipeline's device step and costs no host time.

Geometric ops are restricted to the dihedral group (flips + 90-degree
rotations): exact, label-safe (no interpolation through class ids),
and XLA-friendly (static shapes, no gather-heavy warps).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("hflip", "vflip", "rot90",
                                             "invert_prob", "brightness",
                                             "contrast"))
def augment_pairs(key: jax.Array, images: jnp.ndarray, labels: jnp.ndarray,
                  hflip: bool = True, vflip: bool = True, rot90: bool = True,
                  invert_prob: float = 0.0, brightness: float = 0.0,
                  contrast: float = 0.0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random dihedral + photometric augmentation; geometric ops are
    applied identically to image and label, photometric ops to the
    image only. images: (N, H, W, C) float; labels: (N, H, W) any
    dtype.

    Photometric knobs (the reference's Keras-preprocessing sketch:
    RandomInvert plus the RandomBrightness/RandomContrast family,
    parse_tfrecords.ipynb cells 50-56), all per-example:

    * ``invert_prob``: probability of value inversion (images only),
      assumes images scaled to [0, 1].
    * ``brightness``: additive jitter delta ~ U(-b, +b) on the [0, 1]
      scale, output clipped to [0, 1] (Keras RandomBrightness
      semantics; meaningful for [0, 1]-normalized feeds).
    * ``contrast``: multiplicative jitter around the per-example
      per-channel mean, factor ~ U(1-c, 1+c) (Keras RandomContrast
      semantics; scale-invariant, safe for raw-DN float feeds too).
    """
    n = images.shape[0]
    k_h, k_v, k_r, k_i, k_b, k_c = jax.random.split(key, 6)

    def sel(mask, a, b):
        return jnp.where(mask[:, None, None, None], a, b)

    if hflip:
        m = jax.random.bernoulli(k_h, 0.5, (n,))
        images = sel(m, images[:, :, ::-1, :], images)
        labels = jnp.where(m[:, None, None], labels[:, :, ::-1], labels)
    if vflip:
        m = jax.random.bernoulli(k_v, 0.5, (n,))
        images = sel(m, images[:, ::-1, :, :], images)
        labels = jnp.where(m[:, None, None], labels[:, ::-1, :], labels)
    if rot90:
        if images.shape[1] != images.shape[2]:
            raise ValueError(
                f"rot90 augmentation needs square tiles, got "
                f"{images.shape[1]}x{images.shape[2]}; pass rot90=False "
                "for rectangular chips (the 90/270-degree variants "
                "would change the shape)")
        k = jax.random.randint(k_r, (n,), 0, 4)
        rots_i = jnp.stack([images,
                            jnp.rot90(images, 1, axes=(1, 2)),
                            jnp.rot90(images, 2, axes=(1, 2)),
                            jnp.rot90(images, 3, axes=(1, 2))])
        rots_l = jnp.stack([labels,
                            jnp.rot90(labels, 1, axes=(1, 2)),
                            jnp.rot90(labels, 2, axes=(1, 2)),
                            jnp.rot90(labels, 3, axes=(1, 2))])
        images = jnp.take_along_axis(
            rots_i, k[None, :, None, None, None], axis=0)[0]
        labels = jnp.take_along_axis(
            rots_l, k[None, :, None, None], axis=0)[0]
    if invert_prob > 0:
        m = jax.random.bernoulli(k_i, invert_prob, (n,))
        images = sel(m, 1.0 - images, images)
    if contrast > 0:
        f = jax.random.uniform(k_c, (n, 1, 1, 1),
                               minval=1.0 - contrast,
                               maxval=1.0 + contrast)
        mean = jnp.mean(images, axis=(1, 2), keepdims=True)
        images = mean + (images - mean) * f
    if brightness > 0:
        d = jax.random.uniform(k_b, (n, 1, 1, 1),
                               minval=-brightness, maxval=brightness)
        images = jnp.clip(images + d, 0.0, 1.0)
    return images, labels


@jax.jit
def normalize(images: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray
              ) -> jnp.ndarray:
    """(x - mean) / std per channel, in bfloat16-friendly float32."""
    return (images - mean) / std


def _rotate_one(img: jnp.ndarray, angle: jnp.ndarray, order: int,
                cval: float) -> jnp.ndarray:
    """Rotate (H, W[, C]) about the centre by ``angle`` radians using
    map_coordinates (order 1 for imagery, 0 for label ids)."""
    from jax.scipy.ndimage import map_coordinates
    h, w = img.shape[0], img.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    sy = cy + (yy - cy) * ca - (xx - cx) * sa
    sx = cx + (yy - cy) * sa + (xx - cx) * ca
    if img.ndim == 2:
        return map_coordinates(img, [sy, sx], order=order, cval=cval)
    chans = [map_coordinates(img[..., c], [sy, sx], order=order, cval=cval)
             for c in range(img.shape[-1])]
    return jnp.stack(chans, axis=-1)


@functools.partial(jax.jit, static_argnames=("max_degrees", "fill_label"))
def random_rotate_pairs(key: jax.Array, images: jnp.ndarray,
                        labels: jnp.ndarray, max_degrees: float = 180.0,
                        fill_label: int = 255
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Arbitrary-angle rotation augmentation (the reference's scipy
    rotation / Keras RandomRotation sketches, parse nb cells 47-56),
    fully on device: bilinear for images, nearest for labels, exposed
    corners filled with 0 / the label nodata value so the loss mask
    ignores them."""
    n = images.shape[0]
    angles = jax.random.uniform(key, (n,), minval=-1.0, maxval=1.0) \
        * (max_degrees * jnp.pi / 180.0)
    rot_i = jax.vmap(lambda im, a: _rotate_one(im, a, 1, 0.0))(
        images, angles)
    rot_l = jax.vmap(lambda lb, a: _rotate_one(
        lb.astype(jnp.float32), a, 0, float(fill_label)))(labels, angles)
    return rot_i, rot_l.astype(labels.dtype)


def random_invert_pairs(key: jax.Array, images: jnp.ndarray,
                        labels: jnp.ndarray, prob: float = 0.5,
                        max_value: float = 1.0
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-example random intensity inversion (the reference's custom
    Keras RandomInvert layer, parse_tfrecords.ipynb cells 50-56), on
    device. Labels pass through unchanged. ``max_value`` is the
    intensity ceiling (1.0 for [0,1]-scaled feeds, 255 for raw uint8
    ranges)."""
    n = images.shape[0]
    flip = jax.random.uniform(key, (n,)) < prob
    inverted = max_value - images
    out = jnp.where(flip[:, None, None, None], inverted, images)
    return out, labels
