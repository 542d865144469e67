"""Device-resident data pool: the TPU-native answer to host-feed limits.

Empirically on tunneled single-chip setups (and generally when the
host is weak relative to the device), per-step host dispatches dominate
wall time even when the batch bytes are tiny. The idiomatic fix is to
keep a POOL of examples resident in HBM (uint8: a 2,000-chip 256x256
RGB pool is ~400 MB of a 16 GB chip), sample batches on device, and run
K optimizer steps per dispatch with lax.scan -- zero host round-trips
inside the scan, so the device runs at its own speed. The pool is
refreshed from the host feed between dispatches (one device_put per
refresh, amortized over K steps).

Sampling with replacement from a shuffled pool is the standard
trade-off; refresh cadence controls how quickly new data cycles in.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp


def _rank_adapted(sharding, ndim: int):
    """A NamedSharding whose spec is cut/padded to ``ndim`` axes, so
    one example-axis sharding (e.g. batch_sharding(mesh)) placed on
    both the 4-D image pool and the 3-D label pool shards each on its
    leading axis. Non-NamedShardings pass through untouched."""
    from jax.sharding import NamedSharding, PartitionSpec
    if not isinstance(sharding, NamedSharding):
        return sharding
    spec = list(sharding.spec) + [None] * ndim
    return NamedSharding(sharding.mesh, PartitionSpec(*spec[:ndim]))


class DeviceDataPool:
    """A device-resident (images uint8/float, labels int) example pool.

    images: (N, H, W, C); labels: (N, H, W). Stored in the smallest
    dtype the source provides (uint8 feeds cast to float on device).
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 sharding=None):
        def put(x):
            if sharding is None:
                return jax.device_put(x)
            return jax.device_put(x, _rank_adapted(sharding, x.ndim))

        self.images = put(images)
        self.labels = put(labels)
        jax.block_until_ready((self.images, self.labels))

    @property
    def size(self) -> int:
        return self.images.shape[0]

    @classmethod
    def from_feed(cls, batches: Iterator, n_examples: int,
                  sharding=None) -> "DeviceDataPool":
        """Fill a pool from a batch iterator (e.g. TFRecordFeed with
        ``scale="raw"`` so uint8 sources keep their dtype -- a float
        scale would cast to float32 and quadruple the pool's HBM --
        or any (imgs, lbls) source)."""
        imgs = []
        lbls = []
        have = 0
        for bi, bl in batches:
            imgs.append(bi)
            lbls.append(bl)
            have += len(bi)
            if have >= n_examples:
                break
        if not imgs:
            raise ValueError("feed produced no batches; cannot build "
                             "a device data pool")
        images = np.concatenate(imgs)[:n_examples]
        labels = np.concatenate(lbls)[:n_examples]
        return cls(images, labels, sharding=sharding)

    def refresh(self, images: np.ndarray, labels: np.ndarray,
                offset: int = 0) -> None:
        """Replace a contiguous slice of the pool with new host data
        (one H2D per call; cheap relative to a K-step scan)."""
        n = len(images)
        if n > self.size:
            raise ValueError(
                f"refresh batch ({n} examples) larger than the pool "
                f"({self.size}); use a pool at least one refresh batch "
                "deep or a smaller feed batch size")
        self.images = jax.lax.dynamic_update_slice_in_dim(
            self.images, jnp.asarray(images).astype(self.images.dtype),
            offset, axis=0)
        self.labels = jax.lax.dynamic_update_slice_in_dim(
            self.labels, jnp.asarray(labels).astype(self.labels.dtype),
            offset, axis=0)


def sample_batch(key, pool_images, pool_labels, batch_size: int):
    """Uniform with-replacement batch gather, on device. Images keep
    the pool's source dtype -- the train step normalizes them with the
    single dtype-dispatch rule (trainer.normalize_images), so the
    scaling contract lives in exactly one place."""
    idx = jax.random.randint(key, (batch_size,), 0, pool_images.shape[0])
    images = pool_images[idx]
    labels = pool_labels[idx].astype(jnp.int32)
    return images, labels
