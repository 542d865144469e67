"""DeepLab-lite: dilated-conv encoder + ASPP head, TPU-first.

Second model family beyond the flagship U-Net (the reference ships no
models at all; BASELINE names U-Net as the training target). Useful
when the receptive field matters more than fine boundaries (large
context at 1/8 resolution instead of a deep encoder/decoder). Same
conventions as models/unet.py: NHWC, bfloat16 compute with float32
params/accumulation, float32 logits out, static shapes throughout.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class _ConvBNAct(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        # norm output in the compute dtype (stats are float32 inside
        # flax regardless) -- halves inter-conv activation HBM traffic
        x = nn.GroupNorm(num_groups=None,
                         group_size=min(16, self.features),
                         dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling: parallel dilated branches + a
    global-context branch, concatenated and projected."""
    features: int = 256
    rates: Sequence[int] = (1, 6, 12, 18)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        branches = []
        for r in self.rates:
            branches.append(_ConvBNAct(self.features, dilation=r,
                                       kernel=1 if r == 1 else 3,
                                       dtype=self.dtype)(x))
        # image-level pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = _ConvBNAct(self.features, kernel=1,
                            dtype=self.dtype)(pooled)
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2],
                     self.features))
        branches.append(pooled)
        x = jnp.concatenate(branches, axis=-1)
        return _ConvBNAct(self.features, kernel=1, dtype=self.dtype)(x)


class DeepLabLite(nn.Module):
    num_classes: int = 2
    base_features: int = 32
    aspp_features: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, _ = x.shape
        x = x.astype(self.dtype)
        f = self.base_features
        # encoder to 1/8 resolution
        x = _ConvBNAct(f, strides=2, dtype=self.dtype)(x)        # 1/2
        x = _ConvBNAct(f * 2, dtype=self.dtype)(x)
        low = x
        x = _ConvBNAct(f * 2, strides=2, dtype=self.dtype)(x)    # 1/4
        x = _ConvBNAct(f * 4, dtype=self.dtype)(x)
        x = _ConvBNAct(f * 4, strides=2, dtype=self.dtype)(x)    # 1/8
        x = _ConvBNAct(f * 8, dtype=self.dtype)(x)
        x = ASPP(self.aspp_features, dtype=self.dtype)(x)
        # decoder: upsample to the skip tensor's ACTUAL dims (stride-2
        # SAME convs produce ceil(h/2); h//2 would mismatch odd sizes)
        x = jax.image.resize(x, (n, low.shape[1], low.shape[2],
                                 x.shape[-1]),
                             method="bilinear").astype(self.dtype)
        low = _ConvBNAct(48, kernel=1, dtype=self.dtype)(low)
        x = jnp.concatenate([x, low], axis=-1)
        x = _ConvBNAct(self.aspp_features, dtype=self.dtype)(x)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32)(x)
        return jax.image.resize(
            logits, (n, h, w, self.num_classes), method="bilinear")
