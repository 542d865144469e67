"""SegFormer-lite: hierarchical attention encoder + all-MLP decoder.

Third model family (the reference ships no model at all, SURVEY.md
section 2; U-Net and DeepLab-lite are the other two). A compact
SegFormer/MiT-style design chosen for the MXU: almost every FLOP is a
matmul --

* overlapping patch embeddings (strided conv) build a 4-level pyramid;
* efficient self-attention with spatial-reduction (SRA): keys/values
  are downsampled by a strided conv, so attention is (N, hw, hw/r^2) --
  big batched matmuls, bfloat16 with float32 accumulation;
* Mix-FFN (MLP with a 3x3 depthwise conv between the two projections);
* the decoder is pure MLP: project every stage to one width, upsample,
  concat, fuse -- no transpose convs.

Layout NHWC -> (N, L, C) inside attention; static shapes throughout so
XLA tiles everything onto the 128x128 systolic array.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class SRAttention(nn.Module):
    """Self-attention with spatial reduction of K/V (SegFormer's
    efficient attention)."""
    dim: int
    heads: int
    sr_ratio: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, h: int, w: int):
        n, hw, c = x.shape
        head_dim = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        if self.sr_ratio > 1:
            kv_in = x.reshape(n, h, w, c)
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            dtype=self.dtype,
                            param_dtype=jnp.float32)(kv_in)
            kv_in = kv_in.reshape(n, -1, self.dim)
            kv_in = nn.LayerNorm(dtype=self.dtype,
                                 param_dtype=jnp.float32)(kv_in)
        else:
            kv_in = x
        k = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(kv_in)

        def split(t):
            return t.reshape(n, -1, self.heads, head_dim).transpose(
                0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        att = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att / jnp.sqrt(head_dim), axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", att.astype(self.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(n, hw, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=jnp.float32)(out.astype(self.dtype))


class MixFFN(nn.Module):
    """MLP with a 3x3 depthwise conv between the projections."""
    dim: int
    expand: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, h: int, w: int):
        n, hw, c = x.shape
        hidden = self.dim * self.expand
        x = nn.Dense(hidden, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        x = x.reshape(n, h, w, hidden)
        x = nn.Conv(hidden, (3, 3), padding="SAME",
                    feature_group_count=hidden, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = x.reshape(n, hw, hidden)
        x = nn.gelu(x)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


class Block(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, h: int, w: int):
        x = x + SRAttention(self.dim, self.heads, self.sr_ratio,
                            dtype=self.dtype)(
            nn.LayerNorm(dtype=self.dtype,
                           param_dtype=jnp.float32)(x), h, w)
        x = x + MixFFN(self.dim, dtype=self.dtype)(
            nn.LayerNorm(dtype=self.dtype,
                           param_dtype=jnp.float32)(x), h, w)
        return x


class SegFormerLite(nn.Module):
    """4-stage MiT-B0-style encoder + all-MLP decoder.

    num_classes: segmentation classes (float32 logits at input res)
    base_features: stage-0 width (stages scale x2, x2.5ish like MiT)
    """
    num_classes: int = 2
    base_features: int = 32
    depths: Sequence[int] = (2, 2, 2, 2)
    heads: Sequence[int] = (1, 2, 4, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    decoder_dim: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h0, w0, _ = x.shape
        x = x.astype(self.dtype)
        dims = [self.base_features, self.base_features * 2,
                self.base_features * 5, self.base_features * 8]
        patch = [(7, 4), (3, 2), (3, 2), (3, 2)]  # (kernel, stride)
        feats = []
        for s in range(4):
            k, st = patch[s]
            x = nn.Conv(dims[s], (k, k), strides=(st, st),
                        padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            n_, h, w, c = x.shape
            x = x.reshape(n_, h * w, c)
            x = nn.LayerNorm(dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
            for _ in range(self.depths[s]):
                x = Block(dims[s], self.heads[s], self.sr_ratios[s],
                          dtype=self.dtype)(x, h, w)
            x = nn.LayerNorm(dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
            x = x.reshape(n_, h, w, c)
            feats.append(x)

        # all-MLP decoder: unify widths, upsample to stage-0 res, fuse
        target_h, target_w = feats[0].shape[1], feats[0].shape[2]
        ups = []
        for f in feats:
            p = nn.Dense(self.decoder_dim, dtype=self.dtype,
                         param_dtype=jnp.float32)(f)
            if p.shape[1] != target_h:
                p = jax.image.resize(
                    p.astype(jnp.float32),
                    (p.shape[0], target_h, target_w, self.decoder_dim),
                    method="bilinear").astype(self.dtype)
            ups.append(p)
        y = jnp.concatenate(ups, axis=-1)
        y = nn.Dense(self.decoder_dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        y = nn.gelu(y)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32)(y)
        # back to input resolution (stage 0 is stride 4)
        logits = jax.image.resize(
            logits, (n, h0, w0, self.num_classes), method="bilinear")
        return logits
