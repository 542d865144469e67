"""Int8 post-training quantization for serving, TPU-first.

The v5e MXU runs s8 x s8 -> s32 at twice the bf16 rate (394 vs 197
TOPS peak). DYNAMIC quantization, however, is not free on the HBM
side: each layer re-reads its activations for the max-abs reduction
and writes the int8 copy, so the conv's halved input bytes are bought
with extra elementwise passes. Measured end-to-end on the v5e
(TPU_EVIDENCE.json inference sections, same float params):

* bf=128 U-Net, compute-bound: **1.31x faster** than bf16
  (13.85 vs 18.11 ms/batch; 223 TFLOP/s = 57% of the int8 peak);
* bf=32 U-Net (the default shape, s2d-auto packed tree): **0.94x**
  -- near parity but still no win; the float path stays the default
  and the right choice at narrow widths. (Before the s2d-auto
  default the narrow loss was 0.59x: packing shrinks the HBM tax the
  dynamic-quant passes pay.)
* bf=32 with STATIC calibrated scales (``int8-static``, round 5):
  **0.95x** (1.94 vs 1.85 ms/batch) -- removing the dynamic
  reduction passes recovers only ~1% over dynamic (1.96 ms),
  proving the remaining tax is the int8 activation
  materialisation itself: skip connections and GroupNorm keep bf16
  copies of every activation alive regardless, so the s8 conv's
  halved input read is bought with an extra quantized copy either
  way, and at 52% bf16 MFU there is little MXU time for the 2x
  int8 rate to win back. Weight-only int8 cannot win here either,
  measured structurally: weights are ~3.6% of the forward pass's
  accessed bytes at this shape (32.4 M params vs 3.6 GB/batch), an
  upper bound far below the 5% gap. bf16 stays the narrow-width
  default with all three int8 variants measured.

Use ``quantize="int8"`` for wide/compute-bound serving. This module
provides ``Int8Conv``, a drop-in for ``flax.linen.Conv`` that:

* keeps the SAME parameter names and shapes ("kernel" fp32 HWIO,
  "bias" fp32) -- a float checkpoint loads unchanged; quantization is
  a serving-time compute mode, not a separate artifact to manage;
* quantizes weights per-output-channel (symmetric, max-abs / 127) at
  trace time -- XLA constant-folds nothing here (params are inputs)
  but the per-dispatch requantization is a trivially fused VPU pass;
* quantizes activations dynamically PER-EXAMPLE (max-abs / 127 over
  each example's H, W, C), avoiding any offline calibration dataset:
  one fused reduction per layer buys scale tracking that follows the
  data distribution, and per-example scales keep each request's
  output independent of whatever else the serving micro-batcher
  co-batched with it (zero padding, other clients' magnitudes);
* accumulates in int32 (``preferred_element_type``) and rescales to
  the requested output dtype with the per-channel product
  ``x_scale * w_scale[cout]`` before the bias add.

Scope: convolutions only. ConvTranspose upsampling, GroupNorm, and
the float32 logits head stay in the float path -- they are a small
fraction of FLOPs and the places where int8 error hurts most.

No reference counterpart: the reference
(/root/reference/dl_segmentation_utils) ships no model or serving
code; this extends the BASELINE north-star serving story.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def quantize_tensor(x: jnp.ndarray, axes=None, keepdims: bool = False):
    """Symmetric max-abs int8 quantization. Returns (q, scale) with
    ``x ~= q * scale``; scale is per-remaining-axis when ``axes`` (the
    reduced axes) is given, else a scalar. ``keepdims`` keeps the
    reduced axes as size-1 dims so the scale broadcasts back over x."""
    amax = jnp.max(jnp.abs(x)) if axes is None else jnp.max(
        jnp.abs(x), axis=axes, keepdims=keepdims)
    scale = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


class Int8Conv(nn.Module):
    """``nn.Conv``-compatible int8 convolution (NHWC / HWIO).

    Parameter tree is identical to ``nn.Conv`` (names, shapes, dtypes,
    initializers), so ``UNet(quant=True)`` applies a float-trained
    param tree directly.
    """
    features: int
    kernel_size: Sequence[int]
    strides: Union[None, int, Sequence[int]] = None
    padding: str = "SAME"
    dtype: Any = jnp.bfloat16
    # static=True: activations quantize with a CALIBRATED constant
    # scale (stored in the "quant" variable collection as a running
    # max-abs updated by calibration passes) instead of the dynamic
    # per-example max-abs reduction. Kills the dynamic path's HBM tax
    # -- no per-layer reduction pass, no int8 re-materialisation read
    # -- which is exactly what loses at narrow HBM-bound widths. A
    # constant scale also keeps micro-batched requests independent by
    # construction (nothing data-dependent is shared).
    static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kshape = (kh, kw, x.shape[-1], self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            kshape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        strides = self.strides or (1, 1)
        if isinstance(strides, int):
            strides = (strides, strides)
        qw, w_scale = quantize_tensor(kernel, axes=(0, 1, 2))  # per cout
        if self.static:
            amax = self.variable("quant", "act_amax",
                                 lambda: jnp.zeros((), jnp.float32))
            if self.is_mutable_collection("quant"):
                # calibration pass: fold this batch into the running
                # max-abs (Trainer.calibrate drives N of these)
                amax.value = jnp.maximum(
                    amax.value,
                    jnp.max(jnp.abs(x)).astype(jnp.float32))
            x_scale = jnp.maximum(amax.value / 127.0, 1e-12)
            qx = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                          -127, 127).astype(jnp.int8)
        else:
            # PER-EXAMPLE activation scale (N,1,1,1), not per-batch:
            # the serving micro-batcher packs unrelated requests (and
            # zero padding) into one batch, and a shared DATA-DEPENDENT
            # scale would make one request's int8 output depend on
            # co-batched traffic. With per-example scales each request
            # quantizes exactly as it would alone, so offline
            # --quantize eval transfers to serving.
            qx, x_scale = quantize_tensor(x, axes=(1, 2, 3),
                                          keepdims=True)
        dn = lax.conv_dimension_numbers(x.shape, kshape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            qx, qw, tuple(strides), self.padding,
            dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        # scalar (static) or (N,1,1,1) * (cout,) combined rescale
        y = y.astype(jnp.float32) * (x_scale * w_scale) + bias
        return y.astype(self.dtype)
