"""Scene-stack compositing kernels: cloud-masked temporal median and
nearest-to-date valid-pixel mosaic.

TPU-native replacements for the two mosaic strategies of the reference:

* ``create_cloudmasked_s2_array`` -- stacks all scenes, repeats the
  1-band cloud mask across bands, and takes np.ma.median over the scene
  axis (/root/reference/dl_segmentation_utils/_descartes_img_chips.py:
  557-567). That is a single-core O(S*H*W*B) masked median on the host;
  here it is a fused device kernel: sort the scene axis with invalid
  samples pushed to +inf, then gather the per-pixel middle of the VALID
  prefix (np.ma.median semantics: median of the unmasked subset, whose
  count varies per pixel; even counts average the two middle values).

* ``create_img_array_for_tile`` -- DL server-side "last wins" mosaic
  over scenes sorted by descending |date - ref_date|
  (_descartes_img_chips.py:617-627), i.e. the scene closest to the
  reference date wins wherever it has valid data. Implemented directly
  as an argmin over date distance masked by validity -- no sort, no
  sequential overwrite.

Both kernels are jit-compiled XLA; the masked median also has a Pallas
variant that blocks over (H, W) and keeps the full scene column in
VMEM so mask+sort+select fuse without materialising the sorted stack
in HBM. Stacks are padded to a static max depth (lax-friendly static
shapes); padding scenes are simply invalid everywhere.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# plain Python float: jnp scalars at module scope would be captured as
# closure constants inside Pallas kernels, which pallas_call rejects
_INF = 3.0e38


@functools.partial(jax.jit, static_argnames=("even_mean",))
def masked_median(stack: jnp.ndarray, valid: jnp.ndarray,
                  even_mean: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Median over axis 0 of ``stack`` (S, H, W, B) counting only
    samples where ``valid`` (S, H, W, B or S, H, W) is True.

    Returns (median (H, W, B) float32, any_valid (H, W, B) bool).
    Pixels with zero valid samples return 0 with any_valid False
    (np.ma.median would mask them; callers apply their fill).
    """
    stack = stack.astype(jnp.float32)
    if valid.ndim == stack.ndim - 1:
        valid = valid[..., None]
    valid = jnp.broadcast_to(valid, stack.shape)
    S = stack.shape[0]
    # invalid -> +inf so they sort to the end of the scene axis
    vals = jnp.where(valid, stack, _INF)
    svals = jnp.sort(vals, axis=0)
    n = jnp.sum(valid, axis=0)  # (H, W, B) valid counts
    nz = jnp.maximum(n, 1)
    lo_idx = (nz - 1) // 2
    hi_idx = nz // 2
    lo = jnp.take_along_axis(svals, lo_idx[None], axis=0)[0]
    hi = jnp.take_along_axis(svals, hi_idx[None], axis=0)[0]
    med = (lo + hi) * 0.5 if even_mean else lo
    any_valid = n > 0
    return jnp.where(any_valid, med, 0.0), any_valid


def _batcher_pairs(n: int):
    """Comparator schedule of Batcher's odd-even mergesort for n inputs
    (O(n log^2 n) comparators vs O(n^2) for odd-even transposition)."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


@functools.lru_cache(maxsize=64)
def _median_pallas_fn(S: int, H: int, W: int, B: int, block: int,
                      interpret: bool):
    """Shape-keyed cached builder: pallas_call rebuilt per invocation
    would retrace (fresh jaxpr -> dispatch-cache miss) on every
    composite; the jit wrapper gives repeat shapes the C++ fast path."""
    from jax.experimental import pallas as pl

    # size blocks to a VMEM budget: two (S, bh, bw) f32 inputs, double
    # buffered, plus ~S live (bh, bw) registers for the sort network
    budget = 4 * 1024 * 1024
    bw = min(-(-(W * B) // 128) * 128, 1024)
    bh = max(8, min(block, H, budget // (S * bw * 4 * 4) // 8 * 8))
    grid = (-(-H // bh), -(-(W * B) // bw))

    def kernel(x_ref, v_ref, med_ref, cnt_ref):
        # jnp.sort / gather do not lower in Pallas TPU kernels; use an
        # unrolled odd-even transposition network over the (static,
        # small) scene axis + comparison-based middle selection. Pure
        # VPU min/max/select on (bh, bw) registers.
        vals = [jnp.where(v_ref[s] > 0, x_ref[s], _INF)
                for s in range(S)]
        n = jnp.zeros((bh, bw), jnp.int32)
        for s in range(S):
            n = n + (v_ref[s] > 0).astype(jnp.int32)
        for i, j in _batcher_pairs(S):
            lo = jnp.minimum(vals[i], vals[j])
            hi = jnp.maximum(vals[i], vals[j])
            vals[i] = lo
            vals[j] = hi
        nz = jnp.maximum(n, 1)
        lo_idx = (nz - 1) // 2
        hi_idx = nz // 2
        lo = jnp.zeros((bh, bw), jnp.float32)
        hi = jnp.zeros((bh, bw), jnp.float32)
        for s in range(S):
            lo = jnp.where(lo_idx == s, vals[s], lo)
            hi = jnp.where(hi_idx == s, vals[s], hi)
        med = (lo + hi) * 0.5
        med_ref[...] = jnp.where(n > 0, med, 0.0)
        cnt_ref[...] = n

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((grid[0] * bh, grid[1] * bw), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * bh, grid[1] * bw), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, bh, bw), lambda i, j: (0, i, j)),
            pl.BlockSpec((S, bh, bw), lambda i, j: (0, i, j)),
        ],
        out_specs=(
            pl.BlockSpec((bh, bw), lambda i, j: (i, j)),
            pl.BlockSpec((bh, bw), lambda i, j: (i, j)),
        ),
        interpret=interpret,
    )

    def run(stack2, valid2):
        med, cnt = call(stack2, valid2)
        med = med[:H, : W * B].reshape(H, W, B)
        cnt = cnt[:H, : W * B].reshape(H, W, B)
        return med, cnt > 0

    return jax.jit(run)


def masked_median_pallas(stack, valid, block: int = 128,
                         interpret: Optional[bool] = None):
    """Pallas masked median: blocks over (H, W), whole scene column in
    VMEM. Same outputs as masked_median."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    stack = jnp.asarray(stack, jnp.float32)
    if valid.ndim == stack.ndim - 1:
        valid = valid[..., None]
    valid = jnp.broadcast_to(valid, stack.shape).astype(jnp.float32)
    S, H, W, B = stack.shape
    # move bands into the W axis for 128-lane friendliness: (S, H, W*B)
    stack2 = stack.reshape(S, H, W * B)
    valid2 = valid.reshape(S, H, W * B)
    fn = _median_pallas_fn(S, H, W, B, block, bool(interpret))
    return fn(stack2, valid2)


def masked_median_composite(stack, valid, backend: str = "auto"
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend-dispatching masked median (same contract as
    ``masked_median``): the Pallas kernel on TPU, the jnp path
    elsewhere -- mirroring ``rasterize``'s dispatch.

    Measured on a v5e at the reference-shaped (10, 260, 260, 13)
    composite (fresh on-device inputs, 16 composites per dispatch via
    lax.scan): Pallas 2.31 ms/composite vs jnp sort-based 54.2 ms --
    23x, outputs bit-identical. The jnp path's jnp.sort over the scene
    axis materialises the sorted stack in HBM; the Pallas kernel keeps
    each (S, bh, bw) column in VMEM through mask+sort-network+select.
    """
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu")
    if use_pallas:
        return masked_median_pallas(stack, valid)
    return masked_median(stack, valid)


@jax.jit
def nearest_valid_mosaic(stack: jnp.ndarray, valid: jnp.ndarray,
                         date_dist: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel select the valid scene minimising ``date_dist``.

    stack: (S, H, W, B); valid: (S, H, W) or (S, H, W, B);
    date_dist: (S,) absolute days from the reference date -- or
    (S, H, W) per-pixel distances (used by the batched multi-tile
    compositor, where tiles concatenated along H carry different
    scene dates per row band).

    Exactly reproduces sorted-descending last-wins mosaicking
    (_descartes_img_chips.py:617-627): ties broken toward the LATER
    scene in the original ordering, matching "last in collection wins".
    Returns (mosaic (H, W, B), any_valid (H, W, B) bool).
    """
    stack = stack.astype(jnp.float32)
    if valid.ndim == stack.ndim - 1:
        valid = valid[..., None]
    valid = jnp.broadcast_to(valid, stack.shape)
    S = stack.shape[0]
    # score = date distance, invalid -> +inf. Tie-break toward the
    # LATER scene is done exactly by argmin over the REVERSED scene
    # axis (argmin picks the first equal entry, which reversed is the
    # last original index) -- a float epsilon penalty would vanish
    # below one ulp once distances exceed ~2^23 * eps (e.g. 1e-6
    # disappears beyond ~8.4 days-in-float32-seconds / ~100 days),
    # silently flipping ties to the EARLIEST scene.
    dd = date_dist.astype(jnp.float32)
    if dd.ndim == 1:
        dd = dd[:, None, None]
    score = jnp.where(valid, jnp.broadcast_to(dd[..., None], stack.shape),
                      _INF)
    sel = (S - 1) - jnp.argmin(score[::-1], axis=0)  # (H, W, B)
    mosaic = jnp.take_along_axis(stack, sel[None], axis=0)[0]
    any_valid = jnp.any(valid, axis=0)
    return jnp.where(any_valid, mosaic, 0.0), any_valid


def pad_stack(stack: np.ndarray, valid: np.ndarray, to_depth: int
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the scene axis to a static depth (padding scenes invalid).

    Never truncates: dropping scenes would silently change the
    composite -- raise so the caller picks to_depth >= S."""
    S = stack.shape[0]
    if S > to_depth:
        raise ValueError(
            f"stack has {S} scenes, more than to_depth={to_depth}; "
            "padding must not silently drop scenes")
    if S == to_depth:
        return stack, valid
    pad_s = [(0, to_depth - S)] + [(0, 0)] * (stack.ndim - 1)
    pad_v = [(0, to_depth - S)] + [(0, 0)] * (valid.ndim - 1)
    return (np.pad(stack, pad_s), np.pad(valid, pad_v))
