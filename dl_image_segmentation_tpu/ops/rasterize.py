"""Vector -> raster label burning on TPU (ALL_TOUCHED semantics).

TPU-native replacement for gdal.RasterizeLayer
(/root/reference/dl_segmentation_utils/_descartes_img_chips.py:682-685:
``ALL_TOUCHED=TRUE`` with per-feature ``ATTRIBUTE=`` values or a
constant burn of 1, over a background-prefilled uint8 canvas).

Instead of GDAL's branch-heavy scanline/active-edge-table algorithm,
the burn is formulated as dense per-pixel predicates -- ideal VPU work:

* interior: even-odd parity of ray crossings of every polygon edge,
  evaluated for all pixel centres at once;
* ALL_TOUCHED boundary: a pixel is touched iff some edge segment
  intersects its unit square, tested as (segment-bbox overlaps pixel
  square) AND (pixel square straddles the segment's supporting line) --
  both closed-form and vectorised over the full raster;
* last-writer-wins across features in emit order (matching the
  documented GDAL boundary-tie behaviour, reference :676-681),
  implemented as a lax.scan over features.

Two backends with identical numerics: a jnp implementation (XLA fuses
the per-feature predicates) and a Pallas kernel that keeps the raster
block and the whole edge table in VMEM for the entire feature scan,
avoiding F round-trips to HBM.

Edge layout: features are padded to a common edge count. Padding edges
are placed at _FAR (outside any raster) so they generate no crossings
and no touches.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_FAR = -1.0e9


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------

def pack_features(
    features_px: Sequence[Tuple],
    max_edges: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack [(rings, value), ...] or [(rings, value, (row_lo, row_hi)),
    ...] (rings in PIXEL coordinates, (N,2) x=col, y=row, unclosed or
    closed) into dense arrays. The optional per-feature ROW WINDOW
    restricts the feature's burn to rows [row_lo, row_hi) -- used by
    the batched multi-tile compositor to keep each tile's features
    inside its own row band of a shared canvas.

    returns (edges[F, E, 4] f32, values[F] f32, windows[F, 2] f32)
    """
    feats = []
    for item in features_px:
        rings, value = item[0], item[1]
        win = item[2] if len(item) > 2 else (-1.0e9, 1.0e9)
        segs = []
        for ring in rings:
            r = np.asarray(ring, dtype=np.float32)
            if len(r) < 2:
                continue
            # EXACT closure test: with allclose, a nearly-closed dirty
            # ring at large pixel coords (rtol dominates) got no
            # closing segment, leaving a sub-pixel boundary gap that
            # flips even-odd parity for half a row. Appending a
            # zero-length closing segment to an already-closed ring is
            # harmless (no straddle, no new touch), so err that way.
            if not np.array_equal(r[0], r[-1]):
                r = np.concatenate([r, r[:1]], axis=0)
            a = r[:-1]
            b = r[1:]
            segs.append(np.concatenate([a, b], axis=1))  # (n,4) x0 y0 x1 y1
        if segs:
            feats.append((np.concatenate(segs, axis=0), float(value),
                          (float(win[0]), float(win[1]))))
    if not feats:
        return (np.full((1, 1, 4), _FAR, np.float32),
                np.zeros((1,), np.float32),
                np.array([[-1.0e9, 1.0e9]], np.float32))
    biggest = max(len(e) for e, _, _ in feats)
    if max_edges is not None and biggest > max_edges:
        # numpy slice clamping would silently drop edges, leaving the
        # polygon boundary open and inverting even-odd parity -- a
        # wrong mask with no diagnostic
        raise ValueError(
            f"feature has {biggest} edges, over max_edges={max_edges}")
    e_max = max_edges or biggest
    F = len(feats)
    if max_edges is None:
        # bucket BOTH padded axes to powers of two: every distinct
        # (F, E) pair is a fresh trace/compile of the jitted kernels,
        # and per-tile burns see different counts per tile. Padded
        # rows are _FAR sentinel edges with empty effect, so output is
        # identical; compile count becomes O(log^2) instead of O(tiles)
        e_max = 1 << max(0, e_max - 1).bit_length()
        F_pad = 1 << max(0, F - 1).bit_length()
    else:
        F_pad = F
    edges = np.full((F_pad, e_max, 4), _FAR, dtype=np.float32)
    values = np.zeros((F_pad,), dtype=np.float32)
    windows = np.zeros((F_pad, 2), dtype=np.float32)
    for i, (e, v, w) in enumerate(feats):
        edges[i, : len(e)] = e
        values[i] = v
        windows[i] = w
    return edges, values, windows


# ---------------------------------------------------------------------------
# predicate math (shared by both backends)
# ---------------------------------------------------------------------------

def _feature_masks(edges: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                   all_touched: bool) -> jnp.ndarray:
    """Burn mask for ONE feature. edges: (E,4); cx/cy: (H,W) pixel
    centres. Returns bool (H,W)."""
    x0 = edges[:, 0][:, None, None]
    y0 = edges[:, 1][:, None, None]
    x1 = edges[:, 2][:, None, None]
    y1 = edges[:, 3][:, None, None]
    cxe = cx[None, :, :]
    cye = cy[None, :, :]

    # even-odd parity: edge straddles the horizontal ray through cy and
    # the intersection is right of cx
    straddle = (y0 > cye) != (y1 > cye)
    dy = y1 - y0
    t = jnp.where(straddle, (cye - y0) / jnp.where(dy == 0, 1.0, dy), 0.0)
    xint = x0 + t * (x1 - x0)
    crossing = straddle & (cxe < xint)
    inside = (jnp.sum(crossing.astype(jnp.int32), axis=0) % 2) == 1
    if not all_touched:
        return inside

    # ALL_TOUCHED: segment intersects the closed unit pixel square
    # centred at (cx, cy). Half-extent 0.5 per axis.
    ex0 = jnp.minimum(x0, x1)
    ex1 = jnp.maximum(x0, x1)
    ey0 = jnp.minimum(y0, y1)
    ey1 = jnp.maximum(y0, y1)
    bbox = ((cxe + 0.5 >= ex0) & (cxe - 0.5 <= ex1)
            & (cye + 0.5 >= ey0) & (cye - 0.5 <= ey1))
    # line straddle: |n.(p - a)| <= (|nx| + |ny|)/2 with n = (dy, -dx)
    nx = y1 - y0
    ny = x0 - x1
    dist = jnp.abs(nx * (cxe - x0) + ny * (cye - y0))
    reach = (jnp.abs(nx) + jnp.abs(ny)) * 0.5
    touch = jnp.any(bbox & (dist <= reach), axis=0)
    return inside | touch


def _feature_bboxes(edges, xp):
    """Per-feature [minx, miny, maxx, maxy] over REAL edges only (xp is
    np or jnp -- same code serves the host binner and the in-graph
    dense-kernel cull). Padding rows are _FAR sentinels (all four
    coords), so a plain min would stretch every bbox to -1e9 and defeat
    culling. A fully-padded feature gets an inverted (empty) bbox and
    is culled from every block."""
    real = edges[:, :, 0] != _FAR
    xs = xp.stack([edges[:, :, 0], edges[:, :, 2]], axis=-1)
    ys = xp.stack([edges[:, :, 1], edges[:, :, 3]], axis=-1)
    big = 2.0e9
    m = real[:, :, None]
    return (xp.min(xp.where(m, xs, big), axis=(1, 2)),
            xp.min(xp.where(m, ys, big), axis=(1, 2)),
            xp.max(xp.where(m, xs, -big), axis=(1, 2)),
            xp.max(xp.where(m, ys, -big), axis=(1, 2)))


def _edge_mask(edges_ref, cx, cy, E, all_touched):
    """The per-(feature, block) predicate loop shared by BOTH Pallas
    kernels: stream E edges from SMEM (edges_ref block is (1, E, 4)),
    accumulate even-odd parity and the ALL_TOUCHED touch predicate over
    the (bh, bw) pixel-centre grids cx/cy, and return the bool burn
    mask. Same math as _feature_masks, restructured as a scalar edge
    stream (no gathers, no dynamic VMEM indexing)."""

    # loop carries are int32, not bool: Mosaic crashes on large
    # i1 vector carries through scf.for (observed on v5e)
    def edge_body(e, carry):
        parity, touch = carry
        x0 = edges_ref[0, e, 0]
        y0 = edges_ref[0, e, 1]
        x1 = edges_ref[0, e, 2]
        y1 = edges_ref[0, e, 3]
        straddle = (y0 > cy) != (y1 > cy)
        dy = y1 - y0
        safe_dy = jnp.where(dy == 0, 1.0, dy)
        xint = x0 + (cy - y0) / safe_dy * (x1 - x0)
        parity = parity ^ (straddle & (cx < xint)).astype(jnp.int32)
        if all_touched:
            bbox = ((cx + 0.5 >= jnp.minimum(x0, x1))
                    & (cx - 0.5 <= jnp.maximum(x0, x1))
                    & (cy + 0.5 >= jnp.minimum(y0, y1))
                    & (cy - 0.5 <= jnp.maximum(y0, y1)))
            nx = y1 - y0
            ny = x0 - x1
            dist = jnp.abs(nx * (cx - x0) + ny * (cy - y0))
            reach = (jnp.abs(nx) + jnp.abs(ny)) * 0.5
            touch = touch | (bbox & (dist <= reach)).astype(jnp.int32)
        return parity, touch

    parity0 = jnp.zeros(cx.shape, jnp.int32)
    touch0 = jnp.zeros(cx.shape, jnp.int32)
    parity, touch = jax.lax.fori_loop(0, E, edge_body, (parity0, touch0))
    return (parity | touch if all_touched else parity) > 0


# ---------------------------------------------------------------------------
# jnp backend
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("height", "width",
                                             "all_touched"))
def _rasterize_jnp(edges: jnp.ndarray, values: jnp.ndarray,
                   background: jnp.ndarray, height: int, width: int,
                   all_touched: bool,
                   windows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    cy, cx = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij")
    init = jnp.full((height, width), background, dtype=jnp.float32)
    if windows is None:
        windows = jnp.broadcast_to(
            jnp.asarray([-1.0e9, 1.0e9], jnp.float32),
            (edges.shape[0], 2))

    def body(canvas, feat):
        e, v, w = feat
        mask = _feature_masks(e, cx, cy, all_touched)
        mask = mask & (cy >= w[0]) & (cy < w[1])
        return jnp.where(mask, v, canvas), None

    out, _ = jax.lax.scan(body, init, (edges, values, windows))
    return out


# ---------------------------------------------------------------------------
# Pallas backend
# ---------------------------------------------------------------------------

def _block_hw(block, height, width):
    """block may be an int (square) or an (bh, bw) tuple -- rectangular
    lane-aligned blocks (e.g. (32, 256)) cut the per-(feature, block)
    VPU work for small features while keeping the 128-lane dim full."""
    if isinstance(block, tuple):
        bh, bw = block
    else:
        bh = bw = block
    return min(bh, height), min(bw, width)


@functools.lru_cache(maxsize=64)
def _rasterize_pallas_fn(F, E, height, width, all_touched, block,
                         interpret):
    """Shape-keyed cached builder for the Pallas burn kernel (a fresh
    pallas_call per invocation would retrace every burn; the jit
    wrapper gives repeat shapes the dispatch-cache fast path).

    Grid = (row blocks, col blocks, features) with the FEATURE axis
    innermost: consecutive grid steps revisit the same output block, so
    Pallas keeps the canvas resident in VMEM across the whole feature
    scan (one HBM write per block total). Edge coordinates are streamed
    per-feature into SMEM and consumed as scalars by a fori_loop that
    accumulates the interior-parity and ALL_TOUCHED predicates over the
    block -- pure VPU work on (bh, bw) registers, no gathers, no
    dynamic VMEM indexing (which Mosaic rejects)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, bw = _block_hw(block, height, width)
    grid = (-(-height // bh), -(-width // bw), F)

    def kernel(values_ref, windows_ref, bbox_ref, edges_ref, init_ref,
               out_ref):
        f = pl.program_id(2)

        # the canvas arrives as an INPUT (background-filled for the
        # first feature chunk, the previous chunk's output after):
        # Mosaic's SMEM bookkeeping grows ~1 KB per innermost grid
        # step, so feature counts beyond ~512 must be split across
        # sequential pallas calls (see _F_CHUNK) -- threading the
        # canvas preserves last-writer-wins emit order across chunks
        @pl.when(f == 0)
        def _():
            out_ref[:, :] = init_ref[:, :]

        i = pl.program_id(0)
        j = pl.program_id(1)

        # per-feature bbox BLOCK CULLING: skip the whole edge loop when
        # the feature cannot touch this block. Pixel centres in the
        # block span [i*bh+0.5, i*bh+bh-0.5] x [j*bw+0.5, ...]; the
        # ALL_TOUCHED test reaches at most 0.5 px beyond the edge bbox
        # (the pixel square's half-extent), and the interior lies
        # inside the edge bbox, so a 0.5-px-dilated bbox is a sound
        # cull bound. The feature's row window also bounds its reach.
        bx0 = (j * bw).astype(jnp.float32) + 0.5
        by0 = (i * bh).astype(jnp.float32) + 0.5
        bx1 = bx0 + jnp.float32(bw - 1)
        by1 = by0 + jnp.float32(bh - 1)
        hit = ((bbox_ref[f, 0] - 0.5 <= bx1)
               & (bbox_ref[f, 2] + 0.5 >= bx0)
               & (bbox_ref[f, 1] - 0.5 <= by1)
               & (bbox_ref[f, 3] + 0.5 >= by0)
               & (windows_ref[f, 0] <= by1)
               & (windows_ref[f, 1] > by0))

        @pl.when(hit)
        def _():
            cy = (jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
                  .astype(jnp.float32) + by0)
            cx = (jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
                  .astype(jnp.float32) + bx0)
            mask = _edge_mask(edges_ref, cx, cy, E, all_touched)
            # per-feature row window (batched multi-tile canvases)
            mask = mask & (cy >= windows_ref[f, 0]) \
                & (cy < windows_ref[f, 1])
            out_ref[:, :] = jnp.where(mask, values_ref[f],
                                      out_ref[:, :])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # values (F,), windows (F, 2),
                                # bboxes (F, 4) in SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, E, 4), lambda i, j, f, *_: (f, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bh, bw), lambda i, j, f, *_: (i, j)),
        ],
        out_specs=pl.BlockSpec((bh, bw), lambda i, j, f, *_: (i, j)),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (grid[0] * bh, grid[1] * bw), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    def run(values, canvas, windows, edges):
        bbox = jnp.stack(_feature_bboxes(edges, jnp), axis=-1)
        return call(values, windows, bbox, edges, canvas)

    return jax.jit(run)


# Mosaic SMEM bookkeeping grows with the innermost grid dimension
# (~1 KB/step, measured: F=1024 needs 1.25 MB of the 1 MB SMEM; F=512
# fits); feature counts beyond this are split across sequential calls
# that thread the canvas through.
_F_CHUNK = 512

# dense-kernel grid is blocks x F; above this feature count the binned
# kernel (blocks x max-features-per-block) wins -- grid-step sequencing
# costs ~20 us whether or not the feature is culled, so at production
# scale (1,024 scattered features on a 1,024^2 canvas) the dense grid
# burns ~16k steps where the binned one needs ~2k.
_BIN_THRESHOLD = 64


@functools.lru_cache(maxsize=64)
def _rasterize_pallas_binned_fn(F, E, S, height, width, all_touched,
                                block, interpret):
    """Spatially-BINNED burn kernel. Grid = (row blocks, col blocks,
    slots): slot s of block (i, j) dereferences ``table[i, j, s]`` -- a
    host-computed per-block feature list riding the scalar-prefetch
    channel and consumed by the edge stream's INDEX MAP, so each canvas
    block only streams and evaluates the features whose (0.5-px
    dilated) bbox / row window intersects it. Binning is conservative
    (over-inclusion is safe: the in-kernel predicates are exact), and
    per-block lists are in ascending emit order, preserving
    last-writer-wins within each block; blocks touch disjoint pixels,
    so cross-block order is irrelevant."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, bw = _block_hw(block, height, width)
    grid = (-(-height // bh), -(-width // bw), S)

    def kernel(values_ref, windows_ref, count_ref, table_ref, edges_ref,
               init_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        s = pl.program_id(2)

        @pl.when(s == 0)
        def _():
            out_ref[:, :] = init_ref[:, :]

        @pl.when(s < count_ref[i, j])
        def _():
            fidx = table_ref[i, j, s]
            cy = (jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
                  .astype(jnp.float32)
                  + (i * bh).astype(jnp.float32) + 0.5)
            cx = (jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
                  .astype(jnp.float32)
                  + (j * bw).astype(jnp.float32) + 0.5)
            mask = _edge_mask(edges_ref, cx, cy, E, all_touched)
            mask = mask & (cy >= windows_ref[fidx, 0]) \
                & (cy < windows_ref[fidx, 1])
            out_ref[:, :] = jnp.where(mask, values_ref[fidx],
                                      out_ref[:, :])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # values (F,), windows (F, 2),
                                # count (Gi, Gj), table (Gi, Gj, S)
        grid=grid,
        in_specs=[
            # the slot's feature edges, chosen BY the prefetch table
            pl.BlockSpec((1, E, 4),
                         lambda i, j, s, values, windows, count, table:
                         (table[i, j, s], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bh, bw),
                         lambda i, j, s, *_: (i, j)),
        ],
        out_specs=pl.BlockSpec((bh, bw), lambda i, j, s, *_: (i, j)),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (grid[0] * bh, grid[1] * bw), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    return jax.jit(call)


def _bin_features(edges_np: np.ndarray, windows_np: np.ndarray,
                  height: int, width: int, bh: int, bw: int,
                  dilate: float = 1.0):
    """Host-side spatial binning: per-block feature lists (ascending
    emit order) from dilated bboxes intersected with row windows.
    Conservative (``dilate`` extra pixels each side; callers that will
    shift geometry after binning pass a wider margin) -- the kernel's
    predicates are exact, so over-inclusion only costs work. Returns
    (count (Gi, Gj) int32, table (Gi, Gj, S) int32) with S a power of
    two."""
    gi = -(-height // bh)
    gj = -(-width // bw)
    minx, miny, maxx, maxy = _feature_bboxes(edges_np, np)
    lists = [[[] for _ in range(gj)] for _ in range(gi)]
    F = len(edges_np)
    for f in range(F):
        if minx[f] > maxx[f]:
            continue  # fully-padded feature
        ylo = max(miny[f] - dilate, windows_np[f, 0] - 1.0)
        yhi = min(maxy[f] + dilate, windows_np[f, 1] + 1.0)
        if ylo > yhi:
            continue
        bi0 = max(0, int(ylo) // bh)
        bi1 = min(gi - 1, int(yhi) // bh)
        bj0 = max(0, int(max(minx[f] - dilate, 0.0)) // bw)
        bj1 = min(gj - 1, int(max(maxx[f] + dilate, 0.0)) // bw)
        if bi0 > bi1 or bj0 > bj1:
            continue
        for bi in range(bi0, bi1 + 1):
            for bj in range(bj0, bj1 + 1):
                lists[bi][bj].append(f)
    smax = max(1, max(len(c) for row in lists for c in row))
    S = 1 << max(0, smax - 1).bit_length()
    count = np.zeros((gi, gj), np.int32)
    table = np.zeros((gi, gj, S), np.int32)
    for bi in range(gi):
        for bj in range(gj):
            lst = lists[bi][bj]
            count[bi, bj] = len(lst)
            table[bi, bj, : len(lst)] = lst
    return count, table


def _binned_burn(values, windows, count, table, edges, canvas,
                 height: int, width: int, all_touched: bool,
                 block, interpret: bool):
    """Run the binned kernel over slot chunks, threading the canvas.
    count/table come from _bin_features (or a caller's conservative
    precomputation); canvas is the block-padded initial canvas."""
    F, E, _ = edges.shape
    S = table.shape[2]
    Sc = min(S, _F_CHUNK)
    fn = _rasterize_pallas_binned_fn(F, E, Sc, height, width,
                                     all_touched, block, interpret)
    for lo in range(0, S, Sc):
        # per-chunk slot counts: how many of THIS chunk's slots are
        # live in each block
        c = np.clip(count - lo, 0, Sc).astype(np.int32)
        canvas = fn(values, windows, jnp.asarray(c),
                    jnp.asarray(table[:, :, lo:lo + Sc]), edges, canvas)
    return canvas[:height, :width]


def _rasterize_pallas(edges, values, background, height, width, all_touched,
                      block=None, interpret=False, windows=None):
    """Pallas burn kernel entry: dense feature scan for small feature
    counts (see _rasterize_pallas_fn), spatially binned above
    _BIN_THRESHOLD (see _rasterize_pallas_binned_fn).

    block defaults: 256x256 for the dense scan (one VMEM-resident
    canvas block per tile burn); (32, 256) for the binned kernel --
    measured 9.6x jnp at 1,024 features x 256 edges on a 1,024^2 v5e
    canvas (vs 5.3x at 256x256): rows stay full 128-lane vectors while
    small features stop paying for a mostly-missed 256-row block.

    Binning needs CONCRETE geometry (the per-block feature table is
    computed on the host); when edges/windows are jit tracers the
    dense kernel handles any F instead, splitting feature counts past
    _F_CHUNK across sequential canvas-threading calls (Mosaic SMEM
    limit) with its in-graph bbox cull standing in for the bins."""
    F, E, _ = edges.shape
    if windows is None:
        windows = np.broadcast_to(
            np.asarray([-1.0e9, 1.0e9], np.float32), (F, 2))
    concrete = not (isinstance(edges, jax.core.Tracer)
                    or isinstance(windows, jax.core.Tracer))
    binned = F > _BIN_THRESHOLD and concrete
    if block is None:
        block = (32, 256) if binned else 256
    bh, bw = _block_hw(block, height, width)
    ph = -(-height // bh) * bh
    pw = -(-width // bw) * bw
    canvas = jnp.full((ph, pw), background, jnp.float32)

    if binned:
        # bin BEFORE any device upload: production callers hand numpy
        # geometry, so np.asarray is free here, whereas binning a
        # jnp array would fetch it back through the relay (~16 MB at
        # F=1024 x E=256, ~0.5-1 s of pure transfer per burn)
        count, table = _bin_features(np.asarray(edges),
                                     np.asarray(windows),
                                     int(height), int(width), bh, bw)
        return _binned_burn(values, jnp.asarray(windows, jnp.float32),
                            count, table, jnp.asarray(edges), canvas,
                            int(height), int(width),
                            bool(all_touched), block,
                            bool(interpret))

    windows = jnp.asarray(windows, jnp.float32)
    if F > _F_CHUNK and F % _F_CHUNK:
        # pad to a chunk multiple with inert features (empty bboxes,
        # culled from every block) so every chunk hits one compile
        pad = _F_CHUNK - F % _F_CHUNK
        edges = jnp.concatenate(
            [edges, jnp.full((pad, E, 4), _FAR, edges.dtype)])
        values = jnp.concatenate([values, jnp.zeros((pad,), values.dtype)])
        windows = jnp.concatenate(
            [windows, jnp.zeros((pad, 2), windows.dtype)])
        F += pad
    Fc = min(F, _F_CHUNK)
    fn = _rasterize_pallas_fn(Fc, E, int(height), int(width),
                              bool(all_touched), block,
                              bool(interpret))
    for lo in range(0, F, Fc):
        canvas = fn(values[lo:lo + Fc], canvas,
                    windows[lo:lo + Fc], edges[lo:lo + Fc])
    return canvas[:height, :width]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def rasterize(
    features_px: Sequence[Tuple[Sequence[np.ndarray], float]],
    shape: Tuple[int, int],
    background: float = 255,
    all_touched: bool = True,
    dtype=np.uint8,
    backend: str = "auto",
) -> np.ndarray:
    """Burn polygon features onto a raster.

    features_px: [(rings, value), ...] or [(rings, value, (row_lo,
    row_hi)), ...] in pixel coordinates (x=col, y=row, origin at the
    top-left corner of pixel (0,0)); later features overwrite earlier
    ones where they overlap (GDAL emit-order semantics). The optional
    per-feature row window restricts the burn to rows [row_lo, row_hi)
    (used by the batched multi-tile compositor). Returns (H, W) array
    of ``dtype``.
    """
    height, width = shape
    edges_np, values_np, windows_np = pack_features(features_px)
    background_arr = jnp.float32(background)
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu")
    if use_pallas:
        # geometry stays numpy: the binned path needs it on host (see
        # _rasterize_pallas) and the kernel jit uploads it exactly once
        out = _rasterize_pallas(
            edges_np, values_np, background_arr,
            height, width, all_touched,
            interpret=jax.default_backend() != "tpu",
            windows=windows_np)
    else:
        out = _rasterize_jnp(jnp.asarray(edges_np), jnp.asarray(values_np),
                             background_arr, height, width, all_touched,
                             windows=jnp.asarray(windows_np))
    return np.asarray(out).astype(dtype)
