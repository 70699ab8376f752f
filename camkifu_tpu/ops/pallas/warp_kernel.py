"""Pallas canonical-warp kernel: tiled slab DMA + two-pass line resampling.

The XLA warp gathers ~370 k taps per frame from HBM with no locality
control, and falls off a ~35× cliff when gather indices vary per frame
(per-frame corners, BASELINE config 4). This kernel walks the canonical
image in row tiles: the (scalar-prefetched) source row window is DMA'd
HBM→VMEM once per tile, and sampling happens as two ``take_along_axis``
passes — the only gather form Mosaic lowers:

1. **vertical**: a homography maps each canonical row to a *line* in the
   source; along that line y is affine in x (lines map to lines), so each
   source column is resampled vertically at y(x) = aᵢ + bᵢ·x.
2. **horizontal**: the vertically-resampled rows are sampled at x(i, j).

This is sampling along the row's source line with linear interpolation —
it differs from axis-aligned bilinear only by the quadratic sag of the
bilinear patch within one pixel (≪ 1 intensity level in practice; the
parity test bounds it).

Geometry contract identical to ops.warp.warp_to_canonical (cv2 integer-
center convention, corner intersections at cell centers). Assumes the board
is roughly upright in the frame (|bᵢ| bounded) — the same assumption the
whole detection stack makes.

STATUS: correct in interpret mode (tests), but does NOT lower on this
image's Mosaic — its gather cannot span vregs ("Multiple source vregs
along gather dimension"), and both passes need 256-row / 1920-column index
ranges. Kept for future toolchains; the production per-frame-corner path
uses ops.warp.warp_batch_chunked instead (chunk-shared indices + subpixel
translation correction).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from camkifu_tpu.config import cvconf, guiconf
from camkifu_tpu.ops.warp import canonical_corners, homography_dlt

#: Canonical rows per tile.
TILE = 38

#: Source rows DMA'd per tile (static; covers the perspective fan-out of a
#: TILE-row canonical strip for any plausible camera geometry).
SLAB = 256


def _warp_kernel(row_start_ref, hmat_ref, frame_ref, out_ref, slab_ref,
                 sem_ref, *, size, slab, w, h):
    t = pl.program_id(0)
    r0 = row_start_ref[t]

    dma = pltpu.make_async_copy(
        frame_ref.at[pl.ds(r0, slab), :, :], slab_ref, sem_ref)
    dma.start()

    h00, h01, h02 = hmat_ref[0, 0], hmat_ref[0, 1], hmat_ref[0, 2]
    h10, h11, h12 = hmat_ref[1, 0], hmat_ref[1, 1], hmat_ref[1, 2]
    h20, h21, h22 = hmat_ref[2, 0], hmat_ref[2, 1], hmat_ref[2, 2]

    def src_xy(us, vs):
        den = h20 * us + h21 * vs + h22
        return ((h00 * us + h01 * vs + h02) / den,
                (h10 * us + h11 * vs + h12) / den)

    # Per output row i (canonical v = t·TILE + i): the source line's affine
    # y(x) = a_i + b_i·x from its endpoints at j = 0 and j = size-1.
    vcol = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0) \
        .astype(jnp.float32) + t * TILE                   # (TILE, 1)
    x_a, y_a = src_xy(jnp.zeros_like(vcol), vcol)
    x_b, y_b = src_xy(jnp.full_like(vcol, size - 1.0), vcol)
    b = (y_b - y_a) / (x_b - x_a)                          # (TILE, 1)
    a = y_a - b * x_a

    # Vertical pass (padded to the slab's row count for take_along_axis).
    xs = jax.lax.broadcasted_iota(jnp.int32, (slab, w), 1).astype(jnp.float32)
    a_pad = jnp.pad(a, ((0, slab - TILE), (0, 0)))
    b_pad = jnp.pad(b, ((0, slab - TILE), (0, 0)))
    ys = a_pad + b_pad * xs - r0.astype(jnp.float32)       # slab-local
    ys = jnp.clip(ys, 0.0, slab - 1.001)
    y0f = jnp.floor(ys)
    fy = ys - y0f
    y0 = y0f.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, slab - 1)

    # Horizontal pass indices (padded to slab width).
    uu = jax.lax.broadcasted_iota(jnp.int32, (TILE, size), 1) \
        .astype(jnp.float32)
    vv = jax.lax.broadcasted_iota(jnp.int32, (TILE, size), 0) \
        .astype(jnp.float32) + t * TILE
    x_out, _ = src_xy(uu, vv)
    x_out = jnp.clip(x_out, 0.0, w - 1.001)
    x0f = jnp.floor(x_out)
    fx_real = x_out - x0f
    x0_real = x0f.astype(jnp.int32)
    pad_w = ((0, 0), (0, w - size))
    x0 = jnp.pad(x0_real, pad_w)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fx = jnp.pad(fx_real, pad_w)

    dma.wait()
    img = slab_ref[:]
    for c in range(3):
        # Mosaic has no direct uint8→f32 convert; hop through int32.
        plane = img[:, :, c].astype(jnp.int32).astype(jnp.float32)
        v0 = jnp.take_along_axis(plane, y0, axis=0)
        v1 = jnp.take_along_axis(plane, y1, axis=0)
        v = (v0 * (1.0 - fy) + v1 * fy)[:TILE, :]          # (TILE, w)
        h0 = jnp.take_along_axis(v, x0, axis=1)
        h1 = jnp.take_along_axis(v, x1, axis=1)
        out = h0 * (1.0 - fx) + h1 * fx                    # (TILE, w)
        out_ref[:, :, c] = out[:, :size]


@functools.partial(jax.jit, static_argnames=("gsize", "zone", "interpret"))
def warp_to_canonical_pallas(frame: jnp.ndarray, corners: jnp.ndarray,
                             gsize: int = guiconf.gsize,
                             zone: int = cvconf.zone_size,
                             interpret: bool = False) -> jnp.ndarray:
    """(H, W, 3) frame + (4, 2) corners → (S, S, 3) float32 canonical."""
    h, w = frame.shape[0], frame.shape[1]
    size = gsize * zone
    assert size % TILE == 0, (size, TILE)
    n_tiles = size // TILE

    with jax.default_matmul_precision("float32"):
        H = homography_dlt(canonical_corners(gsize, zone),
                           corners.astype(jnp.float32))
        # Per-tile source row window: min y over the tile's corner mappings.
        tv = jnp.arange(n_tiles + 1, dtype=jnp.float32) * TILE
        edges = jnp.array([0.0, size - 1.0])
        uu, vv = jnp.meshgrid(edges, tv, indexing="xy")
        den = H[2, 0] * uu + H[2, 1] * vv + H[2, 2]
        ys = (H[1, 0] * uu + H[1, 1] * vv + H[1, 2]) / den   # (n_tiles+1, 2)
        y_lo = jnp.minimum(ys[:-1], ys[1:]).min(axis=-1)
        row_start = jnp.clip(jnp.floor(y_lo) - 2, 0,
                             max(h - SLAB, 0)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],      # frame in HBM
        out_specs=pl.BlockSpec((TILE, size, 3), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SLAB, w, 3), frame.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_warp_kernel, size=size, slab=SLAB, w=w, h=h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((size, size, 3), jnp.float32),
        interpret=interpret,
    )(row_start, H, frame)
