"""Pallas canonical-warp kernel: tiled source slabs + in-VMEM bilinear taps.

The XLA warp gathers ~370 k taps per frame straight from the 6 MB HBM frame
with no locality control — the dominant cost of the classify pipeline
(PERF.md). This kernel walks the canonical image in row tiles; for each
tile the (precomputed, scalar-prefetched) source row window is DMA'd into
VMEM once, and the four bilinear taps per output pixel hit VMEM instead of
HBM.

Geometry contract identical to ops.warp.warp_to_canonical (cv2 integer-
center convention, corner intersections at cell centers).
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
SLAB = 512


def _warp_kernel(row_start_ref, hrow_ref, frame_ref, out_ref, slab_ref,
                 sem_ref, *, size, slab, w, h):
    t = pl.program_id(0)
    r0 = row_start_ref[t]

    # DMA the source row window for this tile: HBM → VMEM.
    dma = pltpu.make_async_copy(
        frame_ref.at[pl.ds(r0, slab), :, :], slab_ref, sem_ref)
    dma.start()

    # Canonical coordinates of this tile (cv2 convention: index == coord).
    vs = jax.lax.broadcasted_iota(jnp.float32, (TILE, size), 0) \
        + t * TILE
    us = jax.lax.broadcasted_iota(jnp.float32, (TILE, size), 1)
    h00, h01, h02 = hrow_ref[0, 0], hrow_ref[0, 1], hrow_ref[0, 2]
    h10, h11, h12 = hrow_ref[1, 0], hrow_ref[1, 1], hrow_ref[1, 2]
    h20, h21, h22 = hrow_ref[2, 0], hrow_ref[2, 1], hrow_ref[2, 2]
    denom = h20 * us + h21 * vs + h22
    x = (h00 * us + h01 * vs + h02) / denom
    y = (h10 * us + h11 * vs + h12) / denom

    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = jnp.clip(y0.astype(jnp.int32) - r0, 0, slab - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, slab - 1)

    dma.wait()
    img = slab_ref[:]
    p00 = img[y0i, x0i].astype(jnp.float32)
    p01 = img[y0i, x1i].astype(jnp.float32)
    p10 = img[y1i, x0i].astype(jnp.float32)
    p11 = img[y1i, x1i].astype(jnp.float32)
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    out_ref[:] = top * (1 - fy) + bot * fy


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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],   # frame in HBM
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
