"""Fused Pallas edge kernel: blur + Sobel + NMS in one VMEM round trip.

The XLA path (ops.filters + ops.edges) materializes blur/gx/gy/magnitude
between fusions; this kernel keeps the whole detection-resolution image in
VMEM (256² f32 = 256 KB ≪ 16 MB) and runs the full stack on the VPU with
one HBM read and one write — the "fused Pallas edge kernel" the north-star
names (BASELINE.json).

Boundary contract: exact in the interior, zero within ``BORDER`` pixels of
the frame edge (shift-based neighborhoods wrap there; board detection never
needs frame-border edges).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from camkifu_tpu.ops.filters import gaussian_kernel1d

BORDER = 8


def _shift(x, dy, dx):
    """Value of the neighbor at (+dy, +dx), wrap at borders (zeroed later).

    pltpu.roll only takes non-negative shifts; a shift of -d along an axis
    of length n equals a shift of n - d.
    """
    out = x
    if dy:
        out = pltpu.roll(out, (-dy) % x.shape[0], 0)
    if dx:
        out = pltpu.roll(out, (-dx) % x.shape[1], 1)
    return out


def _edge_compute(x, taps):
    # Separable Gaussian blur (shift + multiply-accumulate on the VPU).
    r = (len(taps) - 1) // 2
    acc = jnp.zeros_like(x)
    for i, t in enumerate(taps):
        acc += t * _shift(x, i - r, 0)
    x = acc
    acc = jnp.zeros_like(x)
    for i, t in enumerate(taps):
        acc += t * _shift(x, 0, i - r)
    x = acc

    # Sobel.
    def smooth_d(a, axis):
        if axis == 0:
            return _shift(a, -1, 0) + 2 * a + _shift(a, 1, 0)
        return _shift(a, 0, -1) + 2 * a + _shift(a, 0, 1)

    def diff_d(a, axis):
        if axis == 0:
            return _shift(a, 1, 0) - _shift(a, -1, 0)
        return _shift(a, 0, 1) - _shift(a, 0, -1)

    gx = smooth_d(diff_d(x, 1), 0)
    gy = smooth_d(diff_d(x, 0), 1)
    mag = jnp.sqrt(gx * gx + gy * gy)

    # NMS along the quantized gradient direction. Mosaic has no atan2;
    # the 4-way sector falls out of |gy|/|gx| against tan(22.5°)/tan(67.5°)
    # and the sign of gx·gy for the two diagonals.
    t1, t2 = np.tan(np.pi / 8), np.tan(3 * np.pi / 8)
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    sector = jnp.where(
        ay < t1 * ax, 0,
        jnp.where(ay > t2 * ax, 2,
                  jnp.where(gx * gy >= 0, 1, 3))).astype(jnp.int32)
    n1 = [_shift(mag, 0, 1), _shift(mag, 1, 1),
          _shift(mag, 1, 0), _shift(mag, 1, -1)]
    n2 = [_shift(mag, 0, -1), _shift(mag, -1, -1),
          _shift(mag, -1, 0), _shift(mag, -1, 1)]
    sel1 = jnp.zeros_like(mag)
    sel2 = jnp.zeros_like(mag)
    for s in range(4):
        sel1 = jnp.where(sector == s, n1[s], sel1)
        sel2 = jnp.where(sector == s, n2[s], sel2)
    keep = (mag >= sel1) & (mag >= sel2)
    out = jnp.where(keep, mag, 0.0)

    # Zero the wrapped border band.
    h, w = out.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((rows >= BORDER) & (rows < h - BORDER)
                & (cols >= BORDER) & (cols < w - BORDER))
    return jnp.where(interior, out, 0.0)


def _edge_kernel(img_ref, out_ref, *, taps):
    out_ref[:] = _edge_compute(img_ref[:], taps)


def _edge_kernel_batch(img_ref, out_ref, *, taps):
    # One grid step per frame: the (1, H, W) block squeezes to the same
    # whole-image VPU computation as the single-frame kernel.
    out_ref[0] = _edge_compute(img_ref[0], taps)


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def edge_magnitude(gray: jnp.ndarray, sigma: float = 1.4,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused blur+Sobel+NMS magnitudes of a (H, W) gray image in [0, 1]."""
    taps = tuple(float(t) for t in gaussian_kernel1d(sigma))
    return pl.pallas_call(
        functools.partial(_edge_kernel, taps=taps),
        out_shape=jax.ShapeDtypeStruct(gray.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gray.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def edge_magnitude_batch(gray: jnp.ndarray, sigma: float = 1.4,
                         interpret: bool = False) -> jnp.ndarray:
    """Batched fused edges: (B, H, W) gray in [0, 1] → (B, H, W) magnitudes.

    The single-frame kernel cannot be vmapped (the batching rule lands the
    batch on the lane dimension); this variant runs one grid step per frame
    instead — same VPU body, VMEM-resident block per step — so the batched
    detection coarse stage keeps the Pallas path instead of falling back to
    XLA (measured r3: the XLA edge path costs ~2× per frame under vmap).
    """
    taps = tuple(float(t) for t in gaussian_kernel1d(sigma))
    b, h, w = gray.shape
    return pl.pallas_call(
        functools.partial(_edge_kernel_batch, taps=taps),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gray.astype(jnp.float32))
