"""Pallas Hough accumulator: scatter-accumulate as MXU one-hot matmuls.

The north-star's "Pallas Hough accumulator (scatter-add into (ρ,θ) bins)"
(BASELINE.json; SURVEY §7 stage 5). TPU has no fast scatter, so each
θ-tile's votes are accumulated as a batched one-hot matmul: for a chunk of
points, build the (chunk, Nρ) bilinear-splat matrix in VMEM on the VPU and
contract it with the point weights on the MXU — nothing big ever
materializes in HBM (the XLA path in ops.hough keeps (chunk, K, Nρ) splat
tensors alive between fusions).

Grid: one program per θ-tile; per program a fori_loop walks the K points in
chunks, accumulating into a (T_TILE, Nρ) VMEM scratch.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 8          # θ rows per program
CHUNK = 512         # points per inner step


def _hough_kernel(x_ref, y_ref, w_ref, trig_ref, out_ref, acc_ref, *,
                  n_rho, rho_max, n_chunks):
    cos = trig_ref[:, 0][:, None]                   # (T_TILE, 1)
    sin = trig_ref[:, 1][:, None]
    rho_scale = (n_rho - 1) / (2.0 * rho_max)
    # Mosaic iota must be integer-typed; compare in int32.
    bins = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, n_rho), 1)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    # Static unrolled walk over chunks and the tile's θ rows: everything a
    # 2D op (Mosaic compiles 3D elementwise/contraction patterns very
    # slowly); each step is a (CHUNK, n_rho) VPU splat + a (1, CHUNK) @
    # (CHUNK, n_rho) MXU matmul.
    for i in range(n_chunks):
        x = x_ref[i, :]                             # (CHUNK,)
        y = y_ref[i, :]
        w = w_ref[i, :]
        rho = cos * x[None, :] + sin * y[None, :]             # (T, CHUNK)
        pos = jnp.clip((rho + rho_max) * rho_scale, 0.0, n_rho - 1.001)
        lo_f = jnp.floor(pos)
        lo_i = lo_f.astype(jnp.int32)
        fr = pos - lo_f
        for t in range(T_TILE):
            lo_t = lo_i[t][:, None]                 # (CHUNK, 1)
            fr_t = fr[t][:, None]
            splat = jnp.where(bins == lo_t, 1.0 - fr_t, 0.0) \
                + jnp.where(bins == lo_t + 1, fr_t, 0.0)
            acc_ref[t, :] += jnp.dot(
                w[None, :], splat,
                preferred_element_type=jnp.float32)[0]

    out_ref[:] = acc_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("rho_max", "n_theta", "n_rho",
                                    "interpret"))
def hough_accumulate_pallas(points: jnp.ndarray, weights: jnp.ndarray,
                            rho_max: float, n_theta: int = 128,
                            n_rho: int = 256,
                            interpret: bool = False) -> jnp.ndarray:
    """(K, 2) points + (K,) weights → (n_theta, n_rho) vote accumulator.

    Same contract as ops.hough.hough_accumulate (bilinear ρ splat, θ bins
    centered on (i + 0.5)·π/n_theta). K must be a multiple of 512.
    """
    k = points.shape[0]
    if k % CHUNK:
        pad = CHUNK - k % CHUNK
        points = jnp.pad(points, ((0, pad), (0, 0)))
        weights = jnp.pad(weights, (0, pad))
        k += pad
    n_chunks = k // CHUNK
    xs = points[:, 0].reshape(n_chunks, CHUNK).astype(jnp.float32)
    ys = points[:, 1].reshape(n_chunks, CHUNK).astype(jnp.float32)
    ws = weights.reshape(n_chunks, CHUNK).astype(jnp.float32)
    thetas = (np.arange(n_theta, dtype=np.float32) + 0.5) * (np.pi / n_theta)
    trig = jnp.asarray(np.stack([np.cos(thetas), np.sin(thetas)],
                                axis=-1))            # (T, 2)

    grid = n_theta // T_TILE
    full = pl.BlockSpec((n_chunks, CHUNK), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_hough_kernel, n_rho=n_rho,
                          rho_max=float(rho_max), n_chunks=n_chunks),
        grid=(grid,),
        in_specs=[
            full, full, full,
            pl.BlockSpec((T_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T_TILE, n_rho), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_theta, n_rho), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T_TILE, n_rho), jnp.float32)],
        interpret=interpret,
    )(xs, ys, ws, trig)
