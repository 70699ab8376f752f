"""Separable filters: Gaussian blur, Sobel gradients.

Replaces ``cv2.GaussianBlur`` and the gradient stage of ``cv2.Canny``
(SURVEY §2.3). Implemented as separable depthwise convolutions — XLA fuses
these tightly on TPU; a dedicated Pallas kernel fuses the full edge stack in
ops/pallas/edge_kernel.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv1d(img: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    """Convolve a 2D image along one axis with edge padding.

    Shift-accumulate, not conv_general_dilated: a 1-channel NHWC conv
    starves the MXU (C=1 → 1/128 utilization) and cost ~1 ms/frame at
    batch scale, while k static slices + multiply-adds are pure VPU work
    and exact f32 (no bf16 conv-precision trap)."""
    k = np.asarray(kernel, np.float32)
    r = (len(k) - 1) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    padded = jnp.pad(img.astype(jnp.float32), pad, mode="edge")
    n = img.shape[axis]
    out = None
    for i, t in enumerate(k):
        sl = lax.slice_in_dim(padded, i, i + n, axis=axis)
        out = float(t) * sl if out is None else out + float(t) * sl
    return out


def gaussian_blur(img: jnp.ndarray, sigma: float = 1.4) -> jnp.ndarray:
    """Separable Gaussian blur of a 2D image."""
    k = gaussian_kernel1d(sigma)
    return _conv1d(_conv1d(img, k, 0), k, 1)


# Sobel kernels (cv2 convention).
_SOBEL_SMOOTH = np.array([1.0, 2.0, 1.0], np.float32)
_SOBEL_DIFF = np.array([-1.0, 0.0, 1.0], np.float32)


def sobel(img: jnp.ndarray):
    """Sobel gradients of a 2D image → (gx, gy)."""
    gx = _conv1d(_conv1d(img, _SOBEL_SMOOTH, 0), _SOBEL_DIFF, 1)
    gy = _conv1d(_conv1d(img, _SOBEL_DIFF, 0), _SOBEL_SMOOTH, 1)
    return gx, gy
