"""Radial lens distortion model (single-coefficient k1).

Real webcams are not pinhole cameras: straight goban lines bow outward
(barrel, k1 > 0) or inward (pincushion, k1 < 0). The detection/reading
model everywhere else in this package is a homography + straight lattice;
measured on synthetic distorted footage (tools/lens_probe.py) that model
silently degrades — 0.44 cells corner error at k1 = 0.04, 1.25 cells at
0.08, and a catastrophic confident misfire at k1 = −0.08 — while typical
cheap webcams sit at |k1| ≈ 0.03–0.08.

Design (TPU-first): the lens is composed into SAMPLE COORDINATES, never
into pixels. Every rectification in the pipeline is an inverse warp — for
each output pixel, compute a source coordinate and gather. Making those
samplers lens-aware costs a handful of FLOPs per coordinate (nothing
against the gather itself) and zero extra HBM traffic, whereas
undistorting whole frames up front would add a full-frame gather per
frame. Corner coordinates remain RAW (distorted) frame positions
throughout the system — they are what detection sees, what the tracker
measures, and where the board actually sits in the image; lens-aware code
converts to pinhole coordinates only transiently, to build homographies:

    H = homography_dlt(canonical, undistort(corners, lens))
    src = distort(apply_homography(H, grid), lens)      # then gather

With ``k1 == 0`` both conversions are exact identities, so the lens
parameter defaults to "off" everywhere and existing call sites/jit caches
are unchanged.

Model (matches utils/synth.py:render_frame's ground-truth convention): a
pinhole point p_u appears in the frame at

    p_d = c + (p_u − c) · (1 + k1 · r_u²),   r_u = |p_u − c| / s

with c the frame center and s half the SHORT frame side. The inverse
(undistort) has no closed form; 8 Newton iterations on the radius are
exact to <1e-3 px across the invertible domain (see undistort_pts).

Reference parity: CamKifu has no distortion handling at all (its author
used a laptop camera with mild optics); this is a robustness extension the
sim-real gap analysis (VERDICT r2 missing #1) demanded.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Lens(NamedTuple):
    """Radial model bound to one image geometry.

    k1: distortion coefficient (0 = pinhole; traced or python scalar).
    cx, cy: distortion center in THIS image's pixel coordinates.
    sx, sy: anisotropic normalization — a point p in this image maps to
    normalized radius via ((px−cx)/sx, (py−cy)/sy). For a full frame
    sx = sy = min(h, w)/2; for an anisotropically resized copy (the
    detection square) the axes scale independently, which keeps the model
    identical to the full-frame one expressed in resized coordinates.
    """
    k1: jnp.ndarray | float
    cx: float
    cy: float
    sx: float
    sy: float


def make_lens(k1, frame_hw: tuple[int, int]) -> Lens:
    """Lens for a full (h, w) frame — synth/webcam convention."""
    h, w = frame_hw
    s = min(h, w) / 2.0
    return Lens(k1, w / 2.0, h / 2.0, s, s)


def scale_lens(lens: Lens, sx: float, sy: float) -> Lens:
    """The same physical lens expressed in coordinates of an image scaled
    by (sx, sy) — e.g. the res×res detection square cut from a full frame
    (sx = res/w, sy = res/h)."""
    return Lens(lens.k1, lens.cx * sx, lens.cy * sy,
                lens.sx * sx, lens.sy * sy)


def identity_lens() -> Lens:
    return Lens(0.0, 0.0, 0.0, 1.0, 1.0)


def stack_lenses(lenses) -> Lens:
    """N per-stream Lens models → one Lens whose leaves are (N,) arrays,
    for stream-sharded engines (parallel/mesh.py multistream_track_read:
    independent streams come from different physical cameras)."""
    return Lens(*(jnp.asarray([getattr(ln, f) for ln in lenses],
                              jnp.float32) for f in Lens._fields))


def _norm(lens: Lens, pts: jnp.ndarray):
    nx = (pts[..., 0] - lens.cx) / lens.sx
    ny = (pts[..., 1] - lens.cy) / lens.sy
    return nx, ny


def distort_pts(lens: Lens | None, pts: jnp.ndarray) -> jnp.ndarray:
    """Pinhole → raw frame coordinates; (..., 2), identity when lens is
    None or k1 == 0 (the k1 == 0 case is algebraically exact, so a static
    0.0 lens costs nothing after constant folding)."""
    if lens is None:
        return pts
    nx, ny = _norm(lens, pts)
    f = 1.0 + lens.k1 * (nx * nx + ny * ny)
    return jnp.stack([lens.cx + nx * f * lens.sx,
                      lens.cy + ny * f * lens.sy], axis=-1)


def undistort_pts(lens: Lens | None, pts: jnp.ndarray,
                  iters: int = 8) -> jnp.ndarray:
    """Raw frame → pinhole coordinates (Newton inverse of
    :func:`distort_pts` on the radius; <1e-3 px across the invertible
    domain — everywhere for barrel, and up to the fold radius
    r = sqrt(−1/(3·k1)) for pincushion, beyond which the physical model
    itself is non-injective; the guard on the derivative keeps the
    iteration finite there rather than exact).

    Newton, not the naive r ← r_d/(1+k1·r²) fixed point: at frame-corner
    radii (r ≈ 2 with the short-side normalization) the fixed point
    contracts too slowly (3e-2 px residual after 4 iterations at
    k1 = 0.08) and diverges for strong pincushion; Newton lands <1e-6 in
    the same iteration count."""
    if lens is None:
        return pts
    nx, ny = _norm(lens, pts)
    rd = jnp.sqrt(nx * nx + ny * ny)
    r = rd
    for _ in range(iters):
        g = r * (1.0 + lens.k1 * r * r) - rd
        dg = 1.0 + 3.0 * lens.k1 * r * r
        dg = jnp.where(jnp.abs(dg) < 0.05, jnp.sign(dg) * 0.05 + (dg == 0)
                       * 0.05, dg)
        r = r - g / dg
    f = jnp.where(rd > 1e-9, r / jnp.maximum(rd, 1e-9), 1.0)
    return jnp.stack([lens.cx + nx * f * lens.sx,
                      lens.cy + ny * f * lens.sy], axis=-1)


def undistort_frame(frame: jnp.ndarray, lens: Lens) -> jnp.ndarray:
    """Resample a raw (H, W[, C]) frame to pinhole geometry (one bilinear
    gather).

    Hot paths never use this — they compose the lens into their sample
    coordinates for free (see module docstring). This exists for the
    ANCHOR path only: full board detection is a deep pipeline of
    rect-space machinery whose geometry all assumes straight lines, and
    anchoring is rare (once per bf_period, or on a trip-wire), so paying
    one extra full-frame gather there buys running the entire existing
    detector unchanged on straightened content.
    """
    from camkifu_tpu.ops.warp import bilinear_sample

    h, w = frame.shape[0], frame.shape[1]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(xs, ys, indexing="xy")
    src = distort_pts(lens, jnp.stack([xx, yy], axis=-1))
    squeeze = frame.ndim == 2
    img = frame[..., None] if squeeze else frame
    out = bilinear_sample(img, src[..., 0], src[..., 1])
    if frame.dtype == jnp.uint8:
        out = jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)
    return out[..., 0] if squeeze else out
