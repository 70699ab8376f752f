"""BoardFinderAuto — automatic goban localization.

Parity: ``camkifu/board/bf_auto.py`` (SURVEY §2.1/§3.2) — grayscale → blur →
Canny → contour/Hough analysis → corner candidates, accumulated over rounds
and committed when stable. TPU-first: the contour walk is replaced by Hough
line families (SURVEY §2.3: "quad fitting from Hough peaks … same observable
output: 4 corners"):

1. downscale gray frame to a square detection resolution;
2. edge map (ops.edges) → top-K votes → (θ, ρ) accumulator (ops.hough);
3. find the two dominant, roughly-perpendicular θ families; within each, the
   *extreme* strong lines (min/max center-signed ρ) bound the board slab —
   their 4 intersections are a coarse board quadrilateral;
4. **grid refinement**: rectify the frame by the coarse quad, project edge
   energy onto each axis, and fit a 19-tooth comb (offset + spacing search)
   to the 1D profiles — grid lines are axis-aligned after rectification, so
   this pins the *outer grid line* positions to sub-pixel without any
   data-dependent contour walk; map the 4 outer-grid intersections back
   through the rectifying homography. Iterated twice.
5. temporal stabilization: median over a batch (fixed camera) or EMA + crude
   outlier rejection across frames (handheld, BASELINE config 4).

Output corners are ordered tl/tr/br/bl in full-frame pixel coordinates and
are the goban's corner *intersections* (the canonical warp's anchors).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from camkifu_tpu.config import cvconf
from camkifu_tpu.ops.color import rgb_to_gray, rgb_to_gray_u8, to_float
from camkifu_tpu.ops.edges import edge_map
from camkifu_tpu.ops.filters import sobel
from camkifu_tpu.ops.hough import hough_accumulate, topk_edge_points
from camkifu_tpu.ops.warp import (apply_homography, bilinear_sample,
                                  homography_dlt, _subpixel_shift)

#: Angular half-window (radians) around a family's dominant θ.
FAMILY_WINDOW = np.pi / 8

#: A line must carry at least this fraction of its family's best vote to be
#: eligible as a board edge. Low on purpose: on dense boards the stone rows
#: vote far harder than the slab edges, and perspective weakens the far
#: edge — the tight FAMILY_WINDOW + peak NMS do the noise rejection.
MIN_LINE_STRENGTH = 0.12

#: Rectification resolution for the grid-comb refinement.
REFINE_RES = 320


def _angdiff(a, b):
    """Angular distance on the line-orientation circle (period π)."""
    d = jnp.abs(a - b) % np.pi
    return jnp.minimum(d, np.pi - d)


def _line_intersection(t1, r1, t2, r2):
    """Intersection of x·cosθ + y·sinθ = ρ pairs → (x, y)."""
    det = jnp.cos(t1) * jnp.sin(t2) - jnp.sin(t1) * jnp.cos(t2)
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    x = (r1 * jnp.sin(t2) - r2 * jnp.sin(t1)) / det
    y = (r2 * jnp.cos(t1) - r1 * jnp.cos(t2)) / det
    return x, y


def _order_quad(pts_xy: jnp.ndarray) -> jnp.ndarray:
    """Order 4 points tl/tr/br/bl (image y grows downward)."""
    ctr = pts_xy.mean(axis=0)
    ang = jnp.arctan2(pts_xy[:, 1] - ctr[1], pts_xy[:, 0] - ctr[0])
    ordered = pts_xy[jnp.argsort(ang)]
    roll = jnp.argmin(ordered.sum(axis=1))
    ordered = jnp.roll(ordered, -roll, axis=0)
    flipped = ordered[jnp.array([0, 3, 2, 1])]
    return jnp.where(ordered[1, 0] >= ordered[3, 0], ordered, flipped)


def _box_blur(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable box filter via cumulative sums (O(n), any radius)."""
    def along(a, axis):
        c = jnp.cumsum(a, axis=axis)
        n = a.shape[axis]
        pad = [(0, 0), (0, 0)]
        pad[axis] = (radius + 1, radius)
        cp = jnp.pad(c, pad, mode="edge")
        # window sum = c[i+r] - c[i-r-1]
        hi = jax.lax.slice_in_dim(cp, 2 * radius + 1, 2 * radius + 1 + n,
                                  axis=axis)
        lo = jax.lax.slice_in_dim(cp, 0, n, axis=axis)
        return (hi - lo) / (2 * radius + 1)
    return along(along(img, 0), 1)


def _coarse_quad(gray_small: jnp.ndarray,
                 chroma_small: jnp.ndarray | None = None):
    """Edge-density board-region quadrilateral on the detection-res gray.

    The board is the region dense in edges (grid lines and/or stones) against
    a quiet table; its four extreme points along the ±45° projections are the
    slab corners. This replaces the reference's findContours board-outline
    walk with dense ops (SURVEY §2.3) and is stone-density-agnostic — Hough
    line extremes fail on full boards where stone rows out-vote slab edges.

    ``chroma_small`` (same res, an R−B opponent channel) contributes a second
    edge map, union-merged after per-channel normalization: dark woods
    (walnut) can have near-zero *luma* contrast against the table and heavily
    attenuated far-corner grid lines, yet stay strongly separated in chroma —
    wood is the reddest surface in the scene. cv2.Canny-on-gray (the
    reference, SURVEY §2.3) misses these boards entirely.

    Returns (quad (4, 2) in detection-res coords, score); score < ~0.1 means
    "no board found".
    """
    res = gray_small.shape[0]
    mag = edge_map(gray_small)
    if chroma_small is not None:
        mag_c = edge_map(chroma_small)
        # Union in per-channel-normalized units: luma and chroma gradient
        # amplitudes are not comparable (different dynamic ranges), but each
        # edge_map is already thresholded relative to its own 99.5th pctl.
        mag = jnp.maximum(mag / jnp.maximum(jnp.percentile(mag, 99.5), 1e-6),
                          mag_c / jnp.maximum(jnp.percentile(mag_c, 99.5),
                                              1e-6))
    density = _box_blur((mag > 0).astype(jnp.float32), radius=7)
    mask = density > 0.06

    ys = jax.lax.broadcasted_iota(jnp.float32, (res, res), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (res, res), 1)

    def corner(proj, k=49):
        p = jnp.where(mask, proj, -jnp.inf).reshape(-1)
        _, idx = jax.lax.top_k(p, k)
        cx = jnp.median(xs.reshape(-1)[idx])
        cy = jnp.median(ys.reshape(-1)[idx])
        return jnp.stack([cx, cy])

    quad = _order_quad(jnp.stack([
        corner(-(xs + ys)),        # tl
        corner(xs - ys),           # tr
        corner(xs + ys),           # br
        corner(ys - xs),           # bl
    ]))

    # Score: edge density must be *concentrated in* the quad — a board is a
    # dense region on a quiet table; uniform texture (no board) scores ~0.
    inside = jnp.ones((res, res), bool)
    for i in range(4):
        p0, p1 = quad[i], quad[(i + 1) % 4]
        e = p1 - p0
        inside &= ((xs - p0[0]) * e[1] - (ys - p0[1]) * e[0]) <= 0
    in_mean = jnp.where(inside, density, 0.0).sum() \
        / jnp.maximum(inside.sum(), 1)
    out_count = (~inside).sum()
    out_mean = jnp.where(~inside, density, 0.0).sum() \
        / jnp.maximum(out_count, 1)
    # Concentration *ratio*, not absolute density difference: a defocused
    # empty pale board has very few edges (thin blurred grid lines only),
    # but whatever edges exist are still entirely inside the quad. Absolute
    # in−out scaling made the score collapse with edge abundance.
    diff = jnp.where(out_count > 0.05 * res * res,
                     in_mean - out_mean, in_mean)
    contrast = diff / jnp.maximum(in_mean, 1e-3)
    # A board also has *line structure*: the Hough accumulator of its edges
    # is sharply peaked (grid lines / stone rows), while texture or noise —
    # which can fool the percentile-adaptive edge threshold into a dense
    # mask — votes diffusely. Measured peak/mean: noise ≈ 6, boards 10–25.
    pts, wts = topk_edge_points(mag)
    acc = hough_accumulate(pts, wts, float(np.hypot(res, res)))
    peakedness = acc.max() / jnp.maximum(acc.mean(), 1e-6)
    structure = jnp.clip((peakedness - 7.0) / 6.0, 0.0, 1.0)

    e1 = quad[1] - quad[0]
    e2 = quad[3] - quad[0]
    quad_area = jnp.abs(e1[0] * e2[1] - e1[1] * e2[0])
    score = jnp.clip(contrast, 0.0, 1.0) * structure \
        * (quad_area > (0.15 * res) ** 2)
    return quad, score


def _interp1d_hat(profile: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of a 1D profile at data-dependent positions,
    gather-free: interp(p) = Σ_b max(0, 1−|b−p|)·profile[b] — a dense hat-
    weight contraction the VPU/MXU eats, where the equivalent tiny gathers
    scalarize on TPU (measured: the comb fit dropped 9.4→~1 ms)."""
    n = profile.shape[0]
    p = jnp.clip(pos, 0.0, n - 1.001)
    bins = jnp.arange(n, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(bins - p[..., None]))    # (..., n)
    return w @ profile


@functools.lru_cache(maxsize=8)
def _comb_matrices(n: int, gsize: int, n_offsets: int, n_spacings: int):
    """Precomputed comb-scoring operators: the comb-grid positions depend
    only on static shapes, so scoring every (offset, spacing) comb reduces
    to two constant (O·S, n) matrices applied to the profile — one matvec
    instead of ~230k scalarized gathers."""
    spacings = np.linspace(0.70 * n / gsize, 1.02 * n / (gsize - 1),
                           n_spacings, dtype=np.float32)
    offsets = np.linspace(0.0, 0.30 * n, n_offsets, dtype=np.float32)
    idx = np.arange(gsize, dtype=np.float32)                # teeth
    mid = np.arange(gsize - 1, dtype=np.float32) + 0.5      # between-line gaps
    pos = offsets[:, None, None] + spacings[None, :, None] * idx   # (O,S,g)
    gaps = offsets[:, None, None] + spacings[None, :, None] * mid
    valid = pos[..., -1] <= n - 1.0

    def interp_matrix(positions, teeth):
        flat = np.clip(positions.reshape(-1, teeth), 0.0, n - 1.001)
        bins = np.arange(n, dtype=np.float32)
        w = np.maximum(0.0, 1.0 - np.abs(bins - flat[..., None]))
        return w.mean(axis=1).astype(np.float32)            # (O·S, n)

    return (offsets, spacings, interp_matrix(pos, gsize),
            interp_matrix(gaps, gsize - 1), valid.astype(np.float32))


def _comb_scores(profile: jnp.ndarray, gsize: int, n_offsets: int = 64,
                 n_spacings: int = 48):
    """The (offset, spacing) comb-score grids on a 1D edge-energy profile.

    Returns (offsets (O,), spacings (S,), teeth_score (O, S), gap_score
    (O, S), valid (O, S)) — computed once and shared by every gap-weight
    scoring raced on this profile.

    Two signals: teeth on high profile; mid-gaps on low(er) profile. The
    gap penalty breaks the basin where the comb stretches one tooth onto
    the board-slab edge — but on near-full boards stone bodies span almost
    the whole cell and the penalty misleads, hence gap_weight is raced by
    the caller (racing is ~free: only these grids carry real work).
    """
    n = profile.shape[0]
    offsets, spacings, a_teeth, a_gaps, valid = _comb_matrices(
        n, gsize, n_offsets, n_spacings)
    teeth_score = (jnp.asarray(a_teeth) @ profile).reshape(
        n_offsets, n_spacings)
    gap_score = (jnp.asarray(a_gaps) @ profile).reshape(n_offsets, n_spacings)
    return (jnp.asarray(offsets), jnp.asarray(spacings), teeth_score,
            gap_score, jnp.asarray(valid) > 0)


def _comb_fit(profile: jnp.ndarray, gsize: int, n_offsets: int = 64,
              n_spacings: int = 48, gap_weight: float = 0.0):
    """Fit a gsize-tooth even comb to a 1D edge-energy profile under one
    gap-weight scoring → (offset, spacing, gap-penalized quality)."""
    offsets, spacings, teeth_score, gap_score, valid = _comb_scores(
        profile, gsize, n_offsets, n_spacings)
    scores = jnp.where(valid, teeth_score - gap_weight * gap_score, -jnp.inf)
    flat = jnp.argmax(scores)
    oi, si = flat // n_spacings, flat % n_spacings
    # Quality under the *common* metric (gap-penalized) for cross-candidate
    # comparison, regardless of which metric selected this comb.
    quality = (teeth_score - gap_score).reshape(-1)[flat]
    return offsets[oi], spacings[si], quality


def _snap_teeth(profile: jnp.ndarray, o, s, gsize: int):
    """Sub-pixel comb polish: snap each tooth to the parabolic peak of the
    profile within ±s/3, then weighted-least-squares refit (o, s).

    Stone edges sit ±0.47·s off the lines — outside the snap window — so
    the snap can only lock onto the line (or stone-center) ridge itself.
    """
    n = profile.shape[0]
    n_off = 21

    idx = jnp.arange(gsize, dtype=jnp.float32)
    teeth = o + s * idx                                    # (g,)
    offs = jnp.linspace(-1.0, 1.0, n_off) * (s / 3.0)      # (n_off,)
    win = _interp1d_hat(profile, teeth[:, None] + offs[None, :])  # (g, n_off)
    best = jnp.argmax(win, axis=1)
    # Parabolic sub-step around the discrete peak.
    bm1 = win[jnp.arange(gsize), jnp.clip(best - 1, 0, n_off - 1)]
    bp1 = win[jnp.arange(gsize), jnp.clip(best + 1, 0, n_off - 1)]
    b0 = win[jnp.arange(gsize), best]
    den = bm1 - 2 * b0 + bp1
    delta = jnp.where(jnp.abs(den) > 1e-9, 0.5 * (bm1 - bp1) / den, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    step = offs[1] - offs[0]
    snapped = teeth + offs[best] + delta * step            # (g,)
    # Weighted LS fit snapped ≈ o' + i·s' (weights = peak strength).
    w = jnp.maximum(b0, 1e-6)
    sw = w.sum()
    mi = (w * idx).sum() / sw
    mp = (w * snapped).sum() / sw
    var = (w * (idx - mi) ** 2).sum()
    s2 = (w * (idx - mi) * (snapped - mp)).sum() / jnp.maximum(var, 1e-9)
    o2 = mp - s2 * mi
    # Sanity: keep the comb fit if the refit drifted implausibly.
    ok = (jnp.abs(s2 - s) < 0.2 * s) & (jnp.abs(o2 - o) < 0.5 * s)
    return jnp.where(ok, o2, o), jnp.where(ok, s2, s)


def _comb_quality(profile: jnp.ndarray, o, s, gsize: int):
    """Gap-penalized comb score at exactly (o, s), for cross-basin ranking.

    Combs whose teeth run off the profile window cannot be the true grid
    (the rectified window always covers the seed quad plus margin) — they
    get a disqualifying penalty rather than a clipped-interpolation score.
    """
    n = profile.shape[0]
    idx = jnp.arange(gsize, dtype=jnp.float32)
    mid = jnp.arange(gsize - 1, dtype=jnp.float32) + 0.5

    q = _interp1d_hat(profile, o + s * idx).mean() \
        - _interp1d_hat(profile, o + s * mid).mean()
    out = (o < 0.0) | (o + s * (gsize - 1) > n - 1.0)
    return q - 10.0 * out


def _rect_profiles(gray: jnp.ndarray, quad: jnp.ndarray, gsize: int,
                   margin: float = 0.08, res: int = REFINE_RES):
    """Rectify by `quad` (+outward margin) → (H, col_profile, row_profile).

    Split from the comb fit so callers racing several comb scorings on the
    SAME seed pay the rectification warp (the expensive part, a res² gather
    + Sobel) once.
    """
    H = _rect_H(quad, margin, res)
    rect = _sample_rect(gray, H, res)
    col_profile, row_profile = _profiles_of(rect, gsize)
    return H, col_profile, row_profile


def _rect_H(quad: jnp.ndarray, margin: float, res: int) -> jnp.ndarray:
    """Homography rect → frame for the quad expanded outward by `margin`
    (the gather-friendly direction)."""
    ctr = quad.mean(axis=0)
    equad = ctr + (quad - ctr) * (1.0 + margin)
    unit = jnp.array([[0.0, 0.0], [res - 1.0, 0.0],
                      [res - 1.0, res - 1.0], [0.0, res - 1.0]], jnp.float32)
    return homography_dlt(unit, equad)


def _sample_rect(gray: jnp.ndarray, H: jnp.ndarray, res: int) -> jnp.ndarray:
    """Rectify `gray` through H → (res, res) float32.

    The gather dominates detection; uint8 gray reads 4× fewer bytes per
    tap (bilinear_sample converts only the taps), and every downstream
    profile statistic is percentile/max-normalized → scale-free.
    """
    us = jnp.arange(res, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(us, us, indexing="xy")
    src = apply_homography(H, jnp.stack([uu, vv], axis=-1))
    rect = bilinear_sample(gray[..., None], src[..., 0], src[..., 1])[..., 0]
    if gray.dtype == jnp.uint8:
        rect = rect * (1.0 / 255.0)
    return rect


def _profiles_of(rect: jnp.ndarray, gsize: int):
    """Rectified board image → (col_profile, row_profile) lattice signals."""
    res = rect.shape[0]
    gx, gy = sobel(rect)
    interior = slice(res // 8, res - res // 8)

    def prep(profile):
        # Clip spikes: the board/table slab edge is far stronger than grid
        # lines and would otherwise buy a one-tooth-shifted comb; after
        # clipping, 19 aligned medium peaks always beat one saturated edge.
        p = jnp.minimum(profile, jnp.percentile(profile, 90))
        # High-pass at the cell scale: wide bands (table margins, shading
        # gradients) carry no lattice information but would bias the comb;
        # only the ~cell-periodic structure should score.
        n = p.shape[0]
        r = max(2, n // (2 * gsize))
        c = jnp.cumsum(jnp.pad(p, (r + 1, r), mode="edge"))
        local_mean = (c[2 * r + 1:] - c[:n]) / (2 * r + 1)
        p = jnp.maximum(p - local_mean, 0.0)
        return p / jnp.maximum(p.max(), 1e-6)

    # Two lattice signals, both peaking ON the grid lines: gradient energy
    # (grid lines, sparse boards) and luma deviation from the wood level
    # (stones sit centered on intersections — on near-full boards stone
    # *edges* peak half a cell off-line in the gradient profile, but stone
    # *bodies* peak on it in the deviation profile).
    # Wood level: radix-select median of a 4×-subsampled view — runs per
    # frame in the tracking path, where jnp.median's sort was a hotspot
    # (TPU sorts; see ops.zones.median_u8).
    from camkifu_tpu.ops.zones import median_u8
    wood = median_u8(rect[::4, ::4].reshape(1, -1))[0]
    dev = jnp.abs(rect - wood)
    col_profile = prep(jnp.abs(gx)[interior, :].mean(axis=0)) \
        + prep(dev[interior, :].mean(axis=0))
    row_profile = prep(jnp.abs(gy)[:, interior].mean(axis=1)) \
        + prep(dev[:, interior].mean(axis=1))
    return col_profile, row_profile


def _fit_combs(H: jnp.ndarray, col_profile: jnp.ndarray,
               row_profile: jnp.ndarray, gsize: int, gap_weight: float):
    """Comb-fit both axes on precomputed profiles.

    Returns (corners (4, 2) in frame coordinates, comb quality scalar,
    variant corners (9, 4, 2), variant qualities (9,)): the variants are the
    comb translated by {-1, 0, +1} teeth along each axis — the comb's basins
    are one tooth apart, and no in-basin scoring can tell "19 teeth on the
    grid" from "18 on the grid + 1 on the slab edge" in every scene; the
    caller races all basins under the slab-containment prior instead.
    """
    ox, sx, qx = _comb_fit(col_profile, gsize, gap_weight=gap_weight)
    oy, sy, qy = _comb_fit(row_profile, gsize, gap_weight=gap_weight)
    ox, sx = _snap_teeth(col_profile, ox, sx, gsize)
    oy, sy = _snap_teeth(row_profile, oy, sy, gsize)

    span = gsize - 1.0
    shifts = (-1.0, 0.0, 1.0)
    qxs = [_comb_quality(col_profile, ox + d * sx, sx, gsize) for d in shifts]
    qys = [_comb_quality(row_profile, oy + d * sy, sy, gsize) for d in shifts]
    var_corners, var_q = [], []
    for i, dx in enumerate(shifts):
        for j, dy in enumerate(shifts):
            x0, y0 = ox + dx * sx, oy + dy * sy
            rc = jnp.array([[x0, y0], [x0 + span * sx, y0],
                            [x0 + span * sx, y0 + span * sy],
                            [x0, y0 + span * sy]])
            var_corners.append(apply_homography(H, rc))
            var_q.append(qxs[i] + qys[j])
    corners = var_corners[4]                       # the (0, 0) central comb
    return corners, qx + qy, jnp.stack(var_corners), jnp.stack(var_q)


def _refine_grid(gray: jnp.ndarray, quad: jnp.ndarray, gsize: int,
                 margin: float = 0.08, res: int = REFINE_RES,
                 gap_weight: float = 1.0):
    """Rectify by `quad` (+outward margin) and comb-fit the grid lines
    (_rect_profiles + _fit_combs; see those for the split rationale)."""
    H, col_profile, row_profile = _rect_profiles(gray, quad, gsize, margin,
                                                 res)
    return _fit_combs(H, col_profile, row_profile, gsize, gap_weight)


def _fit_combs_multi(H: jnp.ndarray, col_profile: jnp.ndarray,
                     row_profile: jnp.ndarray, gsize: int,
                     gap_weights=(1.0, 0.0)):
    """Comb-fit both axes under several gap-weight scorings in ONE pass.

    The (offset, spacing) interpolation grids — the expensive part of a comb
    fit — do not depend on the gap weight, so racing G scorings costs one
    grid per axis plus G cheap argmax/snap passes (VERDICT r1 item 3a: the
    two scorings used to recompute the grids).

    Returns (seeds (G, 4, 2) — each scoring's central comb in frame coords,
    variant corners (G*9, 4, 2), variant qualities (G*9,)); the 9 variants
    per scoring are the ±1-tooth-shifted basins (see _fit_combs).
    """
    grid_x = _comb_scores(col_profile, gsize)
    grid_y = _comb_scores(row_profile, gsize)
    span = gsize - 1.0
    shifts = (-1.0, 0.0, 1.0)
    seeds, var_corners, var_q = [], [], []
    for gw in gap_weights:
        def pick(grid):
            offsets, spacings, teeth, gap, valid = grid
            scores = jnp.where(valid, teeth - gw * gap, -jnp.inf)
            flat = jnp.argmax(scores)
            n_sp = spacings.shape[0]
            return offsets[flat // n_sp], spacings[flat % n_sp]
        ox, sx = pick(grid_x)
        oy, sy = pick(grid_y)
        ox, sx = _snap_teeth(col_profile, ox, sx, gsize)
        oy, sy = _snap_teeth(row_profile, oy, sy, gsize)
        qxs = [_comb_quality(col_profile, ox + d * sx, sx, gsize)
               for d in shifts]
        qys = [_comb_quality(row_profile, oy + d * sy, sy, gsize)
               for d in shifts]
        for i, dx in enumerate(shifts):
            for j, dy in enumerate(shifts):
                x0, y0 = ox + dx * sx, oy + dy * sy
                rc = jnp.array([[x0, y0], [x0 + span * sx, y0],
                                [x0 + span * sx, y0 + span * sy],
                                [x0, y0 + span * sy]])
                var_corners.append(apply_homography(H, rc))
                var_q.append(qxs[i] + qys[j])
        seeds.append(var_corners[-5])          # this scoring's (0, 0) comb
    return jnp.stack(seeds), jnp.stack(var_corners), jnp.stack(var_q)


def _slab_inset(corners: jnp.ndarray, slab: jnp.ndarray) -> jnp.ndarray:
    """Smallest inward distance (px) from any candidate corner to the slab
    boundary. Negative = a corner lies outside the slab."""
    dists = []
    for i in range(4):
        p0 = slab[i]
        p1 = slab[(i + 1) % 4]
        e = p1 - p0
        # Inward normal for a tl/tr/br/bl (clockwise on screen) quad.
        n = jnp.stack([-e[1], e[0]])
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-6)
        d = (corners - p0[None, :]) @ n
        dists.append(d.min())
    return jnp.stack(dists).min()


@functools.partial(jax.jit, static_argnames=("res", "gsize", "refine_iters"))
def detect_corners(frame: jnp.ndarray, res: int = cvconf.bf_resolution,
                   gsize: int = 19, refine_iters: int = 2):
    """One frame (H, W, 3) uint8/float → (corners (4, 2) float32, score).

    Corners are the outer grid intersections, tl/tr/br/bl, in frame pixels.
    score < ~0.1 means "no board found" (callers keep the previous estimate).
    """
    with jax.default_matmul_precision("float32"):
        h, w = frame.shape[0], frame.shape[1]
        # uint8 gray for the rectification gathers (see _rect_profiles); the
        # coarse stage works on small resized floats. Converting the whole
        # frame to f32 first would materialize a 24 MB copy at 1080p.
        gray = rgb_to_gray_u8(frame)
        fscale = 1.0 / 255.0 if frame.dtype == jnp.uint8 else 1.0
        small = jax.image.resize(gray.astype(jnp.float32) / 255.0,
                                 (res, res), method="bilinear")
        chroma = jax.image.resize(
            (frame[..., 0].astype(jnp.float32)
             - frame[..., 2].astype(jnp.float32)) * fscale,
            (res, res), method="bilinear")
        quad_small, score = _coarse_quad(small, chroma)
        scale = jnp.array([(w - 1) / (res - 1), (h - 1) / (res - 1)],
                          jnp.float32)
        quad = quad_small * scale[None, :]
        # Multi-hypothesis refinement: the comb fit has discrete shifted
        # basins (one tooth on the slab edge instead of a grid line), and no
        # single scoring beats all stone densities — so race both scorings,
        # iterate each (re-rectifying on detected corners removes projective
        # distortion from the even-spacing assumption), and disambiguate
        # with the slab prior: the true outer grid lines sit strictly
        # *inside* the slab (≥ ~0.3 cell on a real goban); shifted basins
        # always push a corner onto or past a slab edge.
        cell = jnp.linalg.norm(quad[1] - quad[0]) / (gsize + 0.0)
        gap_weights = (1.0, 0.0)
        # Iteration 1: ONE rectification (same seed quad → identical
        # profiles), one comb-grid pass shared by both scorings.
        hcr = _rect_profiles(gray, quad, gsize, margin=0.10)
        seeds, vc, vq = _fit_combs_multi(*hcr, gsize, gap_weights)
        variant_cs, variant_qs = [vc], [vq]
        # Later iterations: each scoring's chain re-rectifies on its own
        # corners — the G rectification warps run as one vmapped batch
        # (VERDICT r1 item 3a), and each refined quad races both scorings
        # (the grids are shared, so extra hypotheses are nearly free).
        for _ in range(refine_iters - 1):
            Hs, cps, rps = jax.vmap(
                lambda q: _rect_profiles(gray, q, gsize, margin=0.18))(seeds)
            new_seeds = []
            for g in range(len(gap_weights)):
                s2, vc, vq = _fit_combs_multi(Hs[g], cps[g], rps[g], gsize,
                                              gap_weights)
                new_seeds.append(s2[g])     # chain continues w/ own scoring
                variant_cs.append(vc)
                variant_qs.append(vq)
            seeds = jnp.stack(new_seeds)

        cs = jnp.concatenate(variant_cs)                    # (N, 4, 2)
        qs = jnp.concatenate(variant_qs)                    # (N,)
        insets = jax.vmap(lambda cand: _slab_inset(cand, quad))(cs)
        feasible = insets >= 0.25 * cell
        # Among feasible candidates take the best comb quality; if none is
        # feasible (slab estimate itself off), fall back to max inset.
        pick_q = jnp.where(feasible, qs, -jnp.inf)
        idx = jnp.where(feasible.any(), jnp.argmax(pick_q),
                        jnp.argmax(insets))
        corners = cs[idx]
        return corners.astype(jnp.float32), score


def detect_batch(frames: jnp.ndarray, res: int = cvconf.bf_resolution,
                 gsize: int = 19):
    """Per-frame detection over a batch → (corners (B, 4, 2), scores (B,)).

    lax.map, not vmap: the Pallas edge kernel cannot be batch-vmapped (the
    batching rule lands the batch on the lane dim), and detection's gathers
    hit the varying-index cliff under vmap anyway; the sequential map runs
    each frame on the fast single-frame path.
    """
    return jax.lax.map(lambda f: detect_corners(f, res, gsize=gsize), frames)


def detect_batch_stable(frames: jnp.ndarray,
                        res: int = cvconf.bf_resolution,
                        gsize: int = 19,
                        max_frames: int = 8) -> jnp.ndarray:
    """Fixed-camera estimate: per-frame detection, then the median corner
    positions over the confident frames (the reference's accumulate-until-
    stable, batch-shaped). Detection costs ~67 ms/frame, so at most
    ``max_frames`` evenly-spaced frames of the batch are detected."""
    b = frames.shape[0]
    if b > max_frames:
        frames = frames[::max(1, b // max_frames)][:max_frames]
    corners, scores = detect_batch(frames, res, gsize)
    ok = (scores >= 0.05)[:, None, None]
    w = ok.astype(jnp.float32)
    # Median over confident frames; fall back to plain median if none pass.
    big = jnp.where(ok, corners, jnp.nan)
    med = jnp.nanmedian(big, axis=0)
    return jnp.where(jnp.isnan(med), jnp.median(corners, axis=0), med)


# ---------------------------------------------------------------------------
# Per-frame corner tracking (BASELINE config 4: honest per-frame detection).
# ---------------------------------------------------------------------------

#: Outward margin of the tracking rectification; also bounds how far the
#: board may move within ~2 chunks before tracking must re-seed.
TRACK_MARGIN = 0.18

#: Correlation search half-window, in cells: how far the board may move
#: between consecutive tracked frames (and per chunk re-seed).
TRACK_WIN_OFFSET = 0.75

#: Correlation-peak sharpness (peak/mean) below which a frame's measurement
#: is rejected (occlusion/motion blur) and the previous offset is kept.
TRACK_MIN_SHARPNESS = 1.5

#: Reference-profile adaptation rate (EMA toward the latest aligned frame,
#: so slow scene changes — new stones — don't decorrelate the reference).
TRACK_REF_EMA = 0.15


def _profile_shift(profile: jnp.ndarray, delta) -> jnp.ndarray:
    """Translate a 1D profile by `delta` (sub-pixel, edge-clamped)."""
    n = profile.shape[0]
    return _interp1d_hat(profile,
                         jnp.arange(n, dtype=jnp.float32) + delta)


def _corr_shift(profiles: jnp.ndarray, ref: jnp.ndarray, S: int):
    """(B, n) profiles × (n,) reference → per-frame sub-pixel translation +
    correlation-peak sharpness, via one (B, n)×(n, 2S+1) matmul.

    corr[s] pairs p[i] with ref[i + s − S]: a peak at s means the profile
    is the reference translated RIGHT by d = S − s.
    """
    n = profiles.shape[-1]
    n_sh = 2 * S + 1
    refp = jnp.pad(ref, (S, S))
    shifted = jnp.stack([jax.lax.dynamic_slice(refp, (s,), (n,))
                         for s in range(n_sh)])             # (2S+1, n)
    corr = profiles @ shifted.T                             # (B, 2S+1)
    best = jnp.argmax(corr, axis=1)
    c0 = jnp.take_along_axis(corr, best[:, None], 1)[:, 0]
    cm = jnp.take_along_axis(
        corr, jnp.clip(best - 1, 0, n_sh - 1)[:, None], 1)[:, 0]
    cp = jnp.take_along_axis(
        corr, jnp.clip(best + 1, 0, n_sh - 1)[:, None], 1)[:, 0]
    den = cm - 2 * c0 + cp
    sub = jnp.where(jnp.abs(den) > 1e-9,
                    jnp.clip(0.5 * (cm - cp) / den, -1, 1), 0.0)
    d = S - (best.astype(jnp.float32) + sub)
    sharp = c0 / jnp.maximum(corr.mean(axis=1), 1e-6)
    return d, sharp


def _hold_bad(d: jnp.ndarray, ok: jnp.ndarray) -> jnp.ndarray:
    """Replace rejected per-frame measurements with the last good one."""
    def hold(carry, x):
        v, good = x
        v = jnp.where(good, v, carry)
        return v, v
    _, out = jax.lax.scan(hold, jnp.float32(0), (d, ok))
    return out


@functools.partial(jax.jit, static_argnames=("gsize", "chunk", "res"))
def track_corners_batch(frames: jnp.ndarray, seed_corners: jnp.ndarray,
                        gsize: int = 19, chunk: int = 8,
                        res: int = REFINE_RES):
    """Per-frame board corners across a batch, tracked from a seed detection.

    Full detection (detect_corners) costs ~24 ms/frame — per-frame
    re-detection would cap BASELINE config 4 at ~40 fps. Tracking measures
    each frame's *board translation* instead, and keeps the gathers
    TPU-fast: the rectification indices are SHARED across each ``chunk``
    consecutive frames (computed from the running seed, a lax.scan carry),
    so the warp vectorizes across the batch — the same shared-index trick
    as ops.warp.warp_batch_chunked. Each frame's lattice profiles are then
    cross-correlated (one batched matmul) against a slowly-adapting
    reference, giving that frame's (dx, dy) to sub-pixel: all ~19 lattice
    peaks vote coherently, which is far more robust frame-to-frame than
    re-fitting a comb on a profile perturbed by newly placed stones.
    Rotation/perspective drift is NOT modeled here — the host finder
    re-runs full detection at bf_period cadence, which re-anchors the seed.

    frames: (B, H, W, 3) uint8/float; seed_corners: (4, 2) from
    detect_corners (or the previous batch's new_seed).
    Returns (corners (B, 4, 2) float32, sharpness (B,), new_seed (4, 2)).
    """
    with jax.default_matmul_precision("float32"):
        b = frames.shape[0]
        gray = jax.vmap(rgb_to_gray_u8)(frames)
        pad = (-b) % chunk
        if pad:
            gray = jnp.concatenate([gray, gray[-1:].repeat(pad, axis=0)])
        k = gray.shape[0] // chunk
        gc = gray.reshape((k, chunk) + gray.shape[1:])

        # Correlation search window, in rect px (static).
        m = TRACK_MARGIN
        s0 = (res - 1.0) / ((1.0 + m) * (gsize - 1))
        S = max(2, int(round(TRACK_WIN_OFFSET * s0)))

        from camkifu_tpu.ops.warp import _inv3

        def body(carry, frames_chunk):
            seed, ref_col, ref_row, ref_ok = carry
            H = _rect_H(seed, TRACK_MARGIN, res)
            # Where the seed corners ACTUALLY land in rect coords — not the
            # analytic (o0, s0): the frame-space margin expansion is not
            # affine, so the projective residual is several px.
            rc_seed = apply_homography(_inv3(H), seed)        # (4, 2)
            rects = jax.vmap(lambda g: _sample_rect(g, H, res))(frames_chunk)
            cols, rows = jax.vmap(lambda r: _profiles_of(r, gsize))(rects)
            # First chunk bootstraps the reference from its first frame (the
            # seed detection ran on/near it, so its lattice sits at rc_seed).
            ref_col = jnp.where(ref_ok, ref_col, cols[0])
            ref_row = jnp.where(ref_ok, ref_row, rows[0])
            dx, sh_x = _corr_shift(cols, ref_col, S)
            dy, sh_y = _corr_shift(rows, ref_row, S)
            sharp = jnp.minimum(sh_x, sh_y)
            ok = sharp >= TRACK_MIN_SHARPNESS
            # Reject low-sharpness frames: hold the last good offset.
            dx = _hold_bad(dx, ok)
            dy = _hold_bad(dy, ok)

            d = jnp.stack([dx, dy], axis=-1)                  # (chunk, 2)
            rcs = rc_seed[None, :, :] + d[:, None, :]
            cs = jax.vmap(lambda rc: apply_homography(H, rc))(rcs)
            # Hand off to the next chunk: it re-rectifies at the last
            # frame's corners, so in ITS rect coords the lattice sits at
            # rc_seed2 (exact). Old-rect positions map to new-rect positions
            # by ≈ translation T = rc_seed2 − (rc_seed + d_last); realign
            # both reference parts onto the new anchor (profile_shift moves
            # content left by its argument, i.e. a peak at p → p − arg).
            new_seed = cs[-1]
            H2 = _rect_H(new_seed, TRACK_MARGIN, res)
            rc_seed2 = apply_homography(_inv3(H2), new_seed)
            anchor = rc_seed.mean(axis=0)                     # (2,)
            anchor2 = rc_seed2.mean(axis=0)
            # old ref: lattice at anchor → want anchor2: shift by anchor−anchor2
            # last profile: lattice at anchor + d_last → shift by a+d−a2.
            new_ref_col = (1 - TRACK_REF_EMA) * _profile_shift(
                ref_col, anchor[0] - anchor2[0]) \
                + TRACK_REF_EMA * _profile_shift(
                    cols[-1], anchor[0] + dx[-1] - anchor2[0])
            new_ref_row = (1 - TRACK_REF_EMA) * _profile_shift(
                ref_row, anchor[1] - anchor2[1]) \
                + TRACK_REF_EMA * _profile_shift(
                    rows[-1], anchor[1] + dy[-1] - anchor2[1])
            return ((new_seed, new_ref_col, new_ref_row,
                     jnp.bool_(True)), (cs, sharp))

        carry0 = (seed_corners.astype(jnp.float32),
                  jnp.zeros((res,), jnp.float32),
                  jnp.zeros((res,), jnp.float32), jnp.bool_(False))
        (_, _, _, _), (cs, sharp) = jax.lax.scan(body, carry0, gc)
        new_seed = cs[-1, -1]
        cs = cs.reshape(k * chunk, 4, 2)[:b]
        sharp = sharp.reshape(k * chunk)[:b]
        return cs, sharp, new_seed


@functools.partial(jax.jit,
                   static_argnames=("gsize", "zone", "chunk", "pad_cells"))
def rectify_track_batch(frames: jnp.ndarray, seed_corners: jnp.ndarray,
                        gsize: int = 19, zone: int = 16, chunk: int = 16,
                        pad_cells: int = 1):
    """FUSED canonical rectification + per-frame board tracking.

    One chunk-shared gather per frame (the warp_batch_chunked trick) warps
    each frame to an EXPANDED canonical canvas whose anchors put the seed's
    corner intersections at STATIC positions; lattice-profile correlation
    against a drift-realigned reference then measures each frame's (dx, dy)
    from its own pixels, and the canonical image is cropped at the measured
    integer offset + sub-pixel-shifted by the fraction. Compared to running
    track_corners_batch AND warp_batch_chunked, this does ONE big gather
    instead of two, and the drift correction comes from measured pixels
    rather than the (possibly stale) corner inputs. Rotation/perspective
    drift is re-anchored by periodic full detection (bf_period).

    frames: (B, H, W, 3); seed_corners: (4, 2) from detect_corners.
    Returns (canon (B, S, S, 3) float [0,1] with S = gsize·zone,
             corners (B, 4, 2) frame-space, sharpness (B,), new_seed (4, 2)).
    """
    with jax.default_matmul_precision("float32"):
        b = frames.shape[0]
        scale = 1.0 / 255.0 if frames.dtype == jnp.uint8 else 1.0
        padb = (-b) % chunk
        if padb:
            frames = jnp.concatenate(
                [frames, frames[-1:].repeat(padb, axis=0)])
        k = frames.shape[0] // chunk
        fc = frames.reshape((k, chunk) + frames.shape[1:])

        size = gsize * zone                      # canonical side (304)
        pad = pad_cells * zone                   # drift margin (16)
        E = size + 2 * pad                       # expanded canvas (336)
        lo = pad + zone / 2.0 - 0.5
        hi = pad + size - zone / 2.0 - 0.5
        anchors = jnp.array([[lo, lo], [hi, lo], [hi, hi], [lo, hi]],
                            jnp.float32)
        # Correlation window must stay under one cell (the lattice is
        # periodic) and inside the crop margin.
        S = min(pad - 2, int(round(TRACK_WIN_OFFSET * zone)))
        us = jnp.arange(E, dtype=jnp.float32)
        uu, vv = jnp.meshgrid(us, us, indexing="xy")
        grid = jnp.stack([uu, vv], axis=-1)

        def body(carry, frames_chunk):
            seed, ref_col, ref_row, ref_ok = carry
            H = homography_dlt(anchors, seed)
            src = apply_homography(H, grid)
            rect = jax.vmap(lambda f: bilinear_sample(
                f, src[..., 0], src[..., 1]))(frames_chunk) * scale
            luma = jnp.tensordot(
                rect, jnp.asarray([0.299, 0.587, 0.114], jnp.float32),
                axes=([-1], [0]))                           # (chunk, E, E)
            cols, rows = jax.vmap(lambda r: _profiles_of(r, gsize))(luma)
            ref_col = jnp.where(ref_ok, ref_col, cols[0])
            ref_row = jnp.where(ref_ok, ref_row, rows[0])
            dx, sh_x = _corr_shift(cols, ref_col, S)
            dy, sh_y = _corr_shift(rows, ref_row, S)
            sharp = jnp.minimum(sh_x, sh_y)
            okf = sharp >= TRACK_MIN_SHARPNESS
            dx = _hold_bad(dx, okf)
            dy = _hold_bad(dy, okf)

            # Canonical crop at the integer offset (per-frame dynamic slice,
            # sequential over the chunk — tiny DMAs, no batched gather),
            # then sub-pixel shift by the fractional remainder.
            ix = jnp.clip(jnp.round(dx), -(pad - 1), pad - 1)
            iy = jnp.clip(jnp.round(dy), -(pad - 1), pad - 1)
            fx = dx - ix
            fy = dy - iy

            def crop(_, x):
                r, ix_i, iy_i, fx_i, fy_i = x
                c = jax.lax.dynamic_slice(
                    r, (pad + iy_i.astype(jnp.int32),
                        pad + ix_i.astype(jnp.int32), 0),
                    (size, size, rect.shape[-1]))
                return None, _subpixel_shift(c, jnp.stack([fx_i, fy_i]))

            _, canon = jax.lax.scan(crop, None, (rect, ix, iy, fx, fy))

            d = jnp.stack([dx, dy], axis=-1)                # (chunk, 2)
            cs = jax.vmap(lambda dd: apply_homography(
                H, anchors + dd[None, :]))(d)
            # Next chunk re-anchors at the last frame's corners: its lattice
            # lands back at `anchors` (exact, by DLT construction), so the
            # old reference needs no shift and the last profile realigns by
            # its own d.
            new_seed = cs[-1]
            new_ref_col = (1 - TRACK_REF_EMA) * ref_col \
                + TRACK_REF_EMA * _profile_shift(cols[-1], dx[-1])
            new_ref_row = (1 - TRACK_REF_EMA) * ref_row \
                + TRACK_REF_EMA * _profile_shift(rows[-1], dy[-1])
            return ((new_seed, new_ref_col, new_ref_row, jnp.bool_(True)),
                    (canon, cs, sharp))

        carry0 = (seed_corners.astype(jnp.float32),
                  jnp.zeros((E,), jnp.float32),
                  jnp.zeros((E,), jnp.float32), jnp.bool_(False))
        _, (canon, cs, sharp) = jax.lax.scan(body, carry0, fc)
        new_seed = cs[-1, -1]
        canon = canon.reshape((k * chunk,) + canon.shape[2:])[:b]
        cs = cs.reshape(k * chunk, 4, 2)[:b]
        sharp = sharp.reshape(k * chunk)[:b]
        return canon, cs, sharp, new_seed


# ---------------------------------------------------------------------------
# Host finder class (the cvconf-registered algorithm; SURVEY §2.1 bf_auto).
# ---------------------------------------------------------------------------

from camkifu_tpu.board.boardfinder import BoardFinder


class BoardFinderAuto(BoardFinder):
    """Automatic goban localization with temporal stabilization: per-batch
    detections accumulate into an EMA once confident; isolated outlier
    detections are rejected (the reference's accumulate-until-stable).

    Once a confident detection exists, every batch is additionally TRACKED
    (track_corners_batch): per-frame corners are measured from each frame's
    own pixels and published through ``corners_batch`` for stones finders
    that accept them; full detection re-runs at bf_period cadence (and
    immediately when tracking sharpness collapses) to re-anchor against
    rotation/scale drift the translation tracker does not model.
    """

    label = "automatic"

    def __init__(self, vmanager):
        super().__init__(vmanager)
        self._estimate: np.ndarray | None = None
        self.track_seed = None             # device (4, 2), batch-fresh

    def _doframe(self, frames, n: int | None = None) -> None:
        import jax.numpy as jnp

        super()._doframe(frames, n)        # periodic _detect + publish
        if not self.ready():
            self.corners_batch = None
            self.track_seed = None
            return
        if self.track_seed is not None and self._since_detect == 0:
            # A fresh full detection just ran. Rotation/scale drift is
            # invisible to translation tracking, so ALWAYS pull the seed
            # toward the detection: a blend bounds the held drift to ~one
            # detection cadence while halving detection's own corner noise;
            # a jump beyond a cell is a camera bump — hard re-anchor.
            est = np.asarray(self.corners_array, np.float32)
            seed_np = np.asarray(self.track_seed)
            cell = np.linalg.norm(est[1] - est[0]) / (self.gsize - 1)
            if np.abs(seed_np - est).max() > 1.0 * cell:
                self.track_seed = None
            else:
                self.track_seed = jnp.asarray(
                    0.5 * seed_np + 0.5 * est, jnp.float32)
        if self.track_seed is None:
            self.track_seed = jnp.asarray(self.corners_array, jnp.float32)
        sf = getattr(self.vmanager, "stones_finder", None)
        if getattr(sf, "fused_tracking", False):
            # The stones finder tracks inside its fused rectify+classify
            # pass and reports back through report_tracking.
            return
        cs, sharp, new_seed = track_corners_batch(
            jnp.asarray(frames), self.track_seed, gsize=self.gsize)
        self.report_tracking(np.asarray(cs), new_seed,
                             float(np.asarray(sharp).mean()))

    def report_tracking(self, corners_batch: np.ndarray, new_seed,
                        mean_sharp: float) -> None:
        """Adopt a batch's per-frame tracking result (own or the fused
        stones-finder pass). Sharpness collapse = tracking lost (bump or
        occlusion): force a full re-detection on the next batch."""
        self.corners_batch = corners_batch
        self.track_seed = new_seed
        self.metadata["track_sharpness"] = round(mean_sharp, 2)
        if mean_sharp < TRACK_MIN_SHARPNESS:
            self._since_detect = 10 ** 9
            self.track_seed = None
            self.corners_batch = None

    def _detect(self, frames) -> bool:
        import jax.numpy as jnp

        # Detection costs ~67 ms/frame — sample up to 4 frames of the batch
        # for the median rather than detecting on all of them.
        b = frames.shape[0]
        step = max(1, b // 4)
        sample = jnp.asarray(frames[::step][:4])
        corners_all, scores = detect_batch(sample, gsize=self.gsize)
        det = np.asarray(jnp.median(corners_all, axis=0))
        scores = np.asarray(scores)
        if not np.isfinite(det).all() or scores.max() < 0.1:
            return False
        if self._estimate is None:
            self._estimate = det
        else:
            jump = np.abs(det - self._estimate).max()
            cell = np.linalg.norm(self._estimate[1] - self._estimate[0]) \
                / (self.gsize - 1)
            if jump > 3 * cell:
                # Camera bump: restart accumulation from the new detection.
                self._estimate = det
            else:
                self._estimate = 0.8 * self._estimate + 0.2 * det
        self.corners.clear()
        for p in self._estimate:
            self.corners.add(p)
        return self.corners.ready()


if __name__ == "__main__":          # golden-input probe (SURVEY §4)
    import sys

    import cv2

    from camkifu_tpu.utils import jaxcache

    jaxcache.enable()
    img = cv2.imread(sys.argv[1])
    if img is None:
        sys.exit(f"cannot read image: {sys.argv[1]}")
    det, score = detect_corners(jnp.asarray(img[:, :, ::-1].copy()))
    print("corners (tl,tr,br,bl):", np.asarray(det).round(1).tolist())
    print("score:", float(score))
    if len(sys.argv) > 2:           # optional overlay output
        for x, y in np.asarray(det):
            cv2.circle(img, (int(x), int(y)), 6, (0, 0, 255), 2)
        cv2.imwrite(sys.argv[2], img)
        print("overlay saved:", sys.argv[2])
