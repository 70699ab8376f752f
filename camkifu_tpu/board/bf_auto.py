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
from camkifu_tpu.ops.color import rgb_to_gray, to_float
from camkifu_tpu.ops.edges import edge_map
from camkifu_tpu.ops.filters import sobel
from camkifu_tpu.ops.hough import hough_accumulate, topk_edge_points
from camkifu_tpu.ops.warp import apply_homography, bilinear_sample, homography_dlt

#: Angular half-window (radians) around a family's dominant θ.
FAMILY_WINDOW = np.pi / 8

#: A line must carry at least this fraction of its family's best vote to be
#: eligible as a board edge. Low on purpose: on dense boards the stone rows
#: vote far harder than the slab edges, and perspective weakens the far
#: edge — the tight FAMILY_WINDOW + peak NMS do the noise rejection.
MIN_LINE_STRENGTH = 0.12

#: Rectification resolution for the grid-comb refinement.
REFINE_RES = 512


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


def _comb_fit(profile: jnp.ndarray, gsize: int, n_offsets: int = 64,
              n_spacings: int = 48, gap_weight: float = 0.0):
    """Fit a gsize-tooth even comb to a 1D edge-energy profile.

    Searches (offset, spacing) on a grid, scoring Σ_i profile(o + i·s) by
    linear interpolation; returns (offset, spacing) of the best comb with a
    parabolic sub-step refinement on the offset.
    """
    n = profile.shape[0]
    # The quad-rectified grid spans most of [0, n); margins up to ~15%.
    spacings = jnp.linspace(0.70 * n / gsize, 1.02 * n / (gsize - 1),
                            n_spacings)
    offsets = jnp.linspace(0.0, 0.30 * n, n_offsets)

    idx = jnp.arange(gsize, dtype=jnp.float32)             # teeth
    mid = jnp.arange(gsize - 1, dtype=jnp.float32) + 0.5   # between-line gaps

    def interp(pos):
        pos = jnp.clip(pos, 0.0, n - 1.001)
        lo = jnp.floor(pos).astype(jnp.int32)
        f = pos - lo
        return profile[lo] * (1 - f) + profile[lo + 1] * f

    pos = offsets[:, None, None] + spacings[None, :, None] * idx  # (O,S,g)
    gaps = offsets[:, None, None] + spacings[None, :, None] * mid
    valid = pos[..., -1] <= n - 1.0
    # Two signals: teeth on high profile; mid-gaps on low(er) profile. The
    # gap penalty breaks the basin where the comb stretches one tooth onto
    # the board-slab edge — but on near-full boards stone bodies span almost
    # the whole cell and the penalty misleads, hence it is a parameter; the
    # caller races both settings and disambiguates with the slab prior.
    teeth_score = interp(pos).mean(axis=-1)
    gap_score = interp(gaps).mean(axis=-1)
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

    def interp(pos):
        pos = jnp.clip(pos, 0.0, n - 1.001)
        lo = jnp.floor(pos).astype(jnp.int32)
        f = pos - lo
        return profile[lo] * (1 - f) + profile[lo + 1] * f

    idx = jnp.arange(gsize, dtype=jnp.float32)
    teeth = o + s * idx                                    # (g,)
    offs = jnp.linspace(-1.0, 1.0, n_off) * (s / 3.0)      # (n_off,)
    win = interp(teeth[:, None] + offs[None, :])           # (g, n_off)
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

    def interp(pos):
        pos = jnp.clip(pos, 0.0, n - 1.001)
        lo = jnp.floor(pos).astype(jnp.int32)
        f = pos - lo
        return profile[lo] * (1 - f) + profile[lo + 1] * f

    q = interp(o + s * idx).mean() - interp(o + s * mid).mean()
    out = (o < 0.0) | (o + s * (gsize - 1) > n - 1.0)
    return q - 10.0 * out


def _rect_profiles(gray: jnp.ndarray, quad: jnp.ndarray, gsize: int,
                   margin: float = 0.08, res: int = REFINE_RES):
    """Rectify by `quad` (+outward margin) → (H, col_profile, row_profile).

    Split from the comb fit so callers racing several comb scorings on the
    SAME seed pay the rectification warp (the expensive part, a res² gather
    + Sobel) once.
    """
    # Expand the quad outward so the whole grid is safely inside.
    ctr = quad.mean(axis=0)
    equad = ctr + (quad - ctr) * (1.0 + margin)
    # Homography rect → frame (the gather-friendly direction).
    unit = jnp.array([[0.0, 0.0], [res - 1.0, 0.0],
                      [res - 1.0, res - 1.0], [0.0, res - 1.0]], jnp.float32)
    H = homography_dlt(unit, equad)
    us = jnp.arange(res, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(us, us, indexing="xy")
    src = apply_homography(H, jnp.stack([uu, vv], axis=-1))
    rect = bilinear_sample(gray[..., None], src[..., 0], src[..., 1])[..., 0]

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
    wood = jnp.median(rect)
    dev = jnp.abs(rect - wood)
    col_profile = prep(jnp.abs(gx)[interior, :].mean(axis=0)) \
        + prep(dev[interior, :].mean(axis=0))
    row_profile = prep(jnp.abs(gy)[:, interior].mean(axis=1)) \
        + prep(dev[:, interior].mean(axis=1))
    return H, col_profile, row_profile


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
        rgb = to_float(frame)
        gray = rgb_to_gray(rgb)
        small = jax.image.resize(gray, (res, res), method="bilinear")
        chroma = jax.image.resize(rgb[..., 0] - rgb[..., 2], (res, res),
                                  method="bilinear")
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
        variant_cs, variant_qs = [], []
        # Iteration 1 shares one rectification between the two comb
        # scorings (same seed quad → identical profiles); later iterations
        # chain from each scoring's own corners and re-rectify.
        hcr = _rect_profiles(gray, quad, gsize, margin=0.10)
        for gw in (1.0, 0.0):
            c, _q, vc, vq = _fit_combs(*hcr, gsize, gap_weight=gw)
            variant_cs.append(vc)
            variant_qs.append(vq)
            for _ in range(refine_iters - 1):
                c, _q, vc, vq = _refine_grid(gray, c, gsize, margin=0.18,
                                             gap_weight=gw)
                variant_cs.append(vc)
                variant_qs.append(vq)

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
# Host finder class (the cvconf-registered algorithm; SURVEY §2.1 bf_auto).
# ---------------------------------------------------------------------------

from camkifu_tpu.board.boardfinder import BoardFinder


class BoardFinderAuto(BoardFinder):
    """Automatic goban localization with temporal stabilization: per-batch
    detections accumulate into an EMA once confident; isolated outlier
    detections are rejected (the reference's accumulate-until-stable)."""

    label = "automatic"

    def __init__(self, vmanager):
        super().__init__(vmanager)
        self._estimate: np.ndarray | None = None

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
