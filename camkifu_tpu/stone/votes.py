"""Shared temporal-vote machinery (used by SfMeta and SfBgSub).

The reference's cyclic per-intersection vote buffer (SURVEY §2.1 sf_meta),
as a decayed accumulator: discrete votes, confidence-gated casting, local
motion gating, and a commit rule (threshold + 2:1 dominance over the
runner-up).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from camkifu_tpu.config import cvconf
from camkifu_tpu.ops import background


def vote_update(votes: jnp.ndarray, stable: jnp.ndarray,
                labels: jnp.ndarray, conf: jnp.ndarray,
                zone_calm: jnp.ndarray,
                cfg: cvconf.VisionConfig = cvconf.DEFAULT):
    """One reading into the vote state.

    votes (g, g, 3), stable (g, g) int8, labels (g, g) int8, conf (g, g),
    zone_calm (g, g) in {0, 1}.
    Returns (new_votes, new_stable, out_conf).
    """
    decay = 1.0 - 1.0 / cfg.vote_window
    onehot = jax.nn.one_hot(labels, 3, dtype=jnp.float32)
    casts = (conf >= cfg.vote_min_conf).astype(jnp.float32)
    new_votes = votes * decay + onehot * casts[..., None] \
        * zone_calm[..., None]

    top = jnp.max(new_votes, axis=-1)
    top_label = jnp.argmax(new_votes, axis=-1).astype(jnp.int8)
    runner = jnp.sort(new_votes, axis=-1)[..., 1]
    commit = (top >= cfg.vote_threshold) & (top >= 2.0 * runner)
    new_stable = jnp.where(commit, top_label, stable)
    out_conf = jnp.clip(top / cfg.vote_window, 0.0, 1.0)
    return new_votes, new_stable, out_conf


def zone_motion_gate(luma_small: jnp.ndarray, prev: jnp.ndarray,
                     gsize: int, flow_thresh: float = 1.0,
                     grad_floor: float = 0.02):
    """Frame-to-frame motion pooled per intersection.

    Gates on estimated motion in PIXELS — the temporal difference
    normalized by the local spatial gradient (a one-step optical-flow
    magnitude), NOT the raw luma difference: a high-contrast zone (white
    stone on dark wood) flips raw diffs under the sub-pixel jitter of a
    tracked handheld camera and would be gated forever, while a
    low-contrast zone under a hand barely moves the raw diff. Motion
    measured in pixels treats both correctly: jitter stays under ~1 px
    (in the 4×-downsampled background grid this function sees), a hand/arm
    is ≫ 1 px where it covers the board. A second
    term catches occluders whose interior is flat (dt large, gradient
    tiny): dt beyond what ANY sub-pixel shift of the local content could
    produce is motion regardless of the flow estimate.

    Returns (zone_calm (g, g) float {0,1}, agitation scalar = fraction of
    moving zones).
    """
    # Exposure compensation: an auto-exposure step (10–20% of luma when a
    # hand enters the scene — measured to mark the ENTIRE board agitated at
    # ≥12% and stall the vote machine exactly while moves are played) is a
    # global multiplicative gain, not motion. Divide it out before
    # differencing; the gate then sees only local change.
    gain = background.robust_gain(luma_small, prev)
    dt = jnp.abs(luma_small - gain * prev)
    gx = 0.5 * (jnp.roll(luma_small, -1, 1) - jnp.roll(luma_small, 1, 1))
    gy = 0.5 * (jnp.roll(luma_small, -1, 0) - jnp.roll(luma_small, 1, 0))
    grad = jnp.sqrt(gx * gx + gy * gy)
    flow = dt / (grad + grad_floor)                 # ≈ |motion| in px
    f = luma_small.shape[0] // gsize
    zone_flow = flow[:gsize * f, :gsize * f].reshape(
        gsize, f, gsize, f).mean(axis=(1, 3))
    # Flat-occluder term: mean dt per zone vs mean gradient per zone.
    zone_dt = dt[:gsize * f, :gsize * f].reshape(
        gsize, f, gsize, f).mean(axis=(1, 3))
    zone_grad = grad[:gsize * f, :gsize * f].reshape(
        gsize, f, gsize, f).mean(axis=(1, 3))
    flat_occluded = zone_dt > jnp.maximum(2.0 * zone_grad, 0.06)
    calm = (zone_flow <= flow_thresh) & ~flat_occluded
    agitation = 1.0 - calm.mean()
    return calm.astype(jnp.float32), agitation
