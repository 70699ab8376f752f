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
                     gsize: int, pixel_thresh: float = 0.08,
                     zone_thresh: float = 0.1):
    """Frame-to-frame motion pooled per intersection.

    Returns (zone_calm (g, g) float {0,1}, agitation scalar).
    """
    moving = jnp.abs(luma_small - prev) > pixel_thresh
    agitation = moving.mean()
    f = luma_small.shape[0] // gsize
    zone_motion = moving[:gsize * f, :gsize * f].reshape(
        gsize, f, gsize, f).mean(axis=(1, 3))
    # Gate on motion EXCESS over the global median zone level: a hand is
    # localized (the median is blind to it), while handheld-camera jitter —
    # incl. the sub-pixel residual of tracked per-frame corners — raises
    # every zone uniformly and must not starve the votes.
    baseline = jnp.median(zone_motion)
    calm = (zone_motion - baseline) <= zone_thresh
    return calm.astype(jnp.float32), agitation
