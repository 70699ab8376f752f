"""Background model + agitation estimation (frame differencing).

Replaces the reference's ``absdiff`` / background-subtraction uses (SURVEY
§2.3): an exponential-moving-average luma background at reduced resolution,
and an "agitation" score = fraction of pixels changing — the gate that stops
stone reading while hands move over the board (SURVEY §3.3).
"""

from __future__ import annotations

import jax.numpy as jnp

from camkifu_tpu.config import cvconf


def downsample_luma(canonical_luma: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """(S, S) luma → (S/f, S/f) by average pooling (exact reshape mean)."""
    s = canonical_luma.shape[0]
    d = s // factor
    return canonical_luma[:d * factor, :d * factor] \
        .reshape(d, factor, d, factor).mean(axis=(1, 3))


def agitation_score(luma_small: jnp.ndarray, bg: jnp.ndarray,
                    pixel_thresh: float = 0.08) -> jnp.ndarray:
    """Fraction of pixels whose |luma − background| exceeds pixel_thresh."""
    return (jnp.abs(luma_small - bg) > pixel_thresh).mean()


def update_background(bg: jnp.ndarray, luma_small: jnp.ndarray,
                      agitation: jnp.ndarray,
                      ema: float = cvconf.background_ema) -> jnp.ndarray:
    """EMA background update, slowed 10× while the scene is agitated.

    Slowed, not frozen: a full freeze deadlocks when the model initializes
    on an occluded scene (everything reads agitated forever, and a frozen
    background can never converge to open the gate); the slow leak lets any
    *persistent* scene become background within a few seconds while a hand
    sweeping for a moment still barely imprints."""
    rate = jnp.where(agitation > cvconf.agitation_threshold, 0.1 * ema, ema)
    return bg * (1.0 - rate) + luma_small * rate
