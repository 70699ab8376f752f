"""SfNeural — neural-network stone classification (dev-branch parity).

Parity: ``camkifu/stone/sf_neural.py`` (SURVEY §2.1, dev branch) — a CNN
classifying intersection patches B/W/E. Host class wraps
``camkifu_tpu.models.neural``; weights load from an orbax checkpoint, or are
trained on synthetic data on first use (the reference required hand-labeled
videos; we can bootstrap for free).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from camkifu_tpu.config import cvconf, guiconf
from camkifu_tpu.models import neural
from camkifu_tpu.ops.warp import warp_batch_chunked, warp_batch_fixed
from camkifu_tpu.ops.zones import extract_zones
from camkifu_tpu.stone.stonesfinder import StonesFinder


@functools.partial(jax.jit, static_argnames=("gsize", "zone"))
def classify_batch_neural(params, frames, corners,
                          gsize: int = guiconf.gsize,
                          zone: int = cvconf.zone_size, lens=None):
    """(B, H, W, 3) uint8 + (4, 2) or per-frame (B, 4, 2) corners →
    (labels (B,g,g), conf)."""
    with jax.default_matmul_precision("float32"):
        scale = 1.0 / 255.0 if frames.dtype == jnp.uint8 else 1.0
        if corners.ndim == 3:
            canon = warp_batch_chunked(frames, corners, gsize, zone,
                                       lens=lens) * scale
        else:
            canon = warp_batch_fixed(frames, corners, gsize, zone,
                                     lens) * scale
    b = frames.shape[0]
    zones = jax.vmap(lambda c: extract_zones(c, gsize, zone))(canon)
    patches = zones.reshape(b * gsize * gsize, zone, zone, 3)
    logits = neural.PatchNet().apply(params, patches)
    probs = jax.nn.softmax(logits, axis=-1)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int8)
    conf = jnp.max(probs, axis=-1)
    return (labels.reshape(b, gsize, gsize),
            conf.reshape(b, gsize, gsize).astype(jnp.float32))


def get_or_train_params(log=None, quick: bool = False):
    """Load the user checkpoint, or bootstrap-train on synthetic boards.

    Choosing the 'neural' finder is an explicit request for the net, so a
    missing checkpoint triggers a quick bootstrap train rather than a no-op
    (no pretrained checkpoint ships — PERF.md ablations)."""
    params = neural.load_params()
    if params is not None:
        return params
    n_boards = 8 if quick else 48
    patches, labels = neural.harvest_patches(n_boards=n_boards)
    _, params, acc = neural.train(patches, labels,
                                  epochs=2 if quick else 4, log=log)
    if log:
        log(f"sf_neural bootstrap training accuracy: {acc:.4f}")
    try:
        neural.save_params(params)
    except Exception:
        pass   # checkpoint dir may be unwritable; keep the in-memory params
    return params


class SfNeural(StonesFinder):
    label = "neural"

    def __init__(self, vmanager):
        super().__init__(vmanager)
        self.params = get_or_train_params(
            log=lambda msg: self.metadata.__setitem__("train", msg))

    def _find(self, frames, corners):
        return classify_batch_neural(self.params, jnp.asarray(frames),
                                     jnp.asarray(corners, jnp.float32),
                                     gsize=self.gsize,
                                     lens=self._bf_lens())
