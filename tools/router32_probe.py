"""Why does the shared-canvas router fall back at B=32? Print the
router's inputs (scores, quad spread in cells, derotate trips, corner
finiteness) for B=8 vs B=32 on the probe scene."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from camkifu_tpu.utils import jaxcache

jaxcache.enable()

import jax                                      # noqa: E402
import jax.numpy as jnp                         # noqa: E402

from camkifu_tpu.board import bf_auto           # noqa: E402
from camkifu_tpu.config import cvconf           # noqa: E402
from camkifu_tpu.utils import synth             # noqa: E402


def make_frames(B):
    labels = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(0)
    idx = rng.choice(361, 60, replace=False)
    labels.flat[idx[:30]] = 1
    labels.flat[idx[30:]] = 2
    base = synth.default_corners((1080, 1920))
    frames = []
    for i in range(B):
        c = base + np.array([3.0 * np.sin(i / 2.0), 2.0 * np.cos(i / 3.0)],
                            np.float32)
        f, _ = synth.render_frame(labels, c, (1080, 1920), seed=i)
        frames.append(f)
    return np.stack(frames)


def main():
    for B in (8, 32):
        fdev = jax.device_put(jnp.asarray(make_frames(B)))
        grays, quads, scores = bf_auto._detect_prepare_batch(
            fdev, cvconf.bf_resolution)
        q = np.asarray(quads)
        s = np.asarray(scores)
        med = np.median(q, axis=0)
        cell = np.linalg.norm(med[1] - med[0]) / 18.0
        spread = np.abs(q - med).max() / cell
        med_dev = jnp.asarray(med, jnp.float32)
        corners, deltas, concs = bf_auto._refine_shared_batch(
            grays, med_dev, quads, 19)
        d = np.asarray(deltas)
        c = np.asarray(concs)
        trip = (np.abs(d * (2.0 / 3.0)) > bf_auto.DEROTATE_TRIP) \
            & (c > bf_auto.DEROTATE_MIN_CONC)
        cor, ok = bf_auto._route_and_refine_shared(grays, quads, scores, 19)
        print(f"B={B}: ok={bool(ok)} score_min={s.min():.3f} "
              f"spread={spread:.3f} cells (limit "
              f"{bf_auto.SHARED_REFINE_SPREAD}) "
              f"trips={int(trip.sum())}/{B} "
              f"max|delta|deg={np.rad2deg(np.abs(d).max()):.2f} "
              f"conc_max={c.max():.2f} "
              f"corners_finite={bool(np.isfinite(np.asarray(cor)).all())}")


if __name__ == "__main__":
    main()
