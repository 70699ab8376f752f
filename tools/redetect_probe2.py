"""Sub-stage cost split of the per-frame refine (VERDICT r4 item 3).

Times each piece of _detect_refine's line-dominated path separately on the
chip to find where the 11 ms/frame goes: the rectification gather, the
evidence map, the comb race, the ranking, the sub-pixel pin (which pays its
own second rectification), and the derotate estimator.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from camkifu_tpu.utils import jaxcache

jaxcache.enable()

import functools                               # noqa: E402

import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402

from camkifu_tpu.board import bf_auto          # noqa: E402
from camkifu_tpu.config import cvconf          # noqa: E402
from camkifu_tpu.utils import synth            # noqa: E402


def timeit(fn, fence, reps=10, tries=3):
    fence(fn())
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


@functools.partial(jax.jit, static_argnames=("gsize",))
def _rect_only(gray, quad, gsize=19):
    with jax.default_matmul_precision("float32"):
        return bf_auto._rect_profiles_rect(gray, quad, gsize, margin=0.10)


@functools.partial(jax.jit, static_argnames=("gsize",))
def _through_combs(gray, quad, gsize=19):
    with jax.default_matmul_precision("float32"):
        H, colp, rowp, rect = bf_auto._rect_profiles_rect(gray, quad, gsize,
                                                          margin=0.10)
        _, vc1, _ = bf_auto._fit_combs_multi(H, colp, rowp, gsize, (1.0, 0.0))
        return vc1


@functools.partial(jax.jit, static_argnames=("gsize",))
def _through_rank(gray, quad, gsize=19):
    with jax.default_matmul_precision("float32"):
        H, colp, rowp, rect = bf_auto._rect_profiles_rect(gray, quad, gsize,
                                                          margin=0.10)
        cell = jnp.linalg.norm(quad[1] - quad[0]) / (gsize + 0.0)
        _, vc1, _ = bf_auto._fit_combs_multi(H, colp, rowp, gsize, (1.0, 0.0))
        E = bf_auto._evidence_map(rect, gsize)
        Hinv = jnp.linalg.inv(H)
        rank1 = bf_auto._rank_evidence(vc1, E, Hinv, quad, cell, gsize)
        return vc1[jnp.argmax(rank1)]


@functools.partial(jax.jit, static_argnames=("gsize",))
def _pin_only(gray, quad, gsize=19):
    with jax.default_matmul_precision("float32"):
        return bf_auto._pin_corners(gray, quad, gsize)


@functools.partial(jax.jit, static_argnames=("gsize",))
def _derot_only(gray, quad, gsize=19):
    with jax.default_matmul_precision("float32"):
        H, colp, rowp, rect = bf_auto._rect_profiles_rect(gray, quad, gsize,
                                                          margin=0.10)
        return bf_auto._resid_rotation(rect)


def main():
    fence = lambda x: np.asarray(jax.tree.leaves(x)[0])
    labels = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(0)
    idx = rng.choice(361, 60, replace=False)
    labels.flat[idx[:30]] = 1
    labels.flat[idx[30:]] = 2
    frame, gt = synth.render_frame(labels, frame_hw=(1080, 1920))
    fdev = jax.device_put(jnp.asarray(frame))
    fence(fdev)
    res = cvconf.bf_resolution
    grays, quads, scores = bf_auto._detect_prepare_batch(fdev[None], res)
    gray, quad, score = grays[0], quads[0], scores[0]
    fence((gray, quad))

    t = timeit(lambda: _rect_only(gray, quad)[3], fence)
    print(f"rect_profiles_rect    : {t * 1e3:6.2f} ms")
    t = timeit(lambda: _through_combs(gray, quad), fence)
    print(f"  + fit_combs_multi   : {t * 1e3:6.2f} ms")
    t = timeit(lambda: _through_rank(gray, quad), fence)
    print(f"  + evidence + rank   : {t * 1e3:6.2f} ms")
    t = timeit(lambda: _derot_only(gray, quad)[0], fence)
    print(f"rect + resid_rotation : {t * 1e3:6.2f} ms")
    w1 = _through_rank(gray, quad)
    fence(w1)
    t = timeit(lambda: _pin_only(gray, w1), fence)
    print(f"pin_corners (own rect): {t * 1e3:6.2f} ms")
    t = timeit(lambda: bf_auto._refine_one(gray, quad, score, 19), fence)
    print(f"full refine_one       : {t * 1e3:6.2f} ms")
    # Stage-1 on its own, fencing only the small quad outputs (the earlier
    # probe's grays fetch polluted this number).
    fb = jax.device_put(jnp.broadcast_to(jnp.asarray(frame),
                                         (8,) + frame.shape))
    fence(fb)
    t = timeit(lambda: bf_auto._detect_prepare_batch(fb, res)[1], fence,
               reps=3)
    print(f"stage1 batch8 (quads fenced): {t / 8 * 1e3:6.2f} ms/frame")
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
