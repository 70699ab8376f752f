"""On-chip probe for the full-redetection rate (VERDICT r4 item 3).

Measures, on the real TPU:
  1. the current detect_batch rate (batched stage 1 + host-mapped refine),
  2. the per-stage split (stage-1 batch dispatch vs per-frame refine),
  3. a BATCHED vmap of the line-dominated refine path (the candidate ≥2×
     lever): per-frame rectification gathers hit the varying-index cliff
     under vmap, but every other refine op (evidence map, comb matvecs,
     ranking, pin) amortizes across the batch — this probe decides whether
     the net is a win,
  4. the same vmap WITHOUT the derotate cond (under vmap it becomes a
     select that pays the second rectification for every frame).

Run: python tools/redetect_probe.py  (claims the TPU; don't run during bench)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from camkifu_tpu.utils import jaxcache

jaxcache.enable()

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

from camkifu_tpu.board import bf_auto         # noqa: E402
from camkifu_tpu.config import cvconf         # noqa: E402
from camkifu_tpu.utils import synth           # noqa: E402


def timeit(fn, fence, reps=5, tries=3):
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


# Line-dominated refine WITHOUT the saturated branch, vmappable.
# skip_derotate drops the derotate cond entirely (probe 4).
@functools.partial(jax.jit, static_argnames=("gsize", "skip_derotate"))
def _refine_line_batch(grays, quads, gsize: int = 19,
                       skip_derotate: bool = False):
    def one(gray, quad):
        with jax.default_matmul_precision("float32"):
            H, colp, rowp, rect = bf_auto._rect_profiles_rect(
                gray, quad, gsize, margin=0.10)
            if not skip_derotate:
                raw_delta, conc = bf_auto._resid_rotation(rect)
                delta = raw_delta * (2.0 / 3.0)

                def _derotate(_):
                    rres = rect.shape[0]
                    unit = jnp.array(
                        [[0.0, 0.0], [rres - 1.0, 0.0],
                         [rres - 1.0, rres - 1.0], [0.0, rres - 1.0]],
                        jnp.float32)
                    cc = (rres - 1.0) / 2.0
                    cd, sd = jnp.cos(delta), jnp.sin(delta)
                    rotm = jnp.stack([jnp.stack([cd, -sd]),
                                      jnp.stack([sd, cd])])
                    runit = cc + (unit - cc) @ rotm.T
                    equad2 = bf_auto.apply_homography(H, runit)
                    ctr2 = equad2.mean(axis=0)
                    q2 = (ctr2 + (equad2 - ctr2) / 1.10).astype(jnp.float32)
                    return (q2,) + bf_auto._rect_profiles_rect(
                        gray, q2, gsize, margin=0.10)

                def _keep(_):
                    return quad, H, colp, rowp, rect

                quad2, H, colp, rowp, rect = jax.lax.cond(
                    (jnp.abs(delta) > bf_auto.DEROTATE_TRIP)
                    & (conc > bf_auto.DEROTATE_MIN_CONC),
                    _derotate, _keep, None)
            else:
                quad2 = quad
            cell = jnp.linalg.norm(quad2[1] - quad2[0]) / (gsize + 0.0)
            _, vc1, _ = bf_auto._fit_combs_multi(H, colp, rowp, gsize,
                                                 (1.0, 0.0))
            E = bf_auto._evidence_map(rect, gsize)
            Hinv = jnp.linalg.inv(H)
            rank1 = bf_auto._rank_evidence(vc1, E, Hinv, quad2, cell, gsize)
            w1 = vc1[jnp.argmax(rank1)]
            return bf_auto._pin_corners(gray, w1, gsize)

    return jax.vmap(one)(grays, quads)


def main():
    fence = lambda x: np.asarray(jax.tree.leaves(x)[0])
    labels = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(0)
    idx = rng.choice(361, 60, replace=False)
    labels.flat[idx[:30]] = 1
    labels.flat[idx[30:]] = 2
    frame, gt = synth.render_frame(labels, frame_hw=(1080, 1920))
    B = 8
    frames = jax.device_put(jnp.broadcast_to(jnp.asarray(frame),
                                             (B,) + frame.shape))
    fence(frames)
    res = cvconf.bf_resolution

    # 1. current full path
    t_full = timeit(lambda: bf_auto.detect_batch(frames)[0], fence, reps=3)
    print(f"detect_batch     : {t_full / B * 1e3:7.2f} ms/frame "
          f"({B / t_full:6.1f} fps)")

    # 2. stage split
    t_s1 = timeit(lambda: bf_auto._detect_prepare_batch(frames, res)[0],
                  fence)
    grays, quads, scores = bf_auto._detect_prepare_batch(frames, res)
    fence((grays, quads, scores))
    t_ref1 = timeit(
        lambda: bf_auto._refine_one(grays[0], quads[0], scores[0], 19),
        fence)

    def refine_loop():
        return jnp.stack([bf_auto._refine_one(grays[i], quads[i], scores[i],
                                              19) for i in range(B)])
    t_refb = timeit(refine_loop, fence, reps=3)
    print(f"stage1 batched   : {t_s1 / B * 1e3:7.2f} ms/frame")
    print(f"refine single    : {t_ref1 * 1e3:7.2f} ms")
    print(f"refine host-loop : {t_refb / B * 1e3:7.2f} ms/frame")

    # 3. vmapped line refine (with derotate-as-select under vmap)
    for skip in (False, True):
        try:
            t_v = timeit(lambda: _refine_line_batch(grays, quads, 19, skip),
                         fence, reps=3)
            out = np.asarray(_refine_line_batch(grays, quads, 19, skip))
            err = np.abs(out - gt[None]).max()
            print(f"refine vmap skip_derot={int(skip)}: "
                  f"{t_v / B * 1e3:7.2f} ms/frame "
                  f"({B / t_v:6.1f} fps refine-only, max err {err:.1f} px)")
        except Exception as e:
            print(f"refine vmap skip_derot={int(skip)}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")

    # combined projected rate if vmap refine wins: stage1 + vmap refine
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
