"""Sub-stage breakdown of the shared-canvas refine + stage 1 (r5).

The r4 close left full-redetect at ~5.75 ms/frame e2e (B=8): stage 1
~1.8 + shared refine ~1.76 + ~2.2 of dispatch/sync overhead. To reach the
~450 fps stage-1-bound ceiling (VERDICT r4 item 4) this probe times, in
ONE session:

  a. stage-1 batch (and its internals: gray+resize vs edge map vs coarse)
  b. shared refine total
  c. shared refine internals, each as its own jit over the same rects:
       c1 rectification gather (_sample_rect vmap)
       c2 profiles (_profiles_of)
       c3 comb race (_fit_combs_multi)
       c4 evidence map (_evidence_map)
       c5 rank (_rank_evidence)
       c6 pin (_pin_corners_on_rect)
       c7 resid rotation (_resid_rotation)
  d. detect_batch e2e at B=8 and B=32 (router sync amortization)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from camkifu_tpu.utils import jaxcache

jaxcache.enable()

import functools                                # noqa: E402

import jax                                      # noqa: E402
import jax.numpy as jnp                         # noqa: E402

from camkifu_tpu.board import bf_auto           # noqa: E402
from camkifu_tpu.config import cvconf           # noqa: E402
from camkifu_tpu.utils import synth             # noqa: E402


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
    fence = lambda x: np.asarray(jax.tree.leaves(x)[0])
    B = 8
    fdev = jax.device_put(jnp.asarray(make_frames(B)))
    fence(fdev)
    res = cvconf.bf_resolution
    gsize = 19

    t_s1 = timeit(lambda: bf_auto._detect_prepare_batch(fdev, res)[1], fence)
    print(f"a  stage1 batch          : {t_s1 / B * 1e3:6.2f} ms/frame")

    # stage-1 internals
    @jax.jit
    def s1_resize(frames):
        from camkifu_tpu.ops.color import rgb_to_gray_u8
        grays = rgb_to_gray_u8(frames)
        smalls = jax.image.resize(grays.astype(jnp.float32) / 255.0,
                                  (B, res, res), method="bilinear")
        chromas = jax.image.resize(
            (frames[..., 0].astype(jnp.float32)
             - frames[..., 2].astype(jnp.float32)) / 255.0,
            (B, res, res), method="bilinear")
        return smalls, chromas

    t_rz = timeit(lambda: s1_resize(fdev), fence)
    print(f"a1 gray+resize           : {t_rz / B * 1e3:6.2f} ms/frame")

    smalls, chromas = s1_resize(fdev)
    from camkifu_tpu.ops.edges import edge_map_batch
    cat = jnp.concatenate([smalls, chromas])
    ej = jax.jit(functools.partial(edge_map_batch, backend="auto"))
    t_em = timeit(lambda: ej(cat), fence)
    print(f"a2 edge map (2B)         : {t_em / B * 1e3:6.2f} ms/frame")

    mags = ej(cat)
    cj = jax.jit(jax.vmap(bf_auto._coarse_from_mag))
    t_cq = timeit(lambda: cj(mags[:B], mags[B:]), fence)
    print(f"a3 coarse quad           : {t_cq / B * 1e3:6.2f} ms/frame")

    grays, quads, scores = bf_auto._detect_prepare_batch(fdev, res)
    fence((quads, scores))
    med = jnp.asarray(np.median(np.asarray(quads), axis=0), jnp.float32)

    t_new = timeit(lambda: bf_auto._refine_shared_batch(
        grays, med, quads, gsize)[0], fence)
    print(f"b  refine shared total   : {t_new / B * 1e3:6.2f} ms/frame")

    R = bf_auto.REFINE_RES

    @jax.jit
    def rect_only(grays, med):
        H = bf_auto._rect_H(med, 0.10, R)
        return jax.vmap(lambda g: bf_auto._sample_rect(g, H, R))(grays), H

    t_c1 = timeit(lambda: rect_only(grays, med)[0], fence)
    print(f"c1 shared gather         : {t_c1 / B * 1e3:6.2f} ms/frame")

    rects, H = rect_only(grays, med)
    fence(rects)
    Hinv = jnp.linalg.inv(H)

    pj = jax.jit(jax.vmap(functools.partial(bf_auto._profiles_of,
                                            gsize=gsize)))
    t_c2 = timeit(lambda: pj(rects), fence)
    print(f"c2 profiles              : {t_c2 / B * 1e3:6.2f} ms/frame")

    colp, rowp = pj(rects)

    fj = jax.jit(jax.vmap(lambda c, r: bf_auto._fit_combs_multi(
        H, c, r, gsize, (1.0, 0.0))))
    t_c3 = timeit(lambda: fj(colp, rowp), fence)
    print(f"c3 comb race             : {t_c3 / B * 1e3:6.2f} ms/frame")

    _, vc1, _ = fj(colp, rowp)

    evj = jax.jit(jax.vmap(functools.partial(bf_auto._evidence_map,
                                             gsize=gsize)))
    t_c4 = timeit(lambda: evj(rects), fence)
    print(f"c4 evidence map          : {t_c4 / B * 1e3:6.2f} ms/frame")

    E = evj(rects)
    cells = jnp.linalg.norm(quads[:, 1] - quads[:, 0], axis=1) / gsize

    rkj = jax.jit(jax.vmap(lambda e, v, q, cl: bf_auto._rank_evidence(
        v, e, Hinv, q, cl, gsize)))
    t_c5 = timeit(lambda: rkj(E, vc1, quads, cells), fence)
    print(f"c5 rank                  : {t_c5 / B * 1e3:6.2f} ms/frame")

    ranks = rkj(E, vc1, quads, cells)
    w1 = jax.vmap(lambda v, r: v[jnp.argmax(r)])(vc1, ranks)

    pnj = jax.jit(jax.vmap(lambda rect, w: bf_auto._pin_corners_on_rect(
        rect, H, w, gsize)))
    t_c6 = timeit(lambda: pnj(rects, w1), fence)
    print(f"c6 pin                   : {t_c6 / B * 1e3:6.2f} ms/frame")

    rrj = jax.jit(jax.vmap(bf_auto._resid_rotation))
    t_c7 = timeit(lambda: rrj(rects), fence)
    print(f"c7 resid rotation        : {t_c7 / B * 1e3:6.2f} ms/frame")

    t_e2e = timeit(lambda: bf_auto.detect_batch(fdev)[0], fence)
    print(f"d  e2e B=8               : {t_e2e / B * 1e3:6.2f} ms/frame "
          f"({B / t_e2e:6.1f} fps)")

    for bb in (32, 64):
        fb = jax.device_put(jnp.asarray(make_frames(bb)))
        fence(fb)
        t_eb = timeit(lambda: bf_auto.detect_batch(fb)[0], fence, reps=3)
        print(f"d  e2e B={bb:<3d}            : {t_eb / bb * 1e3:6.2f} ms/frame "
              f"({bb / t_eb:6.1f} fps)")
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
