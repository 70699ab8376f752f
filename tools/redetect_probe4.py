"""Same-session A/B of the redetect paths (tunnel sessions vary ~2×, so
cross-session comparisons lie). Times, in one TPU session:

  a. stage-1 batch (reference point for session speed)
  b. OLD path: host loop of per-frame _refine_one
  c. NEW path: _refine_shared_batch (pure device, no host sync)
  d. detect_batch end-to-end (stage1 + router syncs + shared refine)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from camkifu_tpu.utils import jaxcache

jaxcache.enable()

import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402

from camkifu_tpu.board import bf_auto          # noqa: E402
from camkifu_tpu.config import cvconf          # noqa: E402
from camkifu_tpu.utils import synth            # noqa: E402


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


def main():
    fence = lambda x: np.asarray(jax.tree.leaves(x)[0])
    labels = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(0)
    idx = rng.choice(361, 60, replace=False)
    labels.flat[idx[:30]] = 1
    labels.flat[idx[30:]] = 2
    base = synth.default_corners((1080, 1920))
    frames = []
    for i in range(8):
        c = base + np.array([3.0 * np.sin(i / 2.0), 2.0 * np.cos(i / 3.0)],
                            np.float32)
        f, _ = synth.render_frame(labels, c, (1080, 1920), seed=i)
        frames.append(f)
    B = len(frames)
    fdev = jax.device_put(jnp.asarray(np.stack(frames)))
    fence(fdev)
    res = cvconf.bf_resolution

    t_s1 = timeit(lambda: bf_auto._detect_prepare_batch(fdev, res)[1], fence)
    print(f"a stage1 batch      : {t_s1 / B * 1e3:6.2f} ms/frame")

    grays, quads, scores = bf_auto._detect_prepare_batch(fdev, res)
    fence((quads, scores))
    med = np.median(np.asarray(quads), axis=0)
    med_dev = jnp.asarray(med, jnp.float32)

    def old_path():
        return jnp.stack([bf_auto._refine_one(grays[i], quads[i], scores[i],
                                              19) for i in range(B)])
    t_old = timeit(old_path, fence)
    print(f"b refine host-loop  : {t_old / B * 1e3:6.2f} ms/frame")

    t_new = timeit(lambda: bf_auto._refine_shared_batch(grays, med_dev,
                                                        quads, 19)[0], fence)
    print(f"c refine shared     : {t_new / B * 1e3:6.2f} ms/frame")

    t_e2e = timeit(lambda: bf_auto.detect_batch(fdev)[0], fence)
    print(f"d detect_batch e2e  : {t_e2e / B * 1e3:6.2f} ms/frame "
          f"({B / t_e2e:6.1f} fps)")

    out_new = np.asarray(bf_auto._refine_shared_batch(grays, med_dev,
                                                      quads, 19)[0])
    out_old = np.asarray(old_path())
    print(f"max |new-old|       : {np.abs(out_new - out_old).max():6.2f} px")
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
