"""Does raw board detection work on gauntlet-13 frames, pre and post bump?

Uses the vfr=0 variant (frame count preserved through encode) so yielded
frame i has ground-truth corners cam(i). Runs detect_corners at a spread
of indices and reports the max corner error in cells.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tools.gauntlet13_ablate import scenario  # noqa: E402


def main(gsize=13):
    import jax.numpy as jnp

    from camkifu_tpu.board import bf_auto
    from camkifu_tpu.config import cvconf
    from camkifu_tpu.utils import synth

    moves = synth.capture_rich_moves(19, gsize=gsize, seed=11)
    fpm = cvconf.vote_window + 6
    fpm_list = [fpm] * len(moves)
    fpm_list[13] += 36
    fpm_list[-1] += 12
    leadin = 6
    bump_at = leadin + sum(fpm_list[:13]) + fpm

    _, frames_factory = scenario("vfr", gsize)
    frames = list(frames_factory())
    total = len(frames)
    print(f"frames={total} bump_at={bump_at}")

    # Rebuild cam() for ground truth (mirrors the scenario exactly).
    base = synth.default_corners((720, 1280))
    c0 = base.mean(axis=0)
    full_total = leadin + sum(fpm_list)

    def cam(i):
        th = np.deg2rad(10.0) * i / full_total
        s = 1.0 + 0.06 * i / full_total
        if i >= bump_at:
            th += np.deg2rad(2.0)
        rot = np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]], np.float32)
        cs = c0 + s * (base - c0) @ rot.T
        cs += np.array([6.0 * np.sin(i / 9.0), 5.0 * np.cos(i / 11.0)],
                       np.float32)
        if i >= bump_at:
            cs += np.array([26.0, -17.0], np.float32)
        return cs.astype(np.float32)

    idxs = [leadin + 2, bump_at - 40, bump_at - 5, bump_at + 5,
            bump_at + 30, bump_at + 60, total - 60, total - 10]
    for i in idxs:
        i = min(max(i, 0), total - 1)
        truth = cam(i)
        cell = np.linalg.norm(truth[1] - truth[0]) / (gsize - 1)
        det, score = bf_auto.detect_corners(jnp.asarray(frames[i]),
                                            gsize=gsize)
        err = np.abs(np.asarray(det) - truth).max()
        tag = "POST" if i >= bump_at else "pre "
        print(f"{tag} i={i:4d} score={float(score):.3f} "
              f"err={err:6.1f} px = {err / cell:5.2f} cells")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 13)
