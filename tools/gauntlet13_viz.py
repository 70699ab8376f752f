"""Visualize the post-bump gauntlet-13 detection failure: write PNGs of
chosen frames with ground-truth (green) vs coarse (yellow) vs refined
(red) quads drawn, and print the three."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from tools.gauntlet13_detect_probe import main as _unused  # noqa: F401,E402
from tools.gauntlet13_ablate import scenario  # noqa: E402


def run(gsize=13, idxs=(183, 193, 218), out_dir="/tmp/g13"):
    import jax.numpy as jnp

    from camkifu_tpu.board import bf_auto
    from camkifu_tpu.config import cvconf
    from camkifu_tpu.utils import synth

    os.makedirs(out_dir, exist_ok=True)
    moves = synth.capture_rich_moves(19, gsize=gsize, seed=11)
    fpm = cvconf.vote_window + 6
    fpm_list = [fpm] * len(moves)
    fpm_list[13] += 36
    fpm_list[-1] += 12
    leadin = 6
    bump_at = leadin + sum(fpm_list[:13]) + fpm
    _, frames_factory = scenario("vfr", gsize)
    frames = list(frames_factory())

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

    for i in idxs:
        f = frames[i]
        truth = cam(i)
        gray, quad0, score = bf_auto._detect_prepare(
            jnp.asarray(f), cvconf.bf_resolution)
        det, _ = bf_auto.detect_corners(jnp.asarray(f), gsize=gsize)
        q0 = np.asarray(quad0)
        d = np.asarray(det)
        print(f"i={i} score={float(score):.3f}")
        print(f"  truth : {np.round(truth, 0).tolist()}")
        print(f"  coarse: {np.round(q0, 0).tolist()}")
        print(f"  refine: {np.round(d, 0).tolist()}")
        img = f[:, :, ::-1].copy()
        for quad, col in ((truth, (0, 255, 0)), (q0, (0, 255, 255)),
                          (d, (0, 0, 255))):
            cv2.polylines(img, [quad.astype(np.int32)], True, col, 2)
        cv2.imwrite(f"{out_dir}/frame_{i}.png", img)
        print(f"  wrote {out_dir}/frame_{i}.png")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 13)
