"""Gauntlet-13 hazard ablation: re-run the failing scenario with one
hazard removed at a time to find which interaction breaks move 13.

Usage: python tools/gauntlet13_ablate.py <ablation> [gsize]
  ablation in: none (full scenario), bump, vfr, glare, clutter,
  rolling, arm, noise, encode, flicker, wb
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


def scenario(ablate: str, gsize: int, seed: int = 11,
             frame_hw=(720, 1280)):
    """gauntlet_scenario with one hazard removable (mirrors
    synth.gauntlet_scenario exactly when ablate == 'none')."""
    from camkifu_tpu.config import cvconf
    from camkifu_tpu.utils import synth

    moves = synth.capture_rich_moves(19, gsize=gsize, seed=seed)
    fpm = cvconf.vote_window + 6
    fpm_list = [fpm] * len(moves)
    fpm_list[13] += 36
    fpm_list[-1] += 12
    leadin = 6
    bump_at = leadin + sum(fpm_list[:13]) + fpm
    base = synth.default_corners(frame_hw)
    c0 = base.mean(axis=0)
    total = leadin + sum(fpm_list)

    def cam(i):
        th = np.deg2rad(10.0) * i / total
        s = 1.0 + 0.06 * i / total
        if ablate != "bump" and i >= bump_at:
            th += np.deg2rad(2.0)
        rot = np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]], np.float32)
        cs = c0 + s * (base - c0) @ rot.T
        cs += np.array([6.0 * np.sin(i / 9.0), 5.0 * np.cos(i / 11.0)],
                       np.float32)
        if ablate != "bump" and i >= bump_at:
            cs += np.array([26.0, -17.0], np.float32)
        return cs.astype(np.float32)

    kw = dict(frames_per_move=fpm_list, frame_hw=frame_hw, seed=seed,
              empty_leadin=leadin, corners_fn=cam, gsize=gsize,
              hand_frames=2, flicker=0.12, wb_drift=0.08, removal_lag=60,
              stone_jitter=0.07, light_gradient=0.3, blur_sigma=1.2,
              shadow=0.18, wood_texture=0.10, vignette=0.22,
              rolling_shutter=0.7, vfr=0.12, arm_rests=[(6, fpm)],
              glare=0.5, clutter=3, shot_noise=0.4, palette="walnut")
    if ablate == "vfr":
        kw["vfr"] = 0.0
    elif ablate == "glare":
        kw["glare"] = 0.0
    elif ablate == "clutter":
        kw["clutter"] = 0
    elif ablate == "rolling":
        kw["rolling_shutter"] = 0.0
    elif ablate == "arm":
        kw["arm_rests"] = None
    elif ablate == "noise":
        kw["shot_noise"] = 0.0
    elif ablate == "flicker":
        kw["flicker"] = 0.0
    elif ablate == "wb":
        kw["wb_drift"] = 0.0

    def frames_factory():
        it = (f for f, _ in synth.render_game(moves, **kw))
        if ablate == "encode":
            return it
        return iter(synth.encode_roundtrip(it))

    return moves, frames_factory


def main(ablate: str, gsize: int = 13):
    from camkifu_tpu.board.bf_auto import BoardFinderAuto
    from camkifu_tpu.core.capture import ArrayCapture
    from camkifu_tpu.core.controllerv import ControllerVSeq
    from camkifu_tpu.core.vmanager import VManagerSeq
    from camkifu_tpu.stone.sf_meta import SfMeta

    moves, frames_factory = scenario(ablate, gsize)
    frames = list(frames_factory())
    controller = ControllerVSeq(gsize=gsize)
    vm = VManagerSeq(controller, video=None, bf_class=BoardFinderAuto,
                     sf_class=SfMeta, batch=16)
    vm.capture = ArrayCapture(frames)
    vm.instantiate_finders()
    vm.run()
    detected = [(m.color, m.row, m.col) for m in controller.kifu.moves()]
    expected = [(m.color, m.row, m.col) for m in moves]
    ok = detected == expected
    print(f"ablate={ablate} gsize={gsize} match={ok} "
          f"n={len(detected)}/{len(expected)}")
    if not ok:
        for i in range(max(len(detected), len(expected))):
            d = detected[i] if i < len(detected) else None
            e = expected[i] if i < len(expected) else None
            if d != e:
                print(f"  {i}: det={d} exp={e}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "none",
                  int(sys.argv[2]) if len(sys.argv) > 2 else 13))
