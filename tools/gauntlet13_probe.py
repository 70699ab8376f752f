"""Gauntlet-13 bisect probe: run the failing scenario with the
shared-canvas refine ON vs OFF to attribute the move-13 divergence.

Usage: python tools/gauntlet13_probe.py [on|off]
Runs on CPU (same as the test suite).
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


def main(shared_on: bool, gsize: int = 13):
    from camkifu_tpu.board import bf_auto
    from camkifu_tpu.board.bf_auto import BoardFinderAuto
    from camkifu_tpu.core.capture import ArrayCapture
    from camkifu_tpu.core.controllerv import ControllerVSeq
    from camkifu_tpu.core.vmanager import VManagerSeq
    from camkifu_tpu.stone.sf_meta import SfMeta
    from camkifu_tpu.utils import synth

    bf_auto.SHARED_REFINE_ENABLED = shared_on
    moves, frames_factory = synth.gauntlet_scenario(19, seed=11, gsize=gsize)
    frames = list(frames_factory())
    controller = ControllerVSeq(gsize=gsize)
    vm = VManagerSeq(controller, video=None, bf_class=BoardFinderAuto,
                     sf_class=SfMeta, batch=16)
    vm.capture = ArrayCapture(frames)
    vm.instantiate_finders()
    vm.run()
    detected = [(m.color, m.row, m.col) for m in controller.kifu.moves()]
    expected = [(m.color, m.row, m.col) for m in moves]
    print(f"shared={shared_on} gsize={gsize}")
    print(f"detected {len(detected)} expected {len(expected)} "
          f"match={detected == expected}")
    for i, (d, e) in enumerate(zip(detected, expected)):
        if d != e:
            print(f"  first diff at {i}: {d} != {e}")
            break
    if len(detected) != len(expected):
        print(f"  tail: detected[-3:]={detected[-3:]} "
              f"expected[-3:]={expected[-3:]}")


if __name__ == "__main__":
    main(sys.argv[1] != "off" if len(sys.argv) > 1 else True,
         int(sys.argv[2]) if len(sys.argv) > 2 else 13)
