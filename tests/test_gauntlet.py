"""THE GAUNTLET — every adversity at once, one game, exact kifu required.

Each hazard below has its own suite proving the defense that handles it;
this e2e exists because defenses interact. The scenario
(synth.gauntlet_scenario, also runnable as `ckfilecheck synth:19:gauntlet
auto`) stacks:

- capture-rich game (two-stone + single-stone captures) with captured
  stones physically lingering 60 frames (past the bulk-correction
  threshold) — pending-capture filter + explained-contradiction gate;
- handheld camera: drift + slow rotation + slow zoom (4-DoF tracking);
- a mid-game camera BUMP while captured stones are still pending removal
  (jump trip-wire + re-detection + vote re-seed from the committed game,
  with the stale-capture mask protecting the re-seeded state from the
  stones that are physically present but logically captured);
- auto-exposure flicker with reactive dips while the hand is in frame
  (robust gain in the motion gate + background model);
- realism pass: wood grain, vignetting, defocus, lighting gradient,
  shadow, stone jitter, an animated hand placing each stone, walnut
  palette, and an mp4 encode round-trip.

Reference parity: the reference was exercised on real recorded games where
all of these co-occur (SURVEY §0.6, §4) — this is the closest synthetic
equivalent, and the bar is exact move-for-move agreement.
"""

import pytest

from camkifu_tpu.utils import synth

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("gsize", [19, 13, 9])
def test_gauntlet_end_to_end(gsize):
    from camkifu_tpu.board.bf_auto import BoardFinderAuto
    from camkifu_tpu.core.capture import ArrayCapture
    from camkifu_tpu.core.controllerv import ControllerVSeq
    from camkifu_tpu.core.vmanager import VManagerSeq
    from camkifu_tpu.stone.sf_meta import SfMeta

    moves, frames_factory = synth.gauntlet_scenario(19, seed=11, gsize=gsize)
    frames = list(frames_factory())

    controller = ControllerVSeq(gsize=gsize)
    vm = VManagerSeq(controller, video=None, bf_class=BoardFinderAuto,
                     sf_class=SfMeta, batch=16)
    vm.capture = ArrayCapture(frames)
    vm.instantiate_finders()
    vm.run()
    detected = controller.kifu.moves()
    assert [(m.color, m.row, m.col) for m in detected] == \
        [(m.color, m.row, m.col) for m in moves]
