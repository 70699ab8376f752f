"""Self-correction: persistent contradictions trigger bulk fixes through the
controller (SURVEY §3.3 periodic re-scan → pipe("bulk", ...))."""

import numpy as np

from camkifu_tpu.board.bf_manual import BoardFinderManual
from camkifu_tpu.core.capture import ArrayCapture
from camkifu_tpu.core.controllerv import ControllerVSeq
from camkifu_tpu.core.vmanager import VManagerSeq
from camkifu_tpu.gamemodel.move import B, W, Move
from camkifu_tpu.stone.sf_clustering import SfClustering
from camkifu_tpu.stone.stonesfinder import BULK_CORRECT_AFTER
from camkifu_tpu.utils import synth

HW = (360, 640)


def test_bulk_relocate_after_persistent_contradiction():
    corners = synth.default_corners(HW)
    a = np.zeros((19, 19), np.int8)
    a[3, 3] = 1                      # committed (wrongly, say) at (3,3)
    b = np.zeros((19, 19), np.int8)
    b[3, 4] = 1                      # the stone actually sits at (3,4)

    frames = []
    for i in range(4):               # enough to commit B(3,3)
        frames.append(synth.render_frame(a, corners, HW, seed=i)[0])
    for i in range(BULK_CORRECT_AFTER + 8):
        frames.append(synth.render_frame(b, corners, HW, seed=100 + i)[0])

    controller = ControllerVSeq()
    vm = VManagerSeq(controller, video=None, bf_class=BoardFinderManual,
                     sf_class=SfClustering, batch=8)
    vm.capture = ArrayCapture(frames)
    vm.instantiate_finders()
    vm.board_finder.key = None
    vm.board_finder.set_corners(corners)
    vm.run()

    moves = controller.kifu.moves()
    assert [(m.color, m.row, m.col) for m in moves] == [("B", 3, 4)]
    assert controller.stones()[3, 3] == 0
    assert controller.stones()[3, 4] == 1
    # Finder's internal state agrees with the controller.
    assert (vm.stones_finder.extractor.state() == controller.stones()).all()


def test_bulk_update_deferred_while_browsing():
    """A vision-originated bulk correction must not yank the nav cursor
    mid-browse (same invariant as cvappend); it flushes when the user
    returns to the end of the game."""
    from camkifu_tpu.core.controllerv import ControllerVSeq
    from camkifu_tpu.gamemodel.move import B, W, Move

    ctrl = ControllerVSeq()
    for mv in [Move("np", (B, 3, 3)), Move("np", (W, 15, 15)),
               Move("np", (B, 5, 5))]:
        ctrl.append(mv)
    ctrl.nav.goto(1)                          # browsing history
    ctrl.bulk_update([(None, Move("np", (W, 9, 9)))])
    assert ctrl.nav.position == 1             # cursor not yanked
    assert len(ctrl.kifu) == 3                # not yet applied
    ctrl.nav.end()                            # flushes the deferred bulk
    assert len(ctrl.kifu) == 4
    assert ctrl.rules.copystones()[9, 9] == "W"
