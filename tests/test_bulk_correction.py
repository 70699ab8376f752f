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


def test_render_game_removal_lag_lingers_exact_frames():
    """removal_lag keeps a captured stone in the rendered state for exactly
    that many frames after the capturing move, spanning move boundaries."""
    mv = [Move("np", s) for s in
          [(B, 1, 0), (W, 0, 0), (B, 0, 1),    # B captures W(0,0)
           (W, 5, 5), (B, 7, 7)]]
    labs = [lab for _, lab in synth.render_game(
        mv, frames_per_move=2, frame_hw=(180, 240), empty_leadin=0,
        removal_lag=3)]
    present = [int(l[0, 0]) for l in labs]
    # W occupies (0,0) from move 2 (frames 2-3); the capture at move 3
    # (frame 4) starts the 3-frame linger: frames 4, 5, 6 — empty after.
    assert present == [0, 0, 2, 2, 2, 2, 2, 0, 0, 0]


def test_lingering_captures_not_bulk_resurrected():
    """Full pipeline on a capture-rich game where captured stones stay
    physically on the board past BULK_CORRECT_AFTER (players lift captures
    out seconds late). The pending-capture filter must not emit phantom
    moves for the stale group, and the contradiction tracker must treat it
    as an EXPLAINED disagreement — not bulk-resurrect the dead stones."""
    moves = synth.capture_rich_moves(24, seed=11)
    corners = synth.default_corners(HW)
    lag = BULK_CORRECT_AFTER + 8
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=6, corners=corners, frame_hw=HW, seed=5,
        empty_leadin=2, removal_lag=lag)]

    controller = ControllerVSeq()
    vm = VManagerSeq(controller, video=None, bf_class=BoardFinderManual,
                     sf_class=SfClustering, batch=8)
    vm.capture = ArrayCapture(frames)
    vm.instantiate_finders()
    vm.board_finder.key = None
    vm.board_finder.set_corners(corners)
    vm.run()

    got = [(m.color, m.row, m.col) for m in controller.kifu.moves()]
    want = [(m.color, m.row, m.col) for m in moves]
    assert got == want
    # Board truth: both captured W groups are gone from every model.
    from camkifu_tpu.utils.synth import game_states
    final = list(game_states(moves))[-1][0]
    assert (controller.stones() == final).all()
    assert (vm.stones_finder.extractor.state() == final).all()


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
