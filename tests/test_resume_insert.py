"""SGF checkpoint/resume through the full stack (SURVEY §5) + kifu
insert/mark parity."""

import numpy as np
import pytest

from camkifu_tpu.board.bf_manual import BoardFinderManual
from camkifu_tpu.core.capture import ArrayCapture
from camkifu_tpu.core.controllerv import ControllerVSeq
from camkifu_tpu.core.vmanager import VManagerSeq
from camkifu_tpu.gamemodel.kifu import Kifu
from camkifu_tpu.gamemodel.move import B, W, Move
from camkifu_tpu.stone.sf_meta import SfMeta
from camkifu_tpu.utils import synth

HW = (360, 640)


def test_kifu_insert_and_mark():
    k = Kifu()
    k.append(Move("np", (B, 3, 3)))
    k.append(Move("np", (B, 7, 7)))
    k.insert(Move("np", (W, 5, 5)), 2)
    assert [(m.color, m.row, m.col) for m in k.moves()] == \
        [("B", 3, 3), ("W", 5, 5), ("B", 7, 7)]
    k.mark(Move("np", (W, 5, 5)), "TR")
    tree, idx = k._find("W", "ff")
    assert tree.nodes[idx].get("TR") == "ff"
    with pytest.raises(KeyError):
        k.mark(Move("np", (B, 0, 0)))


def test_sgf_resume_full_stack(tmp_path):
    """Half a game recorded to SGF; a new session resumes from it and
    detects only the remaining moves — the SGF is the checkpoint."""
    sgf_path = str(tmp_path / "game.sgf")
    moves = synth.sample_moves(6, seed=31)
    corners = synth.default_corners(HW)

    def run_session(frames):
        controller = ControllerVSeq(sgffile=sgf_path)
        vm = VManagerSeq(controller, video=None, bf_class=BoardFinderManual,
                         sf_class=SfMeta, batch=16)
        vm.capture = ArrayCapture(frames)
        vm.instantiate_finders()
        vm.board_finder.key = None
        vm.board_finder.set_corners(corners)
        vm.run()
        controller.kifu.save()
        return controller

    # Session 1: first three moves.
    frames1 = [f for f, _ in synth.render_game(
        moves[:3], frames_per_move=10, frame_hw=HW, empty_leadin=4)]
    c1 = run_session(frames1)
    assert len(c1.kifu) == 3

    # Session 2: resumes the SGF; sees the board with moves 1-3 already on
    # it, then moves 4-6 appear. It must append exactly 4-6, not re-detect.
    frames2 = []
    state3 = list(synth.game_states(moves[:3]))[-1][0]
    for i in range(6):  # lead-in: board as left at the end of session 1
        frames2.append(synth.render_frame(state3, corners, HW, seed=50 + i)[0])
    replay = list(synth.game_states(moves))
    for state, _mv in replay[3:]:
        for i in range(10):
            frames2.append(synth.render_frame(state, corners, HW,
                                              seed=100 + i)[0])
    c2 = run_session(frames2)
    got = [(m.color, m.row, m.col) for m in c2.kifu.moves()]
    assert got == [(m.color, m.row, m.col) for m in moves], got

    # And the file round-trips.
    assert len(Kifu.load(sgf_path)) == 6


def test_handicap_setup_stones_in_board_state(tmp_path):
    """AB/AW handicap stones count as board state on resume (real-world SGF
    compatibility); AE clears them."""
    path = tmp_path / "handicap.sgf"
    path.write_text("(;FF[4]SZ[19]HA[2]AB[pd][dp]AW[cc]AE[cc];W[qf];B[nd])")
    from camkifu_tpu.core.controllerv import Controller

    controller = Controller(sgffile=str(path))
    stones = controller.stones()
    assert stones[3, 15] == 1 and stones[15, 3] == 1   # AB at pd, dp
    assert stones[2, 2] == 0                           # AW cleared by AE
    assert (stones != 0).sum() == 4                    # 2 setup + 2 moves
    assert controller.kifu.setup_stones()[0].color == "B"
