"""Host runtime: VManager(Seq) + ControllerV(Seq) + finder hosts + ckmain.

These drive the same public surfaces the reference exposes (SURVEY §3.1/§3.5):
controller API commands, the pipe channel, finder hot-swap, corrections,
headless end-to-end video → SGF.
"""

import os

import numpy as np
import pytest

from camkifu_tpu.board.bf_manual import BoardFinderManual
from camkifu_tpu.core.capture import ArrayCapture
from camkifu_tpu.core.controllerv import ControllerV, ControllerVSeq
from camkifu_tpu.core.vmanager import VManager, VManagerSeq
from camkifu_tpu.gamemodel.move import B, W, Move
from camkifu_tpu.stone.sf_clustering import SfClustering
from camkifu_tpu.stone.sf_tuto import SfTuto
from camkifu_tpu.utils import synth

HW = (360, 640)


def make_game(n_moves=6, fpm=2, seed=13):
    moves = synth.sample_moves(n_moves, seed=seed)
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=fpm, frame_hw=HW, empty_leadin=1, seed=seed)]
    return moves, frames, synth.default_corners(HW)


def seq_stack(frames, corners, sf_class=SfClustering, batch=8, sgf=None):
    controller = ControllerVSeq(sgffile=sgf)
    vm = VManagerSeq(controller, video=None, bf_class=BoardFinderManual,
                     sf_class=sf_class, batch=batch)
    vm.capture = ArrayCapture(frames)
    vm.instantiate_finders()
    vm.board_finder.key = None           # no corner persistence in tests
    vm.board_finder.set_corners(corners)
    return controller, vm


def test_seq_end_to_end_video_to_kifu():
    moves, frames, corners = make_game()
    controller, vm = seq_stack(frames, corners)
    vm.run()
    detected = controller.kifu.moves()
    assert [(m.color, m.row, m.col) for m in detected] == \
        [(m.color, m.row, m.col) for m in moves]
    # Captures flow through the controller rules: board state is consistent.
    assert (controller.stones() == vm.stones_finder.extractor.state()).all()


def test_controller_api_commands_and_navigation():
    moves, frames, corners = make_game(n_moves=4)
    controller, vm = seq_stack(frames, corners)
    vm.run()
    assert len(controller.kifu) == 4
    controller.pipe("backward")
    controller.pipe("backward")
    assert controller.nav.position == 2
    assert (controller.stones() != 0).sum() == 2
    r0, c0 = moves[0].get_coord("np")
    assert controller.stones()[r0, c0] != 0
    controller.pipe("end")
    assert (controller.stones() != 0).sum() >= 3   # minus any captures
    controller.pipe("beginning")
    assert (controller.stones() == 0).all()


def test_hot_swap_stones_finder():
    moves, frames, corners = make_game(n_moves=3)
    controller, vm = seq_stack(frames, corners)
    controller.pipe("sfselect", "contours")
    vm.board_finder.key = None
    vm.board_finder.set_corners(corners)
    assert vm.stones_finder.label == "contours"
    vm.run()
    assert len(controller.kifu) == 3


def test_corrected_feedback_resyncs_finder():
    moves, frames, corners = make_game(n_moves=3)
    controller, vm = seq_stack(frames, corners)
    vm.run()
    sf = vm.stones_finder
    wrong = controller.kifu.moves()[-1]
    fixed = Move("np", (wrong.color, wrong.row,
                        (wrong.col + 1) % 19), gsize=19)
    controller.relocate(wrong, fixed)
    controller.corrected(wrong, fixed)
    assert sf.extractor.state()[fixed.row, fixed.col] != 0
    assert sf.extractor.state()[wrong.row, wrong.col] == 0


def test_sf_tuto_pipes_canned_moves():
    _, frames, corners = make_game(n_moves=1, fpm=1)
    controller, vm = seq_stack(frames, corners, sf_class=SfTuto, batch=2)
    vm.run()
    got = [(m.color, m.row, m.col) for m in controller.kifu.moves()]
    from camkifu_tpu.stone.sf_tuto import CANNED
    assert got == list(CANNED[:len(got)]) and len(got) >= 1


def test_threaded_vmanager_on_off():
    moves, frames, corners = make_game(n_moves=3)
    controller = ControllerV()
    vm = VManager(controller, video=None, bf_class=BoardFinderManual,
                  sf_class=SfClustering, batch=8)
    vm.capture = ArrayCapture(frames)
    vm.init_capture = lambda: None       # keep the injected capture
    vm.vision_on()
    vm.board_finder.key = None
    vm.board_finder.set_corners(corners)
    import time
    deadline = time.time() + 60
    while time.time() < deadline and vm.is_running():
        controller.process_pipe()
        time.sleep(0.02)
    vm.vision_off()
    controller.process_pipe()
    assert len(controller.kifu) == 3
    assert controller.kifu.moves()[0] == moves[0]


def test_posgrid_learn_and_closest():
    from camkifu_tpu.stone.stonesfinder import PosGrid
    grid = PosGrid()
    y, x = grid.pos(0, 0)
    assert (y, x) == (7.5, 7.5)
    assert grid.closest(7.0, 8.0) == (0, 0)
    assert grid.closest(100.0, 200.0) == (6, 12)
    for _ in range(30):
        grid.learn(0, 0, (10.0, 7.5))
    assert abs(grid.pos(0, 0)[0] - 10.0) < 0.3


def test_goban_corners_ordering_and_adjust():
    from camkifu_tpu.board.boardfinder import GobanCorners
    gc = GobanCorners()
    for p in [(100, 100), (10, 90), (95, 5), (12, 8)]:   # random order
        gc.add(p)
    assert gc.ready()
    pts = gc.points
    assert pts[0].tolist() == [12, 8]       # tl
    assert pts[2].tolist() == [100, 100]    # br
    gc.add((11, 7))                          # adjust nearest (tl)
    assert gc.points[0].tolist() == [11, 7]


def test_bf_manual_persistence(tmp_path, monkeypatch):
    from camkifu_tpu.board import bf_manual
    monkeypatch.setattr(bf_manual, "PERSIST_PATH",
                        str(tmp_path / "corners.json"))

    class FakeVM:
        video = "game1.avi"
        controller = None

    bf = BoardFinderManual(FakeVM())
    for x, y in [(10, 10), (600, 12), (610, 350), (8, 340)]:
        bf.onclick(x, y)
    assert bf.ready()

    bf2 = BoardFinderManual(FakeVM())    # new instance: reloads from disk
    assert bf2.ready()
    assert np.allclose(bf2.corners_array, bf.corners_array)


def test_ckmain_headless_on_real_video(tmp_path):
    import cv2

    from camkifu_tpu import ckmain

    moves, frames, corners = make_game(n_moves=4, fpm=2)
    path = str(tmp_path / "game.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (HW[1], HW[0]))
    assert vw.isOpened()
    for f in frames:
        vw.write(f[:, :, ::-1])
    vw.release()

    sgf_path = str(tmp_path / "out.sgf")
    corner_arg = ",".join(str(round(float(v), 1))
                          for v in corners.reshape(-1))
    rc = ckmain.main(["-v", path, "--sgf", sgf_path, "--nogui",
                      "--sf", "clustering", "--corners", corner_arg,
                      "--batch", "8"])
    assert rc == 0
    from camkifu_tpu.gamemodel.kifu import Kifu
    got = Kifu.load(sgf_path).moves()
    assert [(m.color, m.row, m.col) for m in got] == \
        [(m.color, m.row, m.col) for m in moves]


def test_vision_appends_deferred_while_browsing():
    """Vision must not yank the cursor while the user browses history; its
    moves queue and flush when the cursor returns to the end."""
    controller = ControllerVSeq()
    controller.pipe("append", Move("np", (B, 3, 3)))
    controller.pipe("append", Move("np", (W, 9, 9)))
    assert len(controller.kifu) == 2

    controller.pipe("backward")                      # user browses
    assert controller.nav.position == 1
    controller.pipe("append", Move("np", (B, 15, 15)))   # vision keeps going
    assert len(controller.kifu) == 2                 # not applied yet
    assert controller.nav.position == 1              # cursor untouched

    controller.pipe("end")                           # user returns
    assert len(controller.kifu) == 3                 # deferred move flushed
    assert controller.kifu.lastmove() == Move("np", (B, 15, 15))


class _VaryingRingCapture(ArrayCapture):
    """Simulates a live camera ring: read_batch returns however many frames
    the ring happens to hold (here: a fixed varying schedule)."""

    def __init__(self, frames, schedule):
        super().__init__(frames)
        self.schedule = list(schedule)

    def read_batch(self, n):
        k = self.schedule.pop(0) if self.schedule else n
        return super().read_batch(min(k, n))


def test_varying_ring_occupancy_single_jit_specialization():
    """Live rings deliver varying batch sizes; pad_batch must keep every
    device dispatch on ONE static shape (VERDICT r1 weak #4)."""
    moves, frames, corners = make_game(n_moves=3, fpm=3)
    controller, vm = seq_stack(frames, corners, batch=4)
    vm.capture = _VaryingRingCapture(frames, [3, 1, 4, 2, 4, 4])

    seen_shapes = set()
    orig_find = vm.stones_finder._find

    def spy(frames_, corners_):
        seen_shapes.add(tuple(np.asarray(frames_).shape))
        return orig_find(frames_, corners_)

    vm.stones_finder._find = spy
    vm.run()
    assert len(seen_shapes) == 1                 # one shape → one jit entry
    assert next(iter(seen_shapes))[0] == 4       # the static batch size
    detected = controller.kifu.moves()
    assert [(m.color, m.row, m.col) for m in detected] == \
        [(m.color, m.row, m.col) for m in moves]


def test_pad_batch():
    from camkifu_tpu.core.capture import pad_batch

    f = np.arange(3 * 2 * 2 * 3, dtype=np.uint8).reshape(3, 2, 2, 3)
    padded, n = pad_batch(f, 8)
    assert padded.shape == (8, 2, 2, 3) and n == 3
    assert (padded[3:] == f[-1]).all()
    same, n2 = pad_batch(f, 3)
    assert n2 == 3 and same.shape == (3, 2, 2, 3)
    empty, n3 = pad_batch(np.zeros((0, 1, 1, 3), np.uint8), 4)
    assert n3 == 0


def test_goban_drag_relocate_logic():
    """Drag-to-relocate (SURVEY §0.5 'add/move/delete stones'): the gesture
    decision is pure logic; the controller relocate + corrected() feedback
    run headless (the canvas only feeds coordinates)."""
    from camkifu_tpu.gui.goban import resolve_press_release

    controller = ControllerVSeq()
    controller.pipe("append", Move("np", (B, 3, 3)))
    controller.pipe("append", Move("np", (W, 9, 9)))
    stones = controller.stones()

    # Gesture decisions.
    assert resolve_press_release(stones, (5, 5), (5, 5), 19) == ("put", 5, 5)
    assert resolve_press_release(stones, (3, 3), (3, 3), 19) == (None,)
    assert resolve_press_release(stones, (3, 3), (9, 9), 19) == (None,)
    act = resolve_press_release(stones, (3, 3), (4, 7), 19)
    assert act == ("relocate", (3, 3), (4, 7), "B")

    # The relocate path through the controller + vision feedback.
    corrections = []
    controller.stones_finder = type(
        "SF", (), {"corrected": lambda self, e, x: corrections.append((e, x))
                   })()
    err = Move("np", (B, 3, 3))
    exp = Move("np", (B, 4, 7))
    controller.relocate(err, exp)
    controller.corrected(err, exp)
    stones = controller.stones()
    assert stones[3, 3] == 0 and stones[4, 7] == 1
    assert corrections == [(err, exp)]
    # The kifu recorded the relocation (move 1 now at the new point).
    assert controller.kifu.moves()[0] == exp


def test_initial_corners_survive_finder_reinstantiation(monkeypatch):
    """ckmain --corners used to poke corners onto a finder instance that
    vision_on/hot-swap immediately discarded (surviving only through
    bf_manual's disk store). They now live on the manager and re-apply on
    every instantiation — with persistence disabled to prove it."""
    import camkifu_tpu.board.bf_manual as bfm

    monkeypatch.setattr(bfm, "_load_store", lambda: {})
    monkeypatch.setattr(bfm, "_save_store", lambda store: None)

    moves, frames, corners = make_game(n_moves=2)
    controller = ControllerVSeq()
    vm = VManagerSeq(controller, video="somevideo.mp4",
                     bf_class=BoardFinderManual, sf_class=SfClustering,
                     batch=8, initial_corners=corners)
    vm.capture = ArrayCapture(frames)
    vm.instantiate_finders()
    assert vm.board_finder.ready()
    vm.instantiate_finders()          # hot-swap / vision_on re-instantiation
    assert vm.board_finder.ready()
    assert np.allclose(vm.board_finder.corners_array, corners, atol=1e-3)
    vm.run()
    assert len(controller.kifu) == 2
