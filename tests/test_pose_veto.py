"""Pose veto: a freshly anchored board pose that wholesale contradicts the
committed game must be REJECTED, not voted into the kifu.

The scenario that makes this live: full detection is confidently wrong on
stone-saturated boards rotated ≥~14° in-plane (measured r3: 3–8 cells off
at score 0.27–0.35 — the 1D combs cannot express that basin and the 2D
evidence prior picks a shrunk impostor). Resuming a recorded late game
with such a camera — or re-anchoring after a mid-endgame bump — would
read every committed stone scrambled, and within a vote window the bulk
self-correction machinery would rewrite the entire kifu onto the impostor
lattice. The committed game is the ground truth that survives any camera
event; SfMeta cross-checks each fresh anchor against it (reference
parity: the reference's vision also defers to the game model on
contradiction — SURVEY §3.4).
"""

import numpy as np

from camkifu_tpu.board.bf_auto import BoardFinderAuto
from camkifu_tpu.core.capture import ArrayCapture
from camkifu_tpu.core.controllerv import ControllerVSeq
from camkifu_tpu.core.vmanager import VManagerSeq
from camkifu_tpu.gamemodel.kifu import Kifu
from camkifu_tpu.stone.sf_meta import SfMeta
from camkifu_tpu.utils import synth

HW = (720, 1280)
N_MOVES = 200          # saturated endgame: the regime where detection can
SEED = 9               # be confidently wrong under rotation


def _resumed_session(sgf_path, frames):
    controller = ControllerVSeq(sgffile=str(sgf_path))
    vm = VManagerSeq(controller, video=None, bf_class=BoardFinderAuto,
                     sf_class=SfMeta, batch=16)
    vm.capture = ArrayCapture(frames)
    vm.instantiate_finders()
    vm.run()
    return controller, vm


def _saved_game(tmp_path):
    moves = synth.sample_moves(N_MOVES, seed=SEED)
    kifu = Kifu.new(str(tmp_path / "late.sgf"))
    for m in moves:
        kifu.append(m)
    kifu.save()
    state = list(synth.game_states(moves))[-1][0]
    return moves, kifu, state


def _rotated(corners, deg):
    ctr = corners.mean(axis=0)
    th = np.deg2rad(deg)
    rot = np.array([[np.cos(th), -np.sin(th)],
                    [np.sin(th), np.cos(th)]], np.float32)
    return (ctr + (corners - ctr) @ rot.T).astype(np.float32)


def test_pose_veto_protects_committed_game(tmp_path):
    """Resume a 200-stone game seen through a 17°-rotated camera: detection
    misfires by cells (measured), the veto must refuse the pose and leave
    the kifu byte-identical — 'board lost' is correct, a rewritten game is
    not."""
    moves, _, state = _saved_game(tmp_path)
    corners = _rotated(synth.default_corners(HW), 17)
    frames = [synth.render_frame(state, corners, HW, seed=70 + i)[0]
              for i in range(48)]                      # 3 batches
    controller, vm = _resumed_session(tmp_path / "late.sgf", frames)

    got = [(m.color, m.row, m.col) for m in controller.kifu.moves()]
    assert got == [(m.color, m.row, m.col) for m in moves]
    assert vm.board_finder.metadata.get("track_trip") == "pose_veto"
    # The vetoed pose is unpublished: the finder is re-anchoring, not
    # serving a wrong homography to anyone.
    assert not vm.board_finder.ready()


def test_pose_accepted_when_consistent(tmp_path):
    """Same resumed endgame, unrotated camera: the anchor agrees with the
    committed game — no veto, and the next move is detected on top of the
    resumed state."""
    moves, _, state = _saved_game(tmp_path)
    corners = synth.default_corners(HW)
    from camkifu_tpu.config import cvconf
    from camkifu_tpu.gamemodel.move import Move, B, W
    from camkifu_tpu.gamemodel.rules import RuleUnsafe

    # One more legal move on the resumed position, rules-verified (a random
    # empty point could be a suicide); `after` comes from the rules so any
    # capture is reflected in the rendered frames.
    rule = RuleUnsafe(gsize=19)
    for m in moves:
        rule.put(m)
        rule.confirm()
    color = B if moves[-1].color == W else W
    nxt = None
    for r in range(19):
        for c in range(19):
            if state[r, c] == 0 and nxt is None:
                try:
                    cand = Move("np", (color, r, c), gsize=19)
                    rule.put(cand)
                    rule.confirm()
                    nxt = cand
                except Exception:
                    continue
    assert nxt is not None
    after = rule.as_labels()
    frames = [synth.render_frame(state, corners, HW, seed=70 + i)[0]
              for i in range(16)]
    frames += [synth.render_frame(after, corners, HW, seed=170 + i)[0]
               for i in range(cvconf.vote_window + 19)]
    controller, vm = _resumed_session(tmp_path / "late.sgf", frames)

    got = [(m.color, m.row, m.col) for m in controller.kifu.moves()]
    assert got == [(m.color, m.row, m.col) for m in moves] \
        + [(nxt.color, nxt.row, nxt.col)]
    assert vm.board_finder.metadata.get("track_trip") != "pose_veto"
    assert vm.board_finder.ready()
