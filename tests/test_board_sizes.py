"""Non-19 board sizes end-to-end: the reference hardcodes gsize=19 (SURVEY
§2.2 guiconf: "rebuild should parameterize but default to 19")."""

import numpy as np
import jax.numpy as jnp
import pytest

from camkifu_tpu import pipeline
from camkifu_tpu.core.gamesync import MoveExtractor, score_moves
from camkifu_tpu.gamemodel.kifu import Kifu
from camkifu_tpu.gamemodel.move import B, W, Move
from camkifu_tpu.gamemodel.rules import RuleUnsafe
from camkifu_tpu.utils import synth


@pytest.mark.parametrize("gsize", [9, 13])
def test_game_model_other_sizes(gsize):
    rule = RuleUnsafe(gsize=gsize)
    rule.put(Move("np", (B, 0, 0), gsize=gsize))
    rule.confirm()
    with pytest.raises(ValueError):
        Move("np", (B, gsize, 0), gsize=gsize)
    kifu = Kifu(gsize=gsize)
    kifu.append(Move("np", (B, 0, 0), gsize=gsize))
    assert kifu.get_info("SZ") == str(gsize)


@pytest.mark.parametrize("gsize", [9, 13])
def test_pipeline_reads_other_sizes(gsize):
    labels = np.zeros((gsize, gsize), np.int8)
    labels[1, 1] = 1
    labels[gsize - 2, gsize - 2] = 2
    labels[gsize // 2, gsize // 2] = 1
    frame, corners = synth.render_frame(labels, frame_hw=(480, 854))
    out, conf = pipeline.read_board_batch(
        jnp.asarray(frame[None]), jnp.asarray(corners), gsize=gsize)
    assert out.shape == (1, gsize, gsize)
    assert np.array_equal(np.asarray(out[0]), labels)


@pytest.mark.parametrize("gsize", [9, 13])
def test_auto_detection_other_sizes(gsize):
    """bf_auto's comb/pin machinery is gsize-parameterized end to end:
    the gsize-tooth comb must lock onto 9- and 13-line lattices (measured
    ≤4 px corner error, scores ≥0.9 on clean 720p renders)."""
    from camkifu_tpu.board import bf_auto

    labels = np.zeros((gsize, gsize), np.int8)
    labels[2, 2] = 1
    labels[gsize - 3, gsize - 3] = 2
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280))
    det, score = bf_auto.detect_corners(jnp.asarray(frame), gsize=gsize)
    assert float(score) > 0.5
    cell = float(np.linalg.norm(corners[1] - corners[0])) / (gsize - 1)
    assert np.abs(np.asarray(det) - corners).max() < 0.2 * cell


def test_9x9_game_to_moves():
    gsize = 9
    moves = synth.sample_moves(8, gsize=gsize, seed=2)
    corners = synth.default_corners((480, 854))
    ex = MoveExtractor(gsize=gsize)
    for state, _ in synth.game_states(moves, gsize=gsize):
        frame, _ = synth.render_frame(state, corners, (480, 854))
        out, _ = pipeline.read_board_batch(
            jnp.asarray(frame[None]), jnp.asarray(corners), gsize=gsize)
        ex.advance(np.asarray(out[0]))
    assert score_moves(ex.moves, moves)["agreement"] == 1.0


def test_ckmain_headless_13x13(tmp_path):
    """Full app on a 13x13 game (--gsize threads through controller,
    finders, and SGF SZ)."""
    import cv2

    from camkifu_tpu import ckmain

    gsize = 13
    moves = synth.sample_moves(4, gsize=gsize, seed=9)
    corners = synth.default_corners((360, 640))
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=2, corners=corners, frame_hw=(360, 640),
        gsize=gsize, empty_leadin=1)]
    path = str(tmp_path / "g13.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (640, 360))
    for f in frames:
        vw.write(f[:, :, ::-1])
    vw.release()

    sgf_path = str(tmp_path / "g13.sgf")
    corner_arg = ",".join(str(round(float(v), 1)) for v in corners.reshape(-1))
    rc = ckmain.main(["-v", path, "--sgf", sgf_path, "--nogui",
                      "--sf", "clustering", "--corners", corner_arg,
                      "--gsize", "13", "--batch", "8"])
    assert rc == 0
    k = Kifu.load(sgf_path)
    assert k.gsize == 13
    assert [(m.color, m.row, m.col) for m in k.moves()] == \
        [(m.color, m.row, m.col) for m in moves]


@pytest.mark.parametrize("true_g", [9, 13, 19])
def test_infer_gsize(true_g):
    """--gsize auto: the true size's lattice evidence beats the wrong-size
    probes (the comb spacing window cannot express commensurate sub-lattice
    impostors — see bf_auto.infer_gsize)."""
    from camkifu_tpu.board import bf_auto

    labels = np.zeros((true_g, true_g), np.int8)
    labels[2, 2] = 1
    labels[true_g - 3, true_g - 3] = 2
    frame, _ = synth.render_frame(labels, frame_hw=(720, 1280))
    g, quals = bf_auto.infer_gsize(jnp.asarray(frame))
    assert g == true_g, quals
    others = [q for k, q in quals.items() if k != true_g]
    assert quals[true_g] > 1.1 * max(others), quals


def test_ckmain_gsize_auto_plumbing(tmp_path, monkeypatch):
    """--gsize auto resolves BEFORE the game model is built and threads the
    inferred size through controller, finders, and SGF SZ (inference itself
    is covered by test_infer_gsize; here it is pinned to 13)."""
    import cv2

    from camkifu_tpu import ckmain
    from camkifu_tpu.board import bf_auto

    gsize = 13
    moves = synth.sample_moves(3, gsize=gsize, seed=9)
    corners = synth.default_corners((360, 640))
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=2, corners=corners, frame_hw=(360, 640),
        gsize=gsize, empty_leadin=1)]
    path = str(tmp_path / "ga.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (640, 360))
    for f in frames:
        vw.write(f[:, :, ::-1])
    vw.release()

    seen = {}

    def fake_infer(frame, *a, **kw):
        seen["shape"] = tuple(frame.shape)
        return 13, {13: 0.5}

    monkeypatch.setattr(bf_auto, "infer_gsize", fake_infer)
    sgf_path = str(tmp_path / "ga.sgf")
    corner_arg = ",".join(str(round(float(v), 1))
                          for v in corners.reshape(-1))
    rc = ckmain.main(["-v", path, "--sgf", sgf_path, "--nogui",
                      "--sf", "clustering", "--corners", corner_arg,
                      "--gsize", "auto", "--batch", "8"])
    assert rc == 0
    assert seen["shape"] == (360, 640, 3)      # probe frame reached it
    k = Kifu.load(sgf_path)
    assert k.gsize == 13
    assert [(m.color, m.row, m.col) for m in k.moves()] == \
        [(m.color, m.row, m.col) for m in moves]
