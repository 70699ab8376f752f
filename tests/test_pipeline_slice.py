"""Stage-3 end-to-end slice (BASELINE config 1/2/3-without-votes): synthetic
game → jitted pipeline (fixed manual corners) → move extraction → SGF, scored
against ground truth. This is the filecheck oracle running on the minimum
slice (SURVEY §7 stage 3)."""

import numpy as np
import jax.numpy as jnp

from camkifu_tpu import filecheck, pipeline
from camkifu_tpu.core.gamesync import MoveExtractor, score_moves
from camkifu_tpu.gamemodel.move import Move, B, W
from camkifu_tpu.utils import synth


def test_single_still_full_classify():
    """BASELINE config 1: one 1080p still, full stone classify."""
    labels = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(0)
    idx = rng.choice(361, 120, replace=False)
    labels.flat[idx[:60]] = 1
    labels.flat[idx[60:]] = 2
    frame, corners = synth.render_frame(labels, frame_hw=(1080, 1920))
    out, conf = pipeline.read_board_batch(
        jnp.asarray(frame[None]), jnp.asarray(corners))
    assert np.array_equal(np.asarray(out[0]), labels)
    assert float(np.asarray(conf[0]).min()) >= 0.0


def test_empty_board_reads_empty():
    frame, corners = synth.render_frame(np.zeros((19, 19), np.int8),
                                        frame_hw=(720, 1280))
    out, _ = pipeline.read_board_batch(jnp.asarray(frame[None]),
                                       jnp.asarray(corners))
    assert np.asarray(out[0]).sum() == 0


def test_sparse_board_one_stone_each():
    labels = np.zeros((19, 19), np.int8)
    labels[3, 3] = 1
    labels[15, 15] = 2
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280))
    out, _ = pipeline.read_board_batch(jnp.asarray(frame[None]),
                                       jnp.asarray(corners))
    assert np.array_equal(np.asarray(out[0]), labels)


def test_filecheck_synth_game_fixed_corners():
    """The whole harness: 20-move synthetic game, manual corners, per-frame
    clustering (no votes needed on clean frames) → 100% agreement."""
    report = filecheck.check("synth:20:11", None, use_meta=False, batch=8)
    assert report["agreement"] == 1.0, report
    assert report["extra"] == 0, report


def test_filecheck_game_with_capture():
    """A game containing a real capture, rendered and re-read."""
    moves = [Move("np", (B, 0, 1)), Move("np", (W, 0, 0)),
             Move("np", (B, 5, 5)), Move("np", (W, 9, 9)),
             Move("np", (B, 1, 0))]  # captures W(0,0)
    frames = (f for f, _ in synth.render_game(moves, frames_per_move=3,
                                              frame_hw=(720, 1280)))
    corners = synth.default_corners((720, 1280))
    ex, _stats = filecheck.run_pipeline(frames, corners, batch=4,
                                        use_meta=False)
    assert score_moves(ex.moves, moves)["agreement"] == 1.0
    assert ex.state()[0, 0] == 0  # capture applied in the extractor state
