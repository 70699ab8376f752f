"""SfMeta: temporal votes, agitation gating, trust promotion, corrections
(SURVEY §2.1 sf_meta; BASELINE config 3)."""

import numpy as np
import jax.numpy as jnp

from camkifu_tpu.config import cvconf
from camkifu_tpu.core.gamesync import MoveExtractor, score_moves
from camkifu_tpu.gamemodel.move import B, W, Move
from camkifu_tpu.stone import sf_meta, sf_contours
from camkifu_tpu.ops.warp import warp_to_canonical
from camkifu_tpu.ops.color import to_float
from camkifu_tpu.utils import synth


def render_batch(labels, n, hw=(360, 640), seed0=0, corners=None):
    frames = []
    for i in range(n):
        f, corners = synth.render_frame(labels, corners=corners,
                                        frame_hw=hw, seed=seed0 + i)
        frames.append(f)
    return np.stack(frames), corners


def test_contours_classifier_works_from_move_one():
    labels = np.zeros((19, 19), np.int8)
    labels[3, 3] = 1          # single black stone, no white anywhere
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280))
    canon = warp_to_canonical(to_float(jnp.asarray(frame)),
                              jnp.asarray(corners))
    out, conf = sf_contours.classify_canonical(canon)
    assert np.array_equal(np.asarray(out), labels)


def test_votes_require_persistence():
    """A stone must be seen for ~vote_threshold frames before it commits."""
    empty = np.zeros((19, 19), np.int8)
    one = empty.copy()
    one[9, 9] = 1
    state = sf_meta.init_state()
    f_empty, corners = render_batch(empty, 6)
    state, labels, conf, agit = sf_meta.read_batch(
        state, jnp.asarray(f_empty), jnp.asarray(corners))
    assert np.asarray(labels)[-1].sum() == 0

    f_one, _ = render_batch(one, 8, corners=corners)
    state, labels, conf, agit = sf_meta.read_batch(
        state, jnp.asarray(f_one), jnp.asarray(corners))
    labels = np.asarray(labels)
    # Not committed instantly…
    assert labels[0].sum() == 0
    # …but committed by the end of the batch.
    assert labels[-1][9, 9] == 1 and labels[-1].sum() == 1


def test_agitation_gates_votes():
    """A hand (large bright blob) sweeping the board must not create stones
    and must not erase the stable reading."""
    labels = np.zeros((19, 19), np.int8)
    labels[3, 3] = 1
    labels[15, 15] = 2
    state = sf_meta.init_state()
    frames, corners = render_batch(labels, 10)
    state, out, conf, agit = sf_meta.read_batch(
        state, jnp.asarray(frames), jnp.asarray(corners))
    assert np.array_equal(np.asarray(out)[-1], labels)

    # Occlude half the board with a "hand".
    import cv2
    occluded = []
    for i in range(6):
        f = frames[i % len(frames)].copy()
        cv2.circle(f, (250 + 25 * i, 180), 110, (210, 170, 150), -1)
        occluded.append(f)
    state2, out2, conf2, agit2 = sf_meta.read_batch(
        state, jnp.asarray(np.stack(occluded)), jnp.asarray(corners))
    agit2 = np.asarray(agit2)
    assert (agit2 > cvconf.agitation_threshold).any(), agit2
    # Stable reading survives the occlusion.
    assert np.array_equal(np.asarray(out2)[-1], labels)


def test_full_game_with_votes_and_scoring():
    """BASELINE config 3 (downscaled): recorded synthetic game → votes → SGF."""
    moves = synth.sample_moves(12, seed=5)
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=cvconf.vote_window + 2, frame_hw=(360, 640),
        empty_leadin=6)]
    corners = synth.default_corners((360, 640))
    state = sf_meta.init_state()
    ex = MoveExtractor()
    B_ = 16
    for i in range(0, len(frames), B_):
        chunk = frames[i:i + B_]
        n = len(chunk)
        while len(chunk) < B_:
            chunk.append(chunk[-1])
        state, labels, conf, agit = sf_meta.read_batch(
            state, jnp.asarray(np.stack(chunk)), jnp.asarray(corners))
        for j in range(n):
            ex.advance(np.asarray(labels[j]))
    report = score_moves(ex.moves, moves)
    assert report["agreement"] == 1.0, report


def test_reset_votes_correction():
    labels = np.zeros((19, 19), np.int8)
    labels[3, 3] = 1
    state = sf_meta.init_state()
    frames, corners = render_batch(labels, 10)
    state, out, _, _ = sf_meta.read_batch(
        state, jnp.asarray(frames), jnp.asarray(corners))
    assert np.asarray(out)[-1][3, 3] == 1
    state = sf_meta.reset_votes(state, [(3, 3)])
    assert np.asarray(state.stable)[3, 3] == 0
    assert np.asarray(state.votes)[3, 3].sum() == 0


def test_set_stable_resume():
    board = np.zeros((19, 19), np.int8)
    board[0, 0] = 2
    state = sf_meta.set_stable(sf_meta.init_state(), board)
    assert np.asarray(state.stable)[0, 0] == 2


def test_capture_heavy_game_through_votes():
    """A scripted game with two captures (single stone + two-stone group)
    through the full SfMeta vote pipeline."""
    from camkifu_tpu.core.gamesync import MoveExtractor, score_moves
    from camkifu_tpu.gamemodel.move import Move

    seq = [  # B captures W(0,0); later W captures B group (5,5),(5,6)
        (B, 0, 1), (W, 0, 0), (B, 5, 5), (W, 4, 5), (B, 5, 6), (W, 4, 6),
        (B, 1, 0),            # captures W(0,0)
        (W, 6, 5), (B, 9, 9), (W, 6, 6), (B, 12, 12), (W, 5, 4),
        (B, 15, 15), (W, 5, 7),   # captures B(5,5),B(5,6)
    ]
    moves = [Move("np", m) for m in seq]
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=cvconf.vote_window + 3, frame_hw=(360, 640),
        empty_leadin=4)]
    corners = synth.default_corners((360, 640))
    state = sf_meta.init_state()
    ex = MoveExtractor()
    for i in range(0, len(frames), 16):
        chunk = frames[i:i + 16]
        n = len(chunk)
        while len(chunk) < 16:
            chunk.append(chunk[-1])
        state, labels, conf, agit = sf_meta.read_batch(
            state, jnp.asarray(np.stack(chunk)), jnp.asarray(corners))
        for j in range(n):
            ex.advance(np.asarray(labels[j]))
    rep = score_moves(ex.moves, moves)
    assert rep["agreement"] == 1.0, rep
    # Captures applied: W(0,0) and the B pair are gone.
    assert ex.state()[0, 0] == 0
    assert ex.state()[5, 5] == 0 and ex.state()[5, 6] == 0


def test_padded_frames_do_not_amplify_votes():
    """A live-mode batch with 1 real frame padded to 16 copies must not
    multiply that frame's evidence: a single transient misread would
    otherwise be committed instantly (pad count >> vote window)."""
    from camkifu_tpu.utils import synth
    import jax.numpy as jnp

    empty = np.zeros((19, 19), np.int8)
    phantom = empty.copy()
    phantom[9, 9] = 1                      # 1-frame transient "stone"
    corners = synth.default_corners((360, 640))
    f_empty, _ = synth.render_frame(empty, corners, (360, 640), seed=2)
    f_phantom, _ = synth.render_frame(phantom, corners, (360, 640), seed=2)

    state = sf_meta.init_state()
    # Warm up on a full batch of empty board.
    fb = jnp.asarray(np.stack([f_empty] * 16))
    state, labels, _, _ = sf_meta.read_batch(state, fb,
                                             jnp.asarray(corners))
    assert (np.asarray(labels[-1]) == 0).all()

    # One real (transient) frame padded to the batch: masked → no commit.
    fb2 = jnp.asarray(np.stack([f_phantom] * 16))
    state2, labels2, _, _ = sf_meta.read_batch(
        state, fb2, jnp.asarray(corners), valid_count=jnp.int32(1))
    assert (np.asarray(labels2[-1]) == 0).all(), \
        "padded duplicates amplified a 1-frame transient into a commit"

    # Control: the same batch WITHOUT masking would commit the phantom
    # (this is exactly the failure mode the mask exists to prevent).
    state3, labels3, _, _ = sf_meta.read_batch(
        state, fb2, jnp.asarray(corners))
    assert np.asarray(labels3[-1])[9, 9] == 1
