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


def test_motion_gate_ignores_exposure_steps():
    """A global auto-exposure step (multiplicative gain on the whole frame)
    is not motion: the gate must stay fully calm at swings measured to mark
    the entire board agitated without compensation (≥12%)."""
    from camkifu_tpu.stone import votes

    labels = np.zeros((19, 19), np.int8)
    labels[3, 3] = 1
    frame, _ = synth.render_frame(labels, frame_hw=(720, 1280))
    g = frame.mean(axis=2).astype(np.float32) / 255.0
    small = g[:180 * 4, :312 * 4].reshape(180, 4, 312, 4).mean(axis=(1, 3))
    sq = small[:152, :152]
    for step in (0.88, 1.12, 1.2):
        calm, agit = votes.zone_motion_gate(jnp.asarray(sq * step),
                                            jnp.asarray(sq), 19)
        assert float(agit) == 0.0, (step, float(agit))


def test_motion_gate_catches_occluder_under_exposure_step():
    """Exposure compensation must not blind the gate to a real occluder
    arriving in the same frame as the AE dip it causes."""
    from camkifu_tpu.stone import votes

    rng = np.random.default_rng(3)
    sq = 0.55 + 0.05 * rng.standard_normal((152, 152)).astype(np.float32)
    cur = (sq * 0.88).astype(np.float32)          # AE dips 12% ...
    cur[40:104, 40:104] = 0.22                    # ... as a hand lands
    calm, agit = votes.zone_motion_gate(jnp.asarray(cur), jnp.asarray(sq), 19)
    blob = np.asarray(calm)[6:12, 6:12]           # zones fully inside blob
    assert blob.mean() < 0.2, blob
    assert float(agit) > 0.05


def test_robust_gain_recovers_gain_despite_outliers():
    from camkifu_tpu.ops import background

    rng = np.random.default_rng(0)
    ref = 0.5 + 0.1 * rng.standard_normal((120, 120)).astype(np.float32)
    ref = np.clip(ref, 0.2, 0.9)
    x = (ref * 1.15).astype(np.float32)
    x[:40, :90] = 0.2                             # 25% of pixels occluded
    gain = float(background.robust_gain(jnp.asarray(x), jnp.asarray(ref)))
    assert abs(gain - 1.15) < 0.02, gain


def test_bgsub_exposure_shift_no_phantom_stones():
    """A sustained AE shift must not flip the board into phantom stones in
    the background-subtraction finder: at a 28% dim the |luma − bg| bias
    (0.28·luma ≈ 0.15) crosses PRESENCE_THRESH and the uncompensated
    finder misreads (measured r3)."""
    from camkifu_tpu.stone import sf_bgsub

    empty = np.zeros((19, 19), np.int8)
    labels = empty.copy()
    labels[3, 3] = 1
    labels[15, 15] = 2
    frames0, corners = render_batch(empty, 8)       # learn the empty board
    state = sf_bgsub.init_state()
    state, *_ = sf_bgsub.read_batch(
        state, jnp.asarray(frames0), jnp.asarray(corners, jnp.float32))
    frames, _ = render_batch(labels, cvconf.vote_window + 4,
                             corners=corners)
    state, out, conf, agit = sf_bgsub.read_batch(
        state, jnp.asarray(frames), jnp.asarray(corners, jnp.float32))
    assert np.array_equal(np.asarray(out)[-1], labels)

    dimmed = np.clip(frames.astype(np.float32) * 0.72, 0, 255) \
        .astype(np.uint8)
    state2, out2, conf2, agit2 = sf_bgsub.read_batch(
        state, jnp.asarray(dimmed), jnp.asarray(corners, jnp.float32))
    assert np.array_equal(np.asarray(out2)[-1], labels), \
        np.asarray(out2)[-1]
