"""Per-frame corner tracking (BASELINE config 4 — honest per-frame board
re-detection): bf_auto.track_corners_batch.

The tracker measures each frame's board translation from that frame's own
pixels (chunk-shared rectification + lattice-profile correlation); full
detection re-anchors it at bf_period cadence. Reference parity: the
reference re-runs BoardFinderAuto._detect periodically and tracks corner
drift (SURVEY §2.1 boardfinder); per-frame measurement is the TPU upgrade.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from camkifu_tpu.board import bf_auto
from camkifu_tpu.config import cvconf
from camkifu_tpu.core.gamesync import MoveExtractor, score_moves
from camkifu_tpu.stone import sf_meta
from camkifu_tpu.utils import synth

HW = (720, 1280)
RES = 320


def _drifting_frames(labels, n, amp=(12.0, 9.0), seed=11):
    base = synth.default_corners(HW)
    frames, gts = [], []
    for i in range(n):
        drift = np.array([amp[0] * np.sin(i / 5), amp[1] * np.cos(i / 6)],
                         np.float32)
        c = base + drift[None, :]
        f, _ = synth.render_frame(labels, c, HW, seed=seed)
        frames.append(f)
        gts.append(c)
    return np.stack(frames), np.stack(gts)


@pytest.fixture(scope="module")
def midgame_labels():
    labels = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(1)
    idx = rng.choice(361, 80, replace=False)
    labels.flat[idx[:40]] = 1
    labels.flat[idx[40:]] = 2
    return labels


def test_tracks_drifting_board_subcell(midgame_labels):
    frames, gts = _drifting_frames(midgame_labels, 32)
    cs, sharp, _ = bf_auto.track_corners_batch(
        jnp.asarray(frames), jnp.asarray(gts[0]), res=RES)
    err = np.abs(np.asarray(cs) - gts).max()
    cell = np.linalg.norm(gts[0][1] - gts[0][0]) / 18
    assert err < 0.15 * cell          # sub-cell on every frame
    assert (np.asarray(sharp) >= bf_auto.TRACK_MIN_SHARPNESS).all()


def test_tracking_resumes_across_batches(midgame_labels):
    frames, gts = _drifting_frames(midgame_labels, 48)
    seed = jnp.asarray(gts[0])
    cell = np.linalg.norm(gts[0][1] - gts[0][0]) / 18
    for k in range(0, 48, 16):
        cs, _, seed = bf_auto.track_corners_batch(
            jnp.asarray(frames[k:k + 16]), seed, res=RES)
        assert np.abs(np.asarray(cs) - gts[k:k + 16]).max() < 0.15 * cell


def test_imperfect_seed_absorbed(midgame_labels):
    """The first frame's correlation is measured against the seed anchor;
    a couple px of seed error must not grow while tracking."""
    frames, gts = _drifting_frames(midgame_labels, 16)
    seed = jnp.asarray(gts[0] + np.array([2.0, -1.5], np.float32))
    cs, _, _ = bf_auto.track_corners_batch(jnp.asarray(frames), seed,
                                           res=RES)
    err = np.abs(np.asarray(cs) - gts).max(axis=(1, 2))
    assert err.max() < err[0] + 4.0   # bounded by seed error + sub-cell


def test_handheld_game_end_to_end_tracked():
    """Config 4 full loop: detect once, track per frame, votes → 100% moves
    (the VERDICT r1 'honest c4' requirement: detection/tracking measured
    from the frames themselves, no ground-truth corners)."""
    moves = synth.sample_moves(10, seed=5)
    fpm = cvconf.vote_window + 3
    base = synth.default_corners(HW)
    frames = []
    t = 0
    for _, lab in synth.render_game(moves, frames_per_move=fpm,
                                    frame_hw=HW, seed=5, empty_leadin=6):
        drift = np.array([12.0 * np.sin(t / 7), 9.0 * np.cos(t / 9)],
                         np.float32)
        f, _ = synth.render_frame(lab, base + drift[None, :], HW, seed=5 + t)
        frames.append(f)
        t += 1
    frames = np.stack(frames)

    seed, score = bf_auto.detect_corners(jnp.asarray(frames[0]))
    assert float(score) > 0.1
    state = sf_meta.init_state()
    ex = MoveExtractor()
    B = 16
    for k in range(0, len(frames), B):
        fb = frames[k:k + B]
        n = fb.shape[0]
        if n < B:                      # pad tail (static jit shapes)
            fb = np.concatenate([fb, fb[-1:].repeat(B - n, 0)])
        # The production config-4 engine: fused track+rectify+classify+scan.
        state, labels, _, _, _cs, _sharp, seed = sf_meta.track_read_batch(
            state, jnp.asarray(fb), seed)
        for lab in np.asarray(labels)[:n]:
            ex.advance(lab)
    rep = score_moves(ex.moves, moves)
    assert rep["agreement"] == 1.0, rep


def test_handheld_game_unfused_corner_batch_path():
    """The unfused path (track_corners_batch corners → read_batch's chunked
    warp) — what non-meta finders get from BoardFinderAuto. The clip holds
    the final position a moment (as any real recording does) so the last
    move's votes can settle."""
    moves = synth.sample_moves(8, seed=6)
    fpm = cvconf.vote_window + 3
    base = synth.default_corners(HW)
    frames = []
    t = 0
    for _, lab in synth.render_game(moves, frames_per_move=fpm,
                                    frame_hw=HW, seed=6, empty_leadin=6):
        drift = np.array([12.0 * np.sin(t / 7), 9.0 * np.cos(t / 9)],
                         np.float32)
        f, _ = synth.render_frame(lab, base + drift[None, :], HW, seed=6 + t)
        frames.append(f)
        t += 1
    for _ in range(12):                # trailing hold on the last position
        frames.append(frames[-1])
    frames = np.stack(frames)

    seed, score = bf_auto.detect_corners(jnp.asarray(frames[0]))
    assert float(score) > 0.1
    state = sf_meta.init_state()
    ex = MoveExtractor()
    B = 16
    for k in range(0, len(frames), B):
        fb = frames[k:k + B]
        n = fb.shape[0]
        if n < B:
            fb = np.concatenate([fb, fb[-1:].repeat(B - n, 0)])
        cs, _, seed = bf_auto.track_corners_batch(jnp.asarray(fb), seed,
                                                  res=RES)
        state, labels, _, _ = sf_meta.read_batch(state, jnp.asarray(fb), cs)
        for lab in np.asarray(labels)[:n]:
            ex.advance(lab)
    rep = score_moves(ex.moves, moves)
    assert rep["agreement"] == 1.0, rep


def test_runtime_auto_tracking_end_to_end():
    """The host runtime path of config 4: VManagerSeq + BoardFinderAuto
    (detect + per-batch tracking via corners_batch) + SfMeta consuming
    per-frame corners (VERDICT r1 item 3c / NEXT r1 item 2)."""
    from camkifu_tpu.board.bf_auto import BoardFinderAuto
    from camkifu_tpu.core.capture import ArrayCapture
    from camkifu_tpu.core.controllerv import ControllerVSeq
    from camkifu_tpu.core.vmanager import VManagerSeq
    from camkifu_tpu.stone.sf_meta import SfMeta

    moves = synth.sample_moves(6, seed=9)
    fpm = cvconf.vote_window + 3
    base = synth.default_corners(HW)
    frames = []
    t = 0
    for _, lab in synth.render_game(moves, frames_per_move=fpm,
                                    frame_hw=HW, seed=9, empty_leadin=6):
        drift = np.array([10.0 * np.sin(t / 8), 8.0 * np.cos(t / 11)],
                         np.float32)
        f, _ = synth.render_frame(lab, base + drift[None, :], HW, seed=9 + t)
        frames.append(f)
        t += 1

    controller = ControllerVSeq()
    vm = VManagerSeq(controller, video=None, bf_class=BoardFinderAuto,
                     sf_class=SfMeta, batch=16)
    vm.capture = ArrayCapture(frames)
    vm.instantiate_finders()
    vm.run()
    assert vm.board_finder.corners_batch is not None
    assert vm.board_finder.corners_batch.shape == (16, 4, 2)
    detected = controller.kifu.moves()
    assert [(m.color, m.row, m.col) for m in detected] == \
        [(m.color, m.row, m.col) for m in moves]


def test_tracked_hard_palette_game():
    """Fused tracking + votes on adversarial footage (hard walnut: defocus,
    lighting gradient, shadow, stone jitter) with a drifting camera — the
    conditions where the classical reference pipeline collapses (PERF.md
    oracle table)."""
    from camkifu_tpu.stone.sf_meta import init_state, track_read_batch

    moves = synth.sample_moves(6, seed=4)
    fpm = cvconf.vote_window + 3
    base = synth.default_corners(HW)
    hard = dict(stone_jitter=0.07, light_gradient=0.3, blur_sigma=1.2,
                shadow=0.18, palette="walnut")
    frames = []
    t = 0
    for _, lab in synth.render_game(moves, frames_per_move=fpm,
                                    frame_hw=HW, seed=4, empty_leadin=6,
                                    **hard):
        drift = np.array([9.0 * np.sin(t / 6), 7.0 * np.cos(t / 8)],
                         np.float32)
        f, _ = synth.render_frame(lab, base + drift[None, :], HW,
                                  seed=4 + t, **hard)
        frames.append(f)
        t += 1
    frames = np.stack(frames)

    seed, score = bf_auto.detect_corners(jnp.asarray(frames[0]))
    assert float(score) > 0.1
    state = init_state()
    ex = MoveExtractor()
    B = 16
    for k in range(0, len(frames), B):
        fb = frames[k:k + B]
        n = fb.shape[0]
        if n < B:
            fb = np.concatenate([fb, fb[-1:].repeat(B - n, 0)])
        state, labels, _, _, _, _, seed = track_read_batch(
            state, jnp.asarray(fb), seed)
        for lab in np.asarray(labels)[:n]:
            ex.advance(lab)
    rep = score_moves(ex.moves, moves)
    assert rep["agreement"] == 1.0, rep


@pytest.mark.parametrize("gsize", [9, 13])
def test_tracking_other_board_sizes(gsize, midgame_labels):
    """The fused engine is gsize-generic (9/13/19 like everything else)."""
    labels = np.zeros((gsize, gsize), np.int8)
    rng = np.random.default_rng(2)
    idx = rng.choice(gsize * gsize, gsize, replace=False)
    labels.flat[idx[:gsize // 2]] = 1
    labels.flat[idx[gsize // 2:]] = 2
    base = synth.default_corners(HW)
    frames, gts = [], []
    for i in range(16):
        drift = np.array([8.0 * np.sin(i / 5), 6.0 * np.cos(i / 6)],
                         np.float32)
        c = base + drift[None, :]
        f, _ = synth.render_frame(labels, c, HW, seed=3)
        frames.append(f)
        gts.append(c)
    frames, gts = np.stack(frames), np.stack(gts)
    import jax

    canon, cs, sharp, _ = bf_auto.rectify_track_batch(
        jnp.asarray(frames), jnp.asarray(gts[0]), gsize=gsize)
    cell = np.linalg.norm(gts[0][1] - gts[0][0]) / (gsize - 1)
    assert np.abs(np.asarray(cs) - gts).max() < 0.15 * cell
    from camkifu_tpu.stone import sf_clustering
    lab, _ = jax.vmap(
        lambda c: sf_clustering.classify_canonical(c, gsize))(canon)
    assert (np.asarray(lab) == labels[None]).mean() > 0.999
