"""System tests: occluded games end-to-end, and config-5 multi-stream meta."""

import numpy as np
import jax
import jax.numpy as jnp

from camkifu_tpu.core.gamesync import MoveExtractor, score_moves
from camkifu_tpu.config import cvconf
from camkifu_tpu.stone import sf_meta
from camkifu_tpu.utils import synth


def test_game_with_hand_occlusions_scores_perfectly():
    """A hand sweeps over the board between moves; agitation gating + votes
    must keep the emitted game exact (BASELINE config 3 with disturbance)."""
    import cv2

    moves = synth.sample_moves(8, seed=6)
    corners = synth.default_corners((360, 640))
    frames = []
    rng = np.random.default_rng(0)
    for state, _mv in synth.game_states(moves):
        # Hand pass: 4 frames of a skin-toned blob crossing the board.
        base, _ = synth.render_frame(state, corners, (360, 640),
                                     seed=int(rng.integers(1 << 30)))
        for k in range(4):
            f = base.copy()
            cv2.circle(f, (150 + 90 * k, 180), 100, (205, 160, 140), -1)
            frames.append(f)
        # Then the stone sits still for the vote window.
        for k in range(cvconf.vote_window + 3):
            f, _ = synth.render_frame(state, corners, (360, 640),
                                      seed=int(rng.integers(1 << 30)))
            frames.append(f)

    state = sf_meta.init_state()
    ex = MoveExtractor()
    B = 16
    for i in range(0, len(frames), B):
        chunk = frames[i:i + B]
        n = len(chunk)
        while len(chunk) < B:
            chunk.append(chunk[-1])
        state, labels, conf, agit = sf_meta.read_batch(
            state, jnp.asarray(np.stack(chunk)), jnp.asarray(corners))
        for j in range(n):
            ex.advance(np.asarray(labels[j]))
    rep = score_moves(ex.moves, moves)
    assert rep["agreement"] == 1.0, rep


def test_multistream_meta_tracks_independent_games():
    from jax.sharding import Mesh
    from camkifu_tpu.parallel.mesh import (multistream_init_states,
                                           multistream_read_meta)

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("stream",))
    corners = synth.default_corners((360, 640))

    boards, frame_stacks = [], []
    for s in range(n):
        labels = np.zeros((19, 19), np.int8)
        labels[s, s] = 1
        labels[18 - s, 18 - s] = 2
        boards.append(labels)
        frame_stacks.append(np.stack([
            synth.render_frame(labels, corners, (360, 640), seed=10 * s + i)[0]
            for i in range(10)]))

    states = multistream_init_states(n)
    states, labels_out, conf, agit = multistream_read_meta(
        mesh, states, jnp.asarray(np.stack(frame_stacks)),
        jnp.asarray(np.tile(corners, (n, 1, 1))))
    out = np.asarray(labels_out)
    assert out.shape == (n, 10, 19, 19)
    for s in range(n):
        assert np.array_equal(out[s, -1], boards[s]), f"stream {s}"
    # States advanced per stream.
    assert np.asarray(states.frame_count).tolist() == [10] * n


def test_handheld_game_end_to_end():
    """Config 4 as a full game: camera drifts every frame; per-frame corners
    go through the chunk-shared warp + subpixel correction + votes."""
    moves = synth.sample_moves(8, seed=41)
    base = synth.default_corners((360, 640))
    rng = np.random.default_rng(3)
    frames, corner_list = [], []
    t = 0
    for state, _mv in synth.game_states(moves):
        for _ in range(cvconf.vote_window + 3):
            drift = np.array([4.0 * np.sin(t / 7), 3.0 * np.cos(t / 9)],
                             np.float32)
            c = (base + drift[None, :]
                 + rng.normal(0, 0.4, (4, 2)).astype(np.float32))
            f, _ = synth.render_frame(state, corners=c, frame_hw=(360, 640),
                                      seed=t)
            frames.append(f)
            corner_list.append(c)
            t += 1

    from camkifu_tpu.core.gamesync import MoveExtractor, score_moves

    state = sf_meta.init_state()
    ex = MoveExtractor()
    B = 16
    for i in range(0, len(frames), B):
        fc = frames[i:i + B]
        cc = corner_list[i:i + B]
        n = len(fc)
        while len(fc) < B:
            fc.append(fc[-1])
            cc.append(cc[-1])
        state, labels, conf, agit = sf_meta.read_batch(
            state, jnp.asarray(np.stack(fc)), jnp.asarray(np.stack(cc)))
        for j in range(n):
            ex.advance(np.asarray(labels[j]))
    rep = score_moves(ex.moves, moves)
    assert rep["agreement"] == 1.0, rep


def test_tracked_handheld_game_with_hand_occlusions():
    """The full adversarial combination: drifting camera + a hand sweeping
    over the board, through the fused tracking engine. The flow gate must
    pass the jitter but block the hand; tracking sharpness holds through
    the occlusion instead of chasing it."""
    import cv2

    from camkifu_tpu.board import bf_auto

    moves = synth.sample_moves(6, seed=12)
    base = synth.default_corners((360, 640))
    frames = []
    rng = np.random.default_rng(3)
    t = 0

    def drifted(state, seed):
        nonlocal t
        drift = np.array([6.0 * np.sin(t / 7), 5.0 * np.cos(t / 9)],
                         np.float32)
        t += 1
        f, c = synth.render_frame(state, base + drift[None, :], (360, 640),
                                  seed=seed)
        return f

    for state, _mv in synth.game_states(moves):
        for k in range(4):                     # hand pass, camera drifting
            f = drifted(state, int(rng.integers(1 << 30)))
            cv2.circle(f, (150 + 90 * k, 180), 100, (205, 160, 140), -1)
            frames.append(f)
        for k in range(cvconf.vote_window + 3):
            frames.append(drifted(state, int(rng.integers(1 << 30))))
    for _ in range(10):
        frames.append(frames[-1])

    seed, score = bf_auto.detect_corners(jnp.asarray(frames[0]))
    assert float(score) > 0.1
    state = sf_meta.init_state()
    ex = MoveExtractor()
    B = 16
    for i in range(0, len(frames), B):
        chunk = frames[i:i + B]
        n = len(chunk)
        while len(chunk) < B:
            chunk.append(chunk[-1])
        state, labels, conf, agit, _cs, _sharp, _al, seed = \
            sf_meta.track_read_batch(state, jnp.asarray(np.stack(chunk)),
                                     seed)
        for j in range(n):
            ex.advance(np.asarray(labels[j]))
    rep = score_moves(ex.moves, moves)
    assert rep["agreement"] == 1.0, rep
