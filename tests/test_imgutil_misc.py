"""imgutil geometry/buffer helpers + determinism + handheld (config 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from camkifu_tpu.core.imgutil import (CyclicBuffer, Segment, around,
                                      draw_metadata, order_corners)
from camkifu_tpu.utils import synth


def test_segment_intersection_and_metrics():
    a = Segment((0, 0), (10, 0))
    b = Segment((5, -5), (5, 5))
    assert a.intersection(b) == (5.0, 0.0)
    assert a.norm == 10.0
    assert abs(a.angle - 0.0) < 1e-9
    assert abs(b.angle - np.pi / 2) < 1e-9
    assert a.intersection(Segment((0, 1), (10, 1))) is None   # parallel
    assert a.distance_to((3, 4)) == 4.0


def test_around_neighborhood():
    assert set(around(0, 0, 1)) == {(0, 1), (1, 0), (1, 1)}
    assert len(list(around(9, 9, 1))) == 8
    assert (9, 9) in set(around(9, 9, 1, include_center=True))


def test_cyclic_buffer():
    buf = CyclicBuffer((2,), 3)
    for i in range(5):
        buf.append([i, i])
    assert len(buf) == 3
    assert buf.view()[:, 0].tolist() == [2, 3, 4]     # oldest first


def test_order_corners_any_permutation():
    pts = np.array([[100, 100], [10, 90], [95, 5], [12, 8]], np.float32)
    for perm in [[0, 1, 2, 3], [3, 2, 1, 0], [1, 3, 0, 2]]:
        out = order_corners(pts[perm])
        assert out[0].tolist() == [12, 8]
        assert out[1].tolist() == [95, 5]
        assert out[2].tolist() == [100, 100]
        assert out[3].tolist() == [10, 90]


def test_draw_metadata_runs():
    img = np.zeros((60, 200, 3), np.uint8)
    out = draw_metadata(img, {"fps": 12.5, "frame": 42})
    assert out.sum() > 0


def test_determinism_same_video_same_moves():
    """SURVEY §5: same video ⇒ identical SGF — a capability the reference
    cannot guarantee under thread-timing variance; our single scan pipeline
    must."""
    from camkifu_tpu.core.gamesync import MoveExtractor
    from camkifu_tpu.stone import sf_meta

    moves = synth.sample_moves(6, seed=3)
    frames = np.stack([f for f, _ in synth.render_game(
        moves, frames_per_move=9, frame_hw=(360, 640), empty_leadin=4)])
    corners = synth.default_corners((360, 640))

    results = []
    for _run in range(2):
        state = sf_meta.init_state()
        ex = MoveExtractor()
        for i in range(0, len(frames), 16):
            chunk = frames[i:i + 16]
            n = len(chunk)
            if n < 16:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:],
                                                         16 - n, 0)])
            state, labels, _, _ = sf_meta.read_batch(
                state, jnp.asarray(chunk), jnp.asarray(corners))
            for j in range(n):
                ex.advance(np.asarray(labels[j]))
        results.append([(m.color, m.row, m.col) for m in ex.moves])
    assert results[0] == results[1]
    assert len(results[0]) == len(moves)


def test_handheld_per_frame_corners_config4():
    """BASELINE config 4: per-frame corners (camera drifts); sf_meta's
    (B, 4, 2) path must track the moving board."""
    from camkifu_tpu.stone import sf_meta

    labels = np.zeros((19, 19), np.int8)
    labels[3, 3] = 1
    labels[15, 15] = 2
    base = synth.default_corners((360, 640))
    frames, corners = [], []
    rng = np.random.default_rng(0)
    for i in range(12):
        drift = np.array([3.0 * np.sin(i / 3), 2.0 * np.cos(i / 4)],
                         np.float32)
        c = base + drift[None, :] + rng.normal(0, 0.3, (4, 2)).astype(np.float32)
        f, _ = synth.render_frame(labels, corners=c, frame_hw=(360, 640),
                                  seed=i)
        frames.append(f)
        corners.append(c)
    state = sf_meta.init_state()
    state, out, conf, agit = sf_meta.read_batch(
        state, jnp.asarray(np.stack(frames)),
        jnp.asarray(np.stack(corners)))
    assert np.array_equal(np.asarray(out)[-1], labels)
