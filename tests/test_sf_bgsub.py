"""SfBgSub — temporal background-subtraction finder."""

import numpy as np
import jax.numpy as jnp

from camkifu_tpu.config import cvconf
from camkifu_tpu.core.gamesync import MoveExtractor, score_moves
from camkifu_tpu.stone import sf_bgsub
from camkifu_tpu.utils import synth

HW = (360, 640)


def test_bgsub_full_game():
    moves = synth.sample_moves(8, seed=12)
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=cvconf.vote_window + 3, frame_hw=HW,
        empty_leadin=5)]
    corners = synth.default_corners(HW)
    state = sf_bgsub.init_state()
    ex = MoveExtractor()
    for i in range(0, len(frames), 16):
        chunk = frames[i:i + 16]
        n = len(chunk)
        while len(chunk) < 16:
            chunk.append(chunk[-1])
        state, labels, conf, agit = sf_bgsub.read_batch(
            state, jnp.asarray(np.stack(chunk)), jnp.asarray(corners))
        for j in range(n):
            ex.advance(np.asarray(labels[j]))
    assert score_moves(ex.moves, moves)["agreement"] == 1.0


def test_bgsub_capture_reads_empty_after_removal():
    """After a captured stone is physically removed, the learned wood
    background makes the zone read empty again."""
    a = np.zeros((19, 19), np.int8)
    b = a.copy()
    b[9, 9] = 2
    corners = synth.default_corners(HW)
    frames = [synth.render_frame(a, corners, HW, seed=i)[0] for i in range(6)]
    frames += [synth.render_frame(b, corners, HW, seed=10 + i)[0]
               for i in range(10)]
    frames += [synth.render_frame(a, corners, HW, seed=30 + i)[0]
               for i in range(10)]
    state = sf_bgsub.init_state()
    outs = []
    for i in range(0, len(frames), 13):
        chunk = frames[i:i + 13]
        n = len(chunk)
        while len(chunk) < 13:
            chunk.append(chunk[-1])
        state, labels, conf, agit = sf_bgsub.read_batch(
            state, jnp.asarray(np.stack(chunk)), jnp.asarray(corners))
        outs.extend(np.asarray(labels)[:n])
    assert outs[14][9, 9] == 2          # stone committed
    assert outs[-1][9, 9] == 0          # removal committed
    assert outs[-1].sum() == 0


def test_bgsub_registered():
    from camkifu_tpu.config import cvconf as c

    assert any(cls.label == "bgsub" for cls in c.sfinders())
