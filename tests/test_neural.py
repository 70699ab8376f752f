"""Neural stone classifier: training, sharded training, checkpointing,
finder-host classification (SURVEY §2.1 sf_neural)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from camkifu_tpu.models import neural
from camkifu_tpu.parallel import train as ptrain


@pytest.fixture(scope="module")
def dataset():
    return neural.harvest_patches(n_boards=6, frame_hw=(480, 854), seed=3)


def test_harvest_shapes_and_balance(dataset):
    patches, labels = dataset
    assert patches.shape[1:] == (16, 16, 3)
    assert len(patches) == len(labels) == 6 * 361
    assert set(np.unique(labels)) == {0, 1, 2}


def test_train_reaches_high_accuracy(dataset):
    patches, labels = dataset
    model, params, acc = neural.train(patches, labels, epochs=4, batch=512)
    assert acc > 0.97


def test_sharded_training_runs_and_learns(dataset):
    patches, labels = dataset
    mesh = ptrain.make_mesh(jax.devices()[:4], model_parallel=2)
    assert mesh.shape == {"data": 2, "model": 2}
    params, acc = ptrain.train_sharded(patches, labels, mesh=mesh,
                                       epochs=3, batch=512)
    assert acc > 0.95
    # Dense kernels really are sharded over the 'model' axis.
    dense0 = params["params"]["Dense_0"]["kernel"]
    assert "model" in str(dense0.sharding.spec)


def test_checkpoint_roundtrip(dataset, tmp_path):
    patches, labels = dataset
    model, params, _ = neural.train(patches, labels, epochs=1, batch=512)
    path = str(tmp_path / "ckpt")
    neural.save_params(params, path)
    restored = neural.load_params(path)
    assert restored is not None
    chex = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(params), restored)
    assert all(jax.tree.leaves(chex))


def test_classify_batch_neural_end_to_end(dataset):
    from camkifu_tpu.stone.sf_neural import classify_batch_neural
    from camkifu_tpu.utils import synth

    patches, labels_flat = dataset
    _, params, acc = neural.train(patches, labels_flat, epochs=4, batch=512)

    board = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(9)
    idx = rng.choice(361, 70, replace=False)
    board.flat[idx[::2]] = 1
    board.flat[idx[1::2]] = 2
    frame, corners = synth.render_frame(board, frame_hw=(480, 854), seed=31)
    out, conf = classify_batch_neural(params, jnp.asarray(frame[None]),
                                      jnp.asarray(corners))
    agreement = (np.asarray(out[0]) == board).mean()
    assert agreement > 0.97, agreement


def test_meta_with_neural_voter(dataset, tmp_path):
    """SfMeta with a trained neural checkpoint as third voter still reads a
    game exactly (the voter competes by confidence, gated by training)."""
    import jax as _jax
    from camkifu_tpu.core.gamesync import MoveExtractor, score_moves
    from camkifu_tpu.stone import sf_meta
    from camkifu_tpu.utils import synth

    patches, labels_flat = dataset
    _, params, acc = neural.train(patches, labels_flat, epochs=4, batch=512)
    assert acc > 0.97

    moves = synth.sample_moves(6, seed=15)
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=9, frame_hw=(480, 854), empty_leadin=4)]
    corners = synth.default_corners((480, 854))
    state = sf_meta.init_state()
    ex = MoveExtractor()
    for i in range(0, len(frames), 16):
        chunk = frames[i:i + 16]
        n = len(chunk)
        while len(chunk) < 16:
            chunk.append(chunk[-1])
        state, labels, conf, agit = sf_meta.read_batch(
            state, jnp.asarray(np.stack(chunk)), jnp.asarray(corners),
            neural_params=params)
        for j in range(n):
            ex.advance(np.asarray(labels[j]))
    assert score_moves(ex.moves, moves)["agreement"] == 1.0
