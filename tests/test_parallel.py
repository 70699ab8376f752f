"""Multi-chip sharding on the virtual 8-device CPU mesh + driver entry points."""

import numpy as np
import jax

from camkifu_tpu.utils import synth


def test_dryrun_multichip_8_devices():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    labels, tracked = jax.jit(fn)(*args)
    assert labels.shape == (4, 19, 19)
    assert tracked.shape == (4, 19, 19)


def test_multistream_tracked_correctness():
    """Stream-sharded FUSED tracking (multistream_track_read) must equal the
    single-stream engine run per stream: same labels, corners, and re-anchor
    seeds — each stream's tracker carry is independent (VERDICT r2 item 4)."""
    from jax.sharding import Mesh
    import jax.numpy as jnp

    from camkifu_tpu.parallel.mesh import (multistream_init_states,
                                           multistream_track_read)
    from camkifu_tpu.stone import sf_meta

    n, B, hw = 4, 8, (360, 640)
    frames_s, seeds_s = [], []
    for s in range(n):
        labels = np.zeros((19, 19), np.int8)
        rng = np.random.default_rng(s)
        idx = rng.choice(361, 24 + 8 * s, replace=False)
        labels.flat[idx[::2]] = 1
        labels.flat[idx[1::2]] = 2
        base = synth.default_corners(hw)
        fr = []
        for i in range(B):
            drift = np.array([3.0 * np.sin(i / 3 + s), 2.0 * np.cos(i / 4)],
                             np.float32)
            f, _ = synth.render_frame(labels, base + drift[None, :], hw,
                                      seed=s)
            fr.append(f)
        frames_s.append(np.stack(fr))
        seeds_s.append(base)

    mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("stream",))
    states = multistream_init_states(n)
    (new_states, labels, conf, agit, corners, sharp, align,
     new_seeds) = multistream_track_read(
        mesh, states, jnp.asarray(np.stack(frames_s)),
        jnp.asarray(np.stack(seeds_s, dtype=np.float32)))
    assert np.asarray(labels).shape == (n, B, 19, 19)
    for s in range(n):
        ref = sf_meta.track_read_batch(
            sf_meta.init_state(), jnp.asarray(frames_s[s]),
            jnp.asarray(seeds_s[s], jnp.float32))
        assert np.array_equal(np.asarray(labels)[s], np.asarray(ref[1])), s
        assert np.allclose(np.asarray(corners)[s], np.asarray(ref[4]),
                           atol=1e-2), s
        assert np.allclose(np.asarray(new_seeds)[s], np.asarray(ref[7]),
                           atol=1e-2), s


def test_multistream_correctness():
    """Stream-sharded classification must equal per-stream classification."""
    from jax.sharding import Mesh
    from camkifu_tpu import pipeline
    from camkifu_tpu.parallel.mesh import multistream_read
    import jax.numpy as jnp

    n = 4
    frames, corners_list, truths = [], [], []
    for s in range(n):
        labels = np.zeros((19, 19), np.int8)
        rng = np.random.default_rng(s)
        idx = rng.choice(361, 30 + 10 * s, replace=False)
        labels.flat[idx[::2]] = 1
        labels.flat[idx[1::2]] = 2
        f, c = synth.render_frame(labels, frame_hw=(360, 640))
        frames.append(np.stack([f, f]))
        corners_list.append(c)
        truths.append(labels)

    mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("stream",))
    out, conf = multistream_read(mesh, jnp.asarray(np.stack(frames)),
                                 jnp.asarray(np.stack(corners_list)))
    out = np.asarray(out)
    assert out.shape == (n, 2, 19, 19)
    for s in range(n):
        ref, _ = pipeline.read_board_batch(
            jnp.asarray(frames[s]), jnp.asarray(corners_list[s]))
        assert np.array_equal(out[s], np.asarray(ref)), f"stream {s}"
        assert np.array_equal(out[s, 0], truths[s]), f"stream {s} truth"


def test_multistream_tracked_with_lenses():
    """Per-stream lens models through the stream-sharded fused tracker:
    each stream's distorted footage must read identically to the single-
    device engine given the same lens (different cameras → different k1)."""
    from jax.sharding import Mesh
    import jax.numpy as jnp

    from camkifu_tpu.ops.lens import make_lens, stack_lenses
    from camkifu_tpu.parallel.mesh import (multistream_init_states,
                                           multistream_track_read)
    from camkifu_tpu.stone import sf_meta

    n, B, hw = 2, 8, (360, 640)
    k1s = (0.05, -0.04)
    frames_s, seeds_s = [], []
    for s in range(n):
        labels = np.zeros((19, 19), np.int8)
        rng = np.random.default_rng(40 + s)
        idx = rng.choice(361, 30, replace=False)
        labels.flat[idx[::2]] = 1
        labels.flat[idx[1::2]] = 2
        base = synth.default_corners(hw)
        fr, seed = [], None
        for i in range(B):
            drift = np.array([2.0 * np.sin(i / 3 + s), 1.5 * np.cos(i / 4)],
                             np.float32)
            f, truth = synth.render_frame(labels, base + drift[None, :], hw,
                                          seed=s, lens_k1=k1s[s])
            fr.append(f)
            if seed is None:
                seed = truth          # raw (distorted) corners, as detected
        frames_s.append(np.stack(fr))
        seeds_s.append(seed)

    lenses = stack_lenses([make_lens(k, hw) for k in k1s])
    mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("stream",))
    states = multistream_init_states(n)
    (_, labels_all, _, _, corners, _, _, new_seeds) = multistream_track_read(
        mesh, states, jnp.asarray(np.stack(frames_s)),
        jnp.asarray(np.stack(seeds_s, dtype=np.float32)), lenses=lenses)
    for s in range(n):
        ref = sf_meta.track_read_batch(
            sf_meta.init_state(), jnp.asarray(frames_s[s]),
            jnp.asarray(seeds_s[s], jnp.float32),
            lens=make_lens(k1s[s], hw))
        assert np.array_equal(np.asarray(labels_all)[s],
                              np.asarray(ref[1])), s
        assert np.allclose(np.asarray(corners)[s], np.asarray(ref[4]),
                           atol=1e-2), s
        assert np.allclose(np.asarray(new_seeds)[s], np.asarray(ref[7]),
                           atol=1e-2), s
