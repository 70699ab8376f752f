"""Radial lens model: algebra + agreement with the synth ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from camkifu_tpu.ops import lens as L
from camkifu_tpu.utils import synth

HW = (720, 1280)


@pytest.mark.parametrize("k1", [0.08, 0.03, -0.05, -0.12, 0.2])
def test_distort_undistort_roundtrip(k1):
    """Roundtrip over the invertible domain: the full frame for barrel;
    for pincushion, inside the fold radius sqrt(−1/(3·k1)) beyond which
    the physical model itself folds (k1 = −0.12 folds at r ≈ 1.67 — the
    frame corners at r ≈ 2 are genuinely out of model)."""
    lens = L.make_lens(k1, HW)
    rng = np.random.default_rng(3)
    pts = rng.uniform([0, 0], [1280, 720], size=(400, 2)).astype(np.float32)
    if k1 < 0:
        r_max = 0.9 * np.sqrt(-1.0 / (3.0 * k1))
        n = (pts - [lens.cx, lens.cy]) / [lens.sx, lens.sy]
        pts = pts[np.linalg.norm(n, axis=1) < r_max]
        assert len(pts) > 50
    back = L.undistort_pts(lens, L.distort_pts(lens, jnp.asarray(pts)))
    err = np.abs(np.asarray(back) - pts).max()
    assert err < 2e-3, err


def test_identity_when_k1_zero():
    lens = L.make_lens(0.0, HW)
    pts = jnp.asarray([[100.0, 200.0], [640.0, 360.0]])
    assert np.allclose(np.asarray(L.distort_pts(lens, pts)), np.asarray(pts))
    assert np.allclose(np.asarray(L.undistort_pts(lens, pts)),
                       np.asarray(pts))
    assert L.distort_pts(None, pts) is pts


def test_matches_synth_ground_truth():
    """synth.render_frame distorts its returned corners through the same
    model: distort_pts(pinhole corners) must reproduce them."""
    labels = np.zeros((19, 19), np.int8)
    base = synth.default_corners(HW)
    _, truth = synth.render_frame(labels, corners=base, frame_hw=HW,
                                  lens_k1=0.07)
    lens = L.make_lens(0.07, HW)
    got = np.asarray(L.distort_pts(lens, jnp.asarray(base)))
    assert np.abs(got - truth).max() < 1e-2


def test_scale_lens_consistent():
    """The scaled lens in resized coordinates equals resize∘distort∘unresize."""
    lens = L.make_lens(0.06, HW)
    sx, sy = 512 / 1280.0, 512 / 720.0
    small = L.scale_lens(lens, sx, sy)
    rng = np.random.default_rng(5)
    pts = rng.uniform([0, 0], [1280, 720], size=(50, 2)).astype(np.float32)
    a = np.asarray(L.distort_pts(lens, jnp.asarray(pts)))
    a_scaled = a * np.array([sx, sy], np.float32)
    pts_scaled = pts * np.array([sx, sy], np.float32)
    b = np.asarray(L.distort_pts(small, jnp.asarray(pts_scaled)))
    assert np.abs(a_scaled - b).max() < 1e-3


def test_warp_lens_recovers_canonical():
    """A distorted render warped with the correct lens must match the
    pinhole render warped plainly — interior stones land back in their
    zones (the plain warp on distorted footage smears them ~1 cell at
    k1 = 0.08)."""
    import jax.numpy as jnp
    from camkifu_tpu.ops.warp import warp_to_canonical

    rng = np.random.default_rng(11)
    labels = np.zeros((19, 19), np.int8)
    idx = rng.choice(361, 120, replace=False)
    labels.flat[idx[:60]] = 1
    labels.flat[idx[60:]] = 2
    base = synth.default_corners(HW, perspective=0.12)
    f0, c0 = synth.render_frame(labels, corners=base, frame_hw=HW, seed=4)
    f1, c1 = synth.render_frame(labels, corners=base, frame_hw=HW, seed=4,
                                lens_k1=0.08)
    lens = L.make_lens(0.08, HW)
    w0 = np.asarray(warp_to_canonical(jnp.asarray(f0, jnp.float32),
                                      jnp.asarray(c0)))
    w1 = np.asarray(warp_to_canonical(jnp.asarray(f1, jnp.float32),
                                      jnp.asarray(c1), lens=lens))
    w1_plain = np.asarray(warp_to_canonical(jnp.asarray(f1, jnp.float32),
                                            jnp.asarray(c1)))
    # Central crop (borders differ by sampling); mean abs diff in [0,255].
    s = w0.shape[0]
    cut = slice(s // 8, -s // 8)
    good = np.abs(w0[cut, cut] - w1[cut, cut]).mean()
    bad = np.abs(w0[cut, cut] - w1_plain[cut, cut]).mean()
    assert good < 6.0, good
    assert bad > 2.5 * good, (good, bad)
