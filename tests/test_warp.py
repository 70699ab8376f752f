"""Homography + warp vs the OpenCV oracle (SURVEY §7 stage 2: tolerance ≈1e-2
px on the transform; interpolation differences bounded on the image)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from camkifu_tpu.config import cvconf
from camkifu_tpu.ops.warp import (
    apply_homography, bilinear_sample, canonical_corners, homography_dlt,
    warp_batch_fixed, warp_to_canonical,
)
from camkifu_tpu.utils import synth


def test_homography_matches_cv2_geometrically():
    src = np.array([[8, 8], [296, 8], [296, 296], [8, 296]], np.float32)
    dst = np.array([[412, 188], [1455, 203], [1560, 905], [320, 880]], np.float32)
    H_ours = np.asarray(homography_dlt(jnp.array(src), jnp.array(dst)))
    H_cv = cv2.getPerspectiveTransform(src, dst)
    # Raw matrix entries are scale/conditioning-sensitive; compare the maps:
    # push a dense grid spanning the canonical square through both.
    g = np.stack(np.meshgrid(np.linspace(0, 304, 20),
                             np.linspace(0, 304, 20)), -1).reshape(-1, 2)
    ours = np.asarray(apply_homography(jnp.asarray(H_ours, jnp.float32),
                                       jnp.asarray(g, jnp.float32)))
    g_h = np.concatenate([g, np.ones((len(g), 1))], 1)
    cv = (g_h @ H_cv.T)
    cv = cv[:, :2] / cv[:, 2:3]
    # ≤0.05 px disagreement across the board (SURVEY stage-2 tolerance 1e-2 px
    # at the corners; interior extrapolation is allowed slightly more).
    assert np.abs(ours - cv).max() < 0.05


def test_homography_maps_corners_exactly():
    src = canonical_corners()
    dst = jnp.array([[400.0, 200.0], [1500.0, 180.0],
                     [1600.0, 900.0], [300.0, 950.0]])
    H = homography_dlt(src, dst)
    mapped = apply_homography(H, src)
    assert np.allclose(np.asarray(mapped), np.asarray(dst), atol=1e-2)


def test_bilinear_sample_exact_on_grid_points():
    img = jnp.arange(25.0).reshape(5, 5, 1)
    x = jnp.array([0.0, 2.0, 4.0])
    y = jnp.array([0.0, 1.0, 4.0])
    out = bilinear_sample(img, x, y)[..., 0]
    assert np.allclose(np.asarray(out), [0.0, 7.0, 24.0])


def test_bilinear_sample_midpoint():
    img = jnp.array([[0.0, 2.0], [4.0, 6.0]])[..., None]
    out = bilinear_sample(img, jnp.array([0.5]), jnp.array([0.5]))[0, 0]
    assert np.isclose(float(out), 3.0)


def test_warp_recovers_canonical_board():
    """Render a synthetic frame with known corners, warp back, and compare to
    a directly-rendered canonical image at the same scale."""
    labels = np.zeros((19, 19), np.int8)
    labels[3, 3] = 1
    labels[15, 15] = 2
    labels[9, 9] = 1
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280), noise=0)

    warped = np.asarray(warp_to_canonical(jnp.asarray(frame),
                                          jnp.asarray(corners)))
    size = cvconf.canonical_size
    assert warped.shape == (size, size, 3)

    # Oracle: cv2 warp of the same frame to the same canonical geometry.
    dst = np.asarray(canonical_corners())
    M = cv2.getPerspectiveTransform(corners.astype(np.float32), dst)
    oracle = cv2.warpPerspective(frame, M, (size, size), flags=cv2.INTER_LINEAR)

    diff = np.abs(warped.astype(np.float32) - oracle.astype(np.float32))
    # Interpolation details differ at stone/line edges; bulk must agree.
    assert np.mean(diff) < 2.0
    assert np.percentile(diff, 99) < 30.0


def test_warp_stone_zones_have_expected_luminance():
    labels = np.zeros((19, 19), np.int8)
    labels[0, 0] = 1   # black at tl corner — hardest spot
    labels[18, 18] = 2
    frame, corners = synth.render_frame(labels, frame_hw=(1080, 1920), noise=0)
    warped = np.asarray(warp_to_canonical(jnp.asarray(frame),
                                          jnp.asarray(corners)))
    z = cvconf.zone_size
    black_patch = warped[:z, :z].mean()
    white_patch = warped[-z:, -z:].mean()
    empty_patch = warped[9 * z:10 * z, 4 * z:5 * z].mean()
    assert black_patch < 90
    assert white_patch > 180
    assert 90 < empty_patch < 200


def test_warp_batch_fixed_corners():
    labels = np.zeros((19, 19), np.int8)
    frame = synth.render_frame(labels, frame_hw=(360, 640), noise=0)[0]
    frames = np.stack([frame] * 3)
    corners = synth.default_corners((360, 640))
    out = warp_batch_fixed(jnp.asarray(frames), jnp.asarray(corners))
    assert out.shape == (3, cvconf.canonical_size, cvconf.canonical_size, 3)
    # vmap over identical frames must produce identical warps.
    assert np.array_equal(np.asarray(out[0]), np.asarray(out[2]))


def test_warp_batch_chunked_matches_exact_warp():
    """Chunk-shared warp + translation correction vs exact per-frame warp:
    drifting corners (pure translation) must agree closely; non-multiple
    batch sizes exercise the padding path."""
    from camkifu_tpu.ops.warp import warp_batch_chunked

    labels = np.zeros((19, 19), np.int8)
    labels[9, 9] = 1
    base = synth.default_corners((360, 640))
    frames, corner_list = [], []
    for i in range(11):                      # 11 % 8 != 0 → padding path
        drift = np.array([2.0 * np.sin(i), 1.5 * np.cos(i)], np.float32)
        c = base + drift[None, :]
        f, _ = synth.render_frame(labels, corners=c, frame_hw=(360, 640),
                                  noise=0, seed=3)
        frames.append(f)
        corner_list.append(c)
    fb = jnp.asarray(np.stack(frames))
    cb = jnp.asarray(np.stack(corner_list))
    out = np.asarray(warp_batch_chunked(fb, cb))
    assert out.shape[0] == 11
    for i in [0, 5, 10]:
        exact = np.asarray(warp_to_canonical(fb[i], cb[i]))
        diff = np.abs(out[i] - exact)
        # Interior agreement (borders differ by edge-padding of the shift).
        assert diff[8:-8, 8:-8].mean() < 3.0, (i, diff.mean())
