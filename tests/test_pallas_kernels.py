"""Pallas kernels vs their XLA reference implementations (interpret mode on
the CPU mesh; the real-chip path is exercised by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from camkifu_tpu.ops.edges import nms_magnitude
from camkifu_tpu.ops.filters import gaussian_blur, sobel
from camkifu_tpu.ops.hough import hough_accumulate, topk_edge_points
from camkifu_tpu.ops.pallas.edge_kernel import BORDER, edge_magnitude
from camkifu_tpu.ops.pallas.hough_kernel import hough_accumulate_pallas
from camkifu_tpu.utils import synth
from camkifu_tpu.ops.color import rgb_to_gray, to_float


def test_edge_kernel_matches_xla_interior():
    frame, _ = synth.render_frame(np.zeros((19, 19), np.int8),
                                  frame_hw=(480, 854), noise=0)
    gray = rgb_to_gray(to_float(jnp.asarray(frame)))
    small = jax.image.resize(gray, (256, 256), method="bilinear")

    ours = np.asarray(edge_magnitude(small, interpret=True))
    gx, gy = sobel(gaussian_blur(small, 1.4))
    ref = np.asarray(nms_magnitude(gx, gy))

    inner = slice(BORDER + 1, 256 - BORDER - 1)
    a, b = ours[inner, inner], ref[inner, inner]
    # NMS tie-breaking at plateaus can differ by one pixel; compare where
    # both are on/off and the magnitudes where both fire.
    both = (a > 0) & (b > 0)
    assert both.sum() > 0.8 * max((a > 0).sum(), (b > 0).sum())
    assert np.allclose(a[both], b[both], atol=1e-4)
    # Border band is zeroed by contract.
    assert ours[:BORDER].sum() == 0


def test_hough_kernel_matches_xla():
    rng = np.random.default_rng(0)
    img = np.zeros((128, 128), np.float32)
    img[40, :] = 1.0
    img[:, 100] = 1.0
    img += rng.random((128, 128)) * 0.05
    pts, wts = topk_edge_points(jnp.asarray(img), k=1024)
    rho_max = float(np.hypot(128, 128))

    ref = np.asarray(hough_accumulate(pts, wts, rho_max, 64, 256))
    ours = np.asarray(hough_accumulate_pallas(pts, wts, rho_max, 64, 256,
                                              interpret=True))
    assert np.allclose(ours, ref, atol=1e-2), np.abs(ours - ref).max()


def test_hough_kernel_pads_nonmultiple_k():
    pts = jnp.asarray(np.array([[10.0, 20.0], [30.0, 7.0]], np.float32))
    wts = jnp.asarray(np.array([1.0, 2.0], np.float32))
    acc = hough_accumulate_pallas(pts, wts, 64.0, 16, 128, interpret=True)
    ref = hough_accumulate(pts, wts, 64.0, 16, 128)
    assert np.allclose(np.asarray(acc), np.asarray(ref), atol=1e-4)


def test_warp_kernel_matches_xla():
    from camkifu_tpu.ops.warp import warp_to_canonical
    from camkifu_tpu.ops.pallas.warp_kernel import warp_to_canonical_pallas

    labels = np.zeros((19, 19), np.int8)
    labels[3, 3] = 1
    labels[15, 15] = 2
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280))
    ref = np.asarray(warp_to_canonical(jnp.asarray(frame),
                                       jnp.asarray(corners)))
    ours = np.asarray(warp_to_canonical_pallas(
        jnp.asarray(frame), jnp.asarray(corners), interpret=True))
    assert np.abs(ref - ours).max() < 0.05


def test_edge_kernel_batch_matches_single_frame():
    """The batch-grid variant (one grid step per frame) must reproduce the
    single-frame kernel exactly on every frame of a varied batch."""
    from camkifu_tpu.ops.pallas.edge_kernel import edge_magnitude_batch

    labels = np.zeros((19, 19), np.int8)
    labels[3, 4] = 1
    labels[9, 9] = 2
    frames = []
    for hw, noise in (((480, 854), 0), ((360, 640), 4), ((480, 854), 7)):
        f, _ = synth.render_frame(labels, frame_hw=(480, 854), noise=noise)
        frames.append(f)
    grays = jnp.stack([
        jax.image.resize(rgb_to_gray(to_float(jnp.asarray(f))), (256, 256),
                         method="bilinear") for f in frames])

    batched = np.asarray(edge_magnitude_batch(grays, interpret=True))
    for i in range(grays.shape[0]):
        single = np.asarray(edge_magnitude(grays[i], interpret=True))
        assert np.allclose(batched[i], single, atol=1e-5), f"frame {i}"
