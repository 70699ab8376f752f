"""Robustness: lighting gradients, heavy noise, stone placement jitter.

The classifiers work on local contrast (disc − annulus), which is the design
choice that buys lighting invariance (SURVEY §7 stage 4 knobs); these tests
pin that property down.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from camkifu_tpu import pipeline
from camkifu_tpu.board import bf_auto
from camkifu_tpu.utils import synth


def board(n=80, seed=4):
    labels = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(seed)
    idx = rng.choice(361, n, replace=False)
    labels.flat[idx[::2]] = 1
    labels.flat[idx[1::2]] = 2
    return labels


@pytest.mark.parametrize("gradient", [0.2, 0.4])
def test_classification_under_lighting_gradient(gradient):
    labels = board()
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        light_gradient=gradient)
    out, conf = pipeline.read_board_batch(jnp.asarray(frame[None]),
                                          jnp.asarray(corners))
    agreement = (np.asarray(out[0]) == labels).mean()
    assert agreement == 1.0, agreement


def test_classification_under_heavy_noise():
    labels = board()
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        noise=12.0)
    out, _ = pipeline.read_board_batch(jnp.asarray(frame[None]),
                                       jnp.asarray(corners))
    assert (np.asarray(out[0]) == labels).mean() == 1.0


def test_classification_with_stone_jitter():
    """Stones are never placed perfectly on the intersection."""
    labels = board()
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        stone_jitter=0.10)
    out, _ = pipeline.read_board_batch(jnp.asarray(frame[None]),
                                       jnp.asarray(corners))
    agreement = (np.asarray(out[0]) == labels).mean()
    assert agreement >= 0.99, agreement


def test_board_detection_under_lighting_gradient():
    labels = board(40, seed=1)
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        light_gradient=0.35)
    det, score = bf_auto.detect_corners(jnp.asarray(frame))
    assert np.abs(np.asarray(det) - corners).max() < 11.0


@pytest.mark.parametrize("blur", [1.0, 2.0])
def test_classification_under_defocus(blur):
    labels = board()
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        blur_sigma=blur)
    out, _ = pipeline.read_board_batch(jnp.asarray(frame[None]),
                                       jnp.asarray(corners))
    agreement = (np.asarray(out[0]) == labels).mean()
    assert agreement >= 0.997, agreement


def test_classification_under_soft_shadow():
    labels = board()
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        shadow=0.25)
    out, _ = pipeline.read_board_batch(jnp.asarray(frame[None]),
                                       jnp.asarray(corners))
    agreement = (np.asarray(out[0]) == labels).mean()
    assert agreement == 1.0, agreement


@pytest.mark.parametrize("wb", [0.25, -0.25])
def test_classification_under_white_balance_shift(wb):
    """A miscalibrated camera WB shifts every chroma statistic; the
    disc − annulus contrast classification must not care (measured: 100%
    at ±25% R/B gain shifts, both warm and cool)."""
    labels = board()
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        white_balance=wb)
    out, _ = pipeline.read_board_batch(jnp.asarray(frame[None]),
                                       jnp.asarray(corners))
    agreement = (np.asarray(out[0]) == labels).mean()
    assert agreement == 1.0, agreement


@pytest.mark.parametrize("wb", [0.25, -0.25])
def test_board_detection_under_white_balance_shift(wb):
    """Detection leans on an R−B chroma edge channel (walnut slab/table
    separation) — a cool WB shift weakens exactly that signal. Corner
    error must stay inside the zone margin."""
    labels = board(40, seed=1)
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        white_balance=wb)
    det, score = bf_auto.detect_corners(jnp.asarray(frame))
    assert np.abs(np.asarray(det) - corners).max() < 11.0


def test_board_detection_under_defocus_and_shadow():
    labels = board(60, seed=2)
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        blur_sigma=1.5, shadow=0.2)
    det, score = bf_auto.detect_corners(jnp.asarray(frame))
    assert np.abs(np.asarray(det) - corners).max() < 11.0


@pytest.mark.parametrize("palette", ["walnut", "bamboo"])
def test_classification_on_alternative_boards(palette):
    """Dark walnut / pale bamboo boards with different stone materials —
    contrast-based classification must not be tuned to one wood tone."""
    labels = board()
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        palette=palette)
    out, _ = pipeline.read_board_batch(jnp.asarray(frame[None]),
                                       jnp.asarray(corners))
    agreement = (np.asarray(out[0]) == labels).mean()
    assert agreement == 1.0, (palette, agreement)


@pytest.mark.parametrize("palette", ["walnut", "bamboo"])
def test_detection_on_alternative_boards(palette):
    labels = board(50, seed=8)
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        palette=palette)
    det, score = bf_auto.detect_corners(jnp.asarray(frame))
    assert np.abs(np.asarray(det) - corners).max() < 11.0, palette


@pytest.mark.parametrize("palette", ["walnut", "bamboo"])
def test_detection_score_on_hard_palettes(palette):
    """Defocus + lighting gradient on extreme wood tones must not push the
    detection confidence below the pipeline's accept threshold (0.1) — a
    correct-but-rejected detection leaves the grid unanchored and turns the
    whole game into phantom reads."""
    labels = board(0)
    frame, corners = synth.render_frame(
        labels, frame_hw=(720, 1280), seed=4, palette=palette,
        stone_jitter=0.07, light_gradient=0.3, blur_sigma=1.2, shadow=0.18)
    det, score = bf_auto.detect_corners(jnp.asarray(frame))
    assert float(score) > 0.15, palette
    assert np.abs(np.asarray(det) - corners).max() < 11.0, palette


def test_bg_indices_border_aware():
    """Border zones must sample only inward corner patches (an outward patch
    can fall past the slab onto the table under warp misalignment)."""
    from camkifu_tpu.ops.zones import bg_indices, corner_indices

    zone = 16
    idx = bg_indices(19, zone)
    base = set(corner_indices(zone).tolist())
    # Interior zone: exactly the four corner patches.
    assert set(idx[9, 9].tolist()) == base
    # Corner zone (0, 0): only the inward (bottom-right) patch — every
    # selected pixel lies in the lower-right quadrant.
    rows = idx[0, 0] // zone
    cols = idx[0, 0] % zone
    assert (rows > zone // 2).all() and (cols > zone // 2).all()
    # Top-row zone: no pixel from the top half.
    assert (idx[0, 9] // zone > zone // 2).all()
