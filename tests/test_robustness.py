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


def test_board_detection_under_defocus_and_shadow():
    labels = board(60, seed=2)
    frame, corners = synth.render_frame(labels, frame_hw=(720, 1280),
                                        blur_sigma=1.5, shadow=0.2)
    det, score = bf_auto.detect_corners(jnp.asarray(frame))
    assert np.abs(np.asarray(det) - corners).max() < 11.0
