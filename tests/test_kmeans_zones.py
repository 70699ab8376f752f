"""k-means vs cv2.kmeans oracle + zone feature classification sanity."""

import cv2
import numpy as np
import jax.numpy as jnp

from camkifu_tpu.config import cvconf
from camkifu_tpu.ops.kmeans import kmeans, luminance_ordered_labels
from camkifu_tpu.ops.warp import warp_to_canonical
from camkifu_tpu.ops.zones import disc_mask, extract_zones, zone_features
from camkifu_tpu.utils import synth


def three_blob_data(n=120, seed=3):
    rng = np.random.default_rng(seed)
    centers = np.array([[0.1, 0.1, 0.1], [0.6, 0.5, 0.4], [0.9, 0.9, 0.9]])
    pts = np.concatenate([
        rng.normal(c, 0.03, (n // 3, 3)) for c in centers]).astype(np.float32)
    return pts, centers


def test_kmeans_matches_cv2_partition():
    pts, _ = three_blob_data()
    cents, labels, compactness = kmeans(jnp.asarray(pts), k=3, iters=12)
    crit = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 50, 1e-4)
    cv_comp, cv_labels, cv_cents = cv2.kmeans(
        pts, 3, None, crit, 5, cv2.KMEANS_PP_CENTERS)
    # Same partition up to label permutation: compare sorted centroids.
    ours = np.sort(np.asarray(cents), axis=0)
    theirs = np.sort(cv_cents, axis=0)
    assert np.allclose(ours, theirs, atol=0.02)
    assert float(compactness) < cv_comp * 1.05 + 1e-3


def test_kmeans_weights_exclude_samples():
    pts, _ = three_blob_data()
    w = np.ones(len(pts), np.float32)
    w[:40] = 0.0  # exclude the dark blob
    cents, _, _ = kmeans(jnp.asarray(pts), k=2, iters=12,
                         weights=jnp.asarray(w))
    # Both centroids should sit in the two bright blobs.
    assert np.all(np.asarray(cents)[:, 0] > 0.3)


def test_luminance_ordered_labels():
    cents = jnp.array([[0.9, 0.9, 0.9], [0.1, 0.1, 0.1], [0.5, 0.5, 0.5]])
    labels = jnp.array([0, 1, 2, 0], jnp.int32)
    lw = jnp.array([0.299, 0.587, 0.114])
    out = np.asarray(luminance_ordered_labels(cents, labels, lw))
    # cluster1 darkest → 0; cluster2 middle → 1; cluster0 brightest → 2
    assert out.tolist() == [2, 0, 1, 2]


def test_extract_zones_is_exact_reshape():
    size = cvconf.canonical_size
    img = np.arange(size * size * 3, dtype=np.float32).reshape(size, size, 3)
    zones = np.asarray(extract_zones(jnp.asarray(img)))
    z = cvconf.zone_size
    assert zones.shape == (19, 19, z, z, 3)
    assert np.array_equal(zones[2, 5], img[2 * z:3 * z, 5 * z:6 * z])


def test_disc_mask_geometry():
    m = np.asarray(disc_mask(16))
    assert m[8, 8] == 1.0 and m[0, 0] == 0.0
    assert 0.3 < m.mean() < 0.8


def test_zone_features_classify_synthetic_board():
    """End-to-end stage-2 sanity: synth frame → warp → features → the three
    populations separate on luminance."""
    labels = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(1)
    stones = rng.choice(361, 80, replace=False)
    labels.flat[stones[:40]] = 1
    labels.flat[stones[40:]] = 2
    frame, corners = synth.render_frame(labels, frame_hw=(1080, 1920))
    canon = warp_to_canonical(jnp.asarray(frame), jnp.asarray(corners))
    feats = np.asarray(zone_features(canon))
    luma = feats[..., :3] @ np.array([0.299, 0.587, 0.114])
    assert luma[labels == 1].max() < luma[labels == 0].min()
    assert luma[labels == 2].min() > luma[labels == 0].max()
