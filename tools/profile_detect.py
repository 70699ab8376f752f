"""Stage-level profile of bf_auto.detect_corners on the real TPU.

Times each stage standalone-jitted with tiny fenced outputs (sums — never
fetch big arrays through the tunnel). Run ALONE (1-core host: concurrent
processes starve staging).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from camkifu_tpu.utils import jaxcache
jaxcache.enable()
import jax
import jax.numpy as jnp
from camkifu_tpu.board import bf_auto
from camkifu_tpu.config import cvconf
from camkifu_tpu.utils import synth

fence = lambda x: np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]

def timeit(fn, reps=10, tries=3):
    fence(fn())
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn()
        fence(o)
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3  # ms

labels = np.zeros((19, 19), np.int8)
rng = np.random.default_rng(0)
idx = rng.choice(361, 100, replace=False)
labels.flat[idx[:50]] = 1
labels.flat[idx[50:]] = 2
frame_np, corners = synth.render_frame(labels, frame_hw=(1080, 1920))

# warm the tunnel
fence(jax.device_put(np.ones((64, 64), np.uint8)))
frame = jax.device_put(jnp.asarray(frame_np))
res = cvconf.bf_resolution
gsize = 19

prep = jax.jit(lambda f: jax.tree.map(jnp.sum, bf_auto._detect_prepare(f, res)),
               )
full = lambda: bf_auto.detect_corners(frame)

with jax.default_matmul_precision("float32"):
    t_full = timeit(full)
    t_prep = timeit(lambda: prep(frame))

    # refine substages on realistic intermediates
    gray, quad, score = jax.jit(
        lambda f: bf_auto._detect_prepare(f, res))(frame)
    gray = jax.device_put(gray); quad = jax.device_put(quad)

    rectf = jax.jit(lambda g, q: jax.tree.map(
        jnp.sum, bf_auto._rect_profiles_rect(g, q, gsize, margin=0.10)))
    t_rect = timeit(lambda: rectf(gray, quad))

    H, colp, rowp, rect = jax.jit(
        lambda g, q: bf_auto._rect_profiles_rect(g, q, gsize, margin=0.10))(
            gray, quad)
    combf = jax.jit(lambda h, c, r: jax.tree.map(
        jnp.sum, bf_auto._fit_combs_multi(h, c, r, gsize, (1.0, 0.0))))
    t_comb = timeit(lambda: combf(H, colp, rowp))

    evf = jax.jit(lambda rr: jnp.sum(bf_auto._evidence_map(rr, gsize)))
    t_ev = timeit(lambda: evf(rect))

    _, vc1, _ = jax.jit(lambda h, c, r: bf_auto._fit_combs_multi(
        h, c, r, gsize, (1.0, 0.0)))(H, colp, rowp)
    w1 = jax.device_put(np.asarray(vc1)[0])
    pinf = jax.jit(lambda g, w: jnp.sum(bf_auto._pin_corners(g, w, gsize)))
    t_pin = timeit(lambda: pinf(gray, w1))

    rankf = jax.jit(lambda vc, rr, h, q: jnp.sum(bf_auto._rank_evidence(
        vc, bf_auto._evidence_map(rr, gsize), jnp.linalg.inv(h), q,
        jnp.linalg.norm(q[1] - q[0]) / gsize, gsize)))
    t_rank = timeit(lambda: rankf(vc1, rect, H, quad))

print({
    "full_detect_ms": round(t_full, 2),
    "prepare_coarse_ms": round(t_prep, 2),
    "rect_profiles_ms": round(t_rect, 2),
    "fit_combs_ms": round(t_comb, 2),
    "evidence_map_ms": round(t_ev, 2),
    "rank_evidence_ms": round(t_rank, 2),
    "pin_corners_ms": round(t_pin, 2),
})
