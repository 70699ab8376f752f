"""Post-tunnel TPU measurement battery (run ALONE — 1-core host).

Answers the round-3 open questions the moment the axon tunnel is healthy:
  1. Does the batch-grid Pallas edge kernel (ops.edges.edge_map_batch)
     lower through Mosaic on the real chip, and how fast is the batched
     detection stage 1 vs the per-frame loop?
  2. Honest full-redetect rate: detect_batch over 32x1080p frames.
  3. Single-still detect latency (c1 component).

Prints one JSON line. First contact is bounded (a hung tunnel exits with
an error instead of blocking forever). See also tools/profile_detect.py
for the stage-level breakdown and bench.py for the official artifact.
"""
import json
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from camkifu_tpu.utils import jaxcache

jaxcache.enable()
import jax
import jax.numpy as jnp


def first_contact(timeout_s: float = 120.0):
    out: list = []

    def probe():
        try:
            out.append(jax.devices())
        except Exception as exc:   # noqa: BLE001
            out.append(exc)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not out or isinstance(out[0], Exception):
        print(json.dumps({"error": f"tunnel unreachable within {timeout_s}s",
                          "detail": repr(out[0]) if out else "hang"}))
        sys.exit(1)
    return out[0]


def fence(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def timeit(fn, reps=5, tries=3):
    fence(fn())
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn()
        fence(o)
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3   # ms


def main():
    devs = first_contact()
    report = {"platform": devs[0].platform, "n_devices": len(devs)}

    from camkifu_tpu.board import bf_auto
    from camkifu_tpu.config import cvconf
    from camkifu_tpu.ops import edges
    from camkifu_tpu.utils import synth

    fence(jax.device_put(np.ones((64, 64), np.uint8)))   # tunnel warmup

    labels = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(0)
    idx = rng.choice(361, 100, replace=False)
    labels.flat[idx[:50]] = 1
    labels.flat[idx[50:]] = 2
    frame_np, _ = synth.render_frame(labels, frame_hw=(1080, 1920))
    B = 32
    batch = jax.device_put(jnp.asarray(
        np.broadcast_to(frame_np, (B,) + frame_np.shape).copy()))
    frame = jax.device_put(jnp.asarray(frame_np))

    with jax.default_matmul_precision("float32"):
        # 1. batch-grid Pallas kernel: lowering + timing at stage-1 shapes.
        res = cvconf.bf_resolution
        gray64 = jnp.ones((2 * B, res, res), jnp.float32)
        try:
            t_pal = timeit(lambda: edges.edge_map_batch(gray64))
            report["pallas_batch_edge_ms_per64"] = round(t_pal, 2)
            report["pallas_batch_edge_lowers"] = True
        except Exception as exc:   # noqa: BLE001
            report["pallas_batch_edge_lowers"] = False
            report["pallas_batch_edge_error"] = str(exc)[:200]

        # 2. full-redetect rate, batched stage 1 (falls back internally).
        t_batch = timeit(lambda: bf_auto.detect_batch(batch), reps=2)
        report["detect_batch32_ms"] = round(t_batch, 1)
        report["full_redetect_fps"] = round(B / (t_batch / 1e3), 1)
        report["batch_stage1_used"] = bool(bf_auto._BATCH_STAGE1_OK)

        # 3. single-still latency.
        t_one = timeit(lambda: bf_auto.detect_corners(frame))
        report["detect_single_ms"] = round(t_one, 2)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
