"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): sustained 1080p frames/sec/chip for board tracking
(detect + stone classify) — measured as BASELINE config 2 (batch of stills,
board detect once + per-frame classify). The other four BASELINE configs are
reported as sub-metrics in the same line:

  c1_still_ms        single 1080p still: detect + classify (latency)
  c2_fps             batch-128 1080p: one full board detection per batch +
                     per-frame classify, detection in the timed region
                     ← headline
  c3_video_fps       720p sequential frames through the SfMeta vote scan
                     (film mode: corners fixed after initial detection)
  c4_handheld_fps    1080p handheld: full detection (first frame) + per-
                     frame corner tracking + vote scan, all timed; the
                     every-frame-full-redetect rate is reported alongside
  c5_streams_fps     8 concurrent 1080p streams batched on one chip

Method: inputs staged in HBM once, `reps` dispatches queued (pipelined, as
the real feeder runs), fenced by a host fetch; best of 3. Host→device
transfer is excluded from steady-state numbers because this environment
reaches the chip through a slow RPC tunnel (~0.5 GB/s staging, ~29 ms
dispatch floor) that no production host link resembles; staging rate is
reported alongside for transparency.

Wedge-proofing (VERDICT r3 item 1): the axon tunnel serializes client
sessions, and a TPU client that starts within seconds of a predecessor
killed mid-RPC can block in its first ``device_put`` for an unbounded time
while a *fresh* probe process succeeds (diagnosed late r3, NEXT.md item 1).
The measurement therefore runs in a DISPOSABLE CHILD PROCESS supervised by
this script: the child signals first device contact through a file; if the
signal does not arrive in time the supervisor kills the child, records the
death (so the next launch staggers ≥75 s away from it — the diagnosed wedge
trigger), and retries with a fresh process.  Only after every attempt fails
does the supervisor emit an honest error line.  Intermediate attempts never
print to stdout; the driver sees exactly one JSON line.

Utilization accounting (VERDICT r3 item 2): for each config the compiled
executable's XLA cost analysis (flops + bytes accessed) is divided by the
measured time and compared against the chip's peaks, so the line reports
not just fps but the achieved fraction of the roofline and which resource
binds each config.

vs_baseline: ratio against the reference's implied live throughput (~30 fps
single-stream CPU webcam processing — BASELINE.md; it publishes no figures).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# --------------------------------------------------------------------------
# Supervisor constants (tuned to the diagnosed wedge behavior, NEXT.md r3):
# a wedged first contact blocks indefinitely while a healthy one lands in
# seconds (warm) to ~4 min (degraded-tunnel handshake).  3 attempts × 7 min
# contact budget + 75 s stagger ≈ 23 min worst case before the error line.
# --------------------------------------------------------------------------
CONTACT_ATTEMPTS = 3
CONTACT_TIMEOUT_S = 420.0
STAGGER_S = 75.0
#: Post-contact budget: a cold persistent cache pays full remote compiles
#: (minutes each through the tunnel); give the measurement body ample room.
CHILD_BUDGET_S = 4800.0

#: Tunnel health thresholds: below/above these the numbers measure the RPC
#: tunnel, not the chip (PERF.md "whole-app tunnel-bound" note).
HEALTHY_STAGING_MBPS = 100.0
HEALTHY_DISPATCH_MS = 10.0
PROBE_BUDGET_S = 300.0

#: TPU v5e (1 TensorCore) peaks for the roofline fractions.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def _timeit(fn, fence, reps=10, tries=3):
    fence(fn())                       # compile + sync
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


# ==========================================================================
# Supervisor (default entry): disposable-child first contact with stagger
# ==========================================================================

def _touch(path: str) -> None:
    try:
        with open(path, "w") as fh:
            fh.write(f"{time.time()}\n")
    except OSError:
        pass


def _stagger_from(death_marker: str, log, stagger_s: float = STAGGER_S) -> None:
    """Wait out the wedge window after any recently-dead TPU client."""
    try:
        age = time.time() - os.path.getmtime(death_marker)
    except OSError:
        return
    wait = stagger_s - age
    if wait > 0:
        log(f"staggering {wait:.0f}s away from a TPU client that died "
            f"{age:.0f}s ago (killed-mid-RPC successors wedge)")
        time.sleep(wait)


def _last_json_line(path: str) -> str | None:
    try:
        with open(path, "rb") as fh:
            lines = fh.read().decode("utf-8", "replace").splitlines()
    except OSError:
        return None
    for line in reversed(lines):
        line = line.strip()
        if line.startswith("{"):
            try:
                json.loads(line)
                return line
            except ValueError:
                continue
    return None


def _supervise() -> int:
    import subprocess
    import tempfile

    # Staging throughput is host-CPU-bound and this host has one core: any
    # concurrent process starves device_put serialization and the run reads
    # "tunnel_degraded" even on a healthy link (measured: 883 MB/s solo vs
    # 24 MB/s with a pytest running).  Claim scheduler priority, best-effort
    # (inherited by the child).
    try:
        os.setpriority(os.PRIO_PROCESS, 0, -19)
    except (OSError, AttributeError):
        pass

    # Test hooks + operational overrides (the defaults are the contract).
    attempts = int(os.environ.get("CK_BENCH_ATTEMPTS", CONTACT_ATTEMPTS))
    contact_timeout = float(os.environ.get("CK_BENCH_CONTACT_TIMEOUT_S",
                                           CONTACT_TIMEOUT_S))
    stagger_s = float(os.environ.get("CK_BENCH_STAGGER_S", STAGGER_S))
    child_budget = float(os.environ.get("CK_BENCH_CHILD_BUDGET_S",
                                        CHILD_BUDGET_S))
    stub = os.environ.get("CK_BENCH_CHILD_STUB")        # test hook: -c body
    child_cmd = ([sys.executable, "-c", stub] if stub else
                 [sys.executable, os.path.abspath(__file__)])

    from camkifu_tpu.utils import jaxcache   # path constants only, no jax
    state_dir = os.environ.get("CK_BENCH_STATE_DIR", jaxcache.DEFAULT_DIR)
    os.makedirs(state_dir, exist_ok=True)
    death_marker = os.path.join(state_dir, ".last_tpu_client_death")

    def log(msg: str) -> None:
        print(f"[bench supervisor] {msg}", file=sys.stderr, flush=True)

    last_line = None
    last_err = None
    for attempt in range(1, attempts + 1):
        _stagger_from(death_marker, log, stagger_s)
        with tempfile.TemporaryDirectory() as td:
            contact = os.path.join(td, "contact")
            out_path = os.path.join(td, "stdout")
            env = dict(os.environ,
                       CK_BENCH_CHILD="1",
                       CK_BENCH_CONTACT_FILE=contact)
            log(f"attempt {attempt}/{attempts}: launching measurement child")
            with open(out_path, "wb") as out_f:
                proc = subprocess.Popen(
                    child_cmd, env=env, stdout=out_f, stderr=sys.stderr)
                deadline = time.monotonic() + contact_timeout
                wedged = False
                while proc.poll() is None and not os.path.exists(contact):
                    if time.monotonic() >= deadline:
                        wedged = True
                        break
                    time.sleep(min(2.0, contact_timeout / 10))
                if wedged:
                    proc.kill()
                    proc.wait()
                    _touch(death_marker)
                    last_err = (f"no first contact within "
                                f"{contact_timeout:.0f}s (attempt "
                                f"{attempt})")
                    log(last_err + "; killed child, will stagger + retry")
                    continue
                try:
                    rc = proc.wait(child_budget)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
                    _touch(death_marker)
                    last_err = (f"child hung post-contact past "
                                f"{child_budget:.0f}s (attempt {attempt})")
                    log(last_err)
                    continue
            line = _last_json_line(out_path)
            if rc == 0 and line:
                print(line, flush=True)
                return 0
            # The child died on its own: its session closed unclean, so the
            # next launch must stagger too.
            _touch(death_marker)
            last_line = line or last_line
            last_err = f"child exited rc={rc} (attempt {attempt})"
            log(last_err)
    if last_line:          # a child got far enough to report something
        print(last_line, flush=True)
    else:
        print(json.dumps({
            "metric": "1080p_frames_per_sec_per_chip_detect_classify",
            "value": 0.0,
            "unit": "fps",
            "vs_baseline": 0.0,
            "error": f"tpu unreachable after {attempts} staggered "
                     f"fresh-process attempts: {last_err}",
        }), flush=True)
    return 1


# ==========================================================================
# Measurement child
# ==========================================================================

def _probe_tunnel(jax, jnp, np, fence):
    """One tunnel-health probe → (dispatch_ms, staging_MBps).

    The FIRST transfer of a session pays a 1–4 min handshake on a degraded
    tunnel; callers must warm up (one small device_put) before trusting a
    probe.
    """
    tiny = jax.jit(lambda x: x + 1)
    td = jax.device_put(jnp.ones((8, 128)))
    fence(tiny(td))
    t0 = time.perf_counter()
    o = None
    for _ in range(10):
        o = tiny(td)
    fence(o)
    dispatch_ms = (time.perf_counter() - t0) / 10 * 1e3

    buf = np.ones((16, 1024, 1024), np.uint8)         # 16 MB staging probe
    t0 = time.perf_counter()
    fence(jax.device_put(buf))
    staging_mbps = buf.nbytes / 1e6 / (time.perf_counter() - t0)
    return dispatch_ms, staging_mbps


def _first_contact(jax, np, fence):
    """First touch of the device; signals the supervisor on success.

    The supervisor watchdogs this from outside (a wedged contact blocks
    indefinitely and only a process kill clears it), so the child simply
    blocks here.  On success it touches CK_BENCH_CONTACT_FILE, which stops
    the supervisor's contact clock.
    """
    fence(jax.device_put(np.ones((1024, 1024), np.uint8)))
    marker = os.environ.get("CK_BENCH_CONTACT_FILE")
    if marker:
        _touch(marker)


def _wait_for_healthy_tunnel(jax, jnp, np, fence):
    """Re-probe (bounded by PROBE_BUDGET_S) until the tunnel looks healthy;
    returns (dispatch_ms, staging_MBps, degraded) of the best attempt seen.

    The chip is reached through an RPC tunnel whose throughput varies wildly
    between sessions; benchmarking through a degraded tunnel measures the
    tunnel (BENCH_r01: c3/c4 at 8.7 MB/s staging). Gate, don't hope.
    """
    # First-transfer handshake was absorbed by _first_contact.
    deadline = time.perf_counter() + PROBE_BUDGET_S
    best = (float("inf"), 0.0)
    while True:
        d, s = _probe_tunnel(jax, jnp, np, fence)
        if s > best[1] or (s == best[1] and d < best[0]):
            best = (d, s)
        if d <= HEALTHY_DISPATCH_MS and s >= HEALTHY_STAGING_MBPS:
            return d, s, False
        if time.perf_counter() >= deadline:
            return best[0], best[1], True
        time.sleep(15.0)


def _cost(jitfn, *args, **kwargs):
    """(flops, bytes accessed) of one dispatch of an already-used jit.

    Lowering with the same signature as the timed call hits the jit cache —
    no extra compile.  Returns None where the backend exposes no analysis.
    """
    try:
        ca = jitfn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):       # older jax: one per device
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed",
                                                         0.0))
    except Exception:
        return None


def _utilization(costs, seconds):
    """Roofline fractions for one config from per-dispatch XLA costs.

    costs: list of (flops, bytes) per dispatch in the timed unit (or None).
    """
    if not costs or any(c is None for c in costs):
        return None
    flops = sum(c[0] for c in costs)
    byts = sum(c[1] for c in costs)
    fl_frac = flops / seconds / PEAK_BF16_FLOPS
    hbm_frac = byts / seconds / PEAK_HBM_BPS
    return {
        "gflops_per_s": round(flops / seconds / 1e9, 1),
        "hbm_GBps": round(byts / seconds / 1e9, 1),
        "mxu_frac": round(fl_frac, 4),
        "hbm_frac": round(hbm_frac, 4),
        "bound": "hbm" if hbm_frac >= fl_frac else "flops",
        "roofline_frac": round(max(fl_frac, hbm_frac), 4),
    }


def _bench_main() -> None:
    try:
        os.setpriority(os.PRIO_PROCESS, 0, -19)
    except (OSError, AttributeError):
        pass

    from camkifu_tpu.utils import jaxcache
    jaxcache.enable()

    import jax
    import jax.numpy as jnp

    from camkifu_tpu import pipeline
    from camkifu_tpu.board import bf_auto
    from camkifu_tpu.stone import sf_meta
    from camkifu_tpu.utils import synth

    fence = lambda x: np.asarray(jax.tree.leaves(x)[0])

    # First touch of the device (wedge-watchdogged by the supervisor), then
    # the health gate: wait (bounded) for a healthy tunnel before
    # measuring; emit the probe numbers + a degraded flag either way.
    _first_contact(jax, np, fence)
    dispatch_ms, staging_probe_mbps, degraded = _wait_for_healthy_tunnel(
        jax, jnp, np, fence)

    labels = np.zeros((19, 19), np.int8)
    rng = np.random.default_rng(0)
    idx = rng.choice(361, 100, replace=False)
    labels.flat[idx[:50]] = 1
    labels.flat[idx[50:]] = 2

    frame1080, corners1080 = synth.render_frame(labels, frame_hw=(1080, 1920))
    frame720, corners720 = synth.render_frame(labels, frame_hw=(720, 1280))

    t0 = time.perf_counter()
    batch = 128
    f1080_b = jax.device_put(jnp.broadcast_to(jnp.asarray(frame1080),
                                              (batch,) + frame1080.shape))
    fence(f1080_b)
    stage_s = time.perf_counter() - t0
    c1080 = jax.device_put(jnp.asarray(corners1080, jnp.float32))

    # Batch 256 for the c2 headline, adopted only once its compile is in
    # the persistent cache (NEXT r1 item 3: +8% measured, ~5 min cold
    # compile through the remote-compile tunnel — never pay it inside a
    # timed run). The marker is written after this run precompiles the
    # 256 variant in its epilogue, so run N+1 measures at 256.
    b256_marker = os.path.join(jaxcache.DEFAULT_DIR, ".c2_b256_warm")
    c2_batch = 256 if os.path.exists(b256_marker) else batch

    # -- c2 (headline): batch stills, detect + classify. Detection runs
    # INSIDE the timed region (VERDICT r1: the metric name says "detect") at
    # the fixed-camera cadence: one full board detection per batch, stone
    # classification on every frame.
    if c2_batch != batch:
        f1080_c2 = jax.device_put(jnp.broadcast_to(
            jnp.asarray(frame1080), (c2_batch,) + frame1080.shape))
        fence(f1080_c2)
    else:
        f1080_c2 = f1080_b

    def c2():
        cs, _ = bf_auto.detect_corners(f1080_c2[0])
        return pipeline.read_board_batch(f1080_c2, cs)[0]
    c2_s = _timeit(c2, fence)
    c2_fps = c2_batch / c2_s
    cs_probe, _ = bf_auto.detect_corners(f1080_c2[0])
    c2_util = _utilization(
        [_cost(bf_auto.detect_corners, f1080_c2[0]),
         _cost(pipeline.read_board_batch, f1080_c2, cs_probe)], c2_s)

    # -- c1: single-still latency (detect + classify, one frame) ------------
    f1 = f1080_b[:1]
    def c1():
        cs, _ = bf_auto.detect_corners(f1[0])
        return pipeline.read_board_batch(f1, cs)[0]
    c1_ms = _timeit(c1, fence, reps=3) * 1e3

    # -- c3: recorded 720p video through the SfMeta scan --------------------
    f720_b = jax.device_put(jnp.broadcast_to(jnp.asarray(frame720),
                                             (batch,) + frame720.shape))
    c720 = jax.device_put(jnp.asarray(corners720, jnp.float32))
    state0 = sf_meta.init_state()
    c3_s = _timeit(lambda: sf_meta.read_batch(state0, f720_b, c720)[1],
                   fence)
    c3_fps = batch / c3_s
    c3_util = _utilization([_cost(sf_meta.read_batch, state0, f720_b, c720)],
                           c3_s)

    # -- c4: handheld — REAL per-frame board measurement in the timed
    # region (VERDICT r1 item 3): full detection on the batch's first frame
    # + per-frame corner tracking (every frame's corners measured from its
    # own pixels) + the vote scan on the tracked (B, 4, 2) corners. The
    # amortized full-redetect rate is reported alongside.
    def c4():
        seed, _ = bf_auto.detect_corners(f1080_b[0])
        return sf_meta.track_read_batch(state0, f1080_b, seed)[1]
    c4_s = _timeit(c4, fence)
    c4_fps = batch / c4_s
    seed_probe, _ = bf_auto.detect_corners(f1080_b[0])
    c4_util = _utilization(
        [_cost(bf_auto.detect_corners, f1080_b[0]),
         _cost(sf_meta.track_read_batch, state0, f1080_b, seed_probe)], c4_s)
    # Honest full-redetection rate: every frame fully re-detected through
    # the batch API (batched stage 1 incl. the batch-grid Pallas edge
    # kernel + host-mapped per-frame refine; see detect_batch's docstring,
    # VERDICT r2 item 7).
    # Batch 64 (was 32, was 8): every frame is still fully redetected, but
    # the per-batch fixed cost amortizes over more frames — the same
    # pipeline-batch reasoning as the classify configs (c2 runs at 128+).
    # Measured r5: the fixed cost is ~32 ms/batch (tunnel dispatch floor +
    # router sync) against ~2.8 ms/frame marginal, so B=32 left ~1 ms/frame
    # on the table.
    redet_n = 64
    det_s = _timeit(lambda: bf_auto.detect_batch(f1080_b[:redet_n])[0],
                    fence, reps=3)
    c4_full_redetect_fps = redet_n / det_s

    # -- c5: 8 concurrent 1080p streams on one chip (the multi-stream
    # flattening of parallel.mesh._read_all_streams) ------------------------
    from camkifu_tpu.parallel.mesh import _read_all_streams

    streams, per = 8, 16
    f_multi = jax.device_put(jnp.broadcast_to(
        jnp.asarray(frame1080), (streams, per) + frame1080.shape))
    c_multi = jax.device_put(jnp.broadcast_to(c1080, (streams, 4, 2)))
    c5_s = _timeit(
        lambda: _read_all_streams(f_multi, c_multi, 19, 16)[0], fence)
    c5_fps = streams * per / c5_s
    c5_util = _utilization([_cost(_read_all_streams, f_multi, c_multi,
                                  19, 16)], c5_s)

    # Sanity: the pipeline must still read the board correctly.
    out, _ = pipeline.read_board_batch(f1080_b[:1], c1080)
    ok = bool(np.array_equal(np.asarray(out[0]), labels))

    # Pallas edge kernel vs the XLA reference ON THE TPU (tests run on a
    # CPU mesh and can only check interpret mode — VERDICT r1 weak #8):
    # the production kernel's compiled output must match XLA's.
    from camkifu_tpu.ops.edges import edge_map
    g = jnp.asarray(frame1080[:512, :512], jnp.float32).mean(-1) / 255.0
    with jax.default_matmul_precision("float32"):   # as production runs it
        mp = np.asarray(edge_map(g, backend="pallas"))
        mx = np.asarray(edge_map(g, backend="xla"))
    # Interior support agreement (the kernel zeroes an 8 px border by
    # contract); magnitudes may differ in float detail, the detector
    # consumes the support + relative strength.
    it = slice(16, -16)
    agree = ((mp[it, it] > 0) == (mx[it, it] > 0)).mean()
    pallas_parity = bool(agree > 0.995)

    # Epilogue (outside every timed region): precompile the 256-batch c2
    # kernel into the persistent cache and leave the marker so the next
    # run measures at 256. Skipped if this run already did.
    b256_error = None
    if c2_batch == batch:
        try:
            f256 = jax.device_put(jnp.broadcast_to(
                jnp.asarray(frame1080), (256,) + frame1080.shape))
            cs256, _ = bf_auto.detect_corners(f256[0])
            fence(pipeline.read_board_batch(f256, cs256)[0])
            with open(b256_marker, "w") as fh:
                fh.write("ok\n")
        except Exception as e:         # cold-compile budget exceeded: stay
            b256_error = f"{type(e).__name__}: {e}"[:200]  # 128, but say why

    util = {k: v for k, v in [("c2", c2_util), ("c3", c3_util),
                              ("c4", c4_util), ("c5", c5_util)] if v}
    print(json.dumps({
        "metric": "1080p_frames_per_sec_per_chip_detect_classify",
        "value": round(c2_fps, 1),
        "unit": "fps",
        "vs_baseline": round(c2_fps / 30.0, 2),
        "c2_batch": c2_batch,
        "accuracy_sanity": ok,
        "pallas_parity_on_tpu": pallas_parity,
        "c1_still_ms": round(c1_ms, 2),
        "c2_fps": round(c2_fps, 1),
        "c3_video_fps": round(c3_fps, 1),
        "c4_handheld_fps": round(c4_fps, 1),
        "c4_full_redetect_fps": round(c4_full_redetect_fps, 1),
        "c5_streams_fps": round(c5_fps, 1),
        "staging_MBps": round(batch * frame1080.nbytes / 1e6 / stage_s, 1),
        "staging_probe_MBps": round(staging_probe_mbps, 1),
        "tunnel_dispatch_ms": round(dispatch_ms, 2),
        "tunnel_degraded": degraded,
        "device": str(jax.devices()[0]),
        **({"utilization": util} if util else {}),
        **({"b256_precompile_error": b256_error} if b256_error else {}),
    }))


def main() -> None:
    if os.environ.get("CK_BENCH_CHILD") == "1":
        _bench_main()
    else:
        sys.exit(_supervise())


if __name__ == "__main__":
    main()
