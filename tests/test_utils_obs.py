"""Observability + cache utilities (SURVEY §5 tracing/metrics rows)."""

import json
import time


def test_batchstats_rolling_fps_and_jsonl_sink(tmp_path):
    from camkifu_tpu.utils.profiling import BatchStats

    sink = str(tmp_path / "stats.jsonl")
    st = BatchStats(sink_path=sink, window_s=60.0)
    t0 = time.perf_counter()
    st._events.append((t0 - 1.0, 32))          # seed a 1 s old event
    rec = st.record(32, detect_score=0.9)
    assert rec["frames"] == 32 and rec["detect_score"] == 0.9
    # fps = frames since the first event / elapsed span ≈ 32 in 1 s.
    assert 25.0 < st.fps() < 40.0
    st.record(16)
    st.close()

    lines = [json.loads(l) for l in open(sink)]
    assert len(lines) == 2
    assert lines[0]["detect_score"] == 0.9
    assert all("fps" in l and "t" in l for l in lines)


def test_batchstats_window_eviction_and_empty_fps():
    from camkifu_tpu.utils.profiling import BatchStats

    st = BatchStats(window_s=0.05)
    assert st.fps() == 0.0                      # no events: defined, zero
    st.record(8)
    time.sleep(0.08)
    st.record(8)                                # first event evicted
    assert len(st._events) == 1
    assert st.fps() == 0.0                      # single survivor: no span
    st.close()                                  # no sink: close is a no-op


def test_jaxcache_enable_points_jax_at_cache_dir(tmp_path):
    import jax

    from camkifu_tpu.utils import jaxcache

    d = str(tmp_path / "cache")
    jaxcache.enable(d)
    try:
        import os
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jaxcache.enable()                       # restore the default dir
