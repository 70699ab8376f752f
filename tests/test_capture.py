"""Capture layer: live latest-wins semantics (mock camera), file seek,
bounds cropping (SURVEY §2.1 capture wrapper / §2.4 fan-out rows)."""

import time

import numpy as np
import pytest

from camkifu_tpu.core import capture as cap_mod
from camkifu_tpu.core.capture import (ArrayCapture, FileCapture, LiveCapture,
                                      open_capture)


class FakeCamera:
    """Stands in for cv2.VideoCapture(index): yields numbered frames."""

    def __init__(self, index):
        self.index = index
        self.n = 0
        self.opened = True

    def isOpened(self):
        return self.opened

    def read(self):
        self.n += 1
        frame = np.full((32, 48, 3), self.n % 251, np.uint8)
        time.sleep(0.001)
        return True, frame

    def release(self):
        self.opened = False


def test_live_capture_latest_wins(monkeypatch):
    import cv2

    monkeypatch.setattr(cv2, "VideoCapture", FakeCamera)
    live = LiveCapture(0, ring=8)
    try:
        time.sleep(0.1)
        batch1, done = live.read_batch(4)
        assert not done and 1 <= batch1.shape[0] <= 4
        time.sleep(0.1)
        batch2, _ = live.read_batch(4)
        # Latest-wins: the second batch's newest frame is strictly newer.
        assert int(batch2[-1, 0, 0, 0]) > int(batch1[-1, 0, 0, 0])
        # Ring bound: never more than `ring` frames delivered.
        time.sleep(0.2)
        batch3, _ = live.read_batch(100)
        assert batch3.shape[0] <= 8
    finally:
        live.release()
    assert not live.cap.opened


def test_live_capture_frame_size(monkeypatch):
    """frame_size must unpack the (frame, arrival_time) ring entries
    rather than indexing the tuple as if it were the frame itself."""
    import cv2

    monkeypatch.setattr(cv2, "VideoCapture", FakeCamera)
    live = LiveCapture(0, ring=4)
    try:
        deadline = time.time() + 2.0
        while live.frame_size == (0, 0) and time.time() < deadline:
            time.sleep(0.005)
        assert live.frame_size == (32, 48)
    finally:
        live.release()


def test_live_capture_bounds_crop(monkeypatch):
    import cv2

    monkeypatch.setattr(cv2, "VideoCapture", FakeCamera)
    live = LiveCapture(0, bounds=(0.25, 0.75))
    try:
        time.sleep(0.05)
        frames, _ = live.read_batch(2)
        assert frames.shape[1] == 16     # 32 * (0.75 - 0.25)
    finally:
        live.release()


def test_open_capture_dispatch(monkeypatch, tmp_path):
    import cv2

    monkeypatch.setattr(cv2, "VideoCapture", FakeCamera)
    live = open_capture("0")
    assert isinstance(live, LiveCapture)
    live.release()
    arr = open_capture([np.zeros((8, 8, 3), np.uint8)])
    assert isinstance(arr, ArrayCapture)


def test_file_capture_seek(tmp_path):
    import cv2

    path = str(tmp_path / "seek.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for i in range(20):
        vw.write(np.full((48, 64, 3), i * 10, np.uint8))
    vw.release()

    fc = FileCapture(path)
    assert fc.frame_size == (48, 64)
    first, done = fc.read_batch(5)
    assert first.shape[0] == 5 and not done
    assert abs(fc.get_position() - 0.25) < 0.01
    fc.set_position(0.75)
    tail, done = fc.read_batch(100)
    assert done and tail.shape[0] == 5       # frames 15..19
    fc.release()


def test_device_feeder_order_and_counts():
    from camkifu_tpu.core.feeder import DeviceFeeder

    frames = [np.full((8, 8, 3), i, np.uint8) for i in range(10)]
    feeder = DeviceFeeder(ArrayCapture(frames), batch=4)
    got = []
    for dev, n, done, last_host, _arrivals in feeder:
        arr = np.asarray(dev)
        # Batches arrive padded to the static jit batch size; the tail
        # repeats the last real frame (one jit specialization — VERDICT r1).
        assert arr.shape[0] == 4
        assert (arr[n:] == arr[n - 1]).all()
        got.extend(arr[:n, 0, 0, 0].tolist())
        assert last_host[0, 0, 0] == got[-1]
    assert got == list(range(10))
    assert done


def test_device_feeder_close_midstream():
    from camkifu_tpu.core.feeder import DeviceFeeder

    frames = [np.zeros((8, 8, 3), np.uint8)] * 64
    feeder = DeviceFeeder(ArrayCapture(frames), batch=4)
    it = iter(feeder)
    next(it)
    feeder.close()     # must not deadlock


def _write_mp4(tmp_path, n=200, hw=(360, 640)):
    import cv2

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (hw[1], hw[0]))
    rng = np.random.default_rng(5)
    for i in range(n):
        frame = np.full((hw[0], hw[1], 3), i % 251, np.uint8)
        frame[:20, :20] = rng.integers(0, 255, (20, 20, 3), np.uint8)
        w.write(frame)
    w.release()
    return path


def test_parallel_file_capture_matches_sequential(tmp_path):
    """Segmented multi-worker decode must emit the byte-identical frame
    sequence (film discipline: every frame exactly once, in order)."""
    from camkifu_tpu.core.capture import FileCapture, ParallelFileCapture

    path = _write_mp4(tmp_path, n=150)
    seq = FileCapture(path)
    par = ParallelFileCapture(path, workers=4, segment=16)
    while True:
        a, da = seq.read_batch(17)          # deliberately ≠ segment size
        b, db = par.read_batch(17)
        assert a.shape == b.shape
        if a.size:
            assert (a == b).all()
        assert da == db
        if da:
            break
    seq.release()
    par.release()


def test_parallel_file_capture_seek(tmp_path):
    from camkifu_tpu.core.capture import FileCapture, ParallelFileCapture

    path = _write_mp4(tmp_path, n=120)
    par = ParallelFileCapture(path, workers=3, segment=16)
    par.read_batch(10)
    par.set_position(0.5)
    got, _ = par.read_batch(8)
    seq = FileCapture(path)
    seq.set_position(0.5)
    want, _ = seq.read_batch(8)
    assert (got == want).all()
    par.release()
    seq.release()


def test_parallel_capture_release_during_blocked_read(tmp_path):
    """release() while a reader is blocked must deliver what is buffered and
    report end-of-stream — not wait forever for a generation that never
    comes (ADVICE r2 / d5116f1 hardening)."""
    import threading

    from camkifu_tpu.core.capture import ParallelFileCapture

    path = _write_mp4(tmp_path, n=60)
    par = ParallelFileCapture(path, workers=2, segment=16)
    got = {}

    def reader():
        # Ask for more frames than the file holds: without the terminal
        # teardown branch this blocks forever once release() stops workers.
        got["out"] = par.read_batch(1000)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    time.sleep(0.3)                      # let the reader block mid-wait
    par.release()
    t.join(timeout=5.0)
    assert not t.is_alive(), "read_batch never returned after release()"
    frames, done = got["out"]
    assert done
    assert frames.shape[0] <= 60


def test_device_feeder_relays_midstream_capture_failure():
    """A capture error mid-stream must surface as an exception to the
    consumer, not masquerade as clean end-of-video (silent truncation)."""
    import pytest as _pytest

    from camkifu_tpu.core.feeder import DeviceFeeder

    class ExplodingCapture:
        def __init__(self):
            self.calls = 0

        def read_batch(self, n):
            self.calls += 1
            if self.calls == 1:
                return np.zeros((n, 8, 8, 3), np.uint8), False
            raise RuntimeError("all decode workers exited (simulated)")

    feeder = DeviceFeeder(ExplodingCapture(), batch=4)
    it = iter(feeder)
    frames, n, done, last, _arr = next(it)   # the good batch arrives intact
    assert n == 4 and not done
    with _pytest.raises(RuntimeError, match="mid-stream") as exc:
        next(it)
    assert "simulated" in str(exc.value.__cause__)
    feeder.close()


def test_vmanager_surfaces_capture_failure_to_gui():
    """The threaded manager forwards a feeder failure to the GUI status
    channel instead of dying silently."""
    from camkifu_tpu.core.controllerv import ControllerVSeq
    from camkifu_tpu.core.vmanager import VManager

    controller = ControllerVSeq()
    events = []
    controller.listeners.append(lambda ev, *a: events.append((ev, a)))
    vm = VManager(controller, video=None)

    def broken_feeder():
        yield (None, 0, False, None)
        raise RuntimeError("video capture failed mid-stream") from OSError(
            "camera unplugged")

    out = list(vm._relay_errors(broken_feeder()))
    assert len(out) == 1
    controller.process_pipe()
    assert any(ev == "error" and "camera unplugged" in str(a)
               for ev, a in events)


def test_prefetch_to_device_delivers_every_batch_to_slow_consumer():
    """The pump's shutdown path must never evict queued REAL batches to
    place its end-of-stream sentinel: with a consumer slower than the
    producer that silently truncated the video's last `depth` batches
    (measured r3: the final 3 moves of a filecheck game vanished)."""
    import time
    from camkifu_tpu.core.feeder import prefetch_to_device

    batches = [(np.full((2, 4, 4, 3), i, np.uint8), 2) for i in range(8)]
    seen = []
    for frames, n in prefetch_to_device(iter(batches), depth=2):
        time.sleep(0.02)               # consumer slower than the producer
        seen.append(int(np.asarray(frames)[0, 0, 0, 0]))
    assert seen == list(range(8))


def test_prefetch_to_device_pump_exits_on_abandoned_consumer():
    """Early consumer exit must unblock the pump thread (it used to park
    forever in q.put, pinning device buffers for the process lifetime)."""
    import threading
    import time
    from camkifu_tpu.core.feeder import prefetch_to_device

    batches = [(np.zeros((1, 4, 4, 3), np.uint8), 1) for _ in range(50)]
    gen = prefetch_to_device(iter(batches), depth=2)
    next(gen)
    gen.close()                        # abandon mid-stream
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(t.name == "prefetch-to-device" and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.05)
    assert not any(t.name == "prefetch-to-device" and t.is_alive()
                   for t in threading.enumerate())
