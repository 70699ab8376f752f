"""bench.py supervisor: wedge-proof first contact (VERDICT r3 item 1).

The r3 official bench recorded 0.0 fps because a single in-process 900 s
watchdog gave up on a wedged tunnel session (BENCH_r03.json).  The
supervisor must instead kill a wedged child, stagger away from the dead
client, retry with a fresh process, and forward exactly one JSON line.

These tests drive ``bench._supervise`` with stub children (no TPU, no jax
import in the child) through the CK_BENCH_CHILD_STUB hook.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

GOOD_CHILD = (
    "import json, os\n"
    "open(os.environ['CK_BENCH_CONTACT_FILE'], 'w').write('x')\n"
    "print('noise line')\n"
    "print(json.dumps({'metric': 'm', 'value': 42.0, 'unit': 'fps',"
    " 'vs_baseline': 1.4}))\n"
)

WEDGED_CHILD = (
    "import time\n"
    "time.sleep(600)\n"          # never signals contact: a wedged session
)

# Wedges on the first launch (state file counts launches), succeeds on the
# second — the diagnosed real-world shape: a fresh process after the dead
# one succeeds.
FLAKY_CHILD = (
    "import json, os, time\n"
    "p = os.environ['CK_BENCH_STATE_DIR'] + '/launches'\n"
    "n = int(open(p).read()) if os.path.exists(p) else 0\n"
    "open(p, 'w').write(str(n + 1))\n"
    "if n == 0:\n"
    "    time.sleep(600)\n"
    "open(os.environ['CK_BENCH_CONTACT_FILE'], 'w').write('x')\n"
    "print(json.dumps({'metric': 'm', 'value': 7.0, 'unit': 'fps',"
    " 'vs_baseline': 0.2}))\n"
)


_PY_STARTUP_S = None


def _py_startup_s() -> float:
    """Measured bare-interpreter startup: this environment's sitecustomize
    (axon site) costs SECONDS per process (measured 4.2 s r5, ~50 ms on a
    normal host), so a fixed 2 s first-contact timeout can never be met by
    even a healthy child. Scale the test timeouts to the machine."""
    global _PY_STARTUP_S
    if _PY_STARTUP_S is None:
        t0 = time.monotonic()
        subprocess.run([sys.executable, "-c", "pass"], timeout=60)
        _PY_STARTUP_S = time.monotonic() - t0
    return _PY_STARTUP_S


def _run(stub, tmp_path, attempts=2, contact_timeout=None, stagger=1.0):
    if contact_timeout is None:
        contact_timeout = max(2.0, 4.0 * _py_startup_s())
    env = dict(os.environ,
               CK_BENCH_CHILD_STUB=stub,
               CK_BENCH_STATE_DIR=str(tmp_path),
               CK_BENCH_ATTEMPTS=str(attempts),
               CK_BENCH_CONTACT_TIMEOUT_S=str(contact_timeout),
               CK_BENCH_STAGGER_S=str(stagger),
               CK_BENCH_CHILD_BUDGET_S="30")
    return subprocess.run([sys.executable, BENCH], env=env,
                          capture_output=True, text=True, timeout=300)


def test_healthy_child_single_json_line(tmp_path):
    r = _run(GOOD_CHILD, tmp_path)
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1          # the driver sees exactly one line
    assert json.loads(lines[0])["value"] == 42.0


def test_wedged_child_killed_staggered_retried(tmp_path):
    t0 = time.monotonic()
    r = _run(FLAKY_CHILD, tmp_path, attempts=3)
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip())
    assert out["value"] == 7.0      # the SECOND (fresh) process delivered
    # The death marker was written for the killed first child, and the
    # retry staggered past it (total runtime covers timeout + stagger).
    assert os.path.exists(os.path.join(str(tmp_path),
                                       ".last_tpu_client_death"))
    assert time.monotonic() - t0 >= 3.0
    assert "stagger" in r.stderr


def test_all_attempts_wedged_emits_honest_error(tmp_path):
    r = _run(WEDGED_CHILD, tmp_path, attempts=2)
    assert r.returncode == 1
    out = json.loads(r.stdout.strip())
    assert out["value"] == 0.0
    assert "2 staggered fresh-process attempts" in out["error"]


def test_failing_child_error_line_forwarded(tmp_path):
    stub = (
        "import json, os, sys\n"
        "open(os.environ['CK_BENCH_CONTACT_FILE'], 'w').write('x')\n"
        "print(json.dumps({'metric': 'm', 'value': 0.0, 'unit': 'fps',"
        " 'vs_baseline': 0.0, 'error': 'device init failed: boom'}))\n"
        "sys.exit(1)\n"
    )
    r = _run(stub, tmp_path, attempts=2)
    assert r.returncode == 1
    out = json.loads(r.stdout.strip())
    assert "boom" in out["error"]
