#!/bin/bash
# Bisect harness for the full-suite XLA CPU segfault — RESOLVED (r3).
#
# Outcome: two DISJOINT 22-module sets both segfaulted (rc=139), proving
# the trigger module-agnostic; watching /proc/<pid>/maps showed the
# crashing run reach 65,332 mappings (vm.max_map_count = 65,530) and die
# at the next compile. Root cause: XLA:CPU JIT executables each hold ~3
# anonymous code mappings until destroyed; a single-process full suite
# exhausts the kernel cap. Fix: tests/conftest.py clears JAX caches when
# the process crosses 30k mappings. Kept for future test-infra bisects.
#
# Usage: tools/segfault_bisect.sh <logfile> <set...>
#   where each <set> is a '+'-joined list of test-module stems, e.g.
#   "bf_auto+board_sizes+tracking". Runs them in the given order.
set -u
log="$1"; shift
cd "$(dirname "$0")/.."
for spec in "$@"; do
    files=()
    for stem in ${spec//+/ }; do files+=("tests/test_${stem}.py"); done
    echo "=== $spec" >> "$log"
    timeout 4200 python -m pytest "${files[@]}" -q -p no:cacheprovider \
        > /tmp/bisect_last.out 2>&1
    rc=$?
    tail -2 /tmp/bisect_last.out >> "$log"
    echo "--- rc=$rc $spec" >> "$log"
done
echo "DONE" >> "$log"
