#!/usr/bin/env bash
# Pre-snapshot gate: the one command to run before committing a milestone /
# ending a round (r2 VERDICT next-#8). Runs the fast tier then the
# parity_fast tier; exits non-zero on any failure.
#
# Measured warm-cache on the 1-core CI host (2026-08-19):
#   fast        ~4-6 min     parity_fast  ~7-10 min
# (First run compiles into .jax_cache and can take 2-3x that.)
#
# After the LAST model-path edit of a round, ALSO re-warm the driver
# artifacts (see PERF.md "Multichip dryrun artifact"):
#   timeout 1200 python __graft_entry__.py dryrun 8
#   BENCH_BUDGET_S=9000 timeout 9500 python bench.py
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -m "not parity and not slow" -q
python -m pytest tests/ -m parity_fast -q
echo "GATE OK"
