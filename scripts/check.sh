#!/usr/bin/env bash
# One-command release gate (role of the reference's CI workflow,
# /root/reference/.github/workflows/ci.yaml): full CPU test suite with an
# explicit final-summary check, the driver entry dry-runs, and an examples
# smoke test.  Run from the repo root:  bash scripts/check.sh  (or `make check`).
#
# Expected wall time: ~30 min warm compile cache, 60+ min cold (the at-scale
# sharding and k=20 fixture tests are the long pole; see CLAUDE.md).
#
# The explicit "passed" grep exists because the persistent XLA:CPU compile
# cache can SIGILL a pytest worker mid-run after a host migration, killing
# the run with no summary — a piped `tail` would mask the exit code.
set -u
cd "$(dirname "$0")/.."
FAIL=0
LOG=$(mktemp /tmp/svtpu_check_XXXX.log)

echo "== [1/3] full CPU test suite =="
python -m pytest tests/ -q 2>&1 | tee "$LOG"
SUITE_RC=${PIPESTATUS[0]}
if [ "$SUITE_RC" -ne 0 ]; then
  echo "CHECK FAIL: pytest exited rc=$SUITE_RC"; FAIL=1
fi
if ! grep -qE '[0-9]+ passed' "$LOG"; then
  echo "CHECK FAIL: no final 'N passed' summary (worker died mid-run?)"; FAIL=1
fi
if grep -qE '[0-9]+ (failed|error)' "$LOG"; then
  echo "CHECK FAIL: failures in suite"; FAIL=1
fi

echo "== [2/3] driver entry dry-runs (CPU, 8 virtual devices) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
python - <<'EOF' || FAIL=1
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
assert bool(out["ok"].all()), "entry() verification failed"
print("entry() ok")
g.dryrun_multichip(8)
print("dryrun_multichip(8) ok")
EOF

echo "== [3/3] examples smoke =="
JAX_PLATFORMS=cpu python examples/standard_plonk.py || FAIL=1

if [ "$FAIL" -eq 0 ]; then
  echo "CHECK OK"
else
  echo "CHECK FAILED"
fi
exit $FAIL
