#!/usr/bin/env bash
# Round checklist (VERDICT r2 item 8): the default suite AND the
# slow-marked real-scale pipeline test, so a stale failure in either is
# never silent. Run from the repo root:
#
#   bash scripts/ci.sh
#
# The default suite runs on a virtual 8-device CPU mesh (tests/conftest.py);
# the slow suite runs the full-width converted-weights pipeline end-to-end.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== default suite (8-device CPU mesh) ==="
python -m pytest tests/ -q

echo "=== slow suite (real-scale converted weights, full pipeline) ==="
python -m pytest tests/ -q -m slow

echo "=== multichip dryrun (8 virtual devices) ==="
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
print('entry OK:', out.shape, out.dtype)
g.dryrun_multichip(8)
"

echo "=== ci.sh: ALL GREEN ==="
