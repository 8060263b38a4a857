#!/usr/bin/env bash
# CI entry — the ``lite/tools/ci_build.sh`` analog.
#
# Tiers (SURVEY §4): unit+kernel+integration tests on CPU (8 virtual
# devices, Pallas interpret mode), native-library build check, entry-point
# compile check, and — when a TPU is attached and --bench is passed — the
# headline benchmark.
set -euo pipefail
cd "$(dirname "$0")"

echo "== native libraries build =="
python - <<'EOF'
from paddle_lite_tpu.native.build import build_library
for lib in ("nbf", "cv"):
    print(" ", lib, "->", build_library(lib))
EOF

echo "== test suite (CPU, 8 virtual devices) =="
python -m pytest tests/ -q

echo "== driver entry compile check (CPU) =="
JAX_PLATFORMS=cpu python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import __graft_entry__ as ge
fn, args = ge.entry()
jax.block_until_ready(jax.jit(fn)(*args))
ge.dryrun_multichip(8)
print("  entry + dryrun_multichip(8) OK")
EOF

if [[ "${1:-}" == "--bench" ]]; then
    echo "== headline benchmark (TPU) =="
    python bench.py | tee /tmp/bench_out.json
    # the default kernel plan must be within 5% of the best variant —
    # an autotune-table entry that regresses the product path fails CI
    python - <<'EOF'
import json
line = [l for l in open("/tmp/bench_out.json") if l.strip().startswith("{")][-1]
detail = json.loads(line)["detail"]
assert detail["default_plan_ok"], (
    f"default kernel plan regresses the flagship: {detail['int8_variants']}")
print("  default-plan guard OK")
EOF
fi
echo "CI OK"
