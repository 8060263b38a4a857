"""r4: bigru kernel fate sweep (VERDICT r3 next #8).

The VMEM-resident Pallas bigru scan lost its one table entry
(bigru_64x64x128 -> xla) in r3.  Before deciding keep-vs-delete, race it
against the XLA lax.scan across the (T, B, 3H) space it could plausibly
serve (CRNN's real shape, longer strips, larger hidden, larger batch) at
bf16 (the serving dtype) — if a win region exists, the dtype-keyed table
can route it; if none does, the kernel goes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/bigru_sweep_r4.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.ops.kernels import gru_scan, tune_cache  # noqa: E402

# (T, B, H): CRNN serves T=80, B=batch, H=48/64; sweep outward
SHAPES = [
    (80, 64, 48),    # CRNN-320 b64 (the shipping shape)
    (80, 128, 48),   # the b128 inversion point
    (80, 16, 48), (80, 256, 48),
    (160, 64, 48), (320, 64, 48),   # longer strips
    (80, 64, 128), (80, 64, 256),   # bigger hidden
    (400, 16, 64), (40, 64, 48),
]

rows = []
for t, b, h in SHAPES:
    if not gru_scan.supported(t, b, 3 * h, 2, "sigmoid", "tanh"):
        rows.append({"shape": f"{t}x{b}x{h}", "winner": "infeasible"})
        print(json.dumps(rows[-1]), flush=True)
        continue
    w = tune_cache.measure_bigru(t, b, 3 * h, dtype="bfloat16", verbose=True)
    rows.append({"shape": f"{t}x{b}x{h}", "winner": w})
    print(json.dumps(rows[-1]), flush=True)

with open("docs/bigru_sweep_r4.json", "w") as f:
    json.dump(rows, f, indent=1)
