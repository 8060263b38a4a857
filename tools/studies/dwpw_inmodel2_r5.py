"""r5 follow-up: clean in-model A/B of fused dw+pw after reverting the
poisoned 786432x32x64->pallas table entry (the first A/B's "off" baseline
measured 26.8k img/s vs the shipped 44.6k because that entry routed the
112px pointwise through the conv-as-GEMM reshape, which costs relayout
copies in-model — docs/dwpw_inmodel_r5.json is tainted).

Measures off vs fuse64 (112px block only); if the fused plan is still
slower in-model, runs the per-op latency_report on the fused graph to
attribute where the time went.  Writes docs/dwpw_inmodel2_r5.json.

ROOT CAUSE (found via the optimized-HLO dump, docs/hlo/mnv1_fuse64.hlo
.txt): XLA lays this net's activations out BATCH-MINOR — e.g. the stem
output is f32[64,112,112,32]{0,3,2,1:T(8,128)} and the int8 trunk runs in
{3,0,2,1:T(8,128)(4,1)} — putting the batch=64 dim in lanes so a C=32
tensor pays 2x padding (64->128) instead of the 4x a C-minor layout
would.  Pallas custom calls require DEFAULT {3,2,1,0} operand/result
layouts, so XLA inserts a full relayout copy on each side of the call
(`%copy.4 = f32[64,112,112,32]{3,2,1,0} copy(...)` right before
`%_fused_impl.1 = ... custom-call`): ~2 x 100MB-class copies = the
measured ~2.1ms in-model overhead.  One mechanism explains the whole r5
negative chain: every standalone Pallas win at small-C shapes dies at
this boundary (dw tail demotions, the 786432x32x64 GEMM poisoning, this
kernel), and a packed-region Pallas pipeline would pay the same tax at
its entry/exit.  Beating XLA in lane-starved regions on this toolchain
requires either custom-call layout control (not exposed) or staying
inside XLA's own lowering.
"""
import os, json

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.models import mobilenet_v1
from paddle_lite_tpu.models.zoo_config import recommended_quant
from paddle_lite_tpu.tools.opt import optimize
from paddle_lite_tpu.tools.benchmark import device_throughput
from paddle_lite_tpu.ops import fused as fused_mod

B = 64
rng = np.random.default_rng(0)
feed = {"image": rng.normal(size=(B, 224, 224, 3)).astype(np.float32)}
results = {}


def build_plan(fuse, max_c=64):
    g = mobilenet_v1.build(batch=B, image_size=224, seed=0)
    fused_mod._FUSE_MAX_C = max_c
    optimize(g, quant=recommended_quant("mobilenet_v1"),
             calib_batches=[feed], fuse_dw_pw=fuse)
    return g


g_off = build_plan(False)
ips_off = device_throughput(g_off, feed)
print(f"off: {ips_off:.1f} img/s", flush=True)
results["off"] = round(ips_off, 1)

g_fuse = build_plan(True)
n_fused = sum(1 for op in g_fuse.ops if op.op_type == "fused_dw_pw")
ips_fuse = device_throughput(g_fuse, feed)
print(f"fuse64: {ips_fuse:.1f} img/s ({n_fused} fused)", flush=True)
results["fuse64"] = round(ips_fuse, 1)

if ips_fuse < ips_off:
    from paddle_lite_tpu.tools.profile import latency_report, per_type_summary
    rows = latency_report(g_fuse, feed, min_window=0.3, reps=3)
    hot = sorted(rows, key=lambda r: -r["ms"])[:10]
    for r in hot:
        print(f'{r["op"]:22s} id={r["id"]:4d} {r["ms"]*1e3:8.1f}us',
              flush=True)
    results["fused_profile_top"] = [
        {"op": r["op"], "id": r["id"], "us": round(r["ms"] * 1e3, 1)}
        for r in hot]

out = "/root/repo/docs/dwpw_inmodel2_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
