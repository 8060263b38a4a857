"""r5: in-model A/B of the fused dw+pw kernel on MobileNetV1 b64 int8.

Standalone (tools/studies/dwpw_r5.py) the fused kernel wins 3.2x at the
lane-starved 112px block and loses at full-lane blocks; this study applies
the r4 lesson (standalone wins must be validated in-model) by measuring
whole-model throughput for three plans:

  off       shipped pipeline, no fusion
  fuse64    dw_pw_fuse gated to C<=64  (the 112px 32->64 block only)
  fuse128   dw_pw_fuse gated to C<=128 (112px + the 56px 128->128 block)

Also re-races the 112/56 block standalones after the r5 kernel rework
(in-VMEM halo, adaptive output block — no more HBM pad round trips).
Writes docs/dwpw_inmodel_r5.json.
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
from paddle_lite_tpu.ops.kernels import tune_cache

B = 64
rng = np.random.default_rng(0)
feed = {"image": rng.normal(size=(B, 224, 224, 3)).astype(np.float32)}
results = {}

# --- standalone re-race after the kernel rework ---------------------------
from paddle_lite_tpu.ops.kernels.dw_pw_fused import fused_dw_pw_int8

for (hw, c, oc) in [(112, 32, 64), (56, 128, 128)]:
    x = jax.device_put(rng.integers(-127, 128, (B, hw, hw, c),
                                    dtype=np.int8))
    dw_w = jnp.asarray(rng.integers(-127, 128, (3, 3, 1, c), dtype=np.int8))
    pw_w = jnp.asarray(rng.integers(-127, 128, (1, 1, c, oc), dtype=np.int8))
    dw_eff = rng.uniform(1e-4, 2e-4, (c,)).astype(np.float32)
    pw_eff = rng.uniform(1e-4, 2e-4, (oc,)).astype(np.float32)

    def one(xc, dw_w=dw_w, pw_w=pw_w, dw_eff=dw_eff, pw_eff=pw_eff):
        return fused_dw_pw_int8(
            xc, dw_w, dw_eff, None, 0.02, pw_w, 0.02 * pw_eff, None,
            dw_act="relu", pw_act="relu", pw_out_scale=0.02)

    xf = x.reshape(B * hw * hw, c)
    def one2(x2, one=one, hw=hw, c=c):
        return one(x2.reshape(B, hw, hw, c)).reshape(B * hw * hw, -1)
    t = tune_cache._time_one(one2, xf)
    key = f"standalone_{hw}x{c}->{oc}_fused_v2"
    print(f"{key}: {t*1e6:.1f}us", flush=True)
    results[key] = round(t * 1e6, 1)

# --- in-model A/B ----------------------------------------------------------
def run(plan, max_c=None, fuse=False):
    g = mobilenet_v1.build(batch=B, image_size=224, seed=0)
    if max_c is not None:
        fused_mod._FUSE_MAX_C = max_c
    quant = recommended_quant("mobilenet_v1")
    optimize(g, quant=quant, calib_batches=[feed], fuse_dw_pw=fuse)
    n_fused = sum(1 for op in g.ops if op.op_type == "fused_dw_pw")
    ips = device_throughput(g, feed)
    print(f"{plan}: {ips:.1f} img/s ({n_fused} fused blocks)", flush=True)
    results[plan] = {"items_per_sec": round(ips, 1), "fused_blocks": n_fused}

run("off", fuse=False)
run("fuse64", max_c=64, fuse=True)
run("fuse128", max_c=128, fuse=True)

out = "/root/repo/docs/dwpw_inmodel_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
