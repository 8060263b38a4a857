"""r5 study: fused dw+pw Pallas kernel vs separate XLA ops, per MNv1 block.

Motivation (the r5 north-star headroom, VERDICT r4 Weak #2): the MNv1 112px
32->64 pointwise runs at 534us because its (M,32)-in/(M,64)-out activations
are PHYSICALLY stored padded to 128 lanes — the int8 (32,128) tiled layout
streams 4x/2x the logical bytes (proven by tools/studies/mnv1_pw_r5.py:
op-level row packing loses to the relayout it needs).  The only way to
shed those bytes is to never materialize the intermediate: the fused
dw+pw kernel (ops/kernels/dw_pw_fused.py) keeps the dw output in VMEM, so
each eligible block pays ONE padded read + ONE padded write instead of two
of each.  r5 also switched its stencil from int32 MACs to f32 FMAs (the
VPU has no int8 MAC; exact below 2^24).

Races, per eligible s1-dw MNv1 block at b64: the in-model-shaped XLA
separate chain (int8 dw conv -> requant -> int8 1x1 conv -> requant) vs
the fused Pallas kernel.  Writes docs/dwpw_r5.json.
"""
import os, json, functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.ops.kernels.dw_pw_fused import fused_dw_pw_int8
from paddle_lite_tpu.ops.kernels import tune_cache

BLOCKS = [  # (spatial, c_in, c_out) for every s1-dw block of MNv1 at b64
    (112, 32, 64),
    (56, 128, 128),
    (28, 256, 256),
    (14, 512, 512),
    (7, 1024, 1024),
]
B = 64
rng = np.random.default_rng(0)
results = {}

for (hw, c, oc) in BLOCKS:
    x = jax.device_put(
        rng.integers(-127, 128, (B, hw, hw, c), dtype=np.int8))
    dw_w = rng.integers(-127, 128, (3, 3, 1, c), dtype=np.int8)
    pw_w = rng.integers(-127, 128, (1, 1, c, oc), dtype=np.int8)
    dw_eff = rng.uniform(1e-4, 2e-4, (c,)).astype(np.float32)
    dw_bias = rng.normal(size=(c,)).astype(np.float32) * 0.1
    pw_eff = rng.uniform(1e-4, 2e-4, (oc,)).astype(np.float32)
    pw_bias = rng.normal(size=(oc,)).astype(np.float32) * 0.1
    dw_out_scale, out_scale = 0.02, 0.02
    dw_w_j = jnp.asarray(dw_w)
    pw_w_j = jnp.asarray(pw_w)

    def one_xla(xc, c=c, dw_w_j=dw_w_j, pw_w_j=pw_w_j, dw_eff=dw_eff,
                dw_bias=dw_bias, pw_eff=pw_eff, pw_bias=pw_bias):
        acc = jax.lax.conv_general_dilated(
            xc, dw_w_j, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * dw_eff + dw_bias
        y = jnp.maximum(y, 0)
        dq = jnp.clip(jnp.round(y / dw_out_scale), -127, 127).astype(jnp.int8)
        acc2 = jax.lax.conv_general_dilated(
            dq, pw_w_j, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        z = acc2.astype(jnp.float32) * (dw_out_scale * pw_eff) + pw_bias
        z = jnp.maximum(z, 0)
        return jnp.clip(jnp.round(z / out_scale), -127, 127).astype(jnp.int8)

    def one_fused(xc, dw_w=dw_w_j, pw_w=pw_w_j, dw_eff=dw_eff,
                  dw_bias=dw_bias, pw_eff=pw_eff, pw_bias=pw_bias):
        return fused_dw_pw_int8(
            xc, dw_w, dw_eff, dw_bias, dw_out_scale,
            pw_w, dw_out_scale * pw_eff, pw_bias,
            dw_act="relu", pw_act="relu", pw_out_scale=out_scale)

    # exactness first (full tensors, int8 requant +-1 quantum tolerance)
    a = np.asarray(one_xla(x))
    b = np.asarray(one_fused(x))
    mism = float((a != b).mean())
    maxd = int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())
    assert maxd <= 1, (hw, c, oc, maxd)

    key = f"{hw}x{c}->{oc}"

    def timed(name, one):
        # _time_one wants a 2-D int8 carry; wrap with reshape
        xf = x.reshape(B * hw * hw, c)
        def one2(x2):
            return one(x2.reshape(B, hw, hw, c)).reshape(B * hw * hw, -1)
        t = tune_cache._time_one(one2, xf)
        print(f"{key:16s} {name:8s} {t*1e6:9.1f}us", flush=True)
        return round(t * 1e6, 1)

    t_xla = timed("xla", one_xla)
    t_fused = timed("fused", one_fused)
    results[key] = {"xla_us": t_xla, "fused_us": t_fused,
                    "speedup": round(t_xla / t_fused, 3),
                    "mismatch_frac": mism, "max_delta": maxd}

out = "/root/repo/docs/dwpw_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
