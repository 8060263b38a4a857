"""Micro-experiments #2 (TPU): global-pool variants, general dw kernel vs
XLA at MobileNet shapes, low-K 1x1 conv compute dtype."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
sys.path.insert(0, "/root/repo")
import functools, time

def timed_per_iter(fn, x, min_window=0.25):
    @jax.jit
    def looped(xc, iters):
        def body(i, carry):
            out = fn(carry)
            bump = (jnp.sum(out.astype(jnp.float32)) > jnp.float32(3e38))
            return carry + bump.astype(carry.dtype)
        return jax.lax.fori_loop(0, iters, body, xc)[0, 0, 0, 0].astype(jnp.float32)
    def t(it):
        t0 = time.perf_counter()
        float(jax.device_get(looped(x, jnp.int32(it))))
        return time.perf_counter() - t0
    t(1); loop = 256
    while True:
        d = float(np.median([t(1+loop)-t(1) for _ in range(3)]))
        if d >= min_window or loop >= 1<<22: break
        loop = min(max(int(loop*min_window*1.3/max(d,1e-4))+1, loop*2), 1<<22)
    deltas = [t(1+loop)-t(1) for _ in range(5)]
    good = [v for v in deltas if v > min_window/4] or deltas
    return float(np.median(good))/loop

rng = np.random.default_rng(0)

print("=== global avg pool (64,7,7,960) int8 ===", flush=True)
x8 = jax.device_put(rng.integers(-127,128,(64,7,7,960),dtype=np.int8))
def pool_int32(x):
    s = jnp.sum(x.astype(jnp.int32), axis=(1,2), keepdims=True)
    return jnp.clip(jnp.round(s/49.0), -127, 127).astype(jnp.int8)
def pool_bf16(x):
    m = jnp.mean(x.astype(jnp.bfloat16), axis=(1,2), keepdims=True)
    return jnp.clip(jnp.round(m.astype(jnp.float32)), -127, 127).astype(jnp.int8)
def pool_f32(x):
    m = jnp.mean(x.astype(jnp.float32), axis=(1,2), keepdims=True)
    return jnp.clip(jnp.round(m), -127, 127).astype(jnp.int8)
def pool_reshape(x):
    n,h,w,c = x.shape
    s = jnp.sum(x.reshape(n, h*w, c).astype(jnp.int32), axis=1, keepdims=True)
    return jnp.clip(jnp.round(s/49.0), -127, 127).astype(jnp.int8).reshape(n,1,1,c)
for name, f in [("int32_sum", pool_int32), ("bf16_mean", pool_bf16),
                ("f32_mean", pool_f32), ("reshape_int32", pool_reshape)]:
    print(f"pool {name}: {timed_per_iter(f, x8)*1e6:.1f} us", flush=True)

print("=== dw general kernel vs XLA (int8 edges) ===", flush=True)
from paddle_lite_tpu.ops.kernels.depthwise import dw_conv_int8
for k, s, h, c in [(3,1,112,64),(3,2,112,64),(5,1,28,120),(5,2,56,72),
                   (3,2,56,72),(5,1,14,672),(5,2,14,672),(5,1,7,960),
                   (3,1,28,240),(3,1,14,480)]:
    xs = jax.device_put(rng.integers(-127,128,(64,h,h,c),dtype=np.int8))
    w = jnp.asarray(rng.integers(-127,128,(k,k,1,c),dtype=np.int8))
    eff = jnp.asarray(rng.uniform(1e-3,2e-3,c).astype(np.float32))
    bias = jnp.asarray(rng.normal(0,0.1,c).astype(np.float32))
    pad = (k-1)//2
    def pallas_dw(x, w=w, eff=eff, bias=bias, s=s):
        return dw_conv_int8(x, w, eff, bias, stride=s, act="relu", out_scale=0.05)
    def xla_dw(x, w=w, eff=eff, bias=bias, s=s, pad=pad, c=c):
        acc = jax.lax.conv_general_dilated(x, w, (s,s), ((pad,pad),(pad,pad)),
            dimension_numbers=("NHWC","HWIO","NHWC"), feature_group_count=c,
            preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32)*eff + bias, 0)
        return jnp.clip(jnp.round(y*20.0), -127, 127).astype(jnp.int8)
    def xla_dw_bf16(x, w=w, eff=eff, bias=bias, s=s, pad=pad, c=c):
        acc = jax.lax.conv_general_dilated(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (s,s), ((pad,pad),(pad,pad)),
            dimension_numbers=("NHWC","HWIO","NHWC"), feature_group_count=c,
            preferred_element_type=jnp.float32)
        y = jnp.maximum(acc*eff + bias, 0)
        return jnp.clip(jnp.round(y*20.0), -127, 127).astype(jnp.int8)
    tp = timed_per_iter(pallas_dw, xs)
    tx = timed_per_iter(xla_dw, xs)
    tb = timed_per_iter(xla_dw_bf16, xs)
    bw = 64*h*h*c*(1+1/(s*s))/1e6
    print(f"dw k{k}s{s} {h}x{c}: pallas {tp*1e6:7.1f}us  xla_i32 {tx*1e6:7.1f}us  "
          f"xla_bf16 {tb*1e6:7.1f}us  (roof~{bw/819*1e3:.0f}us)", flush=True)

print("=== low-K 1x1 conv (64,112,112,16)->(...,64) ===", flush=True)
xi = jax.device_put(rng.integers(-127,128,(64,112,112,16),dtype=np.int8))
wq = jnp.asarray(rng.integers(-127,128,(1,1,16,64),dtype=np.int8))
eff = jnp.asarray(rng.uniform(1e-3,2e-3,64).astype(np.float32))
def conv_i8(x):
    acc = jax.lax.conv_general_dilated(x, wq, (1,1), "VALID",
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32)*eff, 0)
    return jnp.clip(jnp.round(y*20.0), -127, 127).astype(jnp.int8)
def conv_bf16(x):
    acc = jax.lax.conv_general_dilated(x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
        (1,1), "VALID", dimension_numbers=("NHWC","HWIO","NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(acc*eff, 0)
    return jnp.clip(jnp.round(y*20.0), -127, 127).astype(jnp.int8)
print(f"1x1 K16 int8:  {timed_per_iter(conv_i8, xi)*1e6:.1f} us", flush=True)
print(f"1x1 K16 bf16c: {timed_per_iter(conv_bf16, xi)*1e6:.1f} us", flush=True)
