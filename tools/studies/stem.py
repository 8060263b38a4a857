"""Stem-conv variant microbench on TPU (int8 path investigation).

Variants, each a tiny standalone graph at b64 224x224x3 -> 112x112xC0:
  a) quantize -> conv3x3s2 int8 (K=27)          [pre-s2d behavior]
  b) s2d -> quantize -> conv2x2s1 int8 (K=48)   [current pass output]
  c) quantize -> s2d(int8) -> conv2x2s1 int8    [quantize before s2d]
  d) conv3x3s2 fp32 stem, quantize output       [fp32 stem island]
  e) fp32 conv on s2d input (no quant at all)   [fp32+s2d control]
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
sys.path.insert(0, "/root/repo")
from paddle_lite_tpu.core.builder import GraphBuilder
from paddle_lite_tpu.core.types import Precision, QuantInfo
from paddle_lite_tpu.tools.benchmark import device_throughput
import dataclasses

B, HW, C0 = 64, 224, 16
rng = np.random.default_rng(0)
w3 = rng.normal(0, 0.2, (3, 3, 3, C0)).astype(np.float32)

def s2d_weights(w, pad=1):
    kh, kw, ci, oc = w.shape
    def tap(d, p):
        v = d - p; b = v % 2
        return (v - b)//2, b
    hps = [tap(d, pad) for d in range(kh)]; wps = [tap(d, pad) for d in range(kw)]
    hmin = min(t[0] for t in hps); wmin = min(t[0] for t in wps)
    k2h = max(t[0] for t in hps) - hmin + 1; k2w = max(t[0] for t in wps) - wmin + 1
    w2 = np.zeros((k2h, k2w, 4*ci, oc), np.float32)
    for dh in range(kh):
        dhp, bh = hps[dh]
        for dw in range(kw):
            dwp, bw = wps[dw]
            ch = (bh*2+bw)*ci
            w2[dhp-hmin, dwp-wmin, ch:ch+ci, :] = w[dh, dw]
    return w2, (-hmin, max(t[0] for t in hps), -wmin, max(t[0] for t in wps))

w2, pads2 = s2d_weights(w3)
sx = 3.0/127.0

def qweights(w):
    amax = np.maximum(np.abs(w).max(axis=(0,1,2)), 1e-10)
    sc = amax/127.0
    return np.clip(np.round(w/sc), -127, 127).astype(np.int8), sc

def add_int8_conv(b, x, wq, sc, strides, pads, out_scale=None):
    wname = b.weight(b._name("w"), wq)
    b.g.vars[wname].quant = QuantInfo.per_channel_scales(sc, 3)
    op_out = b.op("conv2d", {"Input": [x], "Filter": [wname]},
                  attrs={"strides": list(strides), "paddings": list(pads),
                         "dilations": [1,1], "groups": 1, "enable_int8": True,
                         **({"out_scale": out_scale} if out_scale else {})},
                  shape_args=[x, wname], out_slots=("Output",))[0]
    return op_out

def variant(name):
    b = GraphBuilder(name, seed=0)
    x = b.input("image", (B, HW, HW, 3))
    if name == "a":
        q = b.op("quantize", {"X": [x]}, shape_args=[x],
                 out_precisions=[Precision.INT8])[0]
        b.g.vars[q].quant = QuantInfo.per_tensor(sx)
        wq, sc = qweights(w3)
        y = add_int8_conv(b, q, wq, sc, (2,2), (1,1))
    elif name == "b":
        s = b.op("space_to_depth", {"X": [x]}, attrs={"blocks": [2,2]}, shape_args=[x])[0]
        q = b.op("quantize", {"X": [s]}, shape_args=[s],
                 out_precisions=[Precision.INT8])[0]
        b.g.vars[q].quant = QuantInfo.per_tensor(sx)
        wq, sc = qweights(w2)
        y = add_int8_conv(b, q, wq, sc, (1,1), pads2)
    elif name == "c":
        q = b.op("quantize", {"X": [x]}, shape_args=[x],
                 out_precisions=[Precision.INT8])[0]
        b.g.vars[q].quant = QuantInfo.per_tensor(sx)
        s = b.op("space_to_depth", {"X": [q]}, attrs={"blocks": [2,2]},
                 shape_args=[q], out_precisions=[Precision.INT8])[0]
        b.g.vars[s].quant = QuantInfo.per_tensor(sx)
        wq, sc = qweights(w2)
        y = add_int8_conv(b, s, wq, sc, (1,1), pads2)
    elif name == "d":
        wname = b.weight("w", w3)
        y = b.op("conv2d", {"Input": [x], "Filter": [wname]},
                 attrs={"strides": [2,2], "paddings": [1,1], "dilations": [1,1], "groups": 1},
                 shape_args=[x, wname], out_slots=("Output",))[0]
        q = b.op("quantize", {"X": [y]}, shape_args=[y],
                 out_precisions=[Precision.INT8])[0]
        b.g.vars[q].quant = QuantInfo.per_tensor(0.1)
        y = q
    elif name == "e":
        s = b.op("space_to_depth", {"X": [x]}, attrs={"blocks": [2,2]}, shape_args=[x])[0]
        wname = b.weight("w", w2)
        y = b.op("conv2d", {"Input": [s], "Filter": [wname]},
                 attrs={"strides": [1,1], "paddings": list(pads2), "dilations": [1,1], "groups": 1},
                 shape_args=[s, wname], out_slots=("Output",))[0]
    b.mark_output(y)
    return b.build()

feed = {"image": rng.normal(size=(B, HW, HW, 3)).astype(np.float32)}
for name in ["a", "b", "c", "d", "e"]:
    g = variant(name)
    ips = device_throughput(g, dict(feed))
    print(f"variant {name}: {ips:,.0f} img/s  ({B/ips*1e6:.1f} us/iter)", flush=True)
