"""Pallas depthwise-conv kernel (VPU) — the reference's hand-written
``conv_depthwise_3x3*`` NEON kernels (``lite/backends/arm/math/
conv_depthwise_3x3s1_fp32.cc``, ``conv_depthwise_3x3_int8.cc`` — the fork
author's own specialty) re-imagined for the TPU's vector unit.

Depthwise conv is MXU-hostile (no reduction dimension to feed the systolic
array), so the 9-tap stencil runs as shifted elementwise multiply-adds on
the VPU with channels on the 128-lane axis:

    out[r, w, c] = Σ_{i,j} x[r+i, w+j, c] · k[i, j, c]

Design (stride 1, 3x3, NHWC int8 — the hot MobileNet layers; other
configs fall back to the XLA lowering):
- grid = (batch, channel-blocks of 128); each step holds the full padded
  (H+2, W+2, 128) input slab in VMEM (≤ ~1.7 MB at 112×112).
- rows processed in static chunks so the int32 accumulator stays small
  (chunk×W×128×4B) instead of materializing an (H, W, 128) int32 tensor.
- the epilogue (per-channel scale, bias, activation, saturating int8
  requant) runs on the accumulator chunk in registers/VMEM before the
  single store — the same fused structure as the reference's NEON epilogue
  and our MXU GEMM kernel.

Measured on the v5e (batch 64) — four formulations compared:
- VPU int32 stencil (this kernel): 131-293 GB/s effective; int32 accumulate
  beats fp32 accumulate everywhere (e.g. 28x28x256: 293 vs 29 GB/s)
- dw-as-dense-GEMM (patches @ block-diag (9C,C) on MXU): Mosaic rejects the
  concat+reshape patch construction (remote-compile error)
- dw-as-9-diagonal-matmuls on MXU: compiles but slower still (131 GB/s at
  112x64 falling to 18 GB/s at 28x256 — small matmuls never saturate the
  systolic array and the per-tap reshapes dominate)
- XLA's native dw lowering: ~213+ GB/s at the big shapes — the winner at
  every bucket except 14x14x512 (this kernel: 173us vs 264us standalone,
  though the in-model autotune validation kept XLA there too)
The autotune table (tune_cache.measure_dw) routes per shape; XLA is the
production depthwise path on this chip. Beating it needs a fundamentally
better VPU schedule (open item for a future round).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common import apply_activation

_BC = 128  # channel block = one lane tile


def _pick_row_chunk(h: int) -> int:
    for ch in (16, 14, 8, 7, 4, 2, 1):
        if h % ch == 0:
            return ch
    return 1


def _batch_block(n: int, h: int, w: int) -> int:
    """Images per grid step.  Small-spatial stages (7-14px tails of
    MNv3/SSD) do ~56k MACs per step under the 1-image grid — pure per-step
    overhead; blocking several images amortizes it while the VMEM slab
    stays tiny.  Large-spatial stages keep bb=1 (current behavior)."""
    cap = max(1, 4096 // (h * w))
    bb = 1
    while bb * 2 <= min(cap, 16) and n % (bb * 2) == 0:
        bb *= 2
    return bb


def _dw_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *,
               h: int, w: int, row_chunk: int, bb: int, act, act_attrs,
               out_scale, out_dtype):
    wt = w_ref[:]  # (9, BC) int8 taps
    scale = scale_ref[:]  # (1, BC) f32
    bias = bias_ref[:]  # (1, BC) f32
    # Hoist the W-direction (sublane-axis) shifts OUT of the row loop: a
    # sublane-offset slice is a Mosaic relayout copy, so slicing per tap
    # per chunk paid 9x the slab in VMEM copies; three shifted views built
    # once pay 3x, and the remaining per-tap reads slice only the H axis —
    # a non-tiled dimension, free.  The row loop then runs pure int32 MACs
    # (the VPU-roofline term; see docs/ROOFLINE.md depthwise section).
    for bi in range(bb):
        xs3 = [x_ref[bi, :, j:j + w, :] for j in range(3)]  # (h+2, w, BC)
        for rc in range(h // row_chunk):
            r0 = rc * row_chunk
            acc = jnp.zeros((row_chunk, w, _BC), jnp.int32)
            for i in range(3):
                for j in range(3):
                    xs = xs3[j][r0 + i:r0 + i + row_chunk]
                    acc = acc + xs.astype(jnp.int32) * wt[3 * i + j].astype(
                        jnp.int32)
            y = acc.astype(jnp.float32) * scale[0]
            y = y + bias[0]
            y = apply_activation(y, act, act_attrs)
            if out_scale is not None:
                y = jnp.clip(jnp.round(y * (1.0 / out_scale)), -127, 127)
            out_ref[bi, r0:r0 + row_chunk, :, :] = y.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "act_attrs_tuple", "out_scale", "interpret")
)
def _dw3x3s1_impl(x, w9, eff_scale, bias, *, act, act_attrs_tuple,
                  out_scale, interpret):
    n, h, wdt, c = x.shape
    act_attrs = dict(act_attrs_tuple) if act_attrs_tuple else None
    if bias is not None:
        bias = bias.astype(jnp.float32)  # bf16-island weights arrive bf16
    cp = -c % _BC
    if cp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp)))
        w9 = jnp.pad(w9, ((0, 0), (0, cp)))
        eff_scale = jnp.pad(eff_scale, (0, cp))
        bias = jnp.pad(bias, (0, cp))
    cq = c + cp
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # SAME padding
    out_dtype = jnp.int8 if out_scale is not None else jnp.float32
    row_chunk = _pick_row_chunk(h)
    bb = _batch_block(n, h, wdt)

    out = pl.pallas_call(
        functools.partial(
            _dw_kernel, h=h, w=wdt, row_chunk=row_chunk, bb=bb, act=act,
            act_attrs=act_attrs, out_scale=out_scale, out_dtype=out_dtype,
        ),
        grid=(n // bb, cq // _BC),
        in_specs=[
            pl.BlockSpec((bb, h + 2, wdt + 2, _BC),
                         lambda b, cb: (b, 0, 0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, _BC), lambda b, cb: (0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BC), lambda b, cb: (0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BC), lambda b, cb: (0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, h, wdt, _BC), lambda b, cb: (b, 0, 0, cb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt, cq), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wdt * cq * 9,
            bytes_accessed=n * h * wdt * cq * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w9, eff_scale.reshape(1, -1).astype(jnp.float32),
      bias.reshape(1, -1).astype(jnp.float32))
    return out[..., :c]


def dw_conv3x3s1_int8(
    x,  # (N, H, W, C) int8
    w,  # (3, 3, 1, C) int8
    eff_scale,  # (C,) f32 = s_x * s_w per channel
    bias=None,  # (C,) f32
    *,
    act: Optional[str] = None,
    act_attrs: Optional[dict] = None,
    out_scale: Optional[float] = None,
    interpret: bool = False,
):
    c = x.shape[-1]
    w9 = jnp.asarray(w).reshape(9, c)
    eff = jnp.broadcast_to(jnp.asarray(eff_scale, jnp.float32), (c,))
    b = jnp.zeros((c,), jnp.float32) if bias is None else jnp.asarray(bias)
    act_attrs_tuple = tuple(sorted(act_attrs.items())) if act_attrs else None
    return _dw3x3s1_impl(
        x, w9, eff, b, act=act, act_attrs_tuple=act_attrs_tuple,
        out_scale=None if out_scale is None else float(out_scale),
        interpret=interpret,
    )


def supported(op_attrs, x_shape, w_shape) -> bool:
    """Static eligibility: 3x3, stride 1, SAME padding (1,1), dilation 1,
    channel multiplier 1 (CRNN's stem uses multiplier-2 depthwise, which
    this kernel's C→C tap layout cannot express)."""
    from ..common import normalize_2d, normalize_paddings

    kh, kw = w_shape[0], w_shape[1]
    if w_shape[-1] != x_shape[-1]:  # multiplier != 1
        return False
    strides = normalize_2d(op_attrs.get("strides", (1, 1)))
    dil = normalize_2d(op_attrs.get("dilations", (1, 1)))
    pads = normalize_paddings(op_attrs.get("paddings", (0, 0)))
    return (
        (kh, kw) == (3, 3)
        and strides == (1, 1)
        and dil == (1, 1)
        and pads == ((1, 1), (1, 1))
    )


# ---- generalized variant: k in {3,5}, stride in {1,2} ----------------------
# Stride-2 uses *phase decomposition*: the padded input is split into 4
# polyphase components xp[2q+p_h, 2s+p_w] so every tap becomes a dense
# (unit-stride) read from one phase — Mosaic-friendly, no strided loads.
# Same epilogue fusion as the s1 kernel. This closes the round-1 open item
# "stride-2 variant unimplemented" (VERDICT #6): MobileNet's stride-2
# depthwise layers can now be measured against XLA rather than defaulting.

def _dw_kernel_s2(x_ref, w_ref, scale_ref, bias_ref, out_ref, *,
                  oh: int, ow: int, kh: int, kw: int, row_chunk: int,
                  act, act_attrs, out_scale, out_dtype):
    wt = w_ref[:]  # (kh*kw, BC) int8 taps
    scale = scale_ref[:]
    bias = bias_ref[:]
    # sublane shifts hoisted (see _dw_kernel): one relayout per distinct
    # (phase, column-offset) pair instead of per tap per chunk
    views = {}
    for i in range(kh):
        ph = i % 2
        for j in range(kw):
            pw, qj = j % 2, j // 2
            key = (ph * 2 + pw, qj)
            if key not in views:
                views[key] = x_ref[ph * 2 + pw, 0, :, qj:qj + ow, :]
    for rc in range(oh // row_chunk):
        r0 = rc * row_chunk
        acc = jnp.zeros((row_chunk, ow, _BC), jnp.int32)
        for i in range(kh):
            ph, qi = i % 2, i // 2
            for j in range(kw):
                pw, qj = j % 2, j // 2
                xs = views[(ph * 2 + pw, qj)][r0 + qi:r0 + qi + row_chunk]
                acc = acc + xs.astype(jnp.int32) * wt[i * kw + j].astype(jnp.int32)
        y = acc.astype(jnp.float32) * scale[0]
        y = y + bias[0]
        y = apply_activation(y, act, act_attrs)
        if out_scale is not None:
            y = jnp.clip(jnp.round(y * (1.0 / out_scale)), -127, 127)
        out_ref[0, r0:r0 + row_chunk, :, :] = y.astype(out_dtype)


def _dw_kernel_s1(x_ref, w_ref, scale_ref, bias_ref, out_ref, *,
                  oh: int, ow: int, kh: int, kw: int, row_chunk: int,
                  act, act_attrs, out_scale, out_dtype):
    wt = w_ref[:]
    scale = scale_ref[:]
    bias = bias_ref[:]
    # sublane shifts hoisted out of the row loop (see _dw_kernel): kw
    # relayout copies total instead of kh*kw per chunk
    xsj = [x_ref[0, :, j:j + ow, :] for j in range(kw)]
    for rc in range(oh // row_chunk):
        r0 = rc * row_chunk
        acc = jnp.zeros((row_chunk, ow, _BC), jnp.int32)
        for i in range(kh):
            for j in range(kw):
                xs = xsj[j][r0 + i:r0 + i + row_chunk]
                acc = acc + xs.astype(jnp.int32) * wt[i * kw + j].astype(jnp.int32)
        y = acc.astype(jnp.float32) * scale[0]
        y = y + bias[0]
        y = apply_activation(y, act, act_attrs)
        if out_scale is not None:
            y = jnp.clip(jnp.round(y * (1.0 / out_scale)), -127, 127)
        out_ref[0, r0:r0 + row_chunk, :, :] = y.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("kh", "kw", "stride", "pad", "act",
                              "act_attrs_tuple", "out_scale", "interpret")
)
def _dw_general_impl(x, wk, eff_scale, bias, *, kh, kw, stride, pad, act,
                     act_attrs_tuple, out_scale, interpret):
    n, h, wdt, c = x.shape
    act_attrs = dict(act_attrs_tuple) if act_attrs_tuple else None
    if bias is not None:
        bias = bias.astype(jnp.float32)
    cp = -c % _BC
    if cp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp)))
        wk = jnp.pad(wk, ((0, 0), (0, cp)))
        eff_scale = jnp.pad(eff_scale, (0, cp))
        bias = jnp.pad(bias, (0, cp))
    cq = c + cp
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (wdt + 2 * pad - kw) // stride + 1
    out_dtype = jnp.int8 if out_scale is not None else jnp.float32
    row_chunk = _pick_row_chunk(oh)
    eff2 = eff_scale.reshape(1, -1).astype(jnp.float32)
    b2 = bias.reshape(1, -1).astype(jnp.float32)

    if stride == 1:
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        out = pl.pallas_call(
            functools.partial(
                _dw_kernel_s1, oh=oh, ow=ow, kh=kh, kw=kw,
                row_chunk=row_chunk, act=act, act_attrs=act_attrs,
                out_scale=out_scale, out_dtype=out_dtype),
            grid=(n, cq // _BC),
            in_specs=[
                pl.BlockSpec((1, h + 2 * pad, wdt + 2 * pad, _BC),
                             lambda bb, cb: (bb, 0, 0, cb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kh * kw, _BC), lambda bb, cb: (0, cb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _BC), lambda bb, cb: (0, cb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _BC), lambda bb, cb: (0, cb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, oh, ow, _BC),
                                   lambda bb, cb: (bb, 0, 0, cb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, oh, ow, cq), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * oh * ow * cq * kh * kw,
                bytes_accessed=n * h * wdt * cq * 2, transcendentals=0),
            interpret=interpret,
        )(xp, wk, eff2, b2)
        return out[..., :c]

    # stride 2: polyphase split of the padded input
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    # phase q-extent must cover r0 + (k-1)//2 + row_chunk
    qh = oh + (kh - 1) // 2
    qw = ow + (kw - 1) // 2
    pad_h = max(0, 2 * qh - hp)
    pad_w = max(0, 2 * qw - wp)
    xp = jnp.pad(xp, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    phases = jnp.stack([xp[:, p_h::2, :, :][:, :qh, p_w::2, :][:, :, :qw, :]
                        for p_h in (0, 1) for p_w in (0, 1)])  # (4,N,qh,qw,C)
    out = pl.pallas_call(
        functools.partial(
            _dw_kernel_s2, oh=oh, ow=ow, kh=kh, kw=kw,
            row_chunk=row_chunk, act=act, act_attrs=act_attrs,
            out_scale=out_scale, out_dtype=out_dtype),
        grid=(n, cq // _BC),
        in_specs=[
            pl.BlockSpec((4, 1, qh, qw, _BC),
                         lambda bb, cb: (0, bb, 0, 0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, _BC), lambda bb, cb: (0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BC), lambda bb, cb: (0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BC), lambda bb, cb: (0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, _BC),
                               lambda bb, cb: (bb, 0, 0, cb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, cq), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * oh * ow * cq * kh * kw,
            bytes_accessed=n * h * wdt * cq * 2, transcendentals=0),
        interpret=interpret,
    )(phases, wk, eff2, b2)
    return out[..., :c]


def dw_conv_int8(
    x,  # (N, H, W, C) int8
    w,  # (kh, kw, 1, C) int8
    eff_scale,
    bias=None,
    *,
    stride: int = 1,
    act: Optional[str] = None,
    act_attrs: Optional[dict] = None,
    out_scale: Optional[float] = None,
    interpret: bool = False,
):
    """General int8 depthwise kernel: k∈{3,5}, stride∈{1,2}, SAME padding."""
    kh, kw, _, c = w.shape
    wk = jnp.asarray(w).reshape(kh * kw, c)
    eff = jnp.broadcast_to(jnp.asarray(eff_scale, jnp.float32), (c,))
    b = jnp.zeros((c,), jnp.float32) if bias is None else jnp.asarray(bias)
    act_attrs_tuple = tuple(sorted(act_attrs.items())) if act_attrs else None
    return _dw_general_impl(
        x, wk, eff, b, kh=kh, kw=kw, stride=stride, pad=(kh - 1) // 2,
        act=act, act_attrs_tuple=act_attrs_tuple,
        out_scale=None if out_scale is None else float(out_scale),
        interpret=interpret)


def supported_general(op_attrs, x_shape, w_shape) -> bool:
    """k in {3,5} square, stride in {1,2} uniform, SAME padding, no
    dilation, channel multiplier 1 (see ``supported``)."""
    from ..common import normalize_2d, normalize_paddings

    kh, kw = w_shape[0], w_shape[1]
    if w_shape[-1] != x_shape[-1]:  # multiplier != 1
        return False
    strides = normalize_2d(op_attrs.get("strides", (1, 1)))
    dil = normalize_2d(op_attrs.get("dilations", (1, 1)))
    pads = normalize_paddings(op_attrs.get("paddings", (0, 0)))
    p = (kh - 1) // 2
    # VMEM feasibility: each grid step holds the whole padded input slab,
    # the output slab, and a row-chunk int32 accumulator — DBNet-class
    # 320x320 maps (13MB input slab alone) crash the Mosaic compile
    h, w = x_shape[1], x_shape[2]
    s = strides[0]
    out_b = 4 if op_attrs.get("out_scale") is None else 1
    slab = (h + kh - 1) * (w + kw - 1) * _BC          # int8 input
    out = (h // s) * (w // s) * _BC * out_b
    acc = 16 * (w + kh - 1) * _BC * 4
    return (
        kh == kw and kh in (3, 5)
        and strides in ((1, 1), (2, 2)) and strides[0] == strides[1]
        and dil == (1, 1)
        and pads == ((p, p), (p, p))
        and slab + out + acc <= 9 * 1024 * 1024
    )
