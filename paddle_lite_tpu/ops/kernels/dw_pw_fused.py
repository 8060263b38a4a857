"""Fused depthwise(3x3,s1) + pointwise(1x1) int8 Pallas kernel.

MobileNet's basic block is dw-conv → pw-conv; executed separately, the
depthwise output (the largest activation tensor in the block) makes a full
HBM round trip between the two.  This kernel keeps it in VMEM: per grid
step it computes a row-chunk of the depthwise stencil (VPU), requantizes to
int8 in registers, immediately feeds it to the 1x1 GEMM (MXU) against a
block of pointwise filters, and only the final pw output touches HBM.
This inter-op fusion is the reference's conv+conv chaining taken one level
further than its per-op NEON kernels could (they were separate function
calls through memory) — a fusion only possible because we own the kernel.

Grid: (batch, pw-output blocks).  VMEM per step (112x112x64 → 128 case):
input slab ~0.8MB + pw weights C×bo ≤ 0.5MB + out rows ~1.6MB + chunk
buffers — comfortably inside the budget.
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

_BO = 128  # pw output-channel block (lane tile)


def _pick_row_chunk(h: int) -> int:
    for ch in (16, 14, 8, 7, 4, 2, 1):
        if h % ch == 0:
            return ch
    return 1


def _kernel(x_ref, dww_ref, dwscale_ref, dwbias_ref, pww_ref, pwscale_ref,
            pwbias_ref, out_ref, *,
            h: int, w: int, c: int, oc: int, row_chunk: int, bo: int,
            dw_act, dw_act_attrs, dw_out_scale,
            pw_act, pw_act_attrs, pw_out_scale, out_dtype):
    # grid is (batch,) ONLY: the dw stencil result for a row chunk is
    # computed once and reused for every pw output block (a grid axis over
    # output blocks would recompute the stencil per block — measured 4x
    # end-to-end regression on the first version of this kernel)
    # The stencil runs in f32 FMAs, not int32 MACs: the VPU has no int8
    # MAC and int32 multiplies are the slow path (same reasoning as the
    # dw_compute="bf16" XLA route, nn.py:111).  Exact: int8 values are
    # exact in f32 and every 3x3 window sum stays < 2^24.
    dw_w = dww_ref[:].astype(jnp.float32)   # (9, C)
    dw_scale = dwscale_ref[:]  # (1, C) f32  (s_x * s_wdw per channel)
    dw_bias = dwbias_ref[:]    # (1, C) f32

    # SAME halo built IN VMEM — r5: the old HBM-side jnp.pad was a full
    # extra read+write of the (physically lane-padded) activation, ~380us
    # at the 112px block; a (h+2, w+2, c) VMEM temp costs ~5us total
    xpad = jnp.pad(x_ref[0], ((1, 1), (1, 1), (0, 0)))

    for rc in range(h // row_chunk):
        r0 = rc * row_chunk
        acc = jnp.zeros((row_chunk, w, c), jnp.float32)
        for i in range(3):
            for j in range(3):
                xs = xpad[r0 + i:r0 + i + row_chunk, j:j + w, :]
                acc = acc + xs.astype(jnp.float32) * dw_w[3 * i + j]
        y = acc * dw_scale[0] + dw_bias[0]
        y = apply_activation(y, dw_act, dw_act_attrs)
        # requant to int8 — the tensor that previously went to HBM
        dw_q = jnp.clip(jnp.round(y * (1.0 / dw_out_scale)), -127, 127
                        ).astype(jnp.int8)
        flat = dw_q.reshape(row_chunk * w, c)
        for ob in range(oc // bo):
            o0 = ob * bo
            pw_w = pww_ref[:, o0:o0 + bo]           # (C, BO) int8
            pacc = jax.lax.dot_general(
                flat, pw_w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            z = pacc.astype(jnp.float32) * pwscale_ref[:, o0:o0 + bo][0]
            z = z + pwbias_ref[:, o0:o0 + bo][0]
            z = apply_activation(z, pw_act, pw_act_attrs)
            if pw_out_scale is not None:
                z = jnp.clip(jnp.round(z * (1.0 / pw_out_scale)), -127, 127)
            out_ref[0, r0:r0 + row_chunk, :, o0:o0 + bo] = z.reshape(
                row_chunk, w, bo).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "dw_act", "dw_act_attrs_t", "dw_out_scale",
    "pw_act", "pw_act_attrs_t", "pw_out_scale", "interpret"))
def _fused_impl(x, dw_w9, dw_eff, dw_bias, pw_w, pw_eff, pw_bias, *,
                dw_act, dw_act_attrs_t, dw_out_scale,
                pw_act, pw_act_attrs_t, pw_out_scale, interpret):
    n, h, wdt, c = x.shape
    oc = pw_w.shape[1]
    # r5: no HBM-side channel/halo padding — Mosaic lane-pads sub-128
    # channel dims internally, the SAME halo is built in VMEM inside the
    # kernel, and the pw output block adapts to oc so an oc<=128 output
    # needs no trailing slice-copy.  The old jnp.pad round trips cost
    # ~380us + ~190us at the 112px block (tools/studies/dwpw_r5.py).
    bo = oc if oc <= 128 else _BO
    op_ = -oc % bo
    if op_:
        pw_w = jnp.pad(pw_w, ((0, 0), (0, op_)))
        pw_eff = jnp.pad(pw_eff, (0, op_))
        pw_bias = jnp.pad(pw_bias, (0, op_))
    ocq = oc + op_
    out_dtype = jnp.int8 if pw_out_scale is not None else jnp.float32
    row_chunk = _pick_row_chunk(h)

    out = pl.pallas_call(
        functools.partial(
            _kernel, h=h, w=wdt, c=c, oc=ocq, row_chunk=row_chunk, bo=bo,
            dw_act=dw_act,
            dw_act_attrs=dict(dw_act_attrs_t) if dw_act_attrs_t else None,
            dw_out_scale=dw_out_scale,
            pw_act=pw_act,
            pw_act_attrs=dict(pw_act_attrs_t) if pw_act_attrs_t else None,
            pw_out_scale=pw_out_scale, out_dtype=out_dtype,
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ocq), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ocq), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ocq), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, ocq), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt, ocq), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wdt * c * 9 + 2 * n * h * wdt * c * ocq,
            bytes_accessed=n * h * wdt * (c + ocq),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, dw_w9,
      dw_eff.reshape(1, -1).astype(jnp.float32),
      dw_bias.reshape(1, -1).astype(jnp.float32),
      pw_w,
      pw_eff.reshape(1, -1).astype(jnp.float32),
      pw_bias.reshape(1, -1).astype(jnp.float32))
    return out if ocq == oc else out[..., :oc]


def fused_dw_pw_int8(
    x,        # (N, H, W, C) int8
    dw_w,     # (3, 3, 1, C) int8
    dw_eff,   # (C,) f32 = s_x * s_dw
    dw_bias,  # (C,) f32 or None
    dw_out_scale: float,  # requant scale of the internal dw output
    pw_w,     # (1, 1, C, O) or (C, O) int8
    pw_eff,   # (O,) f32 = s_dwout * s_pw
    pw_bias,  # (O,) f32 or None
    *,
    dw_act: Optional[str] = None, dw_act_attrs=None,
    pw_act: Optional[str] = None, pw_act_attrs=None,
    pw_out_scale: Optional[float] = None,
    interpret: bool = False,
):
    c = x.shape[-1]
    dw_w9 = jnp.asarray(dw_w).reshape(9, c)
    pw_w2 = jnp.asarray(pw_w).reshape(c, -1)
    oc = pw_w2.shape[1]
    z = lambda n: jnp.zeros((n,), jnp.float32)
    return _fused_impl(
        x, dw_w9,
        jnp.broadcast_to(jnp.asarray(dw_eff, jnp.float32), (c,)),
        z(c) if dw_bias is None else jnp.asarray(dw_bias, jnp.float32),
        pw_w2,
        jnp.broadcast_to(jnp.asarray(pw_eff, jnp.float32), (oc,)),
        z(oc) if pw_bias is None else jnp.asarray(pw_bias, jnp.float32),
        dw_act=dw_act,
        dw_act_attrs_t=tuple(sorted(dw_act_attrs.items())) if dw_act_attrs else None,
        dw_out_scale=float(dw_out_scale),
        pw_act=pw_act,
        pw_act_attrs_t=tuple(sorted(pw_act_attrs.items())) if pw_act_attrs else None,
        pw_out_scale=None if pw_out_scale is None else float(pw_out_scale),
        interpret=interpret,
    )
