"""Pallas MXU int8 GEMM with fused requant epilogue.

The TPU re-design of the reference's crown-jewel ARM kernels
(``lite/backends/arm/math/gemm_prepacked_int8.cc`` and its sdot micro-kernel):
int8×int8→int32 accumulation on the MXU, with the entire epilogue — per
output-channel fp32 scale (s_x·s_w[c]), bias add, activation, and optional
saturating round-to-int8 requant — fused in VMEM before the tile is written
back to HBM.  This is exactly the structure of the reference's asm epilogue
("int32 → fp32/int8 via per-channel scale, +bias, relu, saturate-round" in
one pass), mapped onto a (bm×bk)·(bk×bn) block grid instead of 8x12 register
tiles.

Serving conv-as-GEMM (1x1 convs, im2col'd spatial convs) and fc/mul/matmul.
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
from .autotune import gemm_blocks


def _epilogue(acc_i32, scale_blk, bias_blk, act, act_attrs, out_scale, out_dtype):
    y = acc_i32.astype(jnp.float32) * scale_blk
    if bias_blk is not None:
        y = y + bias_blk
    y = apply_activation(y, act, act_attrs)
    if out_scale is not None:
        # saturating round-to-nearest int8 requant for the next int8 layer
        q = jnp.round(y * (1.0 / out_scale))
        return jnp.clip(q, -127, 127).astype(jnp.int8)
    return y.astype(out_dtype)


def _matmul_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, acc_ref, *,
                   n_k: int, act, act_attrs, out_scale, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _():
        bias_blk = bias_ref[:] if bias_ref is not None else None
        out_ref[:] = _epilogue(
            acc_ref[:], scale_ref[:], bias_blk, act, act_attrs, out_scale,
            out_dtype,
        )


def _pad_to(x, mult0, mult1):
    p0 = (-x.shape[0]) % mult0
    p1 = (-x.shape[1]) % mult1
    if p0 or p1:
        x = jnp.pad(x, ((0, p0), (0, p1)))
    return x


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_scale", "interpret", "act_attrs_tuple",
                     "blocks"),
)
def _int8_matmul_impl(x_q, w_q, eff_scale, bias, *, act, act_attrs_tuple,
                      out_scale, interpret, blocks=None):
    m, k = x_q.shape
    _, n = w_q.shape
    act_attrs = dict(act_attrs_tuple) if act_attrs_tuple else None
    if blocks is None:
        b = gemm_blocks(m, k, n)
        blocks = (b.bm, b.bk, b.bn)
    bm, bk, bn = blocks

    xp = _pad_to(x_q, bm, bk)
    wp = _pad_to(w_q, bk, bn)
    mp, kp = xp.shape
    np_ = wp.shape[1]
    scale_p = jnp.pad(eff_scale.reshape(1, -1).astype(jnp.float32),
                      ((0, 0), (0, np_ - n)))
    has_bias = bias is not None
    if has_bias:
        bias_p = jnp.pad(bias.reshape(1, -1).astype(jnp.float32),
                         ((0, 0), (0, np_ - n)))

    n_k = kp // bk
    out_dtype = jnp.int8 if out_scale is not None else jnp.float32

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [xp, wp, scale_p]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(bias_p)

    kernel = _matmul_kernel if has_bias else (
        lambda x_ref, w_ref, scale_ref, out_ref, acc_ref, **kw: _matmul_kernel(
            x_ref, w_ref, scale_ref, None, out_ref, acc_ref, **kw
        )
    )

    out = pl.pallas_call(
        functools.partial(
            kernel, n_k=n_k, act=act, act_attrs=act_attrs,
            out_scale=out_scale, out_dtype=out_dtype,
        ),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * (1 if out_scale else 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m, :n]


def pack_factor(m: int, k: int, n: int) -> int:
    """Row-packing factor for lane-starved GEMMs — measured OUT as an
    op-level transform; always returns 1 (kept for the record + the r5
    study).

    The idea: a (M, K)@(K, N) problem with K<128 or N<128 could view P
    contiguous rows as ONE row of P*K values against a block-diagonal
    (P*K, P*N) weight (bit-exact).  MEASURED (tools/studies/mnv1_pw_r5.py,
    the MNv1 112px 32->64 pointwise, 802816x32x64): packing LOSES — 600us
    packed vs 535us unpacked.  Root cause: the "free reshape" is only free
    on logical row-major bytes.  TPU int8 arrays are stored in (32, 128)
    tiles, so an (M, 32) activation is ALREADY physically padded to 128
    lanes (4x its logical bytes) and the (M/4, 128) view is a genuinely
    different tiled layout — the reshape is a relayout copy that costs
    more than the GEMM saves.  At the PHYSICAL bytes (~205 MB, not 77 MB)
    the unpacked GEMM already runs at ~385 GB/s ≈ half of HBM peak; the
    waste is the layout the tensor LIVES in, which only a graph-level fix
    (keeping the dw->pw intermediate in VMEM via fused_dw_pw, or packing a
    whole region's layout) can remove.
    """
    return 1


def int8_matmul(
    x_q,
    w_q,
    eff_scale,
    bias=None,
    *,
    act: Optional[str] = None,
    act_attrs: Optional[dict] = None,
    out_scale: Optional[float] = None,
    interpret: bool = False,
    blocks: Optional[tuple] = None,
):
    """out = epilogue((x_q @ w_q).i32) — fp32 out, or int8 when ``out_scale``
    is given.  ``eff_scale`` is s_x*s_w per output column (shape (N,) or
    scalar broadcast).  ``blocks`` overrides the (bm, bk, bn) tile choice;
    by default the measured per-bucket table is consulted
    (tune_cache.lookup_blocks), falling back to the static heuristic.

    Row-packing of lane-starved shapes was measured out at this level (see
    :func:`pack_factor` for the full negative result)."""
    m, k = x_q.shape
    n = w_q.shape[1]
    eff_scale = jnp.broadcast_to(jnp.asarray(eff_scale, jnp.float32), (n,))
    if blocks is None and not interpret:
        from . import tune_cache

        blocks = tune_cache.lookup_blocks(m, k, n)
    act_attrs_tuple = tuple(sorted(act_attrs.items())) if act_attrs else None
    return _int8_matmul_impl(
        x_q, w_q, eff_scale, bias,
        act=act, act_attrs_tuple=act_attrs_tuple,
        out_scale=None if out_scale is None else float(out_scale),
        interpret=interpret, blocks=blocks,
    )
