"""Kernel selection + block-shape autotune table.

The TPU analog of the reference's per-SoC tuning tables in
``lite/core/device_info.cc`` (L1/L2 sizes and power modes steering ARM block
sizes): a table of Pallas block shapes keyed by problem shape, plus the
pallas-vs-XLA decision consumed by the kernel-pick pass.

Pallas is only profitable where we fuse work XLA would otherwise schedule as
separate HBM passes — the int8 matmul with dequant+bias+act+requant epilogue.
Everything else defaults to XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

# ops that can route through the Pallas int8 GEMM
_PALLAS_GEMM_OPS = ("fc", "mul")
_PALLAS_CONV_OPS = ("conv2d",)


def _gemm_dims_ok(m: int, k: int, n: int) -> bool:
    # below these sizes the launch overhead beats the fusion win; the MXU
    # wants >=128 in the lane dims anyway
    return m >= 8 and k >= 32 and n >= 32


def _gemm_problem(graph, op) -> Optional[Tuple[int, int, int]]:
    """(m, k, n) if this op can route through the Pallas int8 GEMM."""
    if op.op_type in _PALLAS_GEMM_OPS:
        w = graph.vars[op.input("W" if op.op_type == "fc" else "Y")]
        x = graph.vars[op.input("Input" if op.op_type == "fc" else "X")]
        return int(np.prod(x.shape[:-1])), w.shape[-2], w.shape[-1]
    if op.op_type in _PALLAS_CONV_OPS:
        w = graph.vars[op.input("Filter")]
        kh, kw, ic, oc = w.shape
        if (
            kh == kw == 1
            and tuple(op.attrs.get("strides", (1, 1))) == (1, 1)
            and int(op.attrs.get("groups", 1)) == 1
            and not op.maybe_input("ResidualData")
        ):
            x = graph.vars[op.input("Input")]
            return int(np.prod(x.shape[:-1])), ic, oc
    return None


def choose_kernel(graph, op) -> Optional[str]:
    """Return 'pallas' | 'xla' | None (keep default).

    Policy: Pallas only where the on-device autotune table has *measured* it
    faster than the XLA lowering for that (m, k, n) bucket; XLA otherwise.
    (Measured on the dev chip: XLA's fused int8 dot+epilogue beats the
    current Pallas kernel at most model shapes, so an unmeasured default of
    'pallas' costs real throughput — the conservative default is 'xla'.)
    """
    if op.op_type.startswith("multiclass_nms"):
        # VMEM-resident NMS (ops/kernels/nms.py): the XLA fixed point keeps
        # the (k,k) IoU/suppression matrices in HBM and re-reads them every
        # Jacobi round — measured 7.6ms of the 10.0ms SSD-MobileNetV1 b32
        # batch. Not int8-gated: NMS runs in the fp island either way.
        return "pallas"
    # bidirectional_gru always runs the XLA scan: the Pallas gru_scan
    # kernel was deleted in r5 — no config ever shipped an in-model win
    # (docs/bigru_sweep_r4.json, docs/crnn_long_r5.json).
    if not op.attrs.get("enable_int8"):
        return None
    if op.op_type == "depthwise_conv2d":
        from . import depthwise, tune_cache
        from ..common import normalize_2d

        x = graph.vars[op.input("Input")]
        w = graph.vars[op.input("Filter")]
        if depthwise.supported_general(op.attrs, x.shape, w.shape) \
                and not op.maybe_input("ResidualData"):
            k = w.shape[0]
            stride = normalize_2d(op.attrs.get("strides", (1, 1)))[0]
            return tune_cache.lookup_dw(
                x.shape[1], x.shape[3], k, stride) or "xla"
        return None
    prob = _gemm_problem(graph, op)
    if prob is None:
        return None
    m, k, n = prob
    if not _gemm_dims_ok(m, k, n):
        return "xla"
    from . import tune_cache

    return tune_cache.lookup_gemm(m, k, n) or "xla"


@dataclasses.dataclass(frozen=True)
class GemmBlocks:
    bm: int
    bk: int
    bn: int


def gemm_blocks(m: int, k: int, n: int) -> GemmBlocks:
    """Pallas int8 GEMM block shapes.

    Swept on the v5e (8192x2048x2048): (bm=512, bk=2048, bn=512) reaches
    ~375 Tops ≈ 95% of the 394-TOPS int8 roofline, vs ~121 Tops for
    (256,512,256) — deep K blocks matter most (fewer accumulator
    revisits), then square-ish 512 output tiles.  VMEM at the preferred
    shape: A 1MB + B 1MB + acc 1MB (+double-buffered operands) ≈ 5MB of
    the ~16MB budget.  int8 MXU minimum tiles are (32, 128).
    """
    def fit(dim: int, pref: int, mult: int) -> int:
        if dim <= mult:
            return mult
        b = min(pref, dim)
        return max(mult, (b // mult) * mult)

    bm = fit(m, 512, 32)
    bn = fit(n, 512, 128)
    bk = fit(k, 2048, 128)
    return GemmBlocks(bm=bm, bk=bk, bn=bn)
