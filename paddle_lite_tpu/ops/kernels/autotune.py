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


def choose_kernel(graph, op) -> Optional[str]:
    """Return 'pallas' | 'xla' | None (keep default)."""
    if not op.attrs.get("enable_int8"):
        return None
    if op.op_type in _PALLAS_GEMM_OPS:
        w = graph.vars[op.input("W" if op.op_type == "fc" else "Y")]
        k, n = w.shape[-2], w.shape[-1]
        x = graph.vars[op.input("Input" if op.op_type == "fc" else "X")]
        m = int(np.prod(x.shape[:-1]))
        return "pallas" if _gemm_dims_ok(m, k, n) else "xla"
    if op.op_type in _PALLAS_CONV_OPS:
        w = graph.vars[op.input("Filter")]
        kh, kw, ic, oc = w.shape
        strides = op.attrs.get("strides", [1, 1])
        groups = int(op.attrs.get("groups", 1))
        # 1x1 stride-1 convs are pure GEMMs — the Pallas epilogue-fused
        # path; spatial convs stay on XLA's conv lowering
        if kh == kw == 1 and tuple(strides) in ((1, 1), [1, 1]) and groups == 1:
            x = graph.vars[op.input("Input")]
            m = int(np.prod(x.shape[:-1]))
            return "pallas" if _gemm_dims_ok(m, ic, oc) else "xla"
        return "xla"
    return None


@dataclasses.dataclass(frozen=True)
class GemmBlocks:
    bm: int
    bk: int
    bn: int


def gemm_blocks(m: int, k: int, n: int) -> GemmBlocks:
    """Pallas int8 GEMM block shapes.

    int8 MXU tiles want (32, 128) minimum; we aim for blocks that keep
    A/B/accumulator comfortably under the ~16MB VMEM budget while giving the
    MXU deep K to stream.
    """
    def fit(dim: int, pref: int, mult: int) -> int:
        if dim <= mult:
            return mult
        b = min(pref, dim)
        return max(mult, (b // mult) * mult)

    bm = fit(m, 256, 32)
    bn = fit(n, 256, 128)
    bk = fit(k, 512, 128)
    return GemmBlocks(bm=bm, bk=bk, bn=bn)
