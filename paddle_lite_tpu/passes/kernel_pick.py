"""Kernel-pick pass — analog of ``lite/core/mir/static_kernel_pick_pass.cc``.

The reference scored every registered (target, precision, layout) kernel per
op against the user's ordered ``valid_places``.  Here the choice collapses to
"Pallas hand kernel vs XLA lowering" per op, driven by a static suitability
check plus the autotune table (``ops/kernels/autotune.py`` — the analog of
the reference's per-SoC tuning in ``DeviceInfo``): Pallas is picked for int8
matmul-shaped work (1x1 convs, fc, matmul) where the fused
dequant+bias+act+requant epilogue beats XLA's generic int8 lowering; XLA
keeps everything else (it is already near-roofline for dense fp32/bf16 conv).
"""

from __future__ import annotations

from ..core.ir import Graph
from ..core.pass_manager import register_pass


@register_pass("kernel_pick")
def kernel_pick(graph: Graph) -> None:
    from ..ops.kernels import autotune

    for op in graph.ops:
        choice = autotune.choose_kernel(graph, op)
        if choice:
            op.attrs["kernel"] = choice
