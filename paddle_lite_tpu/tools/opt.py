"""`opt` — the AOT optimize/quantize/compile flow.

Analog of the reference's ``opt`` CLI (``lite/api/model_optimize_tool.cc``):
load → run the optimization pipeline → (optionally) PTQ-calibrate + quantize
→ emit a runnable artifact.  Here the flow is a library function (used by the
Predictor and by the ``python -m paddle_lite_tpu.tools.opt`` CLI in
``cli.py``) whose output is an optimized :class:`Graph` — the serialized
`.nb`-analog artifact is produced by ``paddle_lite_tpu.formats.artifact``.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import numpy as np

from ..core.ir import Graph
from ..core.pass_manager import PassManager
from ..quant.calibrate import CalibrationResult, calibrate
from ..quant.quantize_pass import QuantConfig, ptq_quantize

FUSION_PASSES = [
    "identity_elimination",
    "quant_dequant_fuse",  # no-op unless the graph carries QAT fake ops
    # spatial-in-lanes packing of lane-starved deconv heads (DBNet). Exact
    # rewrite; before conv_bn_fuse so the tiled bn folds into the packed
    # 1x1 conv.
    "deconv_pack",
    "conv_bn_fuse",
    "conv_elementwise_fuse",
    "conv_activation_fuse",
    "fc_fuse",
    "fc_activation_fuse",
    "parallel_fc_fuse",  # QKV-style sibling-GEMM merge (after fc_fuse)
    # NOT here: "stem_space_to_depth". Measured on the v5e (b64, 224px,
    # 3ch->16ch 3x3s2 stem): s2d+conv LOSES to XLA's native stem lowering
    # in both precisions (fp32: 265us vs ~140us; int8: 313us vs 222us) —
    # XLA already handles the shallow-K stem well. The pass stays available
    # (opt-in) with tests; the int8 stem win comes from keeping the stem
    # conv float instead (quantize_pass._is_quantizable stem rule:
    # fp32 stem + quantized output measured 142us vs 222us all-int8).
]

FINALIZE_PASSES = [
    "precision_cast",
    "kernel_pick",
]


def optimize(
    graph: Graph,
    *,
    quant: Optional[QuantConfig] = None,
    calib_batches: Optional[Iterable[Dict[str, np.ndarray]]] = None,
    calib_result: Optional[CalibrationResult] = None,
    fuse_dw_pw: bool = False,
    verbose: bool = False,
) -> Graph:
    """Run the full optimization pipeline in-place and return the graph.

    With ``quant`` set, runs PTQ: fusions → calibration (fp32 graph) →
    quantize → precision-cast insertion → kernel pick.  This step ordering
    mirrors the reference's pass vector (quant/fusion passes before kernel
    picking and cast insertion, lite/core/optimizer.h).
    """
    PassManager(FUSION_PASSES).run(graph, verbose=verbose)
    if quant is not None and quant.weight_only:
        from ..quant.quantize_pass import weight_only_quantize

        weight_only_quantize(graph, bits=quant.weight_only)
        PassManager(FINALIZE_PASSES).run(graph, verbose=verbose)
        if quant.island_dtype != "float32":
            graph.meta["island_dtype"] = quant.island_dtype
        return graph
    if quant is not None:
        from ..core.types import CalibMethod

        if quant.method is CalibMethod.ENTROPY:
            # measured on both full-scale zoo models: KL picks clipped
            # ranges that hurt (worst-layer cosine 0.84 MNv1 / 0.69 R50,
            # R50 top-1 agreement 97.8% vs 99.9% abs-max — docs/ACCURACY.md).
            # Available for parity with PaddleSlim, never the default.
            import warnings

            warnings.warn(
                "CalibMethod.ENTROPY (KL) measurably degrades accuracy on "
                "the measured zoo models (docs/ACCURACY.md); abs_max is the "
                "validated default", stacklevel=2)
        if calib_result is None:
            if calib_batches is None:
                raise ValueError("PTQ needs calib_batches or calib_result")
            calib_result = calibrate(
                graph,
                calib_batches,
                method=quant.method,
                bins=quant.bins,
                observer_kwargs=quant.observer_kwargs,
                collect_channel_means=quant.bias_correction,
            )
        fp32_snapshot = (
            {k: np.array(v, copy=True) for k, v in graph.weights.items()
             if v.dtype == np.float32}
            if quant.bias_correction else None
        )
        ptq_quantize(graph, calib_result, quant)
        if quant.bias_correction:
            from ..quant.bias_correction import apply_bias_correction

            apply_bias_correction(graph, fp32_snapshot,
                                  calib_result.channel_means)
        if fuse_dw_pw or quant.fuse_dw_pw:
            # inter-op dw+pw fusion of lane-starved blocks (Pallas kernel
            # keeps the padded-layout intermediate in VMEM; measured per
            # model — see ops/fused.py and models/zoo_config.py)
            PassManager(["dw_pw_fuse"]).run(graph, verbose=verbose)
        if quant.conv1x1_dot:
            # int8 1x1 convs as in-XLA reshape+dot (ops/nn.py; measured
            # per model — docs/pw_dot_r5.json)
            for op in graph.ops:
                if (op.op_type == "conv2d" and op.attrs.get("enable_int8")
                        and graph.vars[op.input("Filter")].shape[:2]
                        == (1, 1)):
                    op.attrs["conv1x1_dot"] = True
    PassManager(FINALIZE_PASSES).run(graph, verbose=verbose)
    if quant is not None and quant.island_dtype != "float32":
        # stamped AFTER calibration so stats are collected in fp32
        graph.meta["island_dtype"] = quant.island_dtype
    return graph
