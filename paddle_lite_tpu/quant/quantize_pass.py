"""Quantization graph passes.

Together these are the TPU-native re-design of the reference's quantization
machinery in the MIR pipeline:

- :func:`apply_quantization` — the core rewrite shared by PTQ and QAT-import:
  per-channel int8 weights + per-tensor activation scales stamped onto graph
  vars, ops marked ``enable_int8`` (mirrors ``quant_dequant_fuse_pass``
  stamping ``input_scale``/``weight_scale``/``enable_int8`` onto conv/fc/mul)
  and int8 regions assigned (which edges carry int8 tensors, which op outputs
  get a fused requant — the role of ``static_kernel_pick_pass`` +
  ``variable_place_inference_pass`` choosing int8-out vs fp-out kernel
  aliases).
- ``precision_cast`` pass — inserts explicit ``quantize`` nodes where an fp32
  edge feeds an int8 kernel (``type_precision_cast_pass`` inserting `calib`
  ops).  Dequant never needs an inserted node: every op impl inline-dequants
  int8 operands, which XLA folds into the consumer.
- ``quant_dequant_fuse`` pass — consumes imported QAT graphs containing
  ``fake_quantize_*`` / ``fake_dequantize_*`` ops, deletes the fake ops and
  reuses :func:`apply_quantization` with their recorded scales.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Set

import numpy as np

from ..core.ir import Graph, OpNode
from ..core.pass_manager import register_pass
from ..core.types import CalibMethod, Precision, QuantInfo
from .calibrate import CalibrationResult, PASSTHROUGH_OPS, QUANTIZABLE_OPS


@dataclasses.dataclass
class QuantConfig:
    """Quantization scheme config (QuantConfig analog of CxxConfig's quant
    options + PaddleSlim's strategy knobs)."""

    method: CalibMethod = CalibMethod.ABS_MAX
    per_channel_weights: bool = True
    # Attention QK/PV (activation x activation) matmuls: int8 needs BOTH
    # operands quantized at runtime (two extra HBM passes) and the K=head_dim
    # contractions are too small to amortize them — measured 14% slower on
    # ERNIE-tiny (TPU v5e: 12.9k vs 15.0k seqs/s). Off by default; weight
    # GEMMs stay int8 (matches reference-era quantized-ERNIE deployments).
    quant_act_act_matmul: bool = False
    # Depthwise convs are VPU-bound (no MXU help); the VPU has no int8 MAC,
    # so int8 depthwise lowers to int32 multiplies that can run BELOW fp32
    # throughput. True keeps them int8 (saves HBM traffic in dw-heavy
    # MobileNets); set False for large-spatial dw trunks if measured slower.
    quant_depthwise: bool = True
    # dtype for the non-int8 float regions ("float32" | "bfloat16"): bf16
    # halves fp-island HBM traffic (softmax/layer_norm/SE/detection heads);
    # island internals that need fp32 (LN stats, softmax, quant rounding,
    # matmul accumulation) stay fp32. The reference has no analog — mobile
    # CPUs had no fast 16-bit float path at its vintage; on TPU bf16 is the
    # native fp format.
    island_dtype: str = "float32"
    skip_ops: Sequence[str] = ()  # op output-var names to keep fp32
    observer_kwargs: Optional[dict] = None
    bins: int = 2048
    # E[(W - W_q)·x] bias compensation. Helps when weight residuals are
    # systematic (per-TENSOR weights, sub-8-bit); measured neutral-to-noisy
    # with per-channel int8 weights, hence default off.
    bias_correction: bool = False


_WEIGHT_AXIS = {  # per-channel axis = output-channel axis of the weight
    "conv2d": 3,  # HWIO
    "depthwise_conv2d": 3,
    "fc": 1,  # (K, O)
    "mul": 1,
    "matmul": -1,
}

_DATA_SLOTS = {
    "conv2d": ("Input",),
    "depthwise_conv2d": ("Input",),
    "fc": ("Input",),
    "mul": ("X",),
    "matmul": ("X", "Y"),
    "fused_dw_pw": ("Input",),
}

_WEIGHT_SLOTS = {
    "conv2d": "Filter",
    "depthwise_conv2d": "Filter",
    "fc": "W",
    "mul": "Y",
    "matmul": "Y",
}


def quantize_weight_per_channel(w: np.ndarray, axis: int):
    """Symmetric per-channel int8: returns (q, scale) with
    scale[c] = absmax_c / 127 and q = clip(round(w / scale)).

    The arm math analog pre-packed weights for the sdot microkernel
    (``gemm_prepacked_int8.cc`` prepack); on TPU "packing" is just the dtype —
    Mosaic/XLA handle MXU tiling."""
    axis = axis % w.ndim
    red = tuple(i for i in range(w.ndim) if i != axis)
    amax = np.maximum(np.abs(w).max(axis=red), 1e-10).astype(np.float32)
    scale = amax / 127.0
    shape = [1] * w.ndim
    shape[axis] = -1
    q = np.clip(np.round(w / scale.reshape(shape)), -127, 127).astype(np.int8)
    return q, scale


def quantize_weight_per_tensor(w: np.ndarray):
    amax = np.float32(max(np.abs(w).max(), 1e-10))
    q = np.clip(np.round(w / amax * 127.0), -127, 127).astype(np.int8)
    return q, amax / 127.0


def _is_quantizable(graph: Graph, op: OpNode, config: QuantConfig) -> bool:
    if op.op_type not in QUANTIZABLE_OPS:
        return False
    if op.op_type == "depthwise_conv2d" and not config.quant_depthwise:
        return False
    if any(n in config.skip_ops for n in op.output_names()):
        return False
    w_slot = _WEIGHT_SLOTS[op.op_type]
    w_name = op.maybe_input(w_slot)
    if w_name is None:
        return False
    if graph.vars[w_name].is_weight:
        return True
    # activation×activation matmul (attention scores / context)
    return op.op_type == "matmul" and config.quant_act_act_matmul


def apply_quantization(
    graph: Graph,
    act_scales: Dict[str, float],
    config: Optional[QuantConfig] = None,
    weight_scales: Dict[str, np.ndarray] = None,
) -> None:
    """Core quantization rewrite. ``act_scales`` come from calibration (PTQ)
    or from imported fake-quant ops (QAT, via ``weight_scales`` too)."""
    config = config or QuantConfig()
    weight_scales = weight_scales or {}

    int8_ops: List[OpNode] = []
    for op in graph.ops:
        if not _is_quantizable(graph, op, config):
            continue
        # ---- weights -> per-channel int8 -------------------------------
        w_name = op.input(_WEIGHT_SLOTS[op.op_type])
        w_var = graph.vars[w_name]
        if w_var.is_weight and w_var.precision != Precision.INT8:
            w = graph.weights[w_name]
            axis = _WEIGHT_AXIS[op.op_type] % w.ndim
            if w_name in weight_scales:
                scales = np.asarray(weight_scales[w_name], np.float32) / 127.0
                shape = [1] * w.ndim
                shape[axis] = -1
                q = np.clip(np.round(w / scales.reshape(shape)), -127, 127).astype(np.int8)
            elif config.per_channel_weights:
                q, scales = quantize_weight_per_channel(w, axis)
            else:
                q, s = quantize_weight_per_tensor(w)
                scales = np.array([s] * w.shape[axis], np.float32)
            graph.weights[w_name] = q
            w_var.ttype = dataclasses.replace(w_var.ttype, precision=Precision.INT8)
            w_var.quant = QuantInfo.per_channel_scales(scales, axis)
        # ---- activation scales on adjacent vars ------------------------
        missing = False
        for slot in _DATA_SLOTS[op.op_type]:
            n = op.maybe_input(slot)
            if n is None or graph.vars[n].is_weight:
                continue
            if n not in act_scales:
                missing = True
                continue
            if graph.vars[n].quant is None:
                graph.vars[n].quant = QuantInfo.per_tensor(act_scales[n])
        if missing:
            continue  # cannot run this op in int8 without an input scale
        for n in op.output_names():
            if n in act_scales and graph.vars[n].quant is None:
                graph.vars[n].quant = QuantInfo.per_tensor(act_scales[n])
        op.attrs["enable_int8"] = True
        int8_ops.append(op)

    _assign_int8_regions(graph, act_scales)


def _gate_mul_data_slot(graph: Graph, op: OpNode):
    """If `op` is an SE-style gated multiply — elementwise_mul whose one
    operand is a [0, 1] gate (sigmoid / hard_sigmoid output, possibly fused
    into a conv epilogue) — return the DATA operand's slot, else None.
    A gate <= 1 means |x*g| <= |x|, so the data operand's int8 scale remains
    valid through the multiply and the whole op fuses into one elementwise
    kernel (int8 in -> int8 out, no fp32 HBM round trip)."""
    if op.op_type != "elementwise_mul":
        return None

    def is_gate(name):
        d = graph.vars[name].def_op
        if d is None:
            return False
        if d.op_type in ("sigmoid", "hard_sigmoid"):
            return True
        return d.attrs.get("fuse_act") in ("sigmoid", "hard_sigmoid")

    x, y = op.input("X"), op.input("Y")
    if is_gate(y) and not is_gate(x):
        return "X"
    if is_gate(x) and not is_gate(y):
        return "Y"
    return None


def _consumers_accept_int8(graph: Graph, var_name: str, memo: dict) -> bool:
    """True iff every consumer of `var_name` consumes int8 natively: an
    enable_int8 op's data slot, a passthrough op whose own output is
    int8-consumable downstream, or a gated multiply's data operand.
    Graph outputs must stay fp32."""
    if var_name in memo:
        return memo[var_name]
    memo[var_name] = False  # cycle guard
    if var_name in graph.outputs:
        return False
    v = graph.vars[var_name]
    if not v.use_ops:
        return False
    for op in v.use_ops:
        if op.attrs.get("enable_int8"):
            slots = _DATA_SLOTS.get(op.op_type, ())
            in_data = any(op.maybe_input(s) == var_name for s in slots)
            is_residual = op.maybe_input("ResidualData") == var_name
            if not (in_data or is_residual):
                # bias operands want fp32
                return False
            # residual operands are fine as int8: the conv epilogue
            # inline-dequantizes them (XLA fuses it), and int8 shortcut
            # edges carry 4x less HBM traffic through a ResNet stage
        elif op.op_type in PASSTHROUGH_OPS:
            ok = all(
                _consumers_accept_int8(graph, out, memo)
                for out in op.output_names()
            )
            if not ok:
                return False
        elif _gate_mul_data_slot(graph, op) is not None:
            # int8 acceptable only on the data operand (the eltwise impl
            # dequantizes in-register); the gate operand must stay fp
            if op.input(_gate_mul_data_slot(graph, op)) != var_name:
                return False
        else:
            return False
    memo[var_name] = True
    return True


def _assign_int8_regions(graph: Graph, act_scales: Dict[str, float]) -> None:
    """Decide which edges carry int8 tensors.

    An enable_int8 op's output becomes int8 (fused requant: ``out_scale``
    stamped on the op) iff all transitive consumers accept int8; passthrough
    ops then propagate precision AND scale (pool/reshape preserve scale
    exactly) along the chain.
    """
    memo: dict = {}
    for op in graph.topological_order():
        if op.attrs.get("enable_int8"):
            out_name = op.output_names()[0]
            if out_name in act_scales and _consumers_accept_int8(graph, out_name, memo):
                out_var = graph.vars[out_name]
                op.attrs["out_scale"] = float(act_scales[out_name])
                out_var.quant = QuantInfo.per_tensor(act_scales[out_name])
                out_var.ttype = dataclasses.replace(
                    out_var.ttype, precision=Precision.INT8
                )
        elif op.op_type in PASSTHROUGH_OPS:
            in_name = op.input_names()[0]
            in_var = graph.vars[in_name]
            if in_var.precision == Precision.INT8 and not in_var.is_weight:
                for out_name in op.output_names():
                    out_var = graph.vars[out_name]
                    out_var.quant = in_var.quant  # scale-preserving
                    out_var.ttype = dataclasses.replace(
                        out_var.ttype, precision=Precision.INT8
                    )
        elif (slot := _gate_mul_data_slot(graph, op)) is not None:
            # SE gated multiply: int8 data in -> int8 out (one fused kernel)
            in_var = graph.vars[op.input(slot)]
            out_name = op.output_names()[0]
            if (in_var.precision == Precision.INT8
                    and in_var.quant is not None
                    and _consumers_accept_int8(graph, out_name, memo)):
                # prefer the calibrated post-gate scale (gating shrinks the
                # range -> finer quanta); fall back to the input's scale,
                # which stays valid because the gate is <= 1
                scale = float(act_scales.get(out_name,
                                             in_var.quant.scale[0]))
                op.attrs["out_scale"] = scale
                out_var = graph.vars[out_name]
                out_var.quant = QuantInfo.per_tensor(scale)
                out_var.ttype = dataclasses.replace(
                    out_var.ttype, precision=Precision.INT8
                )


@register_pass("precision_cast")
def precision_cast(graph: Graph) -> None:
    """Insert explicit ``quantize`` nodes on fp32→int8-kernel edges
    (type_precision_cast_pass inserting calib ops).  One cast per source var
    is shared by all consumers (`calib_once` behavior)."""
    quantized_of: Dict[str, str] = {}
    for op in list(graph.ops):
        if not op.attrs.get("enable_int8"):
            continue
        for slot in _DATA_SLOTS.get(op.op_type, ()):
            n = op.maybe_input(slot)
            if n is None:
                continue
            v = graph.vars[n]
            if v.is_weight or v.precision == Precision.INT8:
                continue
            if v.quant is None:
                continue  # no scale recorded; op impl will stay fp32 for it
            if n not in quantized_of:
                qname = graph.unique_name(n + ".q8")
                qv = graph.add_var(qname, v.shape, precision=Precision.INT8)
                qv.quant = v.quant
                graph.add_op("quantize", {"X": [n]}, {"Out": [qname]})
                quantized_of[n] = qname
            op.inputs[slot] = [quantized_of[n]]
    graph.rebuild_links()


@register_pass("quant_dequant_fuse")
def quant_dequant_fuse(graph: Graph) -> None:
    """Consume imported QAT graphs: delete ``fake_quantize_*`` /
    ``fake_dequantize_*`` ops, collect their scales, then apply the shared
    quantization rewrite (quant_dequant_fuse_pass + quant_dequant_op_fuser).
    """
    FAKE_Q = (
        "fake_quantize_abs_max",
        "fake_quantize_range_abs_max",
        "fake_quantize_moving_average_abs_max",
        "fake_quantize_dequantize_moving_average_abs_max",
    )
    FAKE_DQ = ("fake_dequantize_max_abs", "fake_channel_wise_dequantize_max_abs")

    act_scales: Dict[str, float] = {}
    weight_scales: Dict[str, np.ndarray] = {}
    dead: List[OpNode] = []

    for op in list(graph.ops):
        if op.op_type in FAKE_Q:
            x = op.input("X")
            out = op.output("Out")
            # scale recorded as attr or as an InScale weight (range variant)
            if "scale" in op.attrs:
                s = float(op.attrs["scale"]) / 127.0
            elif op.maybe_input("InScale"):
                s = float(np.asarray(graph.weights[op.input("InScale")]).reshape(-1)[0]) / 127.0
            else:
                s = None
            v = graph.vars[x]
            if v.is_weight:
                weight_scales[x] = np.asarray([s * 127.0]) if s else None
            elif s is not None:
                act_scales[x] = s
                act_scales[out] = s
            dead.append(op)
            graph.replace_var_uses(out, x)
        elif op.op_type in FAKE_DQ:
            x = op.input("X")
            out = op.output("Out")
            if op.maybe_input("Scales"):
                sc = np.asarray(graph.weights[op.input("Scales")], np.float32)
                producer = graph.vars[x].def_op
                if producer is not None:
                    w_slot = _WEIGHT_SLOTS.get(producer.op_type)
                    if w_slot and producer.maybe_input(w_slot):
                        weight_scales[producer.input(w_slot)] = sc.reshape(-1)
            if "max_range" in op.attrs:
                producer = graph.vars[x].def_op
                if producer is not None:
                    w_slot = _WEIGHT_SLOTS.get(producer.op_type)
                    if w_slot and producer.maybe_input(w_slot):
                        w = graph.weights[producer.input(w_slot)]
                        amax = 127.0 * 127.0 / float(op.attrs["max_range"])
                        weight_scales[producer.input(w_slot)] = np.asarray(
                            [amax] * w.shape[_WEIGHT_AXIS[producer.op_type] % w.ndim]
                        )
            dead.append(op)
            graph.replace_var_uses(out, x)

    if dead:
        graph.remove_ops(dead)
        weight_scales = {k: v for k, v in weight_scales.items() if v is not None}
        apply_quantization(graph, act_scales, weight_scales=weight_scales)


def ptq_quantize(
    graph: Graph,
    calib: CalibrationResult,
    config: Optional[QuantConfig] = None,
) -> None:
    """PTQ entry: apply quantization with calibrated activation scales."""
    apply_quantization(graph, calib.scales, config=config)
