"""PTQ calibration runner.

The TPU-native analog of the role PaddleSlim's post-training calibration
played upstream of the reference (whose ``quant_dequant_fuse_pass`` only
*consumed* precomputed scales).  We run the fp32 graph over calibration
batches with a capture hook (``core.executor.build_callable(capture=...)``),
but instead of materializing activations on the host, a jitted "stats
program" reduces every tensor of interest to a scalar abs-max (and, for
percentile/KL methods, a fixed-bin histogram) on device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.executor import build_callable, stage_weights
from ..core.ir import Graph
from ..core.types import CalibMethod
from .observers import Observer, make_observer

# ops whose int8 kernels need calibrated input/output activation scales
QUANTIZABLE_OPS = ("conv2d", "depthwise_conv2d", "fc", "mul", "matmul")
# shape-preserving ops an int8 tensor flows through unchanged (same scale)
TRANSPARENT_OPS = (
    "reshape", "reshape2", "flatten", "flatten2", "squeeze", "squeeze2",
    "unsqueeze", "unsqueeze2", "transpose", "transpose2",
    "split",  # slices share the input's scale (QKV-fused GEMM outputs)
)
# pool2d is int8-in/int8-out with the same scale (max exactly; avg rounds);
# nearest_interp copies values exactly (pure data movement — bilinear does
# NOT qualify: its blend weights change values)
PASSTHROUGH_OPS = TRANSPARENT_OPS + ("pool2d", "nearest_interp",
                                     "nearest_interp_v2")


def vars_needing_scales(graph: Graph) -> List[str]:
    """Activation vars adjacent to quantizable ops (inputs AND outputs —
    outputs need scales for the fused requant epilogue), plus vars feeding
    transparent/pool chains into them."""
    names: set = set()
    for op in graph.ops:
        if op.op_type in QUANTIZABLE_OPS:
            for slot in ("Input", "X", "Y", "W"):
                for n in op.inputs.get(slot, []):
                    if not graph.vars[n].is_weight:
                        names.add(n)
            for n in op.output_names():
                names.add(n)
        if op.op_type in PASSTHROUGH_OPS:
            for n in op.input_names() + op.output_names():
                if not graph.vars[n].is_weight:
                    names.add(n)
    return sorted(names)


def _stats_fn(graph: Graph, watch: Sequence[str],
              channel_means: bool = False):
    """Jittable: (weights, inputs) -> {name: abs_max [, channel mean]}."""
    watch_set = set(watch)

    def fn(weights, inputs):
        stats: Dict[str, jnp.ndarray] = {}

        def capture(name, val):
            if name in watch_set:
                v = val.astype(jnp.float32)
                stats[name] = jnp.max(jnp.abs(v))
                if channel_means:
                    # E[x] along the channel (last) axis — bias correction
                    stats[name + "/mean"] = jnp.mean(
                        v.reshape(-1, v.shape[-1]), axis=0)

        run = build_callable(graph, capture=capture)
        run(weights, inputs)
        return stats

    return fn


def _hist_fn(graph: Graph, watch: Sequence[str], amax: Dict[str, float], bins: int):
    watch_set = set(watch)

    def fn(weights, inputs):
        hists: Dict[str, jnp.ndarray] = {}

        def capture(name, val):
            if name in watch_set:
                a = jnp.abs(val.astype(jnp.float32)).reshape(-1)
                edges = jnp.linspace(0.0, max(amax[name], 1e-10), bins + 1)
                hists[name], _ = jnp.histogram(a, bins=edges)

        run = build_callable(graph, capture=capture)
        run(weights, inputs)
        return hists

    return fn


@dataclasses.dataclass
class CalibrationResult:
    scales: Dict[str, float]  # var name -> per-tensor activation scale
    channel_means: Dict[str, np.ndarray] = dataclasses.field(
        default_factory=dict)  # var name -> E[x] per channel (bias corr.)

    def scale(self, name: str) -> float:
        return self.scales[name]


def calibrate(
    graph: Graph,
    batches: Iterable[Dict[str, np.ndarray]],
    method: CalibMethod = CalibMethod.ABS_MAX,
    *,
    bins: int = 2048,
    observer_kwargs: Optional[dict] = None,
    collect_channel_means: bool = False,
) -> CalibrationResult:
    """Run calibration batches through the fp32 graph; return per-tensor
    activation scales for every var adjacent to a quantizable op."""
    batches = list(batches)
    if not batches:
        raise ValueError("calibration requires at least one batch")
    watch = vars_needing_scales(graph)
    weights = stage_weights(graph)
    observers: Dict[str, Observer] = {
        n: make_observer(method, **(observer_kwargs or {})) for n in watch
    }

    mean_acc: Dict[str, np.ndarray] = {}
    stats = jax.jit(_stats_fn(graph, watch,
                              channel_means=collect_channel_means))
    for batch in batches:
        out = jax.device_get(stats(weights, batch))
        for n, a in out.items():
            if n.endswith("/mean"):
                base = n[: -len("/mean")]
                prev = mean_acc.get(base)
                mean_acc[base] = a if prev is None else prev + a
            else:
                observers[n].update_absmax(float(a))
    channel_means = {n: v / len(batches) for n, v in mean_acc.items()}

    if observers[watch[0]].needs_histogram if watch else False:
        amax = {n: obs.amax for n, obs in observers.items()}
        hfn = jax.jit(_hist_fn(graph, watch, amax, bins))
        for batch in batches:
            out = jax.device_get(hfn(weights, batch))
            for n, h in out.items():
                observers[n].update_histogram(h, amax[n])

    return CalibrationResult(
        scales={n: obs.scale() for n, obs in observers.items()},
        channel_means=channel_means,
    )
