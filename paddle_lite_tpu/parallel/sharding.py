"""GSPMD sharding of inference graphs — net-new vs the reference.

The reference is a single-process, single-device engine (SURVEY.md §2.9);
scaling here is TPU-native: a ``Mesh`` with a ``data`` axis (batch / request
parallelism — the pod-level analog of the reference's "run multiple
Predictors on threads") and a ``model`` axis (tensor parallelism over conv
output channels / fc output features).  We annotate *weights and inputs*
with ``NamedSharding`` and let XLA's GSPMD partitioner propagate shardings
and insert all-gather/reduce-scatter collectives over ICI — the idiomatic
replacement for hand-written NCCL calls the reference never had.

Sharding rules (weight-stationary TP, channel-major):
- conv2d filter HWIO           → P(None, None, None, 'model')   (shard O)
- depthwise filter             → replicated (channel-local compute; XLA
  splits the feature dim via the propagated activation sharding instead)
- fc / mul weight (K, O)       → P(None, 'model')
- per-output-channel vectors (bias, bn) → P('model')
- activations NHWC             → P('data', None, None, 'model') propagated
- batch inputs                 → P('data', ...)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.ir import Graph


@dataclasses.dataclass
class MeshConfig:
    """Mesh axes for inference serving (MeshConfig per SURVEY §5.6)."""

    data: int = 1
    model: int = 1

    def build(self, devices=None) -> Mesh:
        devices = devices if devices is not None else jax.devices()
        n = self.data * self.model
        if len(devices) < n:
            raise ValueError(
                f"mesh {self.data}x{self.model} needs {n} devices, "
                f"have {len(devices)}"
            )
        arr = np.asarray(devices[:n]).reshape(self.data, self.model)
        return Mesh(arr, ("data", "model"))


def _divisible(dim: int, parts: int) -> bool:
    return parts > 0 and dim % parts == 0


def weight_pspec(graph: Graph, name: str, mesh: Mesh) -> P:
    """PartitionSpec for one weight under channel-major TP."""
    model_parts = mesh.shape.get("model", 1)
    if model_parts == 1:
        return P()
    v = graph.vars[name]
    consumers = v.use_ops
    for op in consumers:
        t = op.op_type
        if t == "conv2d" and op.maybe_input("Filter") == name:
            if int(op.attrs.get("groups", 1)) == 1 and _divisible(v.shape[3], model_parts):
                return P(None, None, None, "model")
        elif t in ("fc", "mul") and name in (
            op.maybe_input("W"), op.maybe_input("Y")
        ):
            if len(v.shape) == 2 and _divisible(v.shape[1], model_parts):
                return P(None, "model")
        elif t in ("conv2d", "depthwise_conv2d", "fc") and name == op.maybe_input("Bias"):
            if _divisible(v.shape[-1], model_parts):
                return P("model")
    return P()


def input_pspec(graph: Graph, name: str, mesh: Mesh) -> P:
    data_parts = mesh.shape.get("data", 1)
    v = graph.vars[name]
    if data_parts > 1 and v.shape and _divisible(v.shape[0], data_parts):
        return P(*(["data"] + [None] * (len(v.shape) - 1)))
    return P()


def shard_weights(graph: Graph, weights: Dict[str, np.ndarray], mesh: Mesh):
    """device_put every weight with its TP sharding."""
    out = {}
    for name, w in weights.items():
        spec = weight_pspec(graph, name, mesh)
        out[name] = jax.device_put(w, NamedSharding(mesh, spec))
    return out


def shard_inputs(graph: Graph, inputs: Dict[str, np.ndarray], mesh: Mesh):
    out = {}
    for name, x in inputs.items():
        spec = input_pspec(graph, name, mesh)
        out[name] = jax.device_put(x, NamedSharding(mesh, spec))
    return out


class ShardedPredictor:
    """Multi-device predictor: DP batch axis × TP channel axis.

    Int8 fc / mul / 1×1-conv ops run the fused Pallas GEMM *per shard*
    under ``shard_map`` (``parallel/tp_ops.assign_tp_kernels`` retags them
    to the "tp_pallas" kernel; column-parallel layout → zero collectives in
    the GEMM itself).  Every other op goes through the XLA lowerings, where
    the GSPMD partitioner propagates shardings and inserts collectives —
    plain single-device pallas picks are stripped because the partitioner
    cannot see inside a pallas_call.
    """

    def __init__(self, graph: Graph, mesh_config: MeshConfig,
                 devices=None, use_tp_pallas: bool = True):
        from ..core.executor import build_callable, stage_weights
        from .tp_ops import assign_tp_kernels

        self.graph = graph
        self.mesh = mesh_config.build(devices)
        if use_tp_pallas:
            self.n_tp_ops = assign_tp_kernels(graph, self.mesh)
        else:
            self.n_tp_ops = 0
            for op in graph.ops:
                if op.attrs.get("kernel") == "pallas":
                    op.attrs["kernel"] = "xla"
        self._fn = jax.jit(build_callable(
            graph,
            platform="tpu" if jax.default_backend() == "tpu" else None,
            mesh=self.mesh))
        self._weights = shard_weights(graph, stage_weights(graph), self.mesh)

    def run(self, inputs):
        sharded = shard_inputs(self.graph, inputs, self.mesh)
        return self._fn(self._weights, sharded)
