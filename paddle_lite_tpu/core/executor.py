"""Executor — traces an optimized Graph into ONE jittable JAX function.

Re-design of ``lite/core/program.{h,cc}`` (``RuntimeProgram::Run``'s
per-``Instruction`` interpreter loop).  On TPU the idiomatic equivalent of
"loop over instructions, launch kernels" is to *trace the whole graph once*
into a single function and hand it to ``jax.jit``: XLA then owns kernel
fusion, scheduling, and buffer reuse (subsuming the reference's
``memory_optimize_pass`` and per-backend sync logic).  The per-op Python loop
below runs only at trace time, not per inference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from .ir import Graph, OpNode
from .registry import OPS


@dataclasses.dataclass
class ExecutionContext:
    """Per-trace context handed to every op impl.

    The reference's ``KernelContext``/``ARMContext`` carried thread counts and
    scratch workspaces (lite/core/context.h); the TPU analog carries platform
    identity (drives pallas-vs-interpret), the autotune table for Pallas block
    shapes (the "power mode" analog), and the graph for quant metadata lookup.
    """

    graph: Graph
    platform: str = "tpu"  # jax.default_backend() at trace time
    interpret: bool = False  # force Pallas interpreter mode (CPU tests)
    autotune: Optional[Dict[str, Any]] = None

    def var_quant(self, name: str):
        return self.graph.vars[name].quant

    def var_shape(self, name: str):
        return self.graph.vars[name].shape


def _resolve_inputs(op: OpNode, env: Dict[str, Any]) -> Dict[str, List[Any]]:
    return {
        slot: [env[n] for n in names]
        for slot, names in op.inputs.items()
        if names
    }


def build_callable(
    graph: Graph,
    *,
    platform: Optional[str] = None,
    interpret: Optional[bool] = None,
    capture: Optional[Callable[[str, Any], None]] = None,
) -> Callable[[Dict[str, Any], Dict[str, Any]], Dict[str, Any]]:
    """Return ``fn(weights, inputs) -> outputs`` ready for ``jax.jit``.

    ``weights``/``inputs``/``outputs`` are name-keyed dicts of arrays.
    ``capture`` (if given) is called with every intermediate (name, value) at
    trace time — the hook used by the calibration runner and the per-layer
    precision profiler (``lite/core/profile/precision_profiler.h`` analog).
    """
    order = graph.topological_order()
    plat = platform or jax.default_backend()
    interp = (plat != "tpu") if interpret is None else interpret
    ctx = ExecutionContext(graph=graph, platform=plat, interpret=interp)

    def run(weights: Dict[str, Any], inputs: Dict[str, Any]) -> Dict[str, Any]:
        env: Dict[str, Any] = {}
        env.update(weights)
        for name in graph.inputs:
            env[name] = inputs[name]
            if capture is not None:
                capture(name, env[name])
        for op in order:
            impl = OPS.get(op.op_type).impl_for(op.attrs.get("kernel"))
            outs = impl(ctx, op, _resolve_inputs(op, env))
            for slot, arrs in outs.items():
                for n, a in zip(op.outputs.get(slot, []), arrs):
                    env[n] = a
                    if capture is not None:
                        capture(n, a)
        return {n: env[n] for n in graph.outputs}

    return run


def stage_weights(graph: Graph) -> Dict[str, Any]:
    """Weights as a jit-ready pytree (host numpy; jit stages to device)."""
    return {k: np.asarray(v) for k, v in graph.weights.items()}


def compile_graph(
    graph: Graph,
    *,
    donate_inputs: bool = False,
    platform: Optional[str] = None,
):
    """``jax.jit`` the traced graph. Returns (jitted_fn, weights).

    This is the ``GenRuntimeProgram`` + first-``Run`` analog; AOT
    serialization of the compiled executable (the ``.nb`` analog) lives in
    ``paddle_lite_tpu.formats.artifact``.
    """
    fn = build_callable(graph, platform=platform)
    weights = stage_weights(graph)
    jitted = jax.jit(fn)
    return jitted, weights
