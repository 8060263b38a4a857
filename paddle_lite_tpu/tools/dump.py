"""Program dumps — graph observability (SURVEY §5.5).

Analog of the reference's ``graph_visualize_pass`` (dot dump) and
``argument_type_display_pass`` plus the ``--dump_jaxpr/--dump_hlo`` debug
surface the TPU build promises: text dump of the op graph, the traced
jaxpr, and the optimized HLO that XLA will run.
"""

from __future__ import annotations

import jax

from ..core.executor import build_callable, stage_weights
from ..core.ir import Graph


def dump_graph(graph: Graph) -> str:
    """Typed op-graph dump (graph_visualize + argument_type_display)."""
    return graph.dump()


def dump_dot(graph: Graph) -> str:
    """Graphviz dot of the op graph (graph_visualize_pass analog)."""
    lines = ["digraph G {", "  rankdir=TB;", "  node [shape=box];"]
    for op in graph.ops:
        label = op.op_type
        extras = []
        if op.attrs.get("enable_int8"):
            extras.append("int8")
        if op.attrs.get("fuse_act"):
            extras.append(op.attrs["fuse_act"])
        if extras:
            label += "\\n" + ",".join(extras)
        color = "lightblue" if op.attrs.get("enable_int8") else "white"
        lines.append(f'  op{op.id} [label="{label}", style=filled, '
                     f'fillcolor={color}];')
    for op in graph.ops:
        for n in op.input_names():
            src = graph.vars[n].def_op
            if src is not None:
                prec = graph.vars[n].precision.value
                lines.append(f'  op{src.id} -> op{op.id} [label="{prec}"];')
    lines.append("}")
    return "\n".join(lines)


def _model_fn(graph: Graph):
    fn = build_callable(graph)
    weights = stage_weights(graph)
    import numpy as np

    example = {
        name: np.zeros(graph.vars[name].shape,
                       graph.vars[name].precision.np_dtype)
        for name in graph.inputs
    }
    return (lambda inputs: fn(weights, inputs)), example


def dump_jaxpr(graph: Graph) -> str:
    fn, example = _model_fn(graph)
    return str(jax.make_jaxpr(fn)(example))


def dump_hlo(graph: Graph, *, optimized: bool = False) -> str:
    fn, example = _model_fn(graph)
    lowered = jax.jit(fn).lower(example)
    if optimized:
        return lowered.compile().as_text()
    return lowered.as_text()
