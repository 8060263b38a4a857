"""AOT program export — the serialized-executable half of the ``.nb`` story.

The reference's ``.nb`` stored the *optimized program description* (ours:
``formats/artifact.py``) and its ``gen_code`` path compiled a model into
C++ source ahead of time (``lite/gen_code/``).  The TPU-native analog of
both is a serialized StableHLO export of the jitted model
(``jax.export``): load it and run with zero re-tracing/re-optimizing —
graph rebuild, pass pipeline, and XLA fusion all happen offline.

The export is portable across processes and jax minor versions
(StableHLO compatibility guarantees); device-specific compilation still
happens at load, cached by XLA's compilation cache.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np
from jax import export as jax_export

from ..core.executor import build_callable, stage_weights
from ..core.ir import Graph


def export_compiled(graph: Graph, *, platform: str = None) -> bytes:
    """Serialize the jitted model (weights baked in as constants) to a
    StableHLO blob whose call signature is ``f(inputs_dict) -> outputs``."""
    weights = stage_weights(graph)
    fn = build_callable(graph, platform=platform)

    def model(inputs: Dict[str, jax.Array]):
        return fn(weights, inputs)

    input_spec = {
        name: jax.ShapeDtypeStruct(
            graph.vars[name].shape, graph.vars[name].precision.np_dtype)
        for name in graph.inputs
    }
    exported = jax_export.export(jax.jit(model))(input_spec)
    return exported.serialize()


def load_compiled(blob: bytes):
    """Returns ``run(inputs_dict) -> outputs_dict`` from an exported blob."""
    exported = jax_export.deserialize(blob)

    def run(inputs: Dict[str, np.ndarray]):
        return exported.call(inputs)

    return run


def save_compiled(graph: Graph, path: str, **kw) -> None:
    with open(path, "wb") as f:
        f.write(export_compiled(graph, **kw))


def load_compiled_file(path: str):
    with open(path, "rb") as f:
        return load_compiled(f.read())
