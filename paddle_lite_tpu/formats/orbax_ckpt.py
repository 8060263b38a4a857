"""Orbax checkpoint backend — ecosystem-standard alternative to the native
``.pnb`` artifact (SURVEY §5.4: "orbax for packed int8 checkpoints —
weights + per-channel scales + calib record").

The native nbf artifact (formats/artifact.py) is the deployment format (one
mmap-able CRC-checked file, C-ABI loader); this Orbax backend targets
JAX-ecosystem interop: the weight pytree (int8 tensors + scales) is saved
via ``orbax.checkpoint`` so standard JAX tooling can read it, with the graph
meta stored alongside as JSON.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

from ..core.ir import Graph
from .artifact import graph_from_meta, graph_to_meta


def save(graph: Graph, path: str) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    meta = graph_to_meta(graph)
    with open(os.path.join(path, "graph.json"), "w") as f:
        json.dump(meta, f)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, "weights"),
              {k: np.asarray(v) for k, v in graph.weights.items()},
              force=True)


def load(path: str) -> Graph:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "graph.json")) as f:
        meta = json.load(f)
    g = graph_from_meta(meta)
    ckpt = ocp.PyTreeCheckpointer()
    weights = ckpt.restore(os.path.join(path, "weights"))
    g.weights = {k: np.asarray(v) for k, v in weights.items()}
    g.rebuild_links()
    return g
