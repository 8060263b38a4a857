"""Predictor — the user-facing inference API.

Analog of the reference's ``lite/api`` predictors:

- :class:`Predictor` ≈ ``CxxPaddleApiImpl`` (full path: build from a model
  graph, run the optimizer/quantizer, then execute), constructed via
  :func:`create_predictor` ≈ ``CreatePaddlePredictor<CxxConfig>``.
- :meth:`Predictor.save` + :func:`load_predictor` ≈ the ``opt`` tool's
  ``SaveOptimizedModel`` → ``.nb`` → ``LightPredictor`` path: the saved
  artifact contains the optimized graph + packed int8 weights and loads
  without re-running the optimizer or calibration.

Unlike the reference's handle-based ``GetInput(i)/Run()/GetOutput(i)`` tensor
API (a C++ necessity), the TPU-native API is functional: ``run(inputs) ->
outputs`` on name-keyed dicts of arrays, jit-compiled on first call per
input signature.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from ..core.executor import build_callable, stage_weights
from ..core.ir import Graph
from ..core.types import Precision


@dataclasses.dataclass
class PredictorConfig:
    """CxxConfig/MobileConfig analog."""

    validate_inputs: bool = True
    donate_inputs: bool = False
    platform: Optional[str] = None  # None => jax.default_backend()


class Predictor:
    def __init__(self, graph: Graph, config: Optional[PredictorConfig] = None):
        self.graph = graph
        self.config = config or PredictorConfig()
        self._fn = jax.jit(
            build_callable(graph, platform=self.config.platform)
        )
        self._weights = stage_weights(graph)
        self._weights_on_device: Optional[Dict[str, Any]] = None

    # ---- introspection (GetInputNames/GetOutputNames analog) -------------
    @property
    def input_names(self):
        return list(self.graph.inputs)

    @property
    def output_names(self):
        return list(self.graph.outputs)

    def input_shape(self, name: str):
        return self.graph.vars[name].shape

    # ---- execution -------------------------------------------------------
    def _validate(self, inputs: Dict[str, Any]) -> None:
        for name in self.graph.inputs:
            if name not in inputs:
                raise ValueError(
                    f"missing input {name!r}; expected inputs: {self.input_names}"
                )
            got = tuple(np.shape(inputs[name]))
            want = self.graph.vars[name].shape
            if got != want:
                raise ValueError(
                    f"input {name!r} has shape {got}, expected {want}"
                )
        extra = set(inputs) - set(self.graph.inputs)
        if extra:
            raise ValueError(f"unexpected inputs: {sorted(extra)}")

    def run(self, inputs: Dict[str, Any]) -> Dict[str, Any]:
        if self.config.validate_inputs:
            self._validate(inputs)
        if self._weights_on_device is None:
            # stage weights to device once (LightPredictor's PrepareForRun
            # weight-repack analog)
            self._weights_on_device = jax.device_put(self._weights)
        return self._fn(self._weights_on_device, inputs)

    def __call__(self, inputs: Dict[str, Any]) -> Dict[str, Any]:
        return self.run(inputs)

    def clone(self, config: Optional[PredictorConfig] = None) -> "Predictor":
        """Weight-sharing clone — the reference's multi-threaded serving
        pattern (``LightPredictor`` clones sharing one scope; one predictor
        per thread, weights read-only). The clone shares the staged device
        weights AND the compiled executable (jit cache keys on the traced
        function identity), so a clone costs no HBM and no recompile; only
        the config (e.g. validation) may differ."""
        if self._weights_on_device is None:
            self._weights_on_device = jax.device_put(self._weights)
        c = Predictor.__new__(Predictor)
        c.graph = self.graph
        c.config = config or self.config
        c._fn = self._fn
        c._weights = self._weights
        c._weights_on_device = self._weights_on_device
        return c

    # ---- save/load -------------------------------------------------------
    def save(self, path: str) -> None:
        from ..formats import artifact

        artifact.save(self.graph, path)


def create_predictor(
    graph: Graph,
    *,
    quant=None,
    calib_batches: Optional[Iterable[Dict[str, np.ndarray]]] = None,
    config: Optional[PredictorConfig] = None,
    optimize: bool = True,
) -> Predictor:
    """Full-path constructor: optimize (+quantize) then wrap in a Predictor."""
    if optimize:
        from ..tools.opt import optimize as _optimize

        _optimize(graph, quant=quant, calib_batches=calib_batches)
    return Predictor(graph, config)


def load_predictor(path: str, config: Optional[PredictorConfig] = None) -> Predictor:
    """Light-path constructor: load a saved artifact (no optimizer run)."""
    from ..formats import artifact

    return Predictor(artifact.load(path), config)
