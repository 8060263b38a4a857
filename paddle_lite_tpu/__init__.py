"""paddle_lite_tpu — a TPU-native quantized inference engine.

A from-scratch re-design of Paddle-Lite's capabilities (single-device int8
edge inference engine, reference: chenjiaoAngel/Paddle-Lite) for TPU:
JAX/XLA is the compiler and runtime, Pallas provides the hand kernels the
reference wrote in NEON assembly, and GSPMD sharding + a continuous batcher
extend it beyond the reference's single-device scope.

Layer map (reference → here):
  lite/api (predictors)      → paddle_lite_tpu.runtime.predictor
  lite/core (IR, registry)   → paddle_lite_tpu.core
  lite/core/mir (passes)     → paddle_lite_tpu.passes + paddle_lite_tpu.quant
  lite/operators + kernels   → paddle_lite_tpu.ops
  lite/backends/arm/math     → paddle_lite_tpu.ops.kernels (Pallas)
  lite/model_parser          → paddle_lite_tpu.formats
  opt tool                   → paddle_lite_tpu.tools.opt
  (none — net-new)           → paddle_lite_tpu.parallel, runtime.batcher
"""

from . import ops  # registers all operators & kernels
from . import passes  # registers all graph passes
from .core.builder import GraphBuilder
from .core.executor import build_callable, compile_graph, stage_weights
from .core.ir import Graph
from .core.pass_manager import PassManager, run_default_pipeline
from .core.types import CalibMethod, Precision, QuantInfo
from .quant.calibrate import calibrate
from .quant.quantize_pass import QuantConfig, ptq_quantize

__version__ = "0.1.0"
