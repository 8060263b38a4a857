"""Model formats — analog of ``lite/model_parser``.

- ``fluid`` / ``fluid_convert``: the reference's primary input format
  (``__model__`` protobuf + params; ``LoadModelPb``), parsed dependency-free
  and converted NCHW→NHWC.
- ``artifact``: the optimized-program container (`.pnb`, the ``.nb`` analog).
- ``importer``: torch state_dict / name→array structural weight import.
- ``aot``: StableHLO export of the compiled program.
- ``orbax_ckpt``: orbax checkpoint integration.
"""

from .fluid_convert import fluid_to_graph, load_fluid_model  # noqa: F401
