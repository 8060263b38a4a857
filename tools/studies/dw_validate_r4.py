"""r4: in-model validation of any depthwise bucket the hoisted kernel
flipped to pallas (never ship a table entry without the in-model A/B).
Runs kernel_pick with the fresh table on MNv1 + MNv3 + SSD, then
validate_in_model, which demotes non-winners and persists the table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/dw_validate_r4.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.models.zoo_config import recommended_quant  # noqa: E402
from paddle_lite_tpu.ops.kernels import tune_cache  # noqa: E402
from paddle_lite_tpu.tools.benchmark import resolve_builder  # noqa: E402
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402

for model, kw in [("mobilenet_v1", dict(batch=64, image_size=224)),
                  ("mobilenet_v3", dict(batch=64, image_size=224)),
                  ("ssd", dict(batch=32, image_size=300))]:
    g = resolve_builder(model)(**kw)
    rng = np.random.default_rng(0)
    feed = {"image": rng.normal(
        size=g.vars[g.inputs[0]].shape).astype(np.float32)}
    optimize(g, quant=recommended_quant(model), calib_batches=[feed])
    decisions = tune_cache.validate_in_model(g, feed, verbose=True)
    print(json.dumps({"model": model, "decisions": decisions}), flush=True)
