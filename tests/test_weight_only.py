"""Weight-only quantize-on-save (the SaveModelNaive int8/int16 storage mode,
lite/model_parser/model_parser.cc): calibration-free, weights stored narrow,
inline-dequantized at run."""

import numpy as np

from paddle_lite_tpu import QuantConfig
from paddle_lite_tpu.core.executor import build_callable, stage_weights
from paddle_lite_tpu.formats import artifact
from paddle_lite_tpu.models import mobilenet_v1
from paddle_lite_tpu.tools.opt import optimize


def _run(g, feed):
    return np.asarray(build_callable(g)(stage_weights(g), feed)[g.outputs[0]])


def _cos(a, b):
    return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_weight_only_modes(rng, tmp_path):
    feed = {"image": rng.normal(size=(2, 64, 64, 3)).astype(np.float32)}
    ref = _run(optimize(mobilenet_v1.build(batch=2, image_size=64)), feed)

    outs = {}
    for bits, dtype in ((8, np.int8), (16, np.int16)):
        g = mobilenet_v1.build(batch=2, image_size=64)
        optimize(g, quant=QuantConfig(weight_only=bits))
        # no calibration => no enable_int8 ops, but weights are narrow
        assert not any(op.attrs.get("enable_int8") for op in g.ops)
        wdtypes = {g.weights[op.input("Filter")].dtype
                   for op in g.ops if op.op_type.endswith("conv2d")}
        assert wdtypes == {np.dtype(dtype)}
        outs[bits] = _run(g, feed)

        # artifact round-trip preserves narrow weights + scales
        path = str(tmp_path / f"wo{bits}.pnb")
        artifact.save(g, path)
        g2 = artifact.load(path)
        w_name = next(op.input("Filter") for op in g2.ops
                      if op.op_type.endswith("conv2d"))
        assert g2.weights[w_name].dtype == dtype
        assert g2.vars[w_name].quant is not None
        np.testing.assert_array_equal(_run(g2, feed), outs[bits])

    # accuracy proxy: W16 ~ fp32; W8 close (>= PTQ int8 quality: weight-only
    # has no activation quantization error at all)
    assert _cos(outs[16], ref) > 0.999999
    assert float(np.abs(outs[16] - ref).max()) < 1e-3
    assert _cos(outs[8], ref) > 0.999

    g_ptq = mobilenet_v1.build(batch=2, image_size=64)
    optimize(g_ptq, quant=QuantConfig(), calib_batches=[feed])
    ptq = _run(g_ptq, feed)
    assert _cos(outs[8], ref) >= _cos(ptq, ref) - 1e-6
