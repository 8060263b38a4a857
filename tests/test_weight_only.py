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


def test_weight_only_w4_packed(rng, tmp_path):
    """r5 W4: weights stored as packed int4 pairs in int8 containers (the
    jnp int4 dtype is broken in this jax build, so packing is manual) —
    pack/unpack exactness, halved storage, end-to-end accuracy, artifact
    round trip, and odd-axis int8 fallback (the 3-channel stem)."""
    import jax.numpy as jnp

    from paddle_lite_tpu.ops.common import _unpack_w4
    from paddle_lite_tpu.quant.quantize_pass import weight_only_quantize

    # pack/unpack exactness on raw nibbles
    vals = rng.integers(-7, 8, size=(6, 4), dtype=np.int8)
    packed = ((vals[0::2] & 0xF) | (vals[1::2] << 4)).astype(np.int8)
    un = np.asarray(_unpack_w4(jnp.asarray(packed), 0))
    np.testing.assert_array_equal(un, vals)

    feed = {"image": rng.normal(size=(2, 64, 64, 3)).astype(np.float32)}
    ref = _run(optimize(mobilenet_v1.build(batch=2, image_size=64)), feed)

    g = mobilenet_v1.build(batch=2, image_size=64)
    optimize(g, quant=QuantConfig(weight_only=4))
    assert not any(op.attrs.get("enable_int8") for op in g.ops)

    packed_n = fallback_n = 0
    total_logical = total_stored = 0
    for op in g.ops:
        if not op.op_type.endswith("conv2d"):
            continue
        w_name = op.input("Filter")
        q = g.vars[w_name].quant
        stored = g.weights[w_name]
        logical = int(np.prod(g.vars[w_name].shape))
        total_logical += logical
        total_stored += stored.size
        if q.pack_axis is not None:
            assert q.bits == 4
            assert stored.size * 2 == logical
            packed_n += 1
        else:
            assert q.bits == 8  # odd-axis fallback (the 3-channel stem)
            fallback_n += 1
    assert packed_n > 0
    assert fallback_n >= 1
    assert total_stored < 0.6 * total_logical  # ~halved storage

    out4 = _run(g, feed)
    # W4 is coarser than W8 but must stay recognizably the same function
    assert _cos(out4, ref) > 0.98

    # artifact round trip preserves packed storage + pack_axis
    path = str(tmp_path / "wo4.pnb")
    artifact.save(g, path)
    g2 = artifact.load(path)
    w_name = next(op.input("Filter") for op in g2.ops
                  if op.op_type == "conv2d"
                  and g2.vars[op.input("Filter")].quant.pack_axis is not None)
    assert g2.weights[w_name].dtype == np.int8
    np.testing.assert_array_equal(_run(g2, feed), out4)
