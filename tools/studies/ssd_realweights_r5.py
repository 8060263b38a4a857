"""r5: SSD bucket3-vs-bucket2 recall gates on a torch-IMPORTED trunk
(VERDICT r4 next-round #6).

No pretrained checkpoints are reachable in this environment (zero egress —
testing/twins.py:5), so "real weights" is approximated the strongest way
available in-sandbox: the SSD trunk takes the torch MobileNetV1 twin's
weights THROUGH the product importer (formats/importer.import_state_dict —
structured torch init + BN statistics, a different weight family than the
realistic_graph_init the r4 frontier used), heads keep realistic init +
trained-regime scaling.  If the bucket3@176 operating point holds its
>=0.999 recall at both confidence regimes here too, the default is
weight-family-robust; if bucket2@256 also clears, it stays the documented
opt-in.

Writes docs/ssd_realweights_r5.json (and the section is merged into
docs/accuracy_ssd.json by the runner).
"""
import os, json

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.models import ssd
from paddle_lite_tpu.tools.opt import optimize
from paddle_lite_tpu.tools.accuracy_families import (
    _compile, _images, _optimize_int8, _scale_ssd_heads, match_detections)
from paddle_lite_tpu.testing.twins import torch_mobilenet_v1, realistic_graph_init
from paddle_lite_tpu.formats.importer import ImportError_, import_state_dict

BATCH, SIZE, N_IMAGES, SEED = 8, 300, 384, 7
CONFS = (0.25, 0.1)

# torch twin trunk params (strip the classifier; the SSD trunk consumes
# stem + 13 dw/pw blocks = 27 convs + 27 BNs, then the importer hits the
# first extra-stage conv and reports exhaustion — expected)
tw = torch_mobilenet_v1(seed=SEED)
sd = dict(tw.state_dict())
# drop the classifier (the last module with a 2-D weight)
cls_prefix = next(k.rsplit(".", 1)[0] for k in reversed(list(sd))
                  if k.endswith("weight") and sd[k].dim() == 2)
sd = {k: v for k, v in sd.items() if not k.startswith(cls_prefix + ".")}


def build(nms_mode, bucket, bg_bias=0.0):
    g = ssd.build(batch=BATCH, image_size=SIZE, seed=SEED)
    realistic_graph_init(g, seed=SEED)     # extras + heads
    consumed = 0
    try:
        consumed = import_state_dict(g, sd, strict=False)
    except ImportError_ as e:
        # expected: trunk consumed, extras/heads keep realistic init
        pass
    _scale_ssd_heads(g, 4.0, 0.1, bg_bias=bg_bias)
    nms = next(op for op in g.ops if op.op_type.startswith("multiclass_nms"))
    nms.attrs["approx_top_k"] = nms_mode
    nms.attrs["bucket_candidates"] = bucket
    return g


# sparse-detection bg bias (same auto-calibration as ssd_report)
g_probe = build(False, 512)
sm = next(op for op in g_probe.ops if op.op_type == "softmax")
g_probe.outputs = [sm.input("X")]
probe_img = next(_images(BATCH, SIZE, seed=SEED + 3, batch=BATCH))
logits = _compile(g_probe)({"image": probe_img})[g_probe.outputs[0]]
margin = logits[..., 1:].max(-1) - logits[..., 0]
bg_bias = float(np.quantile(margin, 1 - 25 / margin.shape[1]))
print(f"bg_bias {bg_bias:.3f}", flush=True)

imgs = list(_images(N_IMAGES, SIZE, seed=SEED + 2, batch=BATCH))
calib = [{"image": next(_images(BATCH, SIZE, seed=SEED + 1, batch=BATCH))}]

g_ref = optimize(build(False, 512, bg_bias))
run_ref = _compile(g_ref)
ref_out = [run_ref({"image": x})[g_ref.outputs[0]] for x in imgs]

g_i8 = build(False, 512, bg_bias)
_optimize_int8(g_i8, calib)
i8_out = [_compile(g_i8)({"image": x})[g_i8.outputs[0]] for x in imgs]

variants = {
    "int8_exact": (False, 512),
    "int8_bucket3_176": ("bucket3", 176),
    "int8_bucket2_256": ("bucket2", 256),
}
report = {"trunk": "torch_twin_imported", "bg_bias": round(bg_bias, 3),
          "n_images": N_IMAGES, "variants": {}}


def score(out_rows, ref_rows, conf):
    n_match = n_ref = n_rmatch = n_got = 0
    for rr, gr in zip(ref_rows, out_rows):
        for bi in range(rr.shape[0]):
            m = match_detections(rr[bi], gr[bi], conf=conf)
            n_match += m["matched"]; n_ref += m["ref"]
            r = match_detections(gr[bi], rr[bi], conf=conf)
            n_rmatch += r["matched"]; n_got += r["ref"]
    return {"recall": round(n_match / max(n_ref, 1), 4),
            "precision": round(n_rmatch / max(n_got, 1), 4),
            "ref_boxes": n_ref, "boxes": n_got}


for name, (mode, bucket) in variants.items():
    g = build(mode, bucket, bg_bias)
    _optimize_int8(g, calib)
    run = _compile(g)
    out = [run({"image": x})[g.outputs[0]] for x in imgs]
    entry = {}
    for conf in CONFS:
        entry[f"vs_fp32_exact@{conf}"] = score(out, ref_out, conf)
        entry[f"vs_int8_exact@{conf}"] = score(out, i8_out, conf)
    report["variants"][name] = entry
    print(name, json.dumps(entry), flush=True)

out_p = "/root/repo/docs/ssd_realweights_r5.json"
json.dump(report, open(out_p, "w"), indent=1)
print("wrote", out_p, flush=True)
