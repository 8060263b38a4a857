"""Full-scale accuracy report — the BASELINE contract measurement
(MobileNetV1-INT8 top-1 within 0.5 pts of fp32) on full architectures with
imported, trained-looking weights (testing/twins.py).

Without a reachable ImageNet/pretrained checkpoint (no network in this
environment), ground truth is the torch twin's fp32 prediction: `top-1
agreement` of our fp32 import against torch proves importer parity, and
int8-vs-fp32 agreement is a *stricter* stand-in for the top-1-delta
contract (every disagreement counts against it, whereas on a real test set
half the flips land on the correct label by symmetry).

Reports, per model and calibration method (abs_max / percentile / KL):

- importer parity: max |torch − ours| rel error on a probe batch
- fp32→int8 prediction agreement over N structured images
- mean |p_int8 − p_fp32| top-probability drift
- worst per-layer cosine from tools/profile.precision_report

Writes one JSON document (stdout or --out); docs/ACCURACY.md holds the
committed snapshot.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, List

import numpy as np


def _compile(graph):
    """One jitted runner per graph (weights staged once)."""
    import jax

    from ..core.executor import build_callable, stage_weights

    fn = jax.jit(build_callable(graph))
    weights = jax.device_put(stage_weights(graph))

    def run(feed):
        out = jax.device_get(fn(weights, feed))
        return {k: np.asarray(v) for k, v in out.items()}

    return run


def build_imported(model: str, batch: int, image_size: int, seed: int):
    from ..formats.importer import import_state_dict
    from ..testing import twins

    if model == "mobilenet_v1":
        from ..models import mobilenet_v1 as zoo

        twin = twins.torch_mobilenet_v1(seed=seed)
    elif model == "mobilenet_v3":
        from ..models import mobilenet_v3 as zoo

        twin = twins.torch_mobilenet_v3(seed=seed)
    elif model == "resnet":
        from ..models import resnet as zoo

        twin = twins.torch_resnet50(seed=seed)
    else:
        raise ValueError(f"no twin for {model}")
    g = zoo.build(batch=batch, image_size=image_size, with_softmax=True)
    consumed = import_state_dict(g, twin.state_dict())
    return g, twin, consumed


def accuracy_report(model: str, *, n_images: int = 1000, batch: int = 50,
                    image_size: int = 224, seed: int = 0,
                    methods=("abs_max", "percentile", "entropy"),
                    calib_batches: int = 4) -> dict:
    import torch

    from .. import QuantConfig
    from ..core.types import CalibMethod
    from ..quant.calibrate import calibrate
    from ..testing.twins import structured_images
    from .opt import optimize
    from .profile import precision_report

    g_fp32, twin, consumed = build_imported(model, batch, image_size, seed)

    # --- importer parity on a probe batch -------------------------------
    probe_nchw = next(structured_images(batch, image_size, seed=seed + 99,
                                        batch=batch))
    with torch.no_grad():
        t_logits = twin(torch.from_numpy(probe_nchw)).numpy()
    t_prob = np.exp(t_logits - t_logits.max(-1, keepdims=True))
    t_prob /= t_prob.sum(-1, keepdims=True)
    feed = {"image": np.transpose(probe_nchw, (0, 2, 3, 1)).copy()}
    run_fp32 = _compile(g_fp32)
    ours = run_fp32(feed)[g_fp32.outputs[0]]
    parity_rel = float(np.abs(ours - t_prob).max() / (np.abs(t_prob).max()))
    parity_agree = float((ours.argmax(-1) == t_prob.argmax(-1)).mean())

    # --- calibration data (shared across methods) ------------------------
    calib = [
        {"image": np.transpose(x, (0, 2, 3, 1)).copy()}
        for x in structured_images(calib_batches * batch, image_size,
                                   seed=seed + 1, batch=batch)
    ]

    eval_stream = list(structured_images(n_images, image_size, seed=seed + 2,
                                         batch=batch))

    report = {
        "model": model, "n_images": n_images, "image_size": image_size,
        "params_imported": consumed,
        "importer_parity_rel_err": parity_rel,
        "importer_top1_agreement_vs_torch": parity_agree,
        "methods": {},
    }

    fp32_preds: List[np.ndarray] = []
    fp32_top_prob: List[np.ndarray] = []
    for x in eval_stream:
        out = run_fp32({
            "image": np.transpose(x, (0, 2, 3, 1)).copy()})[g_fp32.outputs[0]]
        fp32_preds.append(out.argmax(-1))
        fp32_top_prob.append(out.max(-1))

    for method in methods:
        g8, _, _ = build_imported(model, batch, image_size, seed)
        # "kl" is the PaddleSlim/TensorRT name for the entropy method
        cfg = QuantConfig(method=CalibMethod(
            "entropy" if method == "kl" else method))
        optimize(g8, quant=cfg, calib_batches=calib)
        run_int8 = _compile(g8)

        agree = total = 0
        drift = 0.0
        for x, p32, tp32 in zip(eval_stream, fp32_preds, fp32_top_prob):
            out = run_int8({
                "image": np.transpose(x, (0, 2, 3, 1)).copy()})[g8.outputs[0]]
            p8 = out.argmax(-1)
            agree += int((p8 == p32).sum())
            total += p8.shape[0]
            drift += float(np.abs(out.max(-1) - tp32).sum())

        # per-layer quantization error (worst cosines)
        g_ref, _, _ = build_imported(model, batch, image_size, seed)
        optimize(g_ref)  # fused fp32, same topology as g8 minus quant
        rows = precision_report(g_ref, g8, calib[0], top=5)
        worst = [{"var": r.var, "op": r.op_type, "cos": round(r.cos, 6)}
                 for r in rows]

        report["methods"][method] = {
            "int8_top1_agreement": agree / total,
            "top1_delta_upper_bound": 1.0 - agree / total,
            "mean_top_prob_drift": drift / total,
            "worst_layer_cosines": worst,
        }
    return report


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                   help="cpu (default: accuracy is platform-independent and "
                        "must not contend with TPU perf jobs; the dev env's "
                        "sitecustomize force-selects the TPU otherwise)")
    p.add_argument("--model", default="mobilenet_v1",
                   choices=["mobilenet_v1", "mobilenet_v3", "resnet"])
    p.add_argument("--n-images", type=int, default=1000)
    p.add_argument("--batch", type=int, default=50)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--methods", default="abs_max,percentile,entropy")
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    rep = accuracy_report(args.model, n_images=args.n_images,
                          batch=args.batch, image_size=args.image_size,
                          methods=tuple(args.methods.split(",")),
                          calib_batches=args.calib_batches)
    text = json.dumps(rep, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
