"""SSD-MobileNetV1 detection demo: image → int8 SSD → scored boxes.

The TPU-native analog of the reference's SSD detect demo
(``lite/demo/cxx`` mobilenetv1-ssd app): preprocess with the CV lib, run
the int8 predictor, read the fixed-shape NMS output rows
``[label, score, x1, y1, x2, y2]`` (label −1 = empty slot — the dense
analog of the reference's LoD-ragged NMS output).

Run: ``JAX_PLATFORMS=cpu python examples/detect_ssd.py`` (or on the
attached accelerator by default).  Weights are random — the demo shows the
deployment plumbing, not trained-model accuracy.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from paddle_lite_tpu import cv
from paddle_lite_tpu.models import ssd
from paddle_lite_tpu.runtime.predictor import create_predictor

MEAN, STD = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
VOC_LABELS = (
    "background aeroplane bicycle bird boat bottle bus car cat chair cow "
    "diningtable dog horse motorbike person pottedplant sheep sofa train "
    "tvmonitor").split()


def make_predictor(image_size: int = 300):
    rng = np.random.default_rng(0)
    g = ssd.build(batch=1, image_size=image_size)
    from paddle_lite_tpu.models.zoo_config import recommended_quant
    return create_predictor(
        g, quant=recommended_quant("ssd"),
        calib_batches=[{
            "image": rng.normal(size=(1, image_size, image_size, 3))
            .astype(np.float32)}])


def detect(pred, image: np.ndarray, score_thresh: float = 0.5,
           ) -> List[Tuple[str, float, Tuple[int, int, int, int]]]:
    """uint8 HWC image → [(label, score, (x1, y1, x2, y2))] in image pixels."""
    size = pred.input_shape("image")[1]
    h, w = image.shape[:2]
    feed = cv.to_tensor(cv.resize(image, size, size), MEAN, STD)[None]
    rows = np.asarray(pred.run({"image": feed})[pred.output_names[0]])[0]
    results = []
    for label, score, x1, y1, x2, y2 in rows:
        if label < 0 or score < score_thresh:
            continue
        name = (VOC_LABELS[int(label)]
                if int(label) < len(VOC_LABELS) else str(int(label)))
        results.append((name, float(score),
                        (int(x1 * w), int(y1 * h), int(x2 * w), int(y2 * h))))
    return results


def main() -> None:
    pred = make_predictor()
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
    dets = detect(pred, image, score_thresh=0.1)
    print(f"{len(dets)} detections:")
    for name, score, (x1, y1, x2, y2) in dets[:10]:
        print(f"  {name:<12} {score:.3f} ({x1},{y1})-({x2},{y2})")


if __name__ == "__main__":
    main()
