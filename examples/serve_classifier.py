"""End-to-end serving example: camera frame → CV preprocess → continuous
batcher → int8 MobileNetV1 → top-k labels.

Run: ``python examples/serve_classifier.py`` (uses the attached accelerator,
or CPU with ``JAX_PLATFORMS=cpu``).
"""

from __future__ import annotations

import threading
import time

import numpy as np

from paddle_lite_tpu import QuantConfig, cv
from paddle_lite_tpu.models import mobilenet_v1
from paddle_lite_tpu.runtime.batcher import BatcherConfig, ContinuousBatcher
from paddle_lite_tpu.runtime.predictor import create_predictor

IMAGE_SIZE = 224
MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)


def make_predictor(batch: int):
    rng = np.random.default_rng(0)
    g = mobilenet_v1.build(batch=batch, image_size=IMAGE_SIZE, seed=0)
    return create_predictor(
        g,
        quant=QuantConfig(),
        # synthetic calibration for the demo; feed real data in production
        calib_batches=[{
            "image": rng.normal(size=(batch, IMAGE_SIZE, IMAGE_SIZE, 3))
            .astype(np.float32)
        }],
    )


def preprocess(frame_nv12_y: np.ndarray, frame_nv12_uv: np.ndarray,
               h: int, w: int) -> np.ndarray:
    rgb = cv.nv_to_rgb(frame_nv12_y, frame_nv12_uv, h, w)
    rgb = cv.resize(rgb, IMAGE_SIZE, IMAGE_SIZE)
    return cv.to_tensor(rgb, MEAN, STD)  # (H, W, 3) f32 NHWC-ready


def main() -> None:
    batcher = ContinuousBatcher(
        make_predictor, BatcherConfig(buckets=(1, 2, 4, 8), max_wait_ms=3.0))

    def client(i: int):
        h, w = 480, 640
        y = np.random.randint(0, 256, (h, w), dtype=np.uint8)
        uv = np.random.randint(0, 256, (h // 2, w), dtype=np.uint8)
        tensor = preprocess(y, uv, h, w)
        out = batcher.infer({"image": tensor}, timeout=300)
        probs = next(iter(out.values()))
        top5 = np.argsort(probs)[-5:][::-1]
        print(f"client {i}: top-5 classes {top5.tolist()}")

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(f"served 6 requests in {time.time() - t0:.2f}s "
          f"(batches: {batcher.stats['batches']})")
    batcher.close()


if __name__ == "__main__":
    main()
