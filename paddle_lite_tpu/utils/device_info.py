"""Device discovery — analog of ``lite/core/device_info.{h,cc}``.

The reference probed ARM SoCs (core counts, big.LITTLE clusters, cache
sizes) to steer kernel blocking and thread binding.  The TPU analog reports
chip identity, per-chip specs used by the roofline calculator, and HBM
occupancy; the tuning role ("power modes" → block shapes) lives in the
measured autotune table (``ops/kernels/tune_cache``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax

# peak specs per chip generation (public numbers); used by the roofline
# reports in bench/microbench tooling
_CHIP_SPECS = {
    "v5 lite": {"bf16_tflops": 197.0, "int8_tops": 394.0,
                "hbm_gbps": 819.0, "hbm_gib": 16.0},
    "v5e": {"bf16_tflops": 197.0, "int8_tops": 394.0,
            "hbm_gbps": 819.0, "hbm_gib": 16.0},
    "v5p": {"bf16_tflops": 459.0, "int8_tops": 918.0,
            "hbm_gbps": 2765.0, "hbm_gib": 95.0},
    "v4": {"bf16_tflops": 275.0, "int8_tops": 275.0,
           "hbm_gbps": 1228.0, "hbm_gib": 32.0},
    "cpu": {"bf16_tflops": 0.5, "int8_tops": 1.0,
            "hbm_gbps": 50.0, "hbm_gib": 8.0},
}


@dataclasses.dataclass
class DeviceInfo:
    platform: str
    device_kind: str
    num_devices: int
    specs: Dict[str, float]

    def peak_int8_tops(self) -> float:
        return self.specs["int8_tops"]

    def peak_hbm_gbps(self) -> float:
        return self.specs["hbm_gbps"]

    def roofline_time_s(self, flops: float, bytes_moved: float,
                        int8: bool = True) -> float:
        """max(compute, memory) time — the roofline lower bound."""
        peak = (self.specs["int8_tops"] if int8
                else self.specs["bf16_tflops"]) * 1e12
        t_compute = flops / peak
        t_memory = bytes_moved / (self.specs["hbm_gbps"] * 1e9)
        return max(t_compute, t_memory)


@functools.lru_cache(maxsize=1)
def get() -> DeviceInfo:
    devs = jax.devices()
    kind = getattr(devs[0], "device_kind", "cpu") or "cpu"
    specs = None
    for key, s in _CHIP_SPECS.items():
        if key in kind.lower():
            specs = s
            break
    if specs is None:
        specs = _CHIP_SPECS["cpu"]
    return DeviceInfo(
        platform=jax.default_backend(),
        device_kind=kind,
        num_devices=len(devs),
        specs=specs,
    )


def memory_stats() -> Optional[dict]:
    """Per-device memory occupancy where the backend exposes it."""
    try:
        return jax.devices()[0].memory_stats()
    except (AttributeError, NotImplementedError, jax.errors.JaxRuntimeError):
        return None
