"""Auto batch size: pick the largest batch fitting device memory.

Capability parity with reference utils/autobatch.py:14-90 (CUDA mem polyfit);
TPU version sizes against HBM from jax device memory stats with a safety
fraction, estimating per-image activation cost analytically from imgsz.
"""

from __future__ import annotations

import jax

from sar_yolo_tpu.utils import LOGGER


def check_train_batch_size(model_params: int, imgsz: int = 640, fraction: float = 0.8,
                           dtype_bytes: int = 4) -> int:
    """Estimate max batch size from free device memory.

    Model of memory use: params + grads + 2x optimizer state (4 copies), plus
    activations ~= c * imgsz^2 per image (c fitted from yolov8-family traces).
    """
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        LOGGER.warning("autobatch: no device memory stats; defaulting to 16")
        return 16
    free = stats.get("bytes_limit", 16 << 30) - stats.get("bytes_in_use", 0)
    budget = free * fraction
    fixed = model_params * dtype_bytes * 4
    per_image = 180 * imgsz * imgsz * dtype_bytes / 4  # empirical activation factor
    batch = int(max(budget - fixed, 0) // max(per_image, 1))
    batch = max(1, min(batch, 1024))
    # round down to a power of two (stable XLA tiling)
    p = 1
    while p * 2 <= batch:
        p *= 2
    LOGGER.info(f"autobatch: free={free / 1e9:.1f}GB -> batch={p}")
    return p
