"""Environment/arg checks (capability parity: reference utils/checks.py core pieces).

The reference's check_amp (dual-precision sanity inference) maps to
check_bf16: verifies bf16 and f32 forwards agree within tolerance on TPU.
"""

from __future__ import annotations

import math
import platform
import re
import sys

from sar_yolo_tpu.utils import LOGGER


def parse_version(v: str) -> tuple:
    return tuple(int(x) for x in re.findall(r"\d+", str(v))[:3] or [0])


def check_version(current: str, required: str = "", name: str = "version",
                  hard: bool = False) -> bool:
    """Check `current` against a requirement string like '>=0.4.0' or '0.4.0,<1.0'."""
    if not required:
        return True
    cur = parse_version(current)
    ok = True
    for piece in required.split(","):
        m = re.match(r"([<>=!]*)\s*([\d.]+)", piece.strip())
        if not m:
            continue
        op, ver = m.group(1) or ">=", parse_version(m.group(2))
        ok &= {
            "==": cur == ver, "!=": cur != ver, ">=": cur >= ver,
            "<=": cur <= ver, ">": cur > ver, "<": cur < ver,
        }.get(op, cur >= ver)
    if not ok:
        msg = f"{name} requires '{required}' but {current} is installed"
        if hard:
            raise ModuleNotFoundError(msg)
        LOGGER.warning(f"WARNING: {msg}")
    return ok


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, floor: int = 0):
    """Round imgsz up to a multiple of the max stride (reference check_imgsz)."""
    vals = [imgsz] if isinstance(imgsz, int) else list(imgsz)
    out = [max(int(math.ceil(v / stride) * stride), floor) for v in vals]
    if out != vals:
        LOGGER.warning(f"WARNING: imgsz {vals} must be a multiple of stride {stride}, "
                       f"updated to {out}")
    return out[0] if isinstance(imgsz, int) else out


def check_bf16(model, variables, imgsz: int = 64) -> bool:
    """bf16/f32 forward agreement sanity check (reference check_amp analog)."""
    import jax
    import jax.numpy as jnp
    if jax.default_backend() != "tpu":
        return False
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, imgsz, imgsz, 3), jnp.float32)
    try:
        out32 = model.apply(variables, x, train=False)
        leaf32 = jax.tree.leaves(out32)[0]
        leafbf = jax.tree.leaves(model.apply(variables, x.astype(jnp.bfloat16),
                                             train=False))[0]
        rel = float(jnp.abs(leaf32.astype(jnp.float32) - leafbf.astype(jnp.float32)).mean() /
                    (jnp.abs(leaf32).mean() + 1e-6))
        return rel < 0.1
    except Exception as e:  # noqa: BLE001
        LOGGER.warning(f"check_bf16 failed: {e}")
        return False


def check_requirements(requirements, hard: bool = False) -> bool:
    """Verify installed package versions (reference check_requirements, minus the
    auto-`pip install` — installs are forbidden on the zero-egress TPU hosts).

    requirements: str or list like 'numpy>=1.23' / ['jax>=0.4', 'flax'].
    """
    from importlib import metadata
    ok = True
    for req in ([requirements] if isinstance(requirements, str) else requirements):
        m = re.match(r"\s*([A-Za-z0-9_.-]+)\s*(.*)", req)
        name, spec = m.group(1), m.group(2).strip()
        try:
            installed = metadata.version(name)
        except metadata.PackageNotFoundError:
            msg = f"required package '{name}' is not installed"
            if hard:
                raise ModuleNotFoundError(msg) from None
            LOGGER.warning(f"WARNING: {msg}")
            ok = False
            continue
        ok &= check_version(installed, spec, name=name, hard=hard)
    return ok


def collect_system_info() -> dict:
    import jax
    return {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
