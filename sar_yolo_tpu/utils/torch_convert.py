"""One-way torch->JAX checkpoint converter for parity verification.

SURVEY §7 hard-part 8: prove fp-tolerance output parity against reference
weights. Maps an ultralytics-style DetectionModel state_dict (v8 family:
Conv/C2f/Bottleneck/SPPF/Detect-legacy) onto GraphModel params/batch_stats.

Layout rules: torch conv (O, I/g, kh, kw) -> flax (kh, kw, I/g, O);
BN weight/bias -> scale/bias; running stats -> batch_stats.
"""

from __future__ import annotations

import re

import numpy as np


def _set(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def translate_torch_state_dict(state_dict, verbose: bool = False):
    """Returns {'params': ..., 'batch_stats': ...} pytrees (numpy leaves)."""
    params: dict = {}
    batch_stats: dict = {}
    skipped = []
    for key, tensor in state_dict.items():
        t = tensor.detach().cpu().numpy()
        parts = key.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        layer = f"blocks_{parts[0]}"
        rest = parts[1:]
        leaf = rest[-1]
        mid = rest[:-1]

        if mid and mid[0] == "dfl":
            continue  # frozen DFL projection: functional in this framework
        if leaf == "num_batches_tracked":
            continue

        # path translation
        out: list[str] = [layer]
        i = 0
        while i < len(mid):
            p = mid[i]
            if p == "m" and i + 1 < len(mid) and mid[i + 1].isdigit():
                out.append(f"m{mid[i + 1]}")
                i += 2
                continue
            if p in ("cv2", "cv3", "cv4") and i + 2 < len(mid) and mid[i + 1].isdigit():
                # Detect branches: cv2.{level}.{stage}
                level, stage = mid[i + 1], mid[i + 2]
                if stage == "2":
                    out.append(f"{p}_{level}_pred")
                else:
                    out.append(f"{p}_{level}_{stage}")
                i += 3
                continue
            out.append(p)
            i += 1

        if leaf == "weight" and mid and mid[-1] == "conv":
            out.append("kernel")
            _set(params, out, np.transpose(t, (2, 3, 1, 0)))
        elif mid and mid[-1] == "bn":
            name = {"weight": "scale", "bias": "bias"}.get(leaf)
            if name:
                _set(params, out + [name], t)
            elif leaf == "running_mean":
                _set(batch_stats, out + ["mean"], t)
            elif leaf == "running_var":
                _set(batch_stats, out + ["var"], t)
        elif out[-1].endswith("_pred"):
            if leaf == "weight":
                _set(params, out + ["kernel"], np.transpose(t, (2, 3, 1, 0)))
            else:
                _set(params, out + ["bias"], t)
        elif leaf == "weight" and t.ndim == 4:
            _set(params, out + ["conv", "kernel"], np.transpose(t, (2, 3, 1, 0)))
        elif leaf in ("weight", "bias") and t.ndim <= 2:
            # linear layers (state MLP etc.): torch (out, in) -> flax (in, out)
            name = "kernel" if leaf == "weight" else "bias"
            _set(params, out + [name], t.T if t.ndim == 2 else t)
        else:
            skipped.append(key)
    if verbose and skipped:
        print("skipped keys:", skipped)
    return {"params": params, "batch_stats": batch_stats}, skipped
