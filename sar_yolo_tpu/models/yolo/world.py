"""YOLO-World: open-vocabulary detection facade (reference YOLOWorld
models/yolo/model.py:76 + WorldModel nn/tasks.py:620).

`set_classes(names)` swaps the detection vocabulary by replacing the
WorldDetect head's text-embedding parameter — functional param surgery instead
of the reference's module mutation, so the jitted graph stays valid.

Text encoder: the reference embeds prompts with CLIP. This environment has no
CLIP weights (zero egress), so the default encoder is a DETERMINISTIC
hash-seeded random projection — structurally complete (correct shapes, stable
across runs, distinct per prompt) but without semantic transfer. Pass real
text embeddings via `embeddings=` to get true open-vocabulary behavior.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np

from sar_yolo_tpu.engine.model import YOLO


def offline_text_embeddings(names, dim: int = 512) -> np.ndarray:
    """Deterministic per-prompt embeddings (CLIP stand-in, see module docstring)."""
    out = np.zeros((len(names), dim), np.float32)
    for i, name in enumerate(names):
        seed = int.from_bytes(hashlib.sha256(str(name).encode()).digest()[:8], "little")
        v = np.random.default_rng(seed).normal(size=dim).astype(np.float32)
        out[i] = v / (np.linalg.norm(v) + 1e-9)
    return out


class YOLOWorld(YOLO):
    """YOLO with a text-conditioned WorldDetect head."""

    def __init__(self, model="yolov8s-world.yaml", task=None, verbose=False):
        super().__init__(model, task="detect", verbose=verbose)

    def set_classes(self, names, embeddings=None):
        """Swap the detection vocabulary.

        Args:
            names: list of class name prompts.
            embeddings: optional (len(names), embed_dim) float array of real
                text-encoder embeddings; defaults to the offline hash encoder.
        """
        import flax
        import jax.numpy as jnp

        from sar_yolo_tpu.nn.tasks import build_model, init_model

        head_key = f"blocks_{self.meta['head_index']}"
        self._ensure_variables()
        old_params = self.variables["params"]
        embed_dim = int(old_params[head_key]["text_embeddings"].shape[-1])
        emb = np.asarray(embeddings if embeddings is not None
                         else offline_text_embeddings(names, embed_dim), np.float32)
        if emb.shape != (len(names), embed_dim):
            raise ValueError(f"embeddings must be ({len(names)}, {embed_dim}), got {emb.shape}")

        if len(names) != self.meta["nc"]:
            # nc changed: rebuild the graph (only text_embeddings depends on nc)
            model, meta = build_model(self.overrides.get("model", self.cfg),
                                      nc=len(names))
            new_vars = init_model(model, meta, jax.random.PRNGKey(0))
            params = flax.core.unfreeze(new_vars["params"])
            for k in params:
                if k == head_key:
                    for sub in params[k]:
                        if sub != "text_embeddings":
                            params[k][sub] = old_params[k][sub]
                elif k in old_params:
                    params[k] = old_params[k]
            self.model, self.meta = model, meta
            self.variables = {"params": params,
                              "batch_stats": self.variables.get("batch_stats", {})}
        params = flax.core.unfreeze(self.variables["params"])
        params[head_key]["text_embeddings"] = jnp.asarray(emb)
        self.variables = {**self.variables, "params": params}
        self.meta["names"] = dict(enumerate(str(n) for n in names))
        self._predictor_cache = None  # vocabulary changed: invalidate executables
        return self
