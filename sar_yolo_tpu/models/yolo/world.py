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


def clip_text_embeddings(names, model_id: str = "openai/clip-vit-base-patch32",
                         template: str = "a photo of a {}",
                         local_only: bool = True) -> np.ndarray:
    """Real CLIP text embeddings via HuggingFace transformers (the reference
    encodes `set_classes` prompts with CLIP, nn/tasks.py:629-635).

    Requires the CLIP weights locally (`local_files_only` — this image has no
    egress). On a connected machine, precompute once with
    `python -m sar_yolo_tpu.models.yolo.world save OUT.npz name1 name2 ...`
    and pass the .npz through `set_classes(names, embeddings="OUT.npz")`.
    """
    try:
        import torch
        from transformers import CLIPTextModelWithProjection, CLIPTokenizer
    except ImportError as e:  # pragma: no cover - transformers is baked in
        raise RuntimeError(
            "clip_text_embeddings requires `transformers` + `torch`; "
            "use offline_text_embeddings or a precomputed .npz instead.") from e
    try:
        tok = CLIPTokenizer.from_pretrained(model_id, local_files_only=local_only)
        enc = CLIPTextModelWithProjection.from_pretrained(model_id,
                                                          local_files_only=local_only)
    except Exception as e:
        raise RuntimeError(
            f"CLIP weights for '{model_id}' are not available locally (this "
            "environment has no network egress). Precompute embeddings on a "
            "connected machine:\n  python -m sar_yolo_tpu.models.yolo.world "
            "save embeds.npz person boat ...\nthen "
            "set_classes(names, embeddings='embeds.npz').") from e
    prompts = [template.format(str(n)) for n in names]
    with torch.no_grad():
        batch = tok(prompts, padding=True, return_tensors="pt")
        emb = enc(**batch).text_embeds.float().numpy()
    return emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9)


def load_text_embeddings(path) -> tuple[list, np.ndarray]:
    """Load a precomputed `.npz` of {names: (N,) str, embeddings: (N, D) f32}."""
    z = np.load(path, allow_pickle=False)
    return [str(n) for n in z["names"]], np.asarray(z["embeddings"], np.float32)


def save_text_embeddings(path, names, model_id: str = "openai/clip-vit-base-patch32"):
    """Precompute + save CLIP text embeddings for offline use on the TPU host.

    Runs on a CONNECTED machine: downloads the CLIP weights when absent."""
    emb = clip_text_embeddings(names, model_id=model_id, local_only=False)
    np.savez(path, names=np.asarray([str(n) for n in names]), embeddings=emb)
    return path


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

        self._ensure_variables()
        old_params = self.variables["params"]
        if "text_embeddings" not in old_params:
            raise ValueError(
                "this checkpoint predates the graph-level text param (it kept "
                "text_embeddings on the head) and cannot run with the current "
                "world graph — re-train or re-convert the weights")
        embed_dim = int(old_params["text_embeddings"].shape[-1])
        if isinstance(embeddings, (str, bytes)) or hasattr(embeddings, "read"):
            ref_names, emb = load_text_embeddings(embeddings)
            if [str(n) for n in names] != ref_names:
                raise ValueError(
                    f"precomputed embeddings are for {ref_names}, not {list(names)}")
        elif embeddings is not None:
            emb = np.asarray(embeddings, np.float32)
        else:
            try:  # real CLIP if its weights are present locally
                emb = clip_text_embeddings(names)
                if emb.shape[-1] != embed_dim:  # project/trim to the head dim
                    emb = emb[:, :embed_dim] if emb.shape[-1] > embed_dim else np.pad(
                        emb, ((0, 0), (0, embed_dim - emb.shape[-1])))
                    emb /= np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9
            except Exception:  # CLIP is best-effort: any import/load failure
                from sar_yolo_tpu.utils import LOGGER
                LOGGER.warning(
                    "set_classes: CLIP weights unavailable — using the "
                    "deterministic offline hash encoder (no semantic transfer). "
                    "Pass embeddings=<arr|.npz> for true open-vocabulary use.")
                emb = offline_text_embeddings(names, embed_dim)
        emb = np.asarray(emb, np.float32)
        if emb.shape != (len(names), embed_dim):
            raise ValueError(f"embeddings must be ({len(names)}, {embed_dim}), got {emb.shape}")

        # The graph is NOT rebuilt on vocabulary change: like the reference
        # (WorldModel.set_classes, nn/tasks.py:629-647), only the text rows and
        # the head's class count change; every conv keeps its built (nc-at-init)
        # shape and the logits channel count follows the text row count.
        if len(names) != self.meta["nc"]:
            self.meta = {**self.meta, "nc": len(names)}
            # re-declare the text rows without touching conv shapes
            self.model = self.model.clone(txt_nc=len(names))
        params = flax.core.unfreeze(self.variables["params"])
        params["text_embeddings"] = jnp.asarray(emb)
        self.variables = {**self.variables, "params": params}
        self.meta["names"] = dict(enumerate(str(n) for n in names))
        self._predictor_cache = None  # vocabulary changed: invalidate executables
        return self


if __name__ == "__main__":  # offline embedding precompute CLI (see docstring)
    import sys
    if len(sys.argv) >= 4 and sys.argv[1] == "save":
        out = save_text_embeddings(sys.argv[2], sys.argv[3:])
        print(f"saved {len(sys.argv) - 3} embeddings -> {out}")
    else:
        print("usage: python -m sar_yolo_tpu.models.yolo.world save OUT.npz name1 name2 ...")
