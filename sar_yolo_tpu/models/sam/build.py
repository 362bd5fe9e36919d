"""SAM model registry + builder (reference models/sam/build.py).

Zero-egress environment: no checkpoint downloads. `build_sam` accepts a size
name ("sam_b.pt", "sam_l", ...), an orbax checkpoint directory previously
saved by this framework, or a torch .pt/.pth state_dict to convert.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from sar_yolo_tpu.utils import LOGGER

from .modules import SAMModel

# encoder configs: (embed_dim, depth, num_heads, global_attn_indexes)
SAM_CONFIGS = {
    "sam_h": dict(embed_dim=1280, depth=32, num_heads=16,
                  global_attn_indexes=(7, 15, 23, 31)),
    "sam_l": dict(embed_dim=1024, depth=24, num_heads=16,
                  global_attn_indexes=(5, 11, 17, 23)),
    "sam_b": dict(embed_dim=768, depth=12, num_heads=12,
                  global_attn_indexes=(2, 5, 8, 11)),
    # tiny config for tests / smoke runs (not a reference size); matches the
    # converted-checkpoint parity test's reference-side construction
    "sam_test": dict(embed_dim=64, depth=2, num_heads=2, global_attn_indexes=(1,),
                     img_size=128, prompt_embed_dim=32, decoder_heads=2),
}

SAM2_CONFIGS = {
    "sam2_t": dict(embed_dim=96, stages=(1, 2, 7, 2), num_heads=1,
                   global_att_blocks=(5, 7, 9), window_spec=(8, 4, 14, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "sam2_s": dict(embed_dim=96, stages=(1, 2, 11, 2), num_heads=1,
                   global_att_blocks=(7, 10, 13), window_spec=(8, 4, 14, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "sam2_b": dict(embed_dim=112, stages=(2, 3, 16, 3), num_heads=2,
                   global_att_blocks=(12, 16, 20), window_spec=(8, 4, 14, 7),
                   window_spatial_size=(14, 14),
                   backbone_channel_list=(896, 448, 224, 112)),
    "sam2_l": dict(embed_dim=144, stages=(2, 6, 36, 4), num_heads=2,
                   global_att_blocks=(23, 33, 43), window_spec=(8, 4, 16, 8),
                   backbone_channel_list=(1152, 576, 288, 144)),
    # matches the converted-checkpoint parity test's reference construction
    # (the global-attention block must not be a q-pool stage transition)
    "sam2_test": dict(embed_dim=16, stages=(1, 1, 2, 1), num_heads=1,
                      global_att_blocks=(3,), window_spec=(4, 4, 4, 4),
                      window_spatial_size=(4, 4),
                      backbone_channel_list=(128, 64, 32, 16), img_size=128),
}


def _canon(name) -> str:
    s = str(name).lower().replace("-", "_")
    # strip ONLY real weight suffixes — Path.stem would eat the '.1_t' of an
    # extension-less 'sam2.1_t'
    for suf in (".pt", ".pth"):
        if s.endswith(suf):
            s = s[: -len(suf)]
    # accept ultralytics-style names: sam_b.pt, sam2_t.pt, sam2.1_t, mobile_sam
    return Path(s).name.replace("sam2.1", "sam2")


def build_sam(model="sam_b.pt", weights=None, dtype=jnp.float32, imgsz=None):
    """Returns (flax_module, variables, info dict).

    model: size name or path; weights: optional orbax dir / torch .pt to load.
    """
    name = _canon(model)
    if name.startswith("sam2") or name.startswith("mobile_sam"):
        from .modules2 import build_sam2_module
        return build_sam2_module(name, weights=weights, dtype=dtype, imgsz=imgsz)
    if name not in SAM_CONFIGS:
        raise ValueError(f"unknown SAM variant '{model}'; choose from "
                         f"{sorted(SAM_CONFIGS) + sorted(SAM2_CONFIGS)}")
    cfg = dict(SAM_CONFIGS[name])
    img_size = imgsz or cfg.pop("img_size", 1024)
    module = SAMModel(img_size=img_size, dtype=dtype, **cfg)
    variables = _load_or_init(module, weights, img_size, name)
    return module, variables, {"name": name, "img_size": img_size, "is_sam2": False}


def _load_or_init(module, weights, img_size, name):
    if weights is not None:
        p = Path(weights)
        if p.is_dir():  # orbax checkpoint saved by this framework
            from sar_yolo_tpu.utils.checkpoint import load_variables
            return load_variables(p)
        if p.suffix in {".pt", ".pth"}:
            # Meta sam_vit_{b,l,h}.pth are flat tensor state_dicts — loadable
            # with weights_only=True (no pickle execution, matching the
            # repo-wide safe-checkpoint policy in utils/checkpoint.py)
            import torch

            sd = torch.load(p, map_location="cpu", weights_only=True)
            from .convert import translate_sam2_state_dict, translate_sam_state_dict
            from .modules2 import SAM2Model

            translate = (translate_sam2_state_dict if isinstance(module, SAM2Model)
                         else translate_sam_state_dict)
            variables, skipped = translate(sd)
            if skipped:
                LOGGER.warning(f"SAM convert: {len(skipped)} unmapped torch keys "
                               f"(first: {skipped[:4]})")
            LOGGER.info(f"SAM '{name}': converted torch checkpoint {p.name}")
            return variables
        raise FileNotFoundError(f"SAM weights '{weights}' not found/supported")
    LOGGER.info(f"SAM '{name}': initializing random weights "
                "(no pretrained checkpoints in the offline build)")
    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    pts = jnp.zeros((1, 1, 2), jnp.float32)
    lbl = jnp.ones((1, 1), jnp.float32)
    # a dummy mask prompt materializes the mask_conv*/mask_ln* params too
    # (setup-declared flax submodules only create params when CALLED at init)
    msk = jnp.zeros((1, img_size // 4, img_size // 4, 1), jnp.float32)
    method = "init_all" if hasattr(module, "init_all") else None
    return jax.jit(lambda r: module.init(r, x, points=pts, labels=lbl, masks=msk,
                                         method=method))(jax.random.PRNGKey(0))
