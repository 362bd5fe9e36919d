"""Torch SAM checkpoint -> flax variables converter.

Maps a Meta/ultralytics SAM state_dict (ImageEncoderViT + PromptEncoder +
MaskDecoder; reference models/sam/modules/{encoders,decoders,transformer}.py)
onto the SAMModel parameter tree in modules.py. Layout rules:

  torch Linear (out, in)            -> flax Dense kernel (in, out)
  torch Conv2d (O, I, kh, kw)       -> flax Conv kernel (kh, kw, I, O)
  torch ConvTranspose2d (I, O, k, k)-> flax ConvTranspose kernel (k, k, O, I)
                                       (transpose_kernel=True in modules.py)
  torch LayerNorm/LayerNorm2d       -> scale/bias
  nn.Embedding(1, C).weight         -> (C,) vector  (stacked (4, C) for the
                                       four point types)

SAM2/MobileSAM checkpoints are handled by their own builders (modules2.py);
this covers the classic sam_b/l/h ViT family. Forward parity with converted
weights is pinned in tests/test_torch_parity.py::test_sam_converted_weights_*.
"""

from __future__ import annotations

import numpy as np


def _set(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _lin(w):     # torch Linear weight -> Dense kernel
    return w.T


def _conv(w):    # torch Conv2d weight -> Conv kernel
    return w.transpose(2, 3, 1, 0)


def _convT(w):   # torch ConvTranspose2d weight -> flax ConvTranspose kernel
    # modules.py uses transpose_kernel=True (torch orientation), which expects
    # the forward-conv layout (k, k, O, I) — same recipe as utils/torch_convert
    return w.transpose(2, 3, 1, 0)


def translate_sam_state_dict(state_dict, verbose: bool = False):
    """Returns ({'params': pytree}, skipped_keys). Accepts the Meta .pth layout
    (flat state_dict) or a {'model': module_or_state_dict} wrapper."""
    if isinstance(state_dict, dict) and "model" in state_dict and \
            not any(k.startswith(("image_encoder", "prompt_encoder", "mask_decoder"))
                    for k in state_dict):
        inner = state_dict["model"]
        state_dict = inner.state_dict() if hasattr(inner, "state_dict") else inner

    params: dict = {}
    skipped: list[str] = []
    point_rows: dict[int, np.ndarray] = {}

    for key, tensor in state_dict.items():
        t = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else np.asarray(tensor)
        parts = key.split(".")
        top = parts[0]

        if top == "image_encoder":
            rest = parts[1:]
            if rest[0] == "pos_embed":
                _set(params, ["image_encoder", "pos_embed"], t)
            elif rest[0] == "patch_embed":
                _set(params, ["image_encoder", "patch_embed",
                              "kernel" if rest[-1] == "weight" else "bias"],
                     _conv(t) if rest[-1] == "weight" else t)
            elif rest[0] == "blocks":
                blk = f"block_{rest[1]}"
                sub, leaf = rest[2], rest[-1]
                if sub in ("norm1", "norm2"):
                    _set(params, ["image_encoder", blk, sub,
                                  "scale" if leaf == "weight" else "bias"], t)
                elif sub == "attn":
                    name = rest[3]
                    if name in ("rel_pos_h", "rel_pos_w"):
                        _set(params, ["image_encoder", blk, "attn", name], t)
                    else:  # qkv / proj linear
                        _set(params, ["image_encoder", blk, "attn", name,
                                      "kernel" if leaf == "weight" else "bias"],
                             _lin(t) if leaf == "weight" else t)
                elif sub == "mlp":
                    _set(params, ["image_encoder", blk, "mlp", rest[3],
                                  "kernel" if leaf == "weight" else "bias"],
                         _lin(t) if leaf == "weight" else t)
                else:
                    skipped.append(key)
            elif rest[0] == "neck":
                idx, leaf = int(rest[1]), rest[-1]
                name = {0: "neck_conv1", 1: "neck_ln1", 2: "neck_conv2", 3: "neck_ln2"}[idx]
                if "conv" in name:
                    _set(params, ["image_encoder", name, "kernel"], _conv(t))
                else:
                    _set(params, ["image_encoder", name,
                                  "scale" if leaf == "weight" else "bias"], t)
            else:
                skipped.append(key)

        elif top == "prompt_encoder":
            rest = parts[1:]
            if rest[0] == "pe_layer":
                _set(params, ["prompt_encoder", "pe_layer", "gaussian_matrix"], t)
            elif rest[0] == "point_embeddings":
                point_rows[int(rest[1])] = t.reshape(-1)
            elif rest[0] == "not_a_point_embed":
                _set(params, ["prompt_encoder", "not_a_point_embed"], t.reshape(-1))
            elif rest[0] == "no_mask_embed":
                _set(params, ["prompt_encoder", "no_mask_embed"], t.reshape(-1))
            elif rest[0] == "mask_downscaling":
                idx, leaf = int(rest[1]), rest[-1]
                name = {0: "mask_conv1", 1: "mask_ln1", 3: "mask_conv2",
                        4: "mask_ln2", 6: "mask_conv3"}[idx]
                if "conv" in name:
                    _set(params, ["prompt_encoder", name,
                                  "kernel" if leaf == "weight" else "bias"],
                         _conv(t) if leaf == "weight" else t)
                else:
                    _set(params, ["prompt_encoder", name,
                                  "scale" if leaf == "weight" else "bias"], t)
            else:
                skipped.append(key)

        elif top == "mask_decoder":
            rest = parts[1:]
            if rest[0] == "transformer":
                if rest[1] == "layers":
                    base = ["mask_decoder", "transformer", f"layer_{rest[2]}"]
                    sub, leaf = rest[3], rest[-1]
                    if sub.startswith("norm"):
                        _set(params, base + [sub, "scale" if leaf == "weight" else "bias"], t)
                    elif sub == "mlp":
                        _set(params, base + [f"mlp_{rest[4]}",
                                             "kernel" if leaf == "weight" else "bias"],
                             _lin(t) if leaf == "weight" else t)
                    else:  # self_attn / cross_attn_* -> q/k/v/out projections
                        _set(params, base + [sub, rest[4],
                                             "kernel" if leaf == "weight" else "bias"],
                             _lin(t) if leaf == "weight" else t)
                elif rest[1] == "final_attn_token_to_image":
                    _set(params, ["mask_decoder", "transformer",
                                  "final_attn_token_to_image", rest[2],
                                  "kernel" if rest[-1] == "weight" else "bias"],
                         _lin(t) if rest[-1] == "weight" else t)
                elif rest[1] == "norm_final_attn":
                    _set(params, ["mask_decoder", "transformer", "norm_final_attn",
                                  "scale" if rest[-1] == "weight" else "bias"], t)
                else:
                    skipped.append(key)
            elif rest[0] == "iou_token":
                _set(params, ["mask_decoder", "iou_token"], t)
            elif rest[0] == "mask_tokens":
                _set(params, ["mask_decoder", "mask_tokens"], t)
            elif rest[0] == "output_upscaling":
                idx, leaf = int(rest[1]), rest[-1]
                name = {0: "upscale_conv1", 1: "upscale_ln", 3: "upscale_conv2"}[idx]
                if "conv" in name:
                    _set(params, ["mask_decoder", name,
                                  "kernel" if leaf == "weight" else "bias"],
                         _convT(t) if leaf == "weight" else t)
                else:
                    _set(params, ["mask_decoder", name,
                                  "scale" if leaf == "weight" else "bias"], t)
            elif rest[0] == "output_hypernetworks_mlps":
                _set(params, ["mask_decoder", f"hyper_mlp_{rest[1]}", f"l{rest[3]}",
                              "kernel" if rest[-1] == "weight" else "bias"],
                     _lin(t) if rest[-1] == "weight" else t)
            elif rest[0] == "iou_prediction_head":
                _set(params, ["mask_decoder", "iou_head", f"l{rest[2]}",
                              "kernel" if rest[-1] == "weight" else "bias"],
                     _lin(t) if rest[-1] == "weight" else t)
            else:
                skipped.append(key)
        elif top in ("pixel_mean", "pixel_std"):
            continue  # constants, baked into SAMModel.preprocess
        else:
            skipped.append(key)

    if point_rows:
        _set(params, ["prompt_encoder", "point_embeddings"],
             np.stack([point_rows[i] for i in sorted(point_rows)]))
    if verbose and skipped:
        print(f"translate_sam_state_dict: {len(skipped)} unmapped keys: {skipped[:8]}")
    return {"params": params}, skipped
