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

MobileSAM checkpoints (same prompt/mask heads, TinyViT image encoder,
reference models/sam/modules/tiny_encoder.py) are auto-detected and routed
through `_map_tiny_encoder`, which also fills the flax `batch_stats`
collection from the Conv2d_BN running statistics. SAM2 checkpoints are
handled by translate_sam2_state_dict. Forward parity with converted weights
is pinned in tests/test_torch_parity.py::test_*sam*_converted_weights_*.
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


def _unwrap(state_dict):
    """Unwrap a {'model': module_or_state_dict} checkpoint wrapper."""
    if isinstance(state_dict, dict) and "model" in state_dict and \
            not any("." in k for k in state_dict if isinstance(k, str)):
        inner = state_dict["model"]
        return inner.state_dict() if hasattr(inner, "state_dict") else inner
    return state_dict


def _map_prompt_encoder(rest, t, params, base, point_rows):
    """Shared PromptEncoder key mapping (SAM1 'prompt_encoder.*' and SAM2
    'sam_prompt_encoder.*' use the identical reference class)."""
    if rest[0] == "pe_layer":
        _set(params, base + ["pe_layer", "gaussian_matrix"], t)
    elif rest[0] == "point_embeddings":
        point_rows[int(rest[1])] = t.reshape(-1)
    elif rest[0] == "not_a_point_embed":
        _set(params, base + ["not_a_point_embed"], t.reshape(-1))
    elif rest[0] == "no_mask_embed":
        _set(params, base + ["no_mask_embed"], t.reshape(-1))
    elif rest[0] == "mask_downscaling":
        idx, leaf = int(rest[1]), rest[-1]
        name = {0: "mask_conv1", 1: "mask_ln1", 3: "mask_conv2",
                4: "mask_ln2", 6: "mask_conv3"}[idx]
        if "conv" in name:
            _set(params, base + [name, "kernel" if leaf == "weight" else "bias"],
                 _conv(t) if leaf == "weight" else t)
        else:
            _set(params, base + [name, "scale" if leaf == "weight" else "bias"], t)
    else:
        return False
    return True


def _map_two_way_transformer(rest, t, params, base):
    """Shared TwoWayTransformer mapping. `rest` starts after 'transformer'.
    Handles both the SAM1 MLPBlock naming (mlp.lin{1,2}) and the SAM2 MLP
    naming (mlp.layers.{0,1})."""
    leaf = rest[-1]
    if rest[0] == "layers":
        base = base + [f"layer_{rest[1]}"]
        sub = rest[2]
        if sub.startswith("norm"):
            _set(params, base + [sub, "scale" if leaf == "weight" else "bias"], t)
        elif sub == "mlp":
            tag = rest[3] if rest[3] != "layers" else rest[4]
            lin = "mlp_lin1" if tag in ("lin1", "0") else "mlp_lin2"
            _set(params, base + [lin, "kernel" if leaf == "weight" else "bias"],
                 _lin(t) if leaf == "weight" else t)
        else:  # self_attn / cross_attn_* -> q/k/v/out projections
            _set(params, base + [sub, rest[3],
                                 "kernel" if leaf == "weight" else "bias"],
                 _lin(t) if leaf == "weight" else t)
    elif rest[0] == "final_attn_token_to_image":
        _set(params, base + ["final_attn_token_to_image", rest[1],
                             "kernel" if leaf == "weight" else "bias"],
             _lin(t) if leaf == "weight" else t)
    elif rest[0] == "norm_final_attn":
        _set(params, base + ["norm_final_attn",
                             "scale" if leaf == "weight" else "bias"], t)
    else:
        return False
    return True


def _map_convbn(rest, t, leaf, params, stats, base):
    """torch Conv2d_BN (tiny_encoder.py:24) -> flax ConvBN {c, bn}. Fills the
    `batch_stats` tree from running_mean/var; num_batches_tracked is dropped
    (flax keeps no step counter)."""
    if rest[0] == "c":
        _set(params, base + ["c", "kernel"], _conv(t))
    elif rest[0] == "bn":
        if leaf == "weight":
            _set(params, base + ["bn", "scale"], t)
        elif leaf == "bias":
            _set(params, base + ["bn", "bias"], t)
        elif leaf == "running_mean":
            _set(stats, base + ["bn", "mean"], t)
        elif leaf == "running_var":
            _set(stats, base + ["bn", "var"], t)
        elif leaf != "num_batches_tracked":
            return False
    else:
        return False
    return True


def _map_tiny_encoder(rest, t, params, stats):
    """TinyViT (MobileSAM) image-encoder keys -> tiny_vit.py names.

    torch module layout (reference tiny_encoder.py): patch_embed.seq.{0,1},
    layers.0.blocks.{i}.conv{1..3} (MBConv stage), layers.{L}.downsample
    (PatchMerging, L=0..2), layers.{L}.blocks.{i}.{attn,local_conv,mlp}
    (L=1..3), neck.{0..3}. The classification head (head/norm_head) is never
    used by SAM and is dropped.
    """
    leaf = rest[-1]
    base = ["image_encoder"]
    if rest[0] == "patch_embed":  # patch_embed.seq.{0,1}.{c,bn}.*
        name = "pe_conv1" if rest[2] == "0" else "pe_conv2"
        return _map_convbn(rest[3:], t, leaf, params, stats, base + [name])
    if rest[0] == "layers":
        layer, sub = int(rest[1]), rest[2]
        if sub == "downsample":  # layers.L.downsample.conv{j} -> merge{L+1}
            return _map_convbn(rest[4:], t, leaf, params, stats,
                               base + [f"merge{layer + 1}", rest[3]])
        if sub != "blocks":
            return False
        blk = int(rest[3])
        part = rest[4]
        if layer == 0:  # MBConv stage: conv1/conv2/conv3
            return _map_convbn(rest[5:], t, leaf, params, stats,
                               base + [f"s0_mb{blk}", part])
        bbase = base + [f"s{layer}_blk{blk}"]
        if part == "attn":
            if rest[5] == "attention_biases":
                _set(params, bbase + ["attn", "attention_biases"], t)
            elif rest[5] == "norm":
                _set(params, bbase + ["attn", "norm",
                                      "scale" if leaf == "weight" else "bias"], t)
            elif rest[5] in ("qkv", "proj"):
                _set(params, bbase + ["attn", rest[5],
                                      "kernel" if leaf == "weight" else "bias"],
                     _lin(t) if leaf == "weight" else t)
            else:
                return False
            return True
        if part == "local_conv":
            return _map_convbn(rest[5:], t, leaf, params, stats,
                               bbase + ["local_conv"])
        if part == "mlp":  # mlp.{norm,fc1,fc2}
            if rest[5] == "norm":
                _set(params, bbase + ["mlp_norm",
                                      "scale" if leaf == "weight" else "bias"], t)
            else:
                _set(params, bbase + [f"mlp_{rest[5]}",
                                      "kernel" if leaf == "weight" else "bias"],
                     _lin(t) if leaf == "weight" else t)
            return True
        return False
    if rest[0] == "neck":  # neck.{0..3}: conv/LN2d/conv/LN2d
        idx = int(rest[1])
        name = {0: "neck_conv1", 1: "neck_ln1", 2: "neck_conv2", 3: "neck_ln2"}[idx]
        if "conv" in name:
            _set(params, base + [name, "kernel"], _conv(t))
        else:
            _set(params, base + [name, "scale" if leaf == "weight" else "bias"], t)
        return True
    if rest[0] in ("head", "norm_head"):
        return True  # classification head: unused by SAM, dropped by design
    return False


def translate_sam_state_dict(state_dict, verbose: bool = False):
    """Returns ({'params': pytree}, skipped_keys). Accepts the Meta .pth layout
    (flat state_dict) or a {'model': module_or_state_dict} wrapper."""
    if isinstance(state_dict, dict) and "model" in state_dict and \
            not any(k.startswith(("image_encoder", "prompt_encoder", "mask_decoder"))
                    for k in state_dict):
        inner = state_dict["model"]
        state_dict = inner.state_dict() if hasattr(inner, "state_dict") else inner

    params: dict = {}
    stats: dict = {}
    skipped: list[str] = []
    point_rows: dict[int, np.ndarray] = {}
    # MobileSAM = same heads, TinyViT encoder (layers.* instead of blocks.*)
    is_tiny = any(isinstance(k, str) and k.startswith("image_encoder.layers.")
                  for k in state_dict)

    for key, tensor in state_dict.items():
        t = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else np.asarray(tensor)
        parts = key.split(".")
        top = parts[0]

        if top == "image_encoder" and is_tiny:
            if not _map_tiny_encoder(parts[1:], t, params, stats):
                skipped.append(key)

        elif top == "image_encoder":
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
            if not _map_prompt_encoder(parts[1:], t, params, ["prompt_encoder"],
                                       point_rows):
                skipped.append(key)

        elif top == "mask_decoder":
            rest = parts[1:]
            if rest[0] == "transformer":
                if not _map_two_way_transformer(rest[1:], t, params,
                                                ["mask_decoder", "transformer"]):
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
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables, skipped


# keys whose machinery this framework deliberately does not carry: the video
# memory protocol conditions on spatial memories only (no object-pointer
# tokens, reference sam.py:378 obj_ptr_proj / :388 obj_ptr_tpos_proj), and the
# mask-input-without-SAM shortcut (sam.py use_mask_input_as_output_without_sam
# -> mask_downsample) is served by the ordinary prompt-mask path here.
SAM2_UNMAPPED_OK = ("obj_ptr_proj", "obj_ptr_tpos_proj", "no_obj_ptr",
                    "no_obj_embed_spatial", "mask_downsample", "no_mem_pos_enc")


def translate_sam2_state_dict(state_dict, verbose: bool = False):
    """Torch SAM2/SAM2.1 checkpoint -> flax variables for modules2.SAM2Model.

    Covers the Hiera trunk, FPN neck, prompt encoder, SAM2 mask decoder
    (incl. object-score head and the conv_s0/conv_s1 high-res skips, which
    live as hr_proj0/hr_proj1 on the model here), memory encoder and memory
    attention. Returns ({'params': tree}, skipped) where `skipped` excludes
    the documented-deviation keys in SAM2_UNMAPPED_OK.
    """
    state_dict = _unwrap(state_dict)
    params: dict = {}
    skipped: list[str] = []
    point_rows: dict[int, np.ndarray] = {}

    for key, tensor in state_dict.items():
        t = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else np.asarray(tensor)
        parts = key.split(".")
        top = parts[0]
        leaf = parts[-1]

        if top in ("no_mem_embed", "maskmem_tpos_enc"):
            _set(params, [top], t)

        elif top.startswith(SAM2_UNMAPPED_OK):
            continue  # documented deviations, not conversion gaps

        elif top == "image_encoder":
            rest = parts[1:]
            if rest[0] == "trunk":
                r = rest[1:]
                if r[0] in ("pos_embed", "pos_embed_window"):
                    _set(params, ["trunk", r[0]], t.transpose(0, 2, 3, 1))
                elif r[0] == "patch_embed":
                    _set(params, ["trunk", "patch_embed",
                                  "kernel" if leaf == "weight" else "bias"],
                         _conv(t) if leaf == "weight" else t)
                elif r[0] == "blocks":
                    blk = ["trunk", f"block_{r[1]}"]
                    sub = r[2]
                    if sub in ("norm1", "norm2"):
                        _set(params, blk + [sub, "scale" if leaf == "weight" else "bias"], t)
                    elif sub == "attn":
                        _set(params, blk + ["attn", r[3],
                                            "kernel" if leaf == "weight" else "bias"],
                             _lin(t) if leaf == "weight" else t)
                    elif sub == "mlp":
                        lin = "mlp_lin1" if r[4] == "0" else "mlp_lin2"
                        _set(params, blk + [lin, "kernel" if leaf == "weight" else "bias"],
                             _lin(t) if leaf == "weight" else t)
                    elif sub == "proj":
                        _set(params, blk + ["proj", "kernel" if leaf == "weight" else "bias"],
                             _lin(t) if leaf == "weight" else t)
                    else:
                        skipped.append(key)
                else:
                    skipped.append(key)
            elif rest[0] == "neck" and rest[1] == "convs":
                _set(params, ["neck", f"conv_{rest[2]}",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv(t) if leaf == "weight" else t)
            else:
                skipped.append(key)

        elif top == "sam_prompt_encoder":
            if not _map_prompt_encoder(parts[1:], t, params, ["sam_prompt_encoder"],
                                       point_rows):
                skipped.append(key)

        elif top == "sam_mask_decoder":
            rest = parts[1:]
            if rest[0] == "transformer":
                if not _map_two_way_transformer(rest[1:], t, params,
                                                ["sam_mask_decoder", "transformer"]):
                    skipped.append(key)
            elif rest[0] in ("iou_token", "mask_tokens", "obj_score_token"):
                _set(params, ["sam_mask_decoder", rest[0]], t)
            elif rest[0] == "output_upscaling":
                idx = int(rest[1])
                name = {0: "upscale_conv1", 1: "upscale_ln", 3: "upscale_conv2"}[idx]
                if "conv" in name:
                    _set(params, ["sam_mask_decoder", name,
                                  "kernel" if leaf == "weight" else "bias"],
                         _convT(t) if leaf == "weight" else t)
                else:
                    _set(params, ["sam_mask_decoder", name,
                                  "scale" if leaf == "weight" else "bias"], t)
            elif rest[0] in ("conv_s0", "conv_s1"):
                # decoder-owned in the reference; model-level skip projections here
                name = "hr_proj0" if rest[0] == "conv_s0" else "hr_proj1"
                _set(params, [name, "kernel" if leaf == "weight" else "bias"],
                     _conv(t) if leaf == "weight" else t)
            elif rest[0] == "output_hypernetworks_mlps":
                _set(params, ["sam_mask_decoder", f"hyper_mlp_{rest[1]}",
                              f"l{rest[3]}", "kernel" if leaf == "weight" else "bias"],
                     _lin(t) if leaf == "weight" else t)
            elif rest[0] == "iou_prediction_head":
                _set(params, ["sam_mask_decoder", "iou_head", f"l{rest[2]}",
                              "kernel" if leaf == "weight" else "bias"],
                     _lin(t) if leaf == "weight" else t)
            elif rest[0] == "pred_obj_score_head":
                _set(params, ["sam_mask_decoder", "obj_score_head", f"l{rest[2]}",
                              "kernel" if leaf == "weight" else "bias"],
                     _lin(t) if leaf == "weight" else t)
            else:
                skipped.append(key)

        elif top == "memory_attention":
            rest = parts[1:]
            if rest[0] == "layers":
                base = ["memory_attention", f"layer_{rest[1]}"]
                sub = rest[2]
                if sub in ("self_attn", "cross_attn_image"):
                    _set(params, base + [sub, rest[3],
                                         "kernel" if leaf == "weight" else "bias"],
                         _lin(t) if leaf == "weight" else t)
                elif sub in ("linear1", "linear2"):
                    _set(params, base + [sub, "kernel" if leaf == "weight" else "bias"],
                         _lin(t) if leaf == "weight" else t)
                elif sub.startswith("norm"):
                    _set(params, base + [sub, "scale" if leaf == "weight" else "bias"], t)
                else:
                    skipped.append(key)
            elif rest[0] == "norm":
                _set(params, ["memory_attention", "norm",
                              "scale" if leaf == "weight" else "bias"], t)
            else:
                skipped.append(key)

        elif top == "memory_encoder":
            rest = parts[1:]
            if rest[0] == "mask_downsampler":
                idx = int(rest[2])
                if idx == 12:
                    name, is_conv = "proj", True
                elif idx % 3 == 0:
                    name, is_conv = f"conv_{idx // 3}", True
                else:
                    name, is_conv = f"ln_{idx // 3}", False
                if is_conv:
                    _set(params, ["memory_encoder", "mask_downsampler", name,
                                  "kernel" if leaf == "weight" else "bias"],
                         _conv(t) if leaf == "weight" else t)
                else:
                    _set(params, ["memory_encoder", "mask_downsampler", name,
                                  "scale" if leaf == "weight" else "bias"], t)
            elif rest[0] in ("pix_feat_proj", "out_proj"):
                _set(params, ["memory_encoder", rest[0],
                              "kernel" if leaf == "weight" else "bias"],
                     _conv(t) if leaf == "weight" else t)
            elif rest[0] == "fuser":
                base = ["memory_encoder", f"fuser_{rest[2]}"]
                sub = rest[3]
                if sub == "gamma":
                    _set(params, base + ["gamma"], t)
                elif sub == "dwconv":
                    _set(params, base + ["dwconv",
                                         "kernel" if leaf == "weight" else "bias"],
                         _conv(t) if leaf == "weight" else t)
                elif sub == "norm":
                    _set(params, base + ["norm",
                                         "scale" if leaf == "weight" else "bias"], t)
                elif sub in ("pwconv1", "pwconv2"):
                    _set(params, base + [sub, "kernel" if leaf == "weight" else "bias"],
                         _lin(t) if leaf == "weight" else t)
                else:
                    skipped.append(key)
            else:
                skipped.append(key)

        elif top in ("pixel_mean", "pixel_std"):
            continue
        else:
            skipped.append(key)

    if point_rows:
        _set(params, ["sam_prompt_encoder", "point_embeddings"],
             np.stack([point_rows[i] for i in sorted(point_rows)]))
    if verbose and skipped:
        print(f"translate_sam2_state_dict: {len(skipped)} unmapped keys: {skipped[:8]}")
    return {"params": params}, skipped
