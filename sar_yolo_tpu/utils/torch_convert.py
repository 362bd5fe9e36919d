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

        # v10Detect one2one branch copies: one2one_cv2/... -> our o2o_ prefix
        mid = [m.replace("one2one_cv", "o2o_cv") if m.startswith("one2one_cv") else m
               for m in mid]

        # path translation
        out: list[str] = [layer]
        is_head = any(i + 2 < len(mid) and mid[i + 1].isdigit() and mid[i + 2].isdigit()
                      for i, p in enumerate(mid)
                      if p in ("cv2", "cv3", "cv4", "o2o_cv2", "o2o_cv3"))
        i = 0
        while i < len(mid):
            p = mid[i]
            if p == "m" and i + 1 < len(mid) and mid[i + 1].isdigit():
                # A2C2f stacks pairs of ABlocks per slot: m.{i}.{j} -> m{i}_{j}
                if i + 2 < len(mid) and mid[i + 2].isdigit() and \
                        i + 3 < len(mid) and mid[i + 3] in ("attn", "mlp"):
                    out.append(f"m{mid[i + 1]}_{mid[i + 2]}")
                    i += 3
                    continue
                out.append(f"m{mid[i + 1]}")
                i += 2
                continue
            if p in ("cv2", "cv3", "cv4", "o2o_cv2", "o2o_cv3") and is_head and \
                    i + 2 < len(mid) and mid[i + 1].isdigit() and mid[i + 2].isdigit():
                # Detect branches: cv2.{level}.{stage}
                level, stage = mid[i + 1], mid[i + 2]
                if stage == "2":
                    out.append(f"{p}_{level}_pred")
                    i += 3
                    continue
                # non-legacy cls branch: cv3.{l}.{s}.{0|1} = Sequential(DWConv, Conv)
                if p.endswith("cv3") and i + 3 < len(mid) and mid[i + 3] in ("0", "1"):
                    sub = mid[i + 3]
                    # DWConv shares scope with its inner Conv (conv.py), so the
                    # dw module maps flat: cv3.{l}.{s}.0 -> cv3_{l}_{s}dw
                    out.append(f"{p}_{level}_{stage}{'dw' if sub == '0' else 'pw'}")
                    i += 4
                    continue
                out.append(f"{p}_{level}_{stage}")
                i += 3
                continue
            if p == "cv4" and i + 1 < len(mid) and mid[i + 1].isdigit() and \
                    (i + 2 >= len(mid) or mid[i + 2] == "norm"):
                # WorldDetect contrastive heads: cv4.{i}.{bias,logit_scale,norm.*}
                lvl = mid[i + 1]
                if i + 2 < len(mid) and mid[i + 2] == "norm":
                    out.append(f"cv4_{lvl}_norm")
                    i += 3
                else:
                    out.append(f"cv4_{lvl}")  # leaf renamed below
                    i += 2
                continue
            if re.fullmatch(r"cv\d", p) and i + 1 < len(mid) and mid[i + 1].isdigit() \
                    and not (i + 2 < len(mid) and mid[i + 2].isdigit()):
                # ELAN-style Sequential containers (RepNCSPELAN4 cv2/cv3 =
                # Sequential(RepCSP, Conv)): cv2.0 -> cv2_0 (single digit —
                # two consecutive digits is the Detect-head case above)
                out.append(f"{p}_{mid[i + 1]}")
                i += 2
                continue
            if p in ("query", "key", "value") and i + 1 < len(mid) and \
                    mid[i + 1] in ("0", "1"):
                # ImagePoolingAttn Sequential(LayerNorm, Linear)
                out.append(f"{p}_ln" if mid[i + 1] == "0" else f"{p}_fc")
                i += 2
                continue
            if p == "projections" and i + 1 < len(mid) and mid[i + 1].isdigit():
                out.append(f"projections_{mid[i + 1]}")  # raw nn.Conv2d, bias=True
                i += 2
                continue
            if p == "layer" and i + 1 < len(mid) and mid[i + 1].isdigit():
                # ResNetLayer Sequential: layer.{j} -> layer_{j}
                out.append(f"layer_{mid[i + 1]}")
                i += 2
                continue
            if p in ("conv", "shortcut") and i + 1 < len(mid) and mid[i + 1].isdigit():
                # GhostBottleneck Sequentials: conv.0/.1/.2, shortcut.0/.1
                out.append(f"{p}_{mid[i + 1]}")
                i += 2
                continue
            if p == "ffn" and i + 1 < len(mid) and mid[i + 1].isdigit():
                # PSABlock ffn = Sequential(Conv, Conv): ffn.0/ffn.1 -> ffn1/ffn2;
                # torch PSA (v10) holds attn/ffn directly — ours nests them in a
                # PSABlock named 'm', so top-level ffn/attn gain that wrapper
                if len(out) == 1:
                    out.append("m")
                out.append(f"ffn{int(mid[i + 1]) + 1}")
                i += 2
                continue
            if p == "attn" and len(out) == 1 and i == 0 and \
                    i + 1 < len(mid) and mid[i + 1] in ("qkv", "proj", "pe"):
                # torch PSA.attn at top level -> our m/attn (qkv/proj/pe children;
                # C2fAttn's attn.{gl,ec,proj_conv} maps verbatim instead)
                out.append("m")
                out.append("attn")
                i += 1
                continue
            if p == "mlp" and i + 1 < len(mid) and mid[i + 1].isdigit():
                out.append(f"mlp{int(mid[i + 1]) + 1}")  # mlp.0/mlp.1 -> mlp1/mlp2
                i += 2
                continue
            # ---- RT-DETR transformer structures (nn/modules/transformer.py) ----
            if p == "decoder" and i + 2 < len(mid) and mid[i + 1] == "layers" and \
                    mid[i + 2].isdigit():
                out.append(f"dec_layer_{mid[i + 2]}")
                i += 3
                continue
            if p in ("dec_score_head", "dec_bbox_head") and i + 1 < len(mid) and \
                    mid[i + 1].isdigit():
                out.append(f"{p}_{mid[i + 1]}")
                i += 2
                continue
            if p == "layers" and i + 1 < len(mid) and mid[i + 1].isdigit():
                out.append(f"l{mid[i + 1]}")  # torch MLP layers.N -> our l{N}
                i += 2
                continue
            if p == "input_proj" and i + 2 < len(mid) and mid[i + 1].isdigit():
                n, sub = mid[i + 1], mid[i + 2]
                out.append(f"input_proj_{n}" if sub == "0" else f"input_proj_bn_{n}")
                i += 3
                continue
            if p == "enc_output" and i + 1 < len(mid) and mid[i + 1] == "1":
                out.append("enc_norm")  # Sequential(Linear, LayerNorm)[1]
                i += 2
                continue
            if p == "out_proj":  # nn.MultiheadAttention out projection -> our 'out'
                out.append("out")
                i += 1
                continue
            if p in ("edge_proj", "node_proj", "enc_output") and i + 1 < len(mid) \
                    and mid[i + 1] == "0":
                out.append(p)  # Sequential(Linear, GELU) -> single Dense
                i += 2
                continue
            if p == "conv_adjusts" and i + 1 < len(mid) and mid[i + 1].isdigit():
                # 4-scale FuseModule (P24): reference lazily creates the REAL fuse
                # conv in a ModuleDict keyed by concat width (block.py:1895) and
                # leaves the __init__-time conv_out dead; both torch paths map to
                # our single conv_out — the live one is registered later in the
                # state_dict, so it wins the overwrite
                out.append("conv_out")
                i += 2
                continue
            if p == "state_predictor" and i + 1 < len(mid) and mid[i + 1].isdigit():
                out.append({"0": "state_fc1", "3": "state_fc2"}[mid[i + 1]])
                i += 2
                continue
            if i == 0 and len(out) == 1 and p in ("ma", "fc1", "fc2", "norm1", "norm2"):
                out.append("enc")  # AIFI wraps its encoder layer in scope 'enc'
            out.append(p)
            i += 1

        # torch nn.MultiheadAttention packs qkv: split thirds into our q/k/v Dense
        if leaf in ("in_proj_weight", "in_proj_bias") and out and \
                out[-1] in ("ma", "self_attn"):
            C = t.shape[0] // 3
            for j, nm in enumerate(("q", "k", "v")):
                part = t[j * C:(j + 1) * C]
                _set(params, out + [nm, "kernel" if leaf.endswith("weight") else "bias"],
                     part.T if part.ndim == 2 else part)
            continue

        if out and re.fullmatch(r"cv4_\d+", str(out[-1])) and t.size == 1 \
                and leaf in ("bias", "logit_scale"):
            # WorldDetect contrastive-head scalars: flat params on the head scope
            # (JDE/Segment cv4_{l}_{s}/_pred conv leaves never match this shape)
            _set(params, out[:-1] + [f"{out[-1]}_{leaf}"], t.reshape(()))
            continue
        if out and str(out[-1]).startswith("projections_") and leaf in ("weight", "bias"):
            # ImagePoolingAttn raw nn.Conv2d level projections
            _set(params, out + ["kernel" if leaf == "weight" else "bias"],
                 np.transpose(t, (2, 3, 1, 0)) if leaf == "weight" else t)
            continue
        if leaf in ("gamma", "gate", "prototype_base", "scale"):
            _set(params, out + [leaf], t)
        elif leaf == "weight" and mid and mid[-1] in ("conv", "dw", "pw"):
            out.append("kernel")
            _set(params, out, np.transpose(t, (2, 3, 1, 0)))
        elif (mid and mid[-1] == "bn") or str(out[-1]).startswith("input_proj_bn") \
                or str(out[-1]).endswith("_norm"):  # BNContrastiveHead cv4_{i}_norm
            name = {"weight": "scale", "bias": "bias"}.get(leaf)
            if name:
                _set(params, out + [name], t)
            elif leaf == "running_mean":
                _set(batch_stats, out + ["mean"], t)
            elif leaf == "running_var":
                _set(batch_stats, out + ["var"], t)
        elif leaf == "weight" and str(out[-1]).startswith("input_proj_"):
            _set(params, out + ["kernel"], np.transpose(t, (2, 3, 1, 0)))  # raw nn.Conv
        elif leaf in ("weight", "bias") and t.ndim <= 1 and \
                (str(out[-1]).split("/")[-1].startswith(("norm", "enc_norm"))
                 or str(out[-1]).endswith("_ln")):
            # LayerNorm: torch weight -> flax scale
            _set(params, out + ["scale" if leaf == "weight" else "bias"], t)
        elif leaf == "weight" and str(out[-1]).endswith("_embed"):
            _set(params, out + ["embedding"], t)  # nn.Embed, no transpose
        elif out[-1].endswith("_pred"):
            if leaf == "weight":
                _set(params, out + ["kernel"], np.transpose(t, (2, 3, 1, 0)))
            else:
                _set(params, out + ["bias"], t)
        elif leaf in ("weight", "bias") and mid and \
                (mid[-2:] == ["channel_attention", "fc"] or
                 mid[-2:] == ["spatial_attention", "cv1"]):
            # CBAM attention convs are raw nn.Conv2d (no BN wrapper, conv.py:304,320)
            if leaf == "weight":
                _set(params, out + ["kernel"], np.transpose(t, (2, 3, 1, 0)))
            else:
                _set(params, out + ["bias"], t)
        elif leaf == "weight" and t.ndim == 4:
            _set(params, out + ["conv", "kernel"], np.transpose(t, (2, 3, 1, 0)))
        elif leaf == "bias" and mid and mid[-1] == "upsample":
            # Proto's ConvTranspose2d bias lives inside our inner 'conv' module
            _set(params, out + ["conv", "bias"], t)
        elif leaf in ("weight", "bias") and t.ndim <= 2:
            # linear layers (state MLP etc.): torch (out, in) -> flax (in, out)
            name = "kernel" if leaf == "weight" else "bias"
            _set(params, out + [name], t.T if t.ndim == 2 else t)
        else:
            skipped.append(key)
    if verbose and skipped:
        print("skipped keys:", skipped)
    return {"params": params, "batch_stats": batch_stats}, skipped
