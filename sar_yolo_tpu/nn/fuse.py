"""Deploy-time parameter fusion: fold BatchNorm into convolutions and merge
RepVGG-style parallel branches.

Capability parity with the reference's inference fusing
(ultralytics/nn/tasks.py:205 BaseModel.fuse, nn/modules/conv.py fuse_convs /
get_equivalent_kernel_bias), redesigned functionally for JAX: instead of
mutating modules in place, `fuse_variables` transforms the parameter pytree and
the model is re-traced with `fused=True` (see `conv.py fused_mode`), so the
fused program contains no BN ops and one conv per Rep block.

Patterns folded (detected structurally in the params tree):
  * Conv:    {conv: {kernel}, bn: {scale, bias}}          -> {conv: {kernel, bias}}
  * Conv2:   {conv, cv2(1x1), bn}                         -> {conv: {kernel, bias}}
  * RepConv: {conv1: Conv(3x3), conv2: Conv(1x1)}         -> {conv: {kernel, bias}}
  * DSConv:  {dw, pw(1x1), bn}                            -> {dw, pw: {kernel, bias}}
Anything else (LayerNorm, RT-DETR input_proj BN, biased head convs) passes
through untouched, including its batch_stats.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

_EPS = 1e-3  # BatchNorm epsilon used across conv.py


def _is_leaf_conv(p) -> bool:
    return isinstance(p, dict) and "kernel" in p and "bias" not in p


def _is_conv_pattern(p) -> bool:
    return (isinstance(p, dict) and "conv" in p and "bn" in p
            and _is_leaf_conv(p["conv"]) and isinstance(p["bn"], dict)
            and "scale" in p["bn"])


def _is_conv2_pattern(p) -> bool:
    return (_is_conv_pattern(p) and "cv2" in p and _is_leaf_conv(p["cv2"])
            and p["cv2"]["kernel"].shape[:2] == (1, 1))


def _is_repconv_pattern(p) -> bool:
    return (isinstance(p, dict) and set(p) == {"conv1", "conv2"}
            and _is_conv_pattern(p["conv1"]) and _is_conv_pattern(p["conv2"])
            and p["conv1"]["conv"]["kernel"].shape[:2] == (3, 3)
            and p["conv2"]["conv"]["kernel"].shape[:2] == (1, 1))


def _is_repvggdw_pattern(p) -> bool:
    return (isinstance(p, dict) and set(p) == {"conv", "conv1"}
            and _is_conv_pattern(p["conv"]) and _is_conv_pattern(p["conv1"])
            and p["conv"]["conv"]["kernel"].shape[:2] == (7, 7)
            and p["conv1"]["conv"]["kernel"].shape[:2] == (3, 3))


def _is_dsconv_pattern(p) -> bool:
    return (isinstance(p, dict) and set(p) >= {"dw", "pw", "bn"}
            and _is_leaf_conv(p.get("dw", {})) and _is_leaf_conv(p.get("pw", {}))
            and isinstance(p["bn"], dict) and "scale" in p["bn"])


def _fold_bn(kernel, bn_params, bn_stats):
    """kernel (kh,kw,cin,cout), BN over cout -> (scaled kernel, bias)."""
    g = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _EPS)
    return kernel * g, bn_params["bias"] - bn_stats["mean"] * g


def _pad_1x1(kernel_1x1, k: int):
    """Embed a 1x1 kernel at the centre of a kxk kernel (zeros elsewhere)."""
    pad = k // 2
    return jnp.pad(kernel_1x1, ((pad, k - 1 - pad), (pad, k - 1 - pad), (0, 0), (0, 0)))


def _walk(params, stats):
    if not isinstance(params, dict):
        return params, stats
    stats = stats if isinstance(stats, dict) else {}

    if _is_repvggdw_pattern(params):
        # v10 RepVGGDW: parallel 7x7 + 3x3 depthwise -> one biased 7x7
        k7, b7 = _fold_bn(params["conv"]["conv"]["kernel"], params["conv"]["bn"],
                          stats["conv"]["bn"])
        k3, b3 = _fold_bn(params["conv1"]["conv"]["kernel"], params["conv1"]["bn"],
                          stats["conv1"]["bn"])
        k3_in_7 = jnp.pad(k3, ((2, 2), (2, 2), (0, 0), (0, 0)))
        return {"conv": {"kernel": k7 + k3_in_7, "bias": b7 + b3}}, {}

    if _is_repconv_pattern(params):
        k3, b3 = _fold_bn(params["conv1"]["conv"]["kernel"], params["conv1"]["bn"],
                          stats["conv1"]["bn"])
        k1, b1 = _fold_bn(params["conv2"]["conv"]["kernel"], params["conv2"]["bn"],
                          stats["conv2"]["bn"])
        return {"conv": {"kernel": k3 + _pad_1x1(k1, 3), "bias": b3 + b1}}, {}

    if _is_conv2_pattern(params):
        k = params["conv"]["kernel"] + _pad_1x1(params["cv2"]["kernel"],
                                                params["conv"]["kernel"].shape[0])
        k, b = _fold_bn(k, params["bn"], stats["bn"])
        rest_p, rest_s = _split_rest(params, stats, {"conv", "cv2", "bn"})
        return {"conv": {"kernel": k, "bias": b}, **rest_p}, rest_s

    if _is_dsconv_pattern(params):
        k, b = _fold_bn(params["pw"]["kernel"], params["bn"], stats["bn"])
        rest_p, rest_s = _split_rest(params, stats, {"pw", "bn"})
        return {"dw": dict(params["dw"]), "pw": {"kernel": k, "bias": b}, **rest_p}, rest_s

    if _is_conv_pattern(params):
        k, b = _fold_bn(params["conv"]["kernel"], params["bn"], stats["bn"])
        rest_p, rest_s = _split_rest(params, stats, {"conv", "bn"})
        return {"conv": {"kernel": k, "bias": b}, **rest_p}, rest_s

    new_p, new_s = {}, {}
    for key, child in params.items():
        cp, cs = _walk(child, stats.get(key, {}))
        new_p[key] = cp
        if cs:
            new_s[key] = cs
    # batch_stats entries with no params sibling (none in practice) pass through
    for key, child in stats.items():
        if key not in params:
            new_s[key] = child
    return new_p, new_s


def _split_rest(params, stats, consumed):
    """Recurse into sibling entries not consumed by a pattern fold."""
    rest_p, rest_s = {}, {}
    for key, child in params.items():
        if key in consumed:
            continue
        cp, cs = _walk(child, stats.get(key, {}))
        rest_p[key] = cp
        if cs:
            rest_s[key] = cs
    return rest_p, rest_s


def fuse_variables(variables: dict) -> dict:
    """Return variables for the `fused=True` trace of the same model.

    Exact at f32 (pure algebraic refold); unmatched BNs keep their batch_stats.
    """
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))
    new_p, new_s = _walk(params, stats)
    out = {"params": new_p}
    if new_s:
        out["batch_stats"] = new_s
    for key, val in variables.items():
        if key not in ("params", "batch_stats"):
            out[key] = val
    return out


def fuse(model, variables: dict):
    """(GraphModel, variables) -> (fused GraphModel, fused variables)."""
    return dataclasses.replace(model, fused=True), fuse_variables(variables)


def n_params(variables: dict) -> int:
    import jax

    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"])))
