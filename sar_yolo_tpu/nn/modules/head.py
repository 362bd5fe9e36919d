"""Detection heads: Detect (anchor-free + DFL), JDE (det + ReID embed + posture state),
Pose, Segment, OBB, Classify.

Capability parity with ultralytics/nn/modules/head.py (Detect:21, JDE:174,
Segment:252, OBB:277, Pose:307, Classify:359). TPU-native redesign: heads emit raw
per-level NHWC maps; decode (DFL softmax, dist2bbox, sigmoid) lives in
`sar_yolo_tpu.ops.decode` as pure jittable functions so train/val/predict paths
compose functionally instead of branching on a module flag.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .conv import Conv, DWConv, conv_init

Dtype = Any


def _pred_conv(features: int, name: str, dtype):
    """Final 1x1 prediction conv (with bias, torch-default-like init)."""
    return nn.Conv(features, (1, 1), use_bias=True, dtype=dtype, param_dtype=jnp.float32,
                   kernel_init=conv_init, name=name)


class Detect(nn.Module):
    """Anchor-free decoupled detect head with DFL box regression.

    Outputs a list of per-level (B, H, W, 4*reg_max + nc) maps.
    `legacy` selects the v8-style cls branch; non-legacy uses the v13 DWConv branch.
    """

    nc: int = 80
    ch: tuple = ()
    reg_max: int = 16
    legacy: bool = False
    dtype: Dtype = jnp.float32

    @property
    def no(self):
        return self.nc + self.reg_max * 4

    def _box_branch(self, x, i, train, prefix=""):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        y = Conv(c2, 3, dtype=self.dtype, name=f"{prefix}cv2_{i}_0")(x, train)
        y = Conv(c2, 3, dtype=self.dtype, name=f"{prefix}cv2_{i}_1")(y, train)
        return _pred_conv(4 * self.reg_max, f"{prefix}cv2_{i}_pred", self.dtype)(y)

    def _cls_branch(self, x, i, train, prefix=""):
        c3 = max(self.ch[0], min(self.nc, 100))
        if self.legacy:
            y = Conv(c3, 3, dtype=self.dtype, name=f"{prefix}cv3_{i}_0")(x, train)
            y = Conv(c3, 3, dtype=self.dtype, name=f"{prefix}cv3_{i}_1")(y, train)
        else:
            y = DWConv(x.shape[-1], 3, dtype=self.dtype, name=f"{prefix}cv3_{i}_0dw")(x, train)
            y = Conv(c3, 1, dtype=self.dtype, name=f"{prefix}cv3_{i}_0pw")(y, train)
            y = DWConv(c3, 3, dtype=self.dtype, name=f"{prefix}cv3_{i}_1dw")(y, train)
            y = Conv(c3, 1, dtype=self.dtype, name=f"{prefix}cv3_{i}_1pw")(y, train)
        return _pred_conv(self.nc, f"{prefix}cv3_{i}_pred", self.dtype)(y)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        for i, x in enumerate(xs):
            box = self._box_branch(x, i, train)
            cls = self._cls_branch(x, i, train)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs


class v10Detect(Detect):
    """NMS-free end-to-end detect head (reference head.py:669).

    Two head copies: one2many (trained with topk=10 assignment) and one2one
    (topk=1 — consistent dual assignment). Training returns both map lists as a
    dict; inference returns only the one2one maps, whose decode skips NMS
    entirely (ops/decode.postprocess_end2end) — on TPU this removes the last
    non-matmul stage from the serve path.
    """

    @nn.compact
    def __call__(self, xs, train: bool = False):
        # both branches always traced (params must exist at init); at inference
        # the unused one2many maps are dead code and XLA prunes them
        o2o = [jnp.concatenate([self._box_branch(x, i, train, prefix="o2o_"),
                                self._cls_branch(x, i, train, prefix="o2o_")], -1)
               for i, x in enumerate(xs)]
        o2m = [jnp.concatenate([self._box_branch(x, i, train),
                                self._cls_branch(x, i, train)], -1)
               for i, x in enumerate(xs)]
        return {"one2many": o2m, "one2one": o2o} if train else o2o


class WorldDetect(Detect):
    """Text-conditioned open-vocabulary detect head (reference head.py:384).

    The cls branch emits `embed_dim` image features per anchor; class logits are
    the BN-contrastive similarity against per-class text embeddings, stored as
    a parameter so `set_classes` can swap vocabularies by functional param
    surgery (the reference mutates model.txt_feats; here it's a variables
    update — jit-compatible).
    """

    embed_dim: int = 512
    with_bn: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False, txt=None):
        if txt is None:  # standalone use: the graph usually owns the text param
            txt = self.param("text_embeddings",
                             nn.initializers.normal(0.02), (self.nc, self.embed_dim),
                             jnp.float32)
        # both contrastive heads l2-normalize the text side; BN replaces only
        # the image-side normalization (reference block.py:540,580)
        t = txt.astype(jnp.float32)
        t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-6)
        outs = []
        for i, x in enumerate(xs):
            box = self._box_branch(x, i, train)
            c3 = max(self.ch[0], min(self.nc, 100))
            y = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            y = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(y, train)
            emb = _pred_conv(self.embed_dim, f"cv3_{i}_pred", self.dtype)(y)
            e = emb.astype(jnp.float32)
            # per-level contrastive head (reference cv4: ContrastiveHead /
            # BNContrastiveHead, head.py:392 + block.py:529-585)
            bias = self.param(f"cv4_{i}_bias", nn.initializers.constant(-10.0), (),
                              jnp.float32)
            if self.with_bn:
                scale = self.param(f"cv4_{i}_logit_scale",
                                   nn.initializers.constant(-1.0), (), jnp.float32)
                e = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 param_dtype=jnp.float32, name=f"cv4_{i}_norm")(e)
            else:
                scale = self.param(f"cv4_{i}_logit_scale",
                                   nn.initializers.constant(math.log(1 / 0.07)),
                                   (), jnp.float32)
                e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-6)
            tq = t if t.ndim == 2 else t[0]
            logits = jnp.einsum("bhwe,ce->bhwc", e, tq) * jnp.exp(scale) + bias
            outs.append(jnp.concatenate([box, logits.astype(box.dtype)], -1))
        return outs


class JDE(Detect):
    """Joint Detection + Embedding head with optional posture-state prediction.

    Adds a cv4 embedding branch and a per-anchor state MLP on the embedding
    (reference head.py:174-249). Per-level output channels:
        4*reg_max + nc + embed_dim [+ state_classes]
    """

    embed_dim: int = 128
    state_classes: int | None = None

    @property
    def no(self):
        n = self.nc + self.reg_max * 4 + self.embed_dim
        return n + (self.state_classes or 0)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c4 = max(self.ch[0] // 4, self.embed_dim)
        # state predictor MLP is shared across pyramid levels (one instance,
        # multiple calls), matching reference head.py:186-191
        if self.state_classes is not None:
            state_fc1 = nn.Dense(self.embed_dim // 2, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="state_fc1")
            state_fc2 = nn.Dense(self.state_classes, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="state_fc2")
        outs = []
        for i, x in enumerate(xs):
            box = self._box_branch(x, i, train)
            cls = self._cls_branch(x, i, train)
            e = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            e = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(e, train)
            emb = _pred_conv(self.embed_dim, f"cv4_{i}_pred", self.dtype)(e)
            parts = [box, cls, emb]
            if self.state_classes is not None:
                s = nn.relu(state_fc1(emb))
                s = nn.Dropout(0.1, deterministic=not train)(s)
                parts.append(state_fc2(s))
            outs.append(jnp.concatenate(parts, axis=-1))
        return outs


class Pose(Detect):
    """Keypoint head: Detect + per-anchor (nk) keypoint regression branch."""

    kpt_shape: tuple = (17, 3)

    @property
    def no(self):
        return self.nc + self.reg_max * 4 + self.kpt_shape[0] * self.kpt_shape[1]

    @nn.compact
    def __call__(self, xs, train: bool = False):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        outs = []
        for i, x in enumerate(xs):
            box = self._box_branch(x, i, train)
            cls = self._cls_branch(x, i, train)
            k = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            k = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(k, train)
            kpt = _pred_conv(nk, f"cv4_{i}_pred", self.dtype)(k)
            outs.append(jnp.concatenate([box, cls, kpt], axis=-1))
        return outs


class Proto(nn.Module):
    """Mask prototype generator for segmentation (reference block.py:84)."""

    c_: int = 256
    c2: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .conv import ConvTranspose2d
        x = Conv(self.c_, 3, dtype=self.dtype, name="cv1")(x, train)
        # learned 2x upsample (ref block.py:95 uses ConvTranspose2d(c_, c_, 2, 2))
        x = ConvTranspose2d(self.c_, 2, 2, dtype=self.dtype, name="upsample")(x, train)
        x = Conv(self.c_, 3, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(x, train)


class Segment(Detect):
    """Segmentation head: Detect + mask coefficients + prototype masks.

    Returns (list_of_level_maps, protos); level maps carry nm mask coeffs.
    """

    nm: int = 32
    npr: int = 256

    @property
    def no(self):
        return self.nc + self.reg_max * 4 + self.nm

    @nn.compact
    def __call__(self, xs, train: bool = False):
        protos = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        c4 = max(self.ch[0] // 4, self.nm)
        outs = []
        for i, x in enumerate(xs):
            box = self._box_branch(x, i, train)
            cls = self._cls_branch(x, i, train)
            m = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            m = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, train)
            mc = _pred_conv(self.nm, f"cv4_{i}_pred", self.dtype)(m)
            outs.append(jnp.concatenate([box, cls, mc], axis=-1))
        return outs, protos


class OBB(Detect):
    """Oriented bounding box head: Detect + angle branch (ne extra channels)."""

    ne: int = 1

    @property
    def no(self):
        return self.nc + self.reg_max * 4 + self.ne

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c4 = max(self.ch[0] // 4, self.ne)
        outs = []
        for i, x in enumerate(xs):
            box = self._box_branch(x, i, train)
            cls = self._cls_branch(x, i, train)
            a = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            a = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(a, train)
            ang = _pred_conv(self.ne, f"cv4_{i}_pred", self.dtype)(a)
            outs.append(jnp.concatenate([box, cls, ang], axis=-1))
        return outs


class Classify(nn.Module):
    """Image classification head: conv -> GAP -> dropout -> linear."""

    nc: int
    c_: int = 1280
    dropout: float = 0.0  # plumbed from cfg (reference ClassificationModel dropout)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(x, axis=-1)
        x = Conv(self.c_, 1, 1, dtype=self.dtype, name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.nc, dtype=self.dtype, param_dtype=jnp.float32, name="linear")(x)
