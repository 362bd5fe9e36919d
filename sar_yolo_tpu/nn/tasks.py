"""Model graph compiler: YAML architecture specs -> Flax module graph.

Capability parity with ultralytics/nn/tasks.py (parse_model:954, yaml_model_load:1135,
DetectionModel:309, JDEModel:441, guess_model_task:1169), re-designed for JAX:

  * parse_model does the identical channel/depth/width arithmetic (so the same
    YAML dialect & scale dicts work unchanged) but emits a static tuple of
    LayerSpec records instead of an nn.Sequential.
  * GraphModel is a single Flax module that walks the spec graph with an explicit
    save-dict; under jit the whole walk is traced once and XLA fuses it.
  * Strides are inferred with jax.eval_shape (zero FLOPs) instead of a real
    forward probe; Detect/JDE biases are initialised by functional param surgery.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from sar_yolo_tpu.utils import LOGGER, ROOT, yaml_load
from sar_yolo_tpu.nn.modules import block as B
from sar_yolo_tpu.nn.modules import conv as C
from sar_yolo_tpu.nn.modules import head as H


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


@dataclass(frozen=True)
class LayerSpec:
    """One node of the model graph (static/hashable for Flax)."""

    i: int                 # layer index
    f: Any                 # from: -1, int, or tuple of ints
    name: str              # module registry name
    args: tuple            # resolved constructor args (post channel arithmetic)
    c2: int                # output channels
    kwargs: tuple = ()     # resolved keyword args as tuple of (k, v)


# set of modules whose first yaml arg is out-channels (width-scaled)
_CH_SCALED = {"Conv", "DWConv", "DSConv", "Bottleneck", "SPPF", "C2", "C2f", "C3", "C3k",
              "C3k2", "C3k2_CBAM", "A2C2f", "C2fAttn", "DSC3k2", "DSC3k2_CBAM", "Classify", "RepC3",
              "PSA", "C2PSA", "SCDown", "C2fCIB", "GhostConv", "Conv2", "ConvTranspose2d",
              "SPP", "RepNCSPELAN4", "ELAN1", "AConv", "ADown", "SPPELAN",
              "GhostBottleneck", "C3Ghost", "RepConv"}
# subset that takes an inserted repeat count n
_REPEAT_ARG = {"C2", "C2f", "C2fAttn", "C3", "C3k", "C3k2", "C3k2_CBAM", "A2C2f",
               "DSC3k2", "DSC3k2_CBAM", "RepC3", "C2PSA", "C2fCIB", "C3Ghost"}
# torch-layer yaml aliases -> our module names
_NN_ALIAS = {"nn.ConvTranspose2d": "ConvTranspose2d", "nn.MaxPool2d": "MaxPool2d",
             "nn.ZeroPad2d": "ZeroPad2d", "nn.Identity": "Identity"}
_HEADS = {"Detect", "JDE", "Segment", "Pose", "OBB", "Classify", "RTDETRDecoder",
          "v10Detect", "WorldDetect"}

TASK_BY_HEAD = {"Detect": "detect", "JDE": "jde", "Segment": "segment",
                "Pose": "pose", "OBB": "obb", "Classify": "classify",
                "RTDETRDecoder": "detect", "v10Detect": "detect",
                "WorldDetect": "detect"}


def _resolve_arg(a, names: dict):
    if isinstance(a, str):
        if a in names:
            return names[a]
        low = a.lower()
        if low in {"true", "false", "none"}:
            return {"true": True, "false": False, "none": None}[low]
    return a


def parse_model(d: dict, ch: int = 3, verbose: bool = False):
    """Compile a model yaml dict into LayerSpecs + save list + metadata.

    Channel arithmetic mirrors reference parse_model (nn/tasks.py:954-1133)
    including fork special-cases for HyperACE / DownsampleConv / FullPAD_Tunnel.
    """
    legacy = True
    max_channels = float("inf")
    nc = d.get("nc", 80)
    scales = d.get("scales")
    depth, width = d.get("depth_multiple", 1.0), d.get("width_multiple", 1.0)
    scale = d.get("scale", "")
    if scales:
        if not scale:
            scale = tuple(scales.keys())[0]
            LOGGER.warning(f"WARNING: no model scale passed, assuming scale='{scale}'")
        depth, width, max_channels = scales[scale]

    names = {"nc": nc, "kpt_shape": d.get("kpt_shape"), "state_classes": d.get("state_classes")}
    chs = [ch]
    specs: list[LayerSpec] = []
    save: list[int] = []
    meta: dict[str, Any] = {"nc": nc, "scale": scale, "reg_max": 16}
    act = d.get("activation")
    if act:
        # yaml 'activation: nn.ReLU()' dialect (≙ reference Conv.default_act override)
        key = re.sub(r"^nn\.|\(\)$", "", str(act)).lower().replace("(", "").replace(")", "")
        if key not in C.ACTIVATIONS:
            raise KeyError(f"unsupported activation '{act}' in model yaml")
        meta["act"] = key

    for i, (f, n, m, args) in enumerate(d["backbone"] + d["head"]):
        m = _NN_ALIAS.get(m, m)
        args = [_resolve_arg(a, names) for a in args]
        n = max(round(n * depth), 1) if n > 1 else n
        kwargs: dict[str, Any] = {}

        if m in _CH_SCALED:
            c1, c2 = chs[f], args[0]
            if m == "Classify":
                meta["head"] = "Classify"
                meta["head_index"] = i
            if not (m == "Classify" and c2 == nc):
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c2, *args[1:]]
            if m in _REPEAT_ARG:
                args.insert(1, n)
                n = 1
            if m in {"C3k2", "DSC3k2", "C3k2_CBAM", "DSC3k2_CBAM"}:
                legacy = False
                if scale in "lx":
                    # force c3k/dsc3k inner blocks on large scales
                    if len(args) >= 3:
                        args[2] = True
                    else:
                        args.append(True)
            if m == "C2fAttn":
                # embed channels + num heads scale (reference tasks.py:1029-1032)
                args[2] = make_divisible(min(args[2], max_channels // 2) * width, 8)
                args[3] = int(max(round(min(args[3], max_channels // 2 // 32)) * width, 1)
                              if args[3] > 1 else args[3])
            if m == "A2C2f":
                legacy = False
                if scale in "lx":
                    # residual=True, mlp_ratio=1.5 (positional order: c2,n,a2,area,residual,mlp_ratio)
                    while len(args) < 4:
                        args.append(True if len(args) == 2 else 1)
                    args += [True, 1.5]
        elif m == "nn.Upsample":
            m = "Upsample"
            args = [int(args[1]), str(args[2])]
            c2 = chs[f]
        elif m == "HGStem":
            c2 = args[1]  # [cm, c2]
        elif m == "HGBlock":
            cm, c2 = args[0], args[1]
            args = [cm, c2, *args[2:]]
            args.insert(3, n)  # (cm, c2, k, n, lightconv, shortcut)
            n = 1
        elif m == "AIFI":
            c2 = chs[f]  # args = [cm, num_heads]
        elif m == "Concat":
            c2 = sum(chs[x] for x in f)
            args = []
        elif m in _HEADS and m != "Classify":
            ch_list = tuple(chs[x] for x in f)
            kwargs["ch"] = ch_list
            kwargs["legacy"] = legacy
            if m == "Segment" and len(args) > 2:
                # proto channels npr are width-scaled (reference tasks.py:1059)
                args[2] = make_divisible(min(args[2], max_channels) * width, 8)
            c2 = 0  # heads terminate the graph
            meta["head"] = m
            meta["head_index"] = i
            meta["head_ch"] = ch_list
            meta["nl"] = len(ch_list)
        elif m == "HyperACE":
            legacy = False
            c1 = chs[f[1]]
            c2 = make_divisible(min(args[0], max_channels) * width, 8)
            he = args[1]
            if scale == "n":
                he = int(args[1] * 0.5)
            elif scale == "x":
                he = int(args[1] * 1.5)
            args = [c1, c2, n, he, *args[2:]]
            n = 1
            if scale in "lx":
                args.append(False)  # channel_adjust=False for l/x
        elif m == "DownsampleConv":
            c1 = chs[f]
            c2 = c1 * 2
            args = [c1]
            if scale in "lx":
                args.append(False)
                c2 = c1
        elif m == "FullPAD_Tunnel":
            c2 = chs[f[0]]
            args = []
        elif m == "ImagePoolingAttn":
            # text-embedding side-update (reference tasks.py:1081): takes the
            # multi-level feature list, emits updated txt_feats; x passes through
            kwargs["ch"] = tuple(chs[x] for x in f)
            c2 = chs[f[0]]
        elif m == "ResNetLayer":
            # c2 not width-scaled (reference tasks.py:1075); optional 6th arg e
            # (expansion; 1 = BasicBlock for resnet18/34-style backbones)
            c2 = args[1] if args[3] else args[1] * (args[5] if len(args) > 5 else 4)
        elif m == "CBLinear":
            # c2s list is NOT width-scaled (reference tasks.py:1090-1093)
            c2 = tuple(args[0])
            args = [c2, *args[1:]]
        elif m == "CBFuse":
            c2 = chs[f[-1]]
            args = [tuple(args[0])]
        elif m == "Index":
            c2 = args[0]
            args = [c2, args[1] if len(args) > 1 else 0]
        elif m == "ZeroPad2d":
            c2 = chs[f]
            args = [tuple(args[0])]
        elif m in {"MaxPool2d", "Identity"}:
            c2 = chs[f]
        else:
            c2 = chs[f]

        if n != 1:
            # plain modules repeated n times (v3 Bottleneck stacks, v6 Conv stacks):
            # reference wraps in nn.Sequential (tasks.py:1120); we record a repeat kwarg.
            kwargs["repeat"] = n
            n = 1

        # normalize relative 'from' indices (-2, -3, ...) to absolute; keep -1 = previous
        def _norm(j):
            return j if j == -1 else j % i
        f_norm = tuple(_norm(j) for j in f) if isinstance(f, list) else _norm(f)
        specs.append(LayerSpec(i=i, f=f_norm, name=m, args=tuple(args), c2=c2,
                               kwargs=tuple(sorted(kwargs.items()))))
        save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            chs = []
        chs.append(c2)
        if verbose:
            LOGGER.info(f"{i:>3}{str(f):>18}{n:>3}  {m:<20}{str(args):<40}")

    meta["legacy"] = legacy
    meta["channels"] = chs
    return tuple(specs), tuple(sorted(set(save))), meta


class Repeat(nn.Module):
    """Sequential stack of n identical modules (≙ reference nn.Sequential repeat)."""

    spec: Any
    n: int
    nc: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n):
            x = _build_module(self.spec, self.nc, self.dtype)(x, train)
        return x


def _build_module(spec: LayerSpec, nc: int, dtype, dropout: float = 0.0):
    """Instantiate the Flax module for a LayerSpec."""
    a = spec.args
    kw = dict(spec.kwargs)
    rep = kw.pop("repeat", None)
    if rep:
        inner = LayerSpec(i=spec.i, f=spec.f, name=spec.name, args=spec.args, c2=spec.c2,
                          kwargs=tuple(sorted(kw.items())))
        return Repeat(spec=inner, n=rep, nc=nc, dtype=dtype)
    name = spec.name
    if name == "Conv":
        return C.Conv(*a, dtype=dtype)
    if name == "DWConv":
        return C.DWConv(*a, dtype=dtype)
    if name == "DSConv":
        return C.DSConv(*a, dtype=dtype)
    if name == "Upsample":
        return C.Upsample(scale=a[0], mode=a[1])
    if name == "Concat":
        return C.Concat()
    if name == "CBAM":
        return C.CBAM(*a, dtype=dtype)
    if name == "Bottleneck":
        return B.Bottleneck(*a, dtype=dtype)
    if name == "C2":
        return B.C2(*a, dtype=dtype)
    if name == "C2f":
        return B.C2f(*a, dtype=dtype)
    if name == "C3":
        return B.C3(*a, dtype=dtype)
    if name == "C3k":
        return B.C3k(*a, dtype=dtype)
    if name == "C3k2":
        return B.C3k2(*a, dtype=dtype)
    if name == "C3k2_CBAM":
        return B.C3k2_CBAM(*a, dtype=dtype)
    if name == "SPPF":
        return B.SPPF(*a, dtype=dtype)
    if name == "A2C2f":
        return B.A2C2f(*a, dtype=dtype)
    if name == "DSC3k2":
        return B.DSC3k2(*a, dtype=dtype)
    if name == "DSC3k2_CBAM":
        return B.DSC3k2_CBAM(*a, dtype=dtype)
    if name == "HyperACE":
        return B.HyperACE(*a, dtype=dtype)
    if name == "DownsampleConv":
        return B.DownsampleConv(*a, dtype=dtype)
    if name == "FullPAD_Tunnel":
        return B.FullPAD_Tunnel()
    if name == "Detect":
        return H.Detect(nc=a[0] if a else nc, ch=kw["ch"], legacy=kw["legacy"], dtype=dtype)
    if name == "v10Detect":
        # v10 always uses the lightweight separable cls branch (ref head.py:678)
        return H.v10Detect(nc=a[0] if a else nc, ch=kw["ch"], legacy=False, dtype=dtype)
    if name == "WorldDetect":
        return H.WorldDetect(nc=a[0] if a else nc, embed_dim=a[1] if len(a) > 1 else 512,
                             with_bn=bool(a[2]) if len(a) > 2 else False,
                             ch=kw["ch"], legacy=kw["legacy"], dtype=dtype)
    if name == "C2fAttn":
        return B.C2fAttn(*a, dtype=dtype)
    if name == "ImagePoolingAttn":
        return B.ImagePoolingAttn(ec=a[0] if a else 256, ch=kw["ch"], dtype=dtype)
    if name == "C2fCIB":
        return B.C2fCIB(*a, dtype=dtype)
    if name == "CIB":
        return B.CIB(*a, dtype=dtype)
    if name == "GhostConv":
        return C.GhostConv(*a, dtype=dtype)
    if name == "Conv2":
        return C.Conv2(*a, dtype=dtype)
    if name == "RepConv":
        return C.RepConv(*a, dtype=dtype)
    if name == "Index":
        return C.Index(*a)
    if name == "ConvTranspose2d":
        return C.ConvTranspose2d(*a, dtype=dtype)
    if name == "MaxPool2d":
        return C.MaxPool2d(*a)
    if name == "ZeroPad2d":
        return C.ZeroPad2d(*a)
    if name == "Identity":
        return C.Identity()
    if name == "SPP":
        return B.SPP(a[0], tuple(a[1]) if len(a) > 1 else (5, 9, 13), dtype=dtype)
    if name == "GhostBottleneck":
        return B.GhostBottleneck(*a, dtype=dtype)
    if name == "C3Ghost":
        return B.C3Ghost(*a, dtype=dtype)
    if name == "ResNetLayer":
        return B.ResNetLayer(*a, dtype=dtype)
    if name == "RepNCSPELAN4":
        return B.RepNCSPELAN4(*a, dtype=dtype)
    if name == "ELAN1":
        return B.ELAN1(*a, dtype=dtype)
    if name == "AConv":
        return B.AConv(*a, dtype=dtype)
    if name == "ADown":
        return B.ADown(*a, dtype=dtype)
    if name == "SPPELAN":
        return B.SPPELAN(*a, dtype=dtype)
    if name == "CBLinear":
        return B.CBLinear(*a, dtype=dtype)
    if name == "CBFuse":
        return B.CBFuse(*a)
    if name == "JDE":
        return H.JDE(nc=a[0], embed_dim=a[1] if len(a) > 1 else 128,
                     state_classes=a[2] if len(a) > 2 else None,
                     ch=kw["ch"], legacy=kw["legacy"], dtype=dtype)
    if name == "Segment":
        return H.Segment(nc=a[0], nm=a[1] if len(a) > 1 else 32,
                         npr=a[2] if len(a) > 2 else 256,
                         ch=kw["ch"], legacy=kw["legacy"], dtype=dtype)
    if name == "Pose":
        return H.Pose(nc=a[0], kpt_shape=tuple(a[1]) if len(a) > 1 else (17, 3),
                      ch=kw["ch"], legacy=kw["legacy"], dtype=dtype)
    if name == "OBB":
        return H.OBB(nc=a[0], ne=a[1] if len(a) > 1 else 1,
                     ch=kw["ch"], legacy=kw["legacy"], dtype=dtype)
    if name == "Classify":
        return H.Classify(nc=a[0], dropout=dropout, dtype=dtype)
    if name == "HGStem":
        return B.HGStem(*a, dtype=dtype)
    if name == "HGBlock":
        return B.HGBlock(*a, dtype=dtype)
    if name == "RepC3":
        return B.RepC3(*a, dtype=dtype)
    if name == "AIFI":
        from sar_yolo_tpu.nn.modules import transformer as T
        return T.AIFI(*a, dtype=dtype)
    if name == "PSA":
        return B.PSA(*a, dtype=dtype)
    if name == "C2PSA":
        return B.C2PSA(*a, dtype=dtype)
    if name == "SCDown":
        return B.SCDown(*a, dtype=dtype)
    if name == "RTDETRDecoder":
        from sar_yolo_tpu.nn.modules import transformer as T
        extra = {}
        if len(a) > 1:
            extra["hd"] = a[1]
        if len(a) > 2:
            extra["nq"] = a[2]
        if len(a) > 3:
            extra["ndl"] = a[3]
        return T.RTDETRDecoder(nc=a[0] if a else nc, ch=kw["ch"], dtype=dtype, **extra)
    raise KeyError(f"Unknown module '{name}' in model yaml")


class GraphModel(nn.Module):
    """Executes a parsed YAML layer graph with an explicit save-dict.

    Equivalent of reference BaseModel._predict_once (nn/tasks.py:141) as one
    traced functional graph. Returns the head output (list of per-level NHWC
    maps, or a (maps, protos) tuple for Segment).
    """

    specs: tuple
    save: tuple
    nc: int
    dtype: Any = jnp.float32
    act: str = "silu"
    fused: bool = False
    quant: str = ""       # "int8": fused Convs run int8 MXU convolutions (serving)
    remat: bool = False   # train-time activation checkpointing per block
    dropout: float = 0.0  # classify-head dropout (reference ClassificationModel arg)
    txt_nc: int = 0       # world vocabulary row count override (0 -> nc); lets
                          # set_classes change the text rows without touching
                          # the built conv shapes (reference nn/tasks.py:646)

    def setup(self):
        self.blocks = [_build_module(s, self.nc, self.dtype, dropout=self.dropout)
                       for s in self.specs]
        # YOLO-World graphs own ONE graph-level text-embedding param (reference
        # WorldModel.txt_feats, nn/tasks.py:626) threaded into the text-guided
        # blocks by _walk; set_classes swaps it by functional param surgery.
        if any(s.name in ("C2fAttn", "ImagePoolingAttn", "WorldDetect")
               for s in self.specs):
            heads = [s for s in self.specs if s.name == "WorldDetect"]
            embed = heads[0].args[1] if heads and len(heads[0].args) > 1 else 512
            self.text_embeddings = self.param(
                "text_embeddings", nn.initializers.normal(0.02),
                (self.txt_nc or self.nc, embed), jnp.float32)

    def __call__(self, x, train: bool = False, batch_gt=None, embed: tuple = ()):
        with C.default_act(C.ACTIVATIONS[self.act]), C.fused_mode(self.fused), \
                C.quant_mode(self.quant if self.fused else ""):
            return self._walk(x, train, batch_gt, embed)

    def _walk(self, x, train: bool = False, batch_gt=None, embed: tuple = ()):
        saved = {}
        out = x
        embeds: list = []
        last = self.specs[-1]
        # YOLO-World graphs: C2fAttn gets the (possibly ImagePoolingAttn-updated)
        # running text copy, WorldDetect always gets the original (reference
        # WorldModel.predict, nn/tasks.py:666-681).
        txt = txt0 = None
        if hasattr(self, "text_embeddings"):
            txt0 = self.text_embeddings
            txt = jnp.broadcast_to(txt0[None], (x.shape[0],) + txt0.shape)
        for spec, blk in zip(self.specs, self.blocks):
            f = spec.f
            if f == -1:
                inp = out
            elif isinstance(f, int):
                inp = saved[f]
            else:
                inp = [out if j == -1 else saved[j] for j in f]
            # activation checkpointing (remat=True): per-block
            # rematerialization trades ~1/3 extra fwd FLOPs in the backward
            # for O(depth) -> O(1) stored activations per block — the
            # standard jax.checkpoint HBM lever for larger models / batches
            # on TPU. The head stays un-remat'ed (its outputs feed the loss
            # directly). Covers the text-guided World blocks too.
            ckpt = self.remat and train and spec is not last
            if spec is last and spec.name == "RTDETRDecoder" and batch_gt is not None:
                out = blk(inp, train=train, batch_gt=batch_gt)  # denoising queries
            elif spec.name == "C2fAttn":
                out = (nn.remat(lambda m, xi, tt: m(xi, tt, train=True))(blk, inp, txt)
                       if ckpt else blk(inp, txt, train=train))
            elif spec.name == "ImagePoolingAttn":
                txt = (nn.remat(lambda m, xi, tt: m(xi, tt, train=True))(blk, inp, txt)
                       if ckpt else blk(inp, txt, train=train))
                out = inp  # text side-channel update; x passes through (ref :681)
            elif spec.name == "WorldDetect":
                out = blk(inp, train=train, txt=txt0)
            elif ckpt:
                out = nn.remat(lambda m, xi: m(xi, train=True))(blk, inp)
            else:
                out = blk(inp, train=train)
            if spec.i in self.save:
                saved[spec.i] = out
            if embed and spec.i in embed:
                # global-avg-pooled layer features (reference nn/tasks.py:164:
                # adaptive_avg_pool2d(x, 1) per requested layer, concat over C)
                embeds.append(out.mean((1, 2)))
                if spec.i == max(embed):
                    return jnp.concatenate(embeds, -1)
        return out


def yaml_model_load(path) -> dict:
    """Load a model yaml, extracting the scale char from the filename.

    'yolov8n.yaml' -> cfg/models/v8/yolov8.yaml with scale='n' (reference
    nn/tasks.py:1135 convention).
    """
    path = Path(path)
    stem = path.stem
    m = re.match(r"(.*yolov?\d+)([nslmx])(.*)", stem)
    scale = ""
    if m:
        scale = m.group(2)
        unified = f"{m.group(1)}{m.group(3)}.yaml"
    else:
        unified = path.name
    search = path if path.exists() else None
    if search is None:
        for cand in (unified, path.name):
            hits = sorted((ROOT / "cfg" / "models").rglob(cand))
            if hits:
                search = hits[0]
                break
    if search is None:
        raise FileNotFoundError(f"model yaml '{path}' not found (searched cfg/models/**)")
    d = yaml_load(search, append_filename=True)
    d["scale"] = d.get("scale") or scale
    return d


def guess_model_task(d: dict) -> str:
    head_name = d["head"][-1][2]
    return TASK_BY_HEAD.get(head_name, "detect")


def build_model(cfg, nc: int | None = None, dtype=jnp.float32, verbose: bool = False,
                dropout: float = 0.0):
    """Build a GraphModel from a yaml path/dict. Returns (model, meta).

    meta carries nc/reg_max/strides-placeholder/head info for losses & decode.
    """
    d = yaml_model_load(cfg) if isinstance(cfg, (str, Path)) else dict(cfg)
    if nc is not None and nc != d.get("nc"):
        d = dict(d)
        d["nc"] = nc
    specs, save, meta = parse_model(d, ch=3, verbose=verbose)
    meta["yaml"] = d
    meta["task"] = guess_model_task(d)
    model = GraphModel(specs=specs, save=save, nc=meta["nc"], dtype=dtype,
                       act=meta.get("act", "silu"), dropout=dropout)
    head_spec = specs[-1]
    if head_spec.name == "JDE":
        meta["embed_dim"] = head_spec.args[1] if len(head_spec.args) > 1 else 128
        meta["state_classes"] = head_spec.args[2] if len(head_spec.args) > 2 else None
    if head_spec.name == "Pose":
        meta["kpt_shape"] = tuple(head_spec.args[1]) if len(head_spec.args) > 1 else (17, 3)
    if head_spec.name == "Segment":
        meta["nm"] = head_spec.args[1] if len(head_spec.args) > 1 else 32
    return model, meta


def infer_strides(model: GraphModel, meta: dict, imgsz: int = 256):
    """Infer per-level strides via shape-only tracing (no FLOPs)."""
    if meta["task"] == "classify":
        return []
    if meta.get("head") == "RTDETRDecoder":
        return [8, 16, 32]  # nominal; the decoder regresses normalized boxes directly
    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)

    def init_fwd(r, xx):
        return model.init_with_output(r, xx, train=False)

    out_shape, _ = jax.eval_shape(init_fwd, rng, x)
    feats = out_shape[0] if isinstance(out_shape, tuple) and not hasattr(out_shape, "shape") else out_shape
    if isinstance(feats, (list, tuple)) and hasattr(feats[0], "shape") and len(feats[0].shape) == 4:
        levels = feats
    else:
        levels = feats[0]
    return [int(imgsz // s.shape[1]) for s in levels]


def init_model(model: GraphModel, meta: dict, rng, imgsz: int = 640):
    """Initialize model variables and apply Detect bias init. Returns variables."""
    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    # jit the init: one compiled program instead of per-op dispatch of every initializer
    if meta.get("head") == "RTDETRDecoder":
        # init through the denoising path so denoising_class_embed params exist
        gt = {"cls": jnp.zeros((1, 4), jnp.int32),
              "bboxes": jnp.full((1, 4, 4), 0.5, jnp.float32),
              "mask": jnp.zeros((1, 4), jnp.float32)}
        init_fn = jax.jit(lambda r, xx: model.init(
            {"params": r, "dropout": r, "dn": r}, xx, train=True, batch_gt=gt))
    else:
        init_fn = jax.jit(lambda r, xx: model.init({"params": r, "dropout": r}, xx,
                                                   train=False))
    variables = init_fn(rng, x)
    strides = infer_strides(model, meta)
    meta["strides"] = strides
    if meta.get("head") in {"Detect", "JDE", "Segment", "Pose", "OBB", "v10Detect"}:
        variables = bias_init_head(variables, meta)
    return variables


def bias_init_head(variables, meta: dict):
    """Functional equivalent of Detect.bias_init (reference head.py:133-146).

    cv2 (box) final bias -> 1.0; cv3 (cls) final bias -> log(5 / nc / (640/s)^2).
    v10Detect gets the same init on both its one2many and one2one ("o2o_")
    branches.
    """
    import flax

    params = flax.core.unfreeze(variables["params"])
    head_key = f"blocks_{meta['head_index']}"
    head = params[head_key]
    nc = meta["nc"]
    for i, s in enumerate(meta["strides"]):
        for pre in ("", "o2o_"):
            if f"{pre}cv2_{i}_pred" in head:
                head[f"{pre}cv2_{i}_pred"]["bias"] = \
                    jnp.ones_like(head[f"{pre}cv2_{i}_pred"]["bias"])
            if f"{pre}cv3_{i}_pred" in head:
                b = head[f"{pre}cv3_{i}_pred"]["bias"]
                head[f"{pre}cv3_{i}_pred"]["bias"] = \
                    jnp.full_like(b, math.log(5 / nc / (640 / s) ** 2))
    new_vars = dict(variables)
    new_vars["params"] = params
    return new_vars
