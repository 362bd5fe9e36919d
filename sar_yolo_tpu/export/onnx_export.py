"""jaxpr -> ONNX graph exporter (no torch, no `onnx` wheel).

The reference exports ONNX by tracing torch modules (engine/exporter.py:487).
The TPU-native equivalent traces the **jitted inference function to a jaxpr**
and maps each JAX primitive onto standard ONNX-opset-13 ops, serializing with
the self-contained protobuf writer in `onnx_proto.py`. Because the fused
serving forward of every YOLO family lowers to a compact primitive set
(convs, elementwise, reshapes, reductions, one softmax), this covers the
detect/seg/pose/classify/JDE raw-preds artifacts end-to-end.

Layout note: JAX models here are NHWC; ONNX Conv/MaxPool are NCHW-only, so
spatial ops are bracketed with Transpose pairs (same strategy tf2onnx uses
for TF NHWC graphs — ONNX runtimes fold these during layout optimization).
Weights are pre-transposed to OIHW at export time since they are constants.

Verified without third-party deps by `onnx_runtime.OnnxReferenceRuntime`,
a numpy interpreter implementing ONNX operator semantics independently
(tests/test_onnx.py compares it against the jitted forward).
"""

from __future__ import annotations

import itertools

import jax
import numpy as np

from sar_yolo_tpu.export import onnx_proto as P
from sar_yolo_tpu.utils import LOGGER


class UnsupportedPrimitive(Exception):
    pass


class _Builder:
    def __init__(self):
        self.nodes: list[bytes] = []
        self.const_vals: dict[str, np.ndarray] = {}  # for export-time folding
        self._names = (f"t{i}" for i in itertools.count())
        self._const_cache: dict = {}
        self._used: set[str] = set()  # const names referenced by emitted nodes

    def fresh(self) -> str:
        return next(self._names)

    def const(self, arr, name: str | None = None) -> str:
        """Register a constant LAZILY: the tensor_proto is only serialized if
        an emitted node actually references the name (initializers()).
        Folded-away intermediates (e.g. an HWIO weight superseded by its
        transposed OIHW copy) therefore cost zero bytes in the .onnx file."""
        arr = np.asarray(arr)
        key = None
        if name is None and arr.size <= 64:
            key = (arr.dtype.str, arr.shape, arr.tobytes())
            if key in self._const_cache:
                return self._const_cache[key]
        name = name or self.fresh()
        self.const_vals[name] = arr
        if key is not None:
            self._const_cache[key] = name
        return name

    def node(self, op: str, inputs: list[str], n_out: int = 1, **attrs):
        self._used.update(i for i in inputs if i in self.const_vals)
        outs = [self.fresh() for _ in range(n_out)]
        self.nodes.append(P.node_proto(op, inputs, outs, **attrs))
        return outs[0] if n_out == 1 else outs

    def raw_node(self, proto: bytes, inputs: list[str]):
        self._used.update(i for i in inputs if i in self.const_vals)
        self.nodes.append(proto)

    def initializers(self) -> list[bytes]:
        return [P.tensor_proto(n, a) for n, a in self.const_vals.items()
                if n in self._used]

    def i64(self, vals) -> str:
        return self.const(np.asarray(vals, np.int64))


# --------------------------------------------------------------------------
# primitive handlers: fn(b, eqn, invals) -> outval name(s)
# --------------------------------------------------------------------------

_ELTWISE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div", "max": "Max",
    "min": "Min", "pow": "Pow", "logistic": "Sigmoid", "exp": "Exp",
    "tanh": "Tanh", "erf": "Erf", "sqrt": "Sqrt", "neg": "Neg", "abs": "Abs",
    "log": "Log", "floor": "Floor", "sign": "Sign", "ceil": "Ceil",
    "and": "And", "or": "Or", "not": "Not",
    "cos": "Cos", "sin": "Sin",  # dist2rbox angle math (OBB head)
}
_COMPARE = {"eq": "Equal", "lt": "Less", "le": "LessOrEqual",
            "gt": "Greater", "ge": "GreaterOrEqual"}


def _dt(dtype) -> int:
    return P.NP2ONNX[np.dtype(dtype)]


def _conv(b: _Builder, eqn, invals):
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    ndim = len(lhs_spec)
    if ndim != 4:
        raise UnsupportedPrimitive("conv: only 2-D convolutions are exportable")
    if p.get("batch_group_count", 1) != 1:
        raise UnsupportedPrimitive("conv: batch_group_count != 1")
    x, w = invals
    group = p.get("feature_group_count", 1)
    strides = list(p["window_strides"])
    pads_pairs = list(p["padding"])  # per spatial dim (lo, hi)
    rhs_dil = list(p.get("rhs_dilation") or [1] * (ndim - 2))
    lhs_dil = list(p.get("lhs_dilation") or [1] * (ndim - 2))
    # onnx pads: [d1_begin, d2_begin, d1_end, d2_end]
    pads = [pp[0] for pp in pads_pairs] + [pp[1] for pp in pads_pairs]

    # lhs -> NCHW
    perm_l = list(lhs_spec)  # positions of (N, C, *spatial) in the operand
    xn = x if perm_l == list(range(ndim)) else b.node("Transpose", [x], perm=perm_l)
    # rhs -> OIHW; weights are constants, fold the transpose at export time
    perm_r = list(rhs_spec)
    if w in b.const_vals:
        w_oihw = np.transpose(b.const_vals[w], perm_r)
    else:
        raise UnsupportedPrimitive("conv: non-constant weights")

    if any(d != 1 for d in lhs_dil):  # transposed convolution
        if group != 1:
            raise UnsupportedPrimitive("conv_transpose: grouped not supported")
        if any(s != 1 for s in strides):
            raise UnsupportedPrimitive("conv_transpose: fractional+strided")
        k = w_oihw.shape[2:]
        # ONNX ConvTranspose W is (C_in, C_out, kH, kW) with implicit kernel
        # flip; lax's dilated-lhs conv applies the unflipped kernel, so flip
        # spatially and swap O<->I (derivation in docs: out sizes match with
        # pads' = d*(k-1) - pad)
        w_ct = np.transpose(w_oihw[:, :, ::-1, ::-1], (1, 0, 2, 3))
        wn = b.const(np.ascontiguousarray(w_ct))
        ct_pads = [rhs_dil[i] * (k[i] - 1) - pads_pairs[i][0] for i in range(2)] + \
                  [rhs_dil[i] * (k[i] - 1) - pads_pairs[i][1] for i in range(2)]
        if min(ct_pads) < 0:
            raise UnsupportedPrimitive("conv_transpose: negative effective pads")
        y = b.node("ConvTranspose", [xn, wn], strides=list(lhs_dil),
                   pads=ct_pads, dilations=rhs_dil, group=1,
                   kernel_shape=list(k))
    else:
        wn = b.const(np.ascontiguousarray(w_oihw))
        y = b.node("Conv", [xn, wn], strides=strides, pads=pads,
                   dilations=rhs_dil, group=group,
                   kernel_shape=list(w_oihw.shape[2:]))
    inv = list(np.argsort(out_spec))  # NCHW -> jax out layout
    if inv == list(range(ndim)):
        return y
    return b.node("Transpose", [y], perm=inv)


def _dot_general(b: _Builder, eqn, invals):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs_av, rhs_av = eqn.invars[0].aval, eqn.invars[1].aval
    ls, rs = lhs_av.shape, rhs_av.shape
    lfree = [i for i in range(len(ls)) if i not in set(lc) | set(lb)]
    rfree = [i for i in range(len(rs)) if i not in set(rc) | set(rb)]
    bshape = [ls[i] for i in lb]
    m = int(np.prod([ls[i] for i in lfree], dtype=np.int64)) if lfree else 1
    k = int(np.prod([ls[i] for i in lc], dtype=np.int64)) if lc else 1
    n = int(np.prod([rs[i] for i in rfree], dtype=np.int64)) if rfree else 1
    bsz = int(np.prod(bshape, dtype=np.int64)) if bshape else 1
    x, w = invals
    xt = b.node("Transpose", [x], perm=list(lb) + lfree + list(lc))
    wt = b.node("Transpose", [w], perm=list(rb) + list(rc) + rfree)
    x3 = b.node("Reshape", [xt, b.i64([bsz, m, k])])
    w3 = b.node("Reshape", [wt, b.i64([bsz, k, n])])
    y = b.node("MatMul", [x3, w3])
    out_shape = bshape + [ls[i] for i in lfree] + [rs[i] for i in rfree]
    return b.node("Reshape", [y, b.i64(out_shape or [1])])


def _broadcast_in_dim(b: _Builder, eqn, invals):
    shape = list(eqn.params["shape"])
    bd = list(eqn.params["broadcast_dimensions"])
    s = eqn.invars[0].aval.shape
    mid = [1] * len(shape)
    for i, d in enumerate(bd):
        mid[d] = s[i]
    x = invals[0]
    if list(s) != mid:
        x = b.node("Reshape", [x, b.i64(mid)])
    if mid == shape:
        return x
    return b.node("Expand", [x, b.i64(shape)])


def _reduce_window_max(b: _Builder, eqn, invals):
    p = eqn.params
    wd, ws = list(p["window_dimensions"]), list(p["window_strides"])
    pads_pairs = list(p["padding"])
    if len(wd) != 4 or wd[0] != 1 or wd[3] != 1:
        raise UnsupportedPrimitive("reduce_window_max: expected NHWC pooling")
    if any(d != 1 for d in list(p.get("base_dilation") or [1] * 4)):
        raise UnsupportedPrimitive("reduce_window_max: base dilation")
    xn = b.node("Transpose", [invals[0]], perm=[0, 3, 1, 2])
    pads = [pads_pairs[1][0], pads_pairs[2][0], pads_pairs[1][1], pads_pairs[2][1]]
    y = b.node("MaxPool", [xn], kernel_shape=wd[1:3], strides=ws[1:3], pads=pads)
    return b.node("Transpose", [y], perm=[0, 2, 3, 1])


def _reduce_window_sum(b: _Builder, eqn, invals):
    p = eqn.params
    wd, ws = list(p["window_dimensions"]), list(p["window_strides"])
    pads_pairs = list(p["padding"])
    if len(wd) != 4 or wd[0] != 1 or wd[3] != 1:
        raise UnsupportedPrimitive("reduce_window_sum: expected NHWC pooling")
    if any(d != 1 for d in list(p.get("base_dilation") or [1] * 4)):
        raise UnsupportedPrimitive("reduce_window_sum: base dilation")
    xn = b.node("Transpose", [invals[0]], perm=[0, 3, 1, 2])
    pads = [pads_pairs[1][0], pads_pairs[2][0], pads_pairs[1][1], pads_pairs[2][1]]
    # sum-pool = AveragePool(count_include_pad=1) * window_count: zero pads
    # contribute 0 to the sum, matching lax's init value 0
    y = b.node("AveragePool", [xn], kernel_shape=wd[1:3], strides=ws[1:3],
               pads=pads, count_include_pad=1)
    k = b.const(np.asarray(wd[1] * wd[2], eqn.outvars[0].aval.dtype))
    y = b.node("Mul", [y, k])
    return b.node("Transpose", [y], perm=[0, 2, 3, 1])


def _reduce(op_attr_axes):
    def h(b, eqn, invals, op=op_attr_axes):
        axes = [int(a) for a in eqn.params["axes"]]
        if op == "ReduceSum":  # axes are an input from opset 13
            return b.node(op, [invals[0], b.i64(axes)], keepdims=0)
        return b.node(op, [invals[0]], axes=axes, keepdims=0)
    return h


def _handle_eltwise(b, eqn, invals):
    name = eqn.primitive.name
    if name == "not":
        return b.node("Not", invals)
    return b.node(_ELTWISE[name], invals)


_HANDLERS = {}


def _register_all():
    H = _HANDLERS
    for k in _ELTWISE:
        H[k] = _handle_eltwise
    for k, op in _COMPARE.items():
        H[k] = lambda b, e, iv, op=op: b.node(op, iv)
    H["ne"] = lambda b, e, iv: b.node("Not", [b.node("Equal", iv)])
    H["conv_general_dilated"] = _conv
    H["dot_general"] = _dot_general
    H["broadcast_in_dim"] = _broadcast_in_dim
    H["reduce_window_max"] = _reduce_window_max
    H["reduce_window_sum"] = _reduce_window_sum
    H["reduce_max"] = _reduce("ReduceMax")
    H["reduce_min"] = _reduce("ReduceMin")
    H["reduce_sum"] = _reduce("ReduceSum")
    H["reduce_and"] = None  # unsupported
    H["rsqrt"] = lambda b, e, iv: b.node("Reciprocal", [b.node("Sqrt", iv)])
    # erfc(x) = 1 - erf(x) (gelu tails in attention blocks)
    H["erfc"] = lambda b, e, iv: b.node(
        "Sub", [b.const(np.asarray(1, e.invars[0].aval.dtype)),
                b.node("Erf", iv)])
    H["stop_gradient"] = lambda b, e, iv: iv[0]
    H["copy"] = lambda b, e, iv: iv[0]
    H["convert_element_type"] = lambda b, e, iv: b.node(
        "Cast", iv, to=_dt(e.params["new_dtype"]))
    H["reshape"] = _reshape
    H["transpose"] = lambda b, e, iv: b.node(
        "Transpose", iv, perm=[int(p) for p in e.params["permutation"]])
    H["squeeze"] = lambda b, e, iv: b.node(
        "Reshape", [iv[0], b.i64(list(e.outvars[0].aval.shape) or [1])])
    H["expand_dims"] = lambda b, e, iv: b.node(
        "Reshape", [iv[0], b.i64(list(e.outvars[0].aval.shape))])
    H["concatenate"] = lambda b, e, iv: b.node(
        "Concat", iv, axis=int(e.params["dimension"]))
    H["split"] = _split
    H["slice"] = _slice
    H["rev"] = _rev
    H["pad"] = _pad
    H["iota"] = _iota
    H["select_n"] = _select_n
    H["integer_pow"] = _integer_pow
    H["square"] = lambda b, e, iv: b.node("Mul", [iv[0], iv[0]])
    H["argmax"] = lambda b, e, iv: b.node(
        "Cast", [b.node("ArgMax", iv, axis=int(e.params["axes"][0]), keepdims=0)],
        to=_dt(e.params["index_dtype"]))
    H["exp2"] = lambda b, e, iv: b.node(
        "Pow", [b.const(np.asarray(2, e.invars[0].aval.dtype)), iv[0]])
    H["clamp"] = lambda b, e, iv: b.node(
        "Max", [b.node("Min", [iv[1], iv[2]]), iv[0]])


def _reshape(b, eqn, invals):
    x = invals[0]
    if eqn.params.get("dimensions") is not None:
        x = b.node("Transpose", [x], perm=[int(p) for p in eqn.params["dimensions"]])
    return b.node("Reshape", [x, b.i64(list(eqn.params["new_sizes"]) or [1])])


def _split(b, eqn, invals):
    sizes = [int(s) for s in eqn.params["sizes"]]
    outs = b.node("Split", [invals[0], b.i64(sizes)], n_out=len(sizes),
                  axis=int(eqn.params["axis"]))
    return outs if isinstance(outs, list) else [outs]


def _slice(b, eqn, invals):
    p = eqn.params
    starts = [int(s) for s in p["start_indices"]]
    ends = [int(s) for s in p["limit_indices"]]
    steps = [int(s) for s in (p.get("strides") or [1] * len(starts))]
    axes = list(range(len(starts)))
    return b.node("Slice", [invals[0], b.i64(starts), b.i64(ends),
                            b.i64(axes), b.i64(steps)])


def _rev(b, eqn, invals):
    dims = [int(d) for d in eqn.params["dimensions"]]
    imin = np.iinfo(np.int64).min
    return b.node("Slice", [invals[0], b.i64([-1] * len(dims)),
                            b.i64([imin] * len(dims)), b.i64(dims),
                            b.i64([-1] * len(dims))])


def _pad(b, eqn, invals):
    cfg = eqn.params["padding_config"]
    if any(int(i) != 0 for _, _, i in cfg):
        raise UnsupportedPrimitive("pad: interior padding")
    if any(int(lo) < 0 or int(hi) < 0 for lo, hi, _ in cfg):
        raise UnsupportedPrimitive("pad: negative (cropping) pads")
    pads = [int(lo) for lo, _, _ in cfg] + [int(hi) for _, hi, _ in cfg]
    return b.node("Pad", [invals[0], b.i64(pads), invals[1]], mode="constant")


def _iota(b, eqn, invals):
    p = eqn.params
    shape, dim = list(p["shape"]), int(p["dimension"])
    ar = np.arange(shape[dim], dtype=p["dtype"])
    arr = np.broadcast_to(ar.reshape([-1 if i == dim else 1 for i in range(len(shape))]),
                          shape).copy()
    return b.const(arr)


def _select_n(b, eqn, invals):
    if len(invals) != 3:
        raise UnsupportedPrimitive(f"select_n with {len(invals) - 1} cases")
    # select_n(pred, false_case, true_case); Where(cond, X, Y) -> X where cond
    return b.node("Where", [invals[0], invals[2], invals[1]])


def _integer_pow(b, eqn, invals):
    y = int(eqn.params["y"])
    if y == 2:
        return b.node("Mul", [invals[0], invals[0]])
    expo = b.const(np.asarray(y, eqn.invars[0].aval.dtype))
    return b.node("Pow", [invals[0], expo])


_register_all()

_INLINE = {"pjit", "jit", "closed_call", "remat", "checkpoint",
           "custom_jvp_call", "custom_vjp_call", "custom_jvp_call_jaxpr",
           "custom_vjp_call_jaxpr", "remat2"}

# Pure ops folded at export time when ALL inputs are constants. This is what
# lets initializer-derived weights reach `conv` as constants even when the
# trace routes them through transpose/rev/reshape first (e.g. the Proto
# upsample's ConvTranspose kernel — round-4 advisor finding). Size-guarded so
# a scalar broadcast to an image-sized tensor is NOT materialized.
_FOLDABLE = {"transpose", "rev", "reshape", "squeeze", "expand_dims",
             "broadcast_in_dim", "convert_element_type", "slice",
             "concatenate", "neg", "mul", "add", "sub", "div", "pad"}


def _try_fold(b: _Builder, eqn, invals, env) -> bool:
    """Constant-fold `eqn` into const_vals; True when folded."""
    if eqn.primitive.name not in _FOLDABLE:
        return False
    if not all(n in b.const_vals for n in invals):
        return False
    ins = [b.const_vals[n] for n in invals]
    out_sz = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars)
    in_sz = sum(int(a.size) for a in ins)
    if out_sz > 2 * max(in_sz, 1024):  # block constant blow-ups
        return False
    try:
        import contextlib
        try:  # prefer folding on host CPU; an accel-only platform config
            ctx = jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:  # (e.g. JAX_PLATFORMS=axon) folds on the default
            ctx = contextlib.nullcontext()
        with ctx:
            res = eqn.primitive.bind(*ins, **eqn.params)
    except Exception:  # noqa: BLE001 — fall back to graph emission
        return False
    res = list(res) if eqn.primitive.multiple_results else [res]
    for ov, r in zip(eqn.outvars, res):
        env[ov] = b.const(np.asarray(r))
    return True


def _emit(b: _Builder, jaxpr, env: dict):
    from jax._src.core import Literal

    def read(v):
        if isinstance(v, Literal):
            return b.const(np.asarray(v.val, v.aval.dtype))
        return env[v]

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        invals = [read(v) for v in eqn.invars]
        if _try_fold(b, eqn, invals, env):
            continue
        if name in _INLINE:
            inner = (eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
                     or eqn.params.get("fun_jaxpr"))
            if inner is None:
                raise UnsupportedPrimitive(f"{name}: no inner jaxpr found")
            consts, inner_jaxpr = (
                (inner.consts, inner.jaxpr) if hasattr(inner, "jaxpr") else ([], inner))
            sub = {}
            for cv, c in zip(inner_jaxpr.constvars, consts):
                sub[cv] = b.const(np.asarray(c))
            n_in = len(inner_jaxpr.invars)
            for iv, val in zip(inner_jaxpr.invars, invals[len(invals) - n_in:]):
                sub[iv] = val
            outs = _emit(b, inner_jaxpr, sub)
            for ov, o in zip(eqn.outvars, outs):
                env[ov] = o
            continue
        h = _HANDLERS.get(name)
        if h is None:
            raise UnsupportedPrimitive(name)
        out = h(b, eqn, invals)
        if isinstance(out, list):
            for ov, o in zip(eqn.outvars, out):
                env[ov] = o
        else:
            env[eqn.outvars[0]] = out
    return [read(v) for v in jaxpr.outvars]


def export_onnx(fn, example_input: np.ndarray, path: str, opset: int = 17,
                input_name: str = "images", output_names=None,
                graph_name: str = "sar_yolo_tpu") -> str:
    """Trace `fn(example_input)` to a jaxpr and write a verified ONNX model.

    The declared opset is clamped to [13, 17]: the emitted operator forms
    (ReduceSum axes-as-input, Split sizes-as-input, Slice input form) were
    introduced in 13, and ReduceMax's axes-as-attribute form was retired in 18.
    """
    opset_c = min(max(int(opset), 13), 17)
    if opset_c != opset:
        LOGGER.warning(f"ONNX opset {opset} clamped to {opset_c} "
                       "(emitted operator forms are valid for 13..17)")
    closed = jax.make_jaxpr(fn)(jax.ShapeDtypeStruct(
        example_input.shape, example_input.dtype))
    b = _Builder()
    env = {}
    for cv, c in zip(closed.jaxpr.constvars, closed.consts):
        env[cv] = b.const(np.asarray(c))
    if len(closed.jaxpr.invars) != 1:
        raise ValueError("export_onnx expects a single-array function")
    iv = closed.jaxpr.invars[0]
    env[iv] = input_name
    try:
        outs = _emit(b, closed.jaxpr, env)
    except UnsupportedPrimitive as e:
        hint = (" Embedded-NMS/dynamic-control-flow graphs are not "
                "ONNX-exportable; export with nms=False, or use 'stablehlo' / "
                "'saved_model' for full-pipeline artifacts."
                if any(k in str(e) for k in ("while", "cond", "scan", "sort",
                                             "top_k", "gather", "scatter"))
                else "")
        raise UnsupportedPrimitive(
            f"ONNX export: the traced program uses a primitive with no ONNX "
            f"mapping ({e}).{hint}") from e
    out_avals = [v.aval for v in closed.jaxpr.outvars]
    output_names = output_names or [f"output{i}" if i else "output"
                                    for i in range(len(outs))]
    # terminal Identity nodes pin the public output names (raw_node marks a
    # directly-returned constant as used so its initializer is serialized)
    for o, nm in zip(outs, output_names):
        b.raw_node(P.node_proto("Identity", [o], [nm]), [o])
    g = P.graph_proto(
        b.nodes, graph_name, b.initializers(),
        inputs=[P.value_info_proto(input_name, example_input.dtype,
                                   example_input.shape)],
        outputs=[P.value_info_proto(nm, av.dtype, av.shape)
                 for nm, av in zip(output_names, out_avals)])
    blob = P.model_proto(g, opset=opset_c)
    with open(path, "wb") as f:
        f.write(blob)
    return str(path)
