"""Golden tests for the YAML->graph compiler channel arithmetic.

Golden values derived from the reference parse_model printout conventions
(ultralytics yolov8n: 3,157,184 trainable params, strides 8/16/32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_yolo_tpu.nn.tasks import build_model, init_model, parse_model, yaml_model_load


def n_params(variables):
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"])))


def test_yolov8n_channels():
    d = yaml_model_load("yolov8n.yaml")
    specs, save, meta = parse_model(d)
    assert meta["nc"] == 80
    assert meta["legacy"] is True
    # golden per-layer output channels for yolov8n (width 0.25)
    assert meta["channels"][:10] == [16, 32, 32, 64, 64, 128, 128, 256, 256, 256]
    assert save == (4, 6, 9, 12, 15, 18, 21)
    assert meta["head"] == "Detect"
    assert meta["head_ch"] == (64, 128, 256)


def test_yolov8s_channels():
    d = yaml_model_load("yolov8s.yaml")
    _, _, meta = parse_model(d)
    assert meta["channels"][:10] == [32, 64, 64, 128, 128, 256, 256, 512, 512, 512]


def test_yolov13n_parse():
    d = yaml_model_load("yolov13n.yaml")
    specs, save, meta = parse_model(d)
    assert meta["legacy"] is False
    # backbone channels (width 0.25): 16,32,64,64,128,128,128,256,256
    assert meta["channels"][:9] == [16, 32, 64, 64, 128, 128, 128, 256, 256]
    # HyperACE output = make_divisible(512*0.25) = 128; hyperedges scaled 8*0.5=4 at n
    hyper = specs[9]
    assert hyper.name == "HyperACE"
    assert hyper.args[1] == 128 and hyper.args[3] == 4
    # DownsampleConv doubles channels
    assert specs[11].name == "DownsampleConv" and specs[11].c2 == 256
    # FullPAD_Tunnel keeps first-input channels
    assert specs[12].name == "FullPAD_Tunnel" and specs[12].c2 == 128


def test_yolov13_jde_parse():
    d = yaml_model_load("yolov13n-JDE.yaml")
    specs, save, meta = parse_model(d)
    assert meta["nc"] == 1
    head = specs[-1]
    assert head.name == "JDE"
    assert head.args == (1, 256, 6)  # nc, embed_dim, state_classes


def test_yolov8n_param_count_and_forward():
    """Fast-tier representative: exact param parity + forward shapes for the
    canonical v8 family (full-family goldens live in the slow tier)."""
    model, meta = build_model("yolov8n.yaml")
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
    # reference yolov8n: 3,157,184 gradients (trainable params; +16 frozen DFL proj)
    assert n_params(variables) == 3_157_184
    assert meta["strides"] == [8, 16, 32]
    feats = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape for f in feats] == [(1, 8, 8, 144), (1, 4, 4, 144), (1, 2, 2, 144)]


def test_yolov13n_jde_forward():
    """Fast-tier representative for the flagship JDE family."""
    model, meta = build_model("yolov13n-JDE.yaml")
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
    assert meta["strides"] == [8, 16, 32]
    assert meta["embed_dim"] == 256 and meta["state_classes"] == 6
    feats = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.zeros((1, 64, 64, 3)))
    no = 16 * 4 + 1 + 256 + 6  # reg_max*4 + nc + embed + states
    assert [f.shape for f in feats] == [(1, 8, 8, no), (1, 4, 4, no), (1, 2, 2, no)]


def test_v13_variant_yamls_parse():
    for name in ["yolov13n-JDE_CBAM.yaml", "yolov13n-JDE_P24.yaml"]:
        d = yaml_model_load(name)
        specs, save, meta = parse_model(d)
        assert meta["head"] == "JDE"
    # P24 head covers 4 pyramid levels
    d = yaml_model_load("yolov13n-JDE_P24.yaml")
    specs, _, meta = parse_model(d)
    assert meta["nl"] == 4


def test_rtdetr_yaml_parses():
    d = yaml_model_load("rtdetr-l.yaml")
    specs, save, meta = parse_model(d)
    assert meta["head"] == "RTDETRDecoder"
    assert specs[0].name == "HGStem"


def test_yolo11_param_parity_fast():
    """Fast-tier representative for the yolo11 family: exact trainable-param
    parity for yolo11n (the FORK's yaml, nc=1 person detection)."""
    model, meta = build_model("yolo11n.yaml")
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
    assert n_params(variables) == 2_590_019


@pytest.mark.slow
def test_yolo11_yolo12_param_parity():
    """Exact trainable-param parity with reference yolo11n/yolov12n
    (reference counts minus the 16 frozen DFL projection weights)."""
    # yolo11n count is for the FORK's yaml (nc=1, person detection)
    for name, exp in [("yolo11n.yaml", 2_590_019), ("yolov12n.yaml", 2_553_888)]:
        model, meta = build_model(name)
        variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
        assert n_params(variables) == exp, name


@pytest.mark.slow
def test_yolov13_jde_param_parity():
    """Exact trainable-param parity with the reference yolov13n-JDE build
    (verified per-layer against the reference parse_model: every DSC3k2, A2C2f,
    HyperACE, hypergraph and FullPAD layer matches to the parameter)."""
    model, meta = build_model("yolov13n-JDE.yaml")
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
    assert n_params(variables) == 5_495_872


@pytest.mark.slow
def test_yolo11_jde_family_param_parity():
    """Exact trainable-param parity with reference builds of the fork's
    yolo11-JDE experiment matrix (JDEModel counts; the P24_CBAM golden is the
    reference count minus its DEAD 4-scale FuseModule conv_out — the reference
    creates Conv(4*c1, c1) in __init__ then never calls it in the 4-input
    forward, using a lazily-created conv_adjusts[concat_width] instead,
    reference block.py:1869-1899; 4*128*128+256 = 65,792 params at scale n)."""
    gold = {
        "yolo11n-JDE.yaml": 5_625_801,
        "yolo11n-JDE_CBAM.yaml": 5_832_537,
        "yolo11n-P24_JDE.yaml": 6_432_954,
        "yolo11n-P24_CBAM_JDE.yaml": 6_645_102,
        "yolov13n-P24_CBAM_JDE.yaml": 6_586_740 - 65_792,
    }
    for name, exp in gold.items():
        model, meta = build_model(name)
        variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
        assert n_params(variables) == exp, name
        assert meta["head"] == "JDE"


@pytest.mark.slow
def test_yolo11_task_family_param_parity():
    """Exact trainable-param parity with reference yolo11n-seg/pose/obb/cls."""
    gold = {
        "yolo11n-seg.yaml": 2_876_832,
        "yolo11n-pose.yaml": 2_908_491,
        "yolo11n-obb.yaml": 2_695_731,
        "yolo11n-cls.yaml": 1_633_584,
    }
    for name, exp in gold.items():
        model, meta = build_model(name)
        variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
        assert n_params(variables) == exp, name


@pytest.mark.slow
def test_yolov13_jde_p24_builds_and_runs():
    """P24 variant: 4-scale HyperACE fuse + P2..P5 JDE head builds and runs."""
    model, meta = build_model("yolov13n-JDE_P24.yaml")
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
    assert meta["strides"] == [4, 8, 16, 32]
    feats = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.zeros((1, 64, 64, 3)))
    assert len(feats) == 4


@pytest.mark.slow
def test_v3_v5_v6_v9_param_parity():
    """Exact trainable-param parity with reference builds of the v3/v5/v6/v9
    families (golden counts from reference DetectionModel/SegmentationModel,
    minus nothing — reference counts already exclude the frozen DFL proj)."""
    gold = {
        "yolov3-tiny.yaml": 12_173_232,
        "yolov5n.yaml": 2_654_800,
        "yolov6n.yaml": 4_500_064,
        "yolov9t.yaml": 2_128_704,
    }
    for name, exp in gold.items():
        model, meta = build_model(name)
        variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=256)
        assert n_params(variables) == exp, name


@pytest.mark.slow
def test_yolov9e_dual_branch_param_parity():
    """yolov9e exercises CBLinear/CBFuse/Identity + deep GELAN; exact parity."""
    model, meta = build_model("yolov9e.yaml")
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=256)
    assert n_params(variables) == 58_206_576
    assert meta["strides"] == [8, 16, 32]


def test_v9t_parse():
    d = yaml_model_load("yolov9t.yaml")
    specs, save, meta = parse_model(d)
    assert specs[2].name == "ELAN1" and specs[2].c2 == 32
    assert specs[4].name == "RepNCSPELAN4" and specs[4].args == (64, 64, 32, 3)
    assert specs[9].name == "SPPELAN" and specs[9].c2 == 128


@pytest.mark.slow  # whole-model compile; v9 forward parity also covered in test_torch_parity
def test_v9t_forward():
    model, meta = build_model("yolov9t.yaml")
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=128)
    out = model.apply(variables, jnp.zeros((1, 128, 128, 3)), train=False)
    feats = out[0] if isinstance(out, tuple) else out
    assert [f.shape[1] for f in feats] == [16, 8, 4]


def test_v6_relu_activation_override():
    """yolov6 yaml sets activation: nn.ReLU(); negative pre-act values must be
    clipped at 0 after every Conv (silu would leak negatives)."""
    d = yaml_model_load("yolov6n.yaml")
    _, _, meta = parse_model(d)
    assert meta["act"] == "relu"


def test_repeat_wrapper_sequential_stack():
    """v3's `- [-1, 2, Bottleneck, [128]]` rows must become 2 chained bottlenecks
    (reference wraps in nn.Sequential) — params double vs a single block."""
    ms = []
    for n in (1, 2, 4):
        d = {"nc": 1, "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, n, "Bottleneck", [8]]],
             "head": [[[-1], 1, "Detect", ["nc"]]]}
        model, meta = build_model(d)
        v = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
        ms.append(n_params(v))
    # each extra bottleneck adds the same param increment; n=1->2 is one block,
    # n=2->4 is two blocks
    inc = ms[1] - ms[0]
    assert inc > 0
    assert ms[2] - ms[1] == 2 * inc
