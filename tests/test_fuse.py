"""Deploy-time fusion: BN fold + Rep-branch merge (nn/fuse.py).

Reference capability: BaseModel.fuse (ultralytics/nn/tasks.py:205),
RepConv.get_equivalent_kernel_bias / Conv2.fuse_convs (nn/modules/conv.py).
"""

import jax
import jax.numpy as jnp
import flax
import pytest

from sar_yolo_tpu.nn.tasks import build_model, init_model
from sar_yolo_tpu.nn.fuse import fuse, fuse_variables, n_params
from sar_yolo_tpu.nn.modules.conv import Conv2, DSConv, RepConv, fused_mode


def _randomize_stats(v, seed=7):
    """Give batch_stats non-trivial values so the fold is actually exercised."""
    bs = flax.core.unfreeze(v.get("batch_stats", {}))
    leaves, tree = jax.tree.flatten(bs)
    keys = jax.random.split(jax.random.PRNGKey(seed), max(len(leaves), 1))
    leaves = [jnp.abs(jax.random.normal(k, l.shape)) * 0.5 + 0.2
              for k, l in zip(keys, leaves)]
    v = dict(v)
    v["batch_stats"] = jax.tree.unflatten(tree, leaves)
    return v


@pytest.mark.parametrize("mod,kw", [(RepConv, {"c2": 8}), (Conv2, {"c2": 12}),
                                    (DSConv, {"c2": 12})])
def test_module_fuse_exact(mod, kw):
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 16, 16, 8))
    m = mod(**kw)
    v = _randomize_stats(m.init(rng, x, train=False))
    out = m.apply(v, x, train=False)
    fv = fuse_variables(v)
    with fused_mode(True):
        fout = m.apply(fv, x, train=False)
    assert float(jnp.abs(out - fout).max()) < 1e-4


def test_model_fuse_exact_and_smaller():
    model, meta = build_model("tinydet.yaml")
    v = _randomize_stats(init_model(model, meta, jax.random.PRNGKey(0), imgsz=64))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = model.apply(v, x, train=False)
    fm, fv = fuse(model, v)
    fout = fm.apply(fv, x, train=False)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(fout)):
        assert float(jnp.abs(a - b).max()) < 1e-3
    # BN scale params disappear; conv biases appear -> net params shrink
    assert n_params(fv) < n_params(v)
    assert "batch_stats" not in fv


def test_predict_runs_fused(tmp_path):
    """YOLO.predict serves the fused trace and matches unfused boxes."""
    import numpy as np
    from sar_yolo_tpu.engine.model import YOLO
    m = YOLO("tinydet.yaml")
    img = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype("uint8")
    res = m.predict(img, imgsz=64, conf=0.001, verbose=False)
    pred = m._predictor_cache[1]
    assert getattr(pred.model, "fused", False) is True
    assert res is not None


def test_repvggdw_fuse_exact():
    """v10 CIB large-kernel branch: parallel 7x7+3x3 dw fold to one 7x7."""
    from sar_yolo_tpu.nn.modules.block import RepVGGDW
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (2, 16, 16, 24))
    m = RepVGGDW(24)
    v = _randomize_stats(m.init(rng, x, train=False))
    out = m.apply(v, x, train=False)
    fv = fuse_variables(v)
    with fused_mode(True):
        fout = m.apply(fv, x, train=False)
    assert float(jnp.abs(out - fout).max()) < 1e-4


def test_int8_quant_conv_close_but_not_identical():
    """quant_mode("int8") runs dense convs on the int8 path: output within
    dynamic-range-quantization tolerance of the fused f32 conv, and NOT
    bit-identical (proves the quantized kernel is actually in the trace)."""
    from sar_yolo_tpu.nn.modules.conv import Conv, quant_mode
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 16, 16, 8))
    m = Conv(c2=16, k=3)
    with fused_mode(True):
        v = m.init(rng, x)
        out = m.apply(v, x)
        with quant_mode("int8"):
            qout = m.apply(v, x)
    rel = float(jnp.abs(qout - out).max() / (jnp.abs(out).max() + 1e-9))
    assert 0 < rel < 0.05  # ~1/254-per-tensor rounding through one conv


def test_predict_int8_serving(tmp_path):
    """YOLO.predict(int8=True) serves the fused int8-MXU trace (reference
    int8=True / TRT dynamic-range analog) and still produces detections."""
    import numpy as np
    from sar_yolo_tpu.engine.model import YOLO
    m = YOLO("tinydet.yaml")
    img = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype("uint8")
    res = m.predict(img, imgsz=64, conf=0.001, int8=True, verbose=False)
    pred = m._predictor_cache[1]
    assert getattr(pred.model, "fused", False) is True
    assert getattr(pred.model, "quant", "") == "int8"
    assert res is not None
