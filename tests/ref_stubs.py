"""Import the read-only reference checkout (/root/reference) with the minimal
stubs this image needs: fake torchvision dist metadata + empty thop /
pytorch_metric_learning modules (none are touched by the code paths under
test). Shared by test_torch_parity.py and test_ref_crosscheck.py.
"""

from __future__ import annotations

import importlib.metadata as _md
import sys
import types

_REAL_VERSION = _md.version


def install_reference_stubs():
    def fake_version(name):
        if name == "torchvision":
            return "0.19.0"
        return _REAL_VERSION(name)

    _md.version = fake_version
    for name in ("thop", "pytorch_metric_learning", "pytorch_metric_learning.miners",
                 "pytorch_metric_learning.distances", "pytorch_metric_learning.losses",
                 "pytorch_metric_learning.reducers"):
        mod = types.ModuleType(name)
        if name == "thop":
            mod.profile = lambda *a, **k: (0, 0)
        sys.modules.setdefault(name, mod)
    pml = sys.modules["pytorch_metric_learning"]
    for sub in ("miners", "distances", "losses", "reducers"):
        setattr(pml, sub, sys.modules[f"pytorch_metric_learning.{sub}"])

    class _Unavailable:
        """Constructible placeholder so v13JDELoss.__init__ (which builds
        MetricLearningLoss eagerly, reference loss.py:392) imports; raises if
        the miner/loss is actually invoked — tests must zero embed_loss."""

        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise RuntimeError("pytorch_metric_learning is stubbed in this image")

        def to(self, *a, **k):
            return self

    sys.modules["pytorch_metric_learning.miners"].BatchEasyHardMiner = _Unavailable
    sys.modules["pytorch_metric_learning.losses"].TripletMarginLoss = _Unavailable
    if "lap" not in sys.modules:
        sys.modules["lap"] = _make_lap_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _make_lap_stub():
    """lap.lapjv stand-in (not pip-installable here): scipy Hungarian on the
    standard cost_limit extension [[C, L/2], [L/2, 0]], which is exactly how
    lapjv realizes extend_cost+cost_limit — optimal gated assignments agree
    whenever no cost ties the limit."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    def lapjv(cost, extend_cost=False, cost_limit=np.inf):
        cost = np.asarray(cost, float)
        n, m = cost.shape
        if not np.isfinite(cost_limit):
            cost_limit = cost.max() + 1.0 if cost.size else 1.0
        ext = np.full((n + m, n + m), cost_limit / 2.0)
        ext[n:, m:] = 0.0
        ext[:n, :m] = cost
        rows, cols = linear_sum_assignment(ext)
        x = np.full(n, -1, int)
        y = np.full(m, -1, int)
        total = 0.0
        for r, c in zip(rows, cols):
            if r < n and c < m:
                x[r], y[c] = c, r
                total += cost[r, c]
        return total, x, y

    mod = types.ModuleType("lap")
    mod.__version__ = "0.5.12-stub"
    mod.lapjv = lapjv
    return mod
