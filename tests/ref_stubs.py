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
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
