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

    miner_cls, loss_cls = _make_metric_learning_oracle()
    sys.modules["pytorch_metric_learning.miners"].BatchEasyHardMiner = miner_cls
    sys.modules["pytorch_metric_learning.losses"].TripletMarginLoss = loss_cls
    if "lap" not in sys.modules:
        sys.modules["lap"] = _make_lap_stub()
    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = _make_torchvision_stub()
        sys.modules["torchvision.ops"] = sys.modules["torchvision"].ops
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _make_metric_learning_oracle():
    """Faithful test-local re-implementation of the two pytorch_metric_learning
    classes the reference's MetricLearningLoss instantiates
    (/root/reference/ultralytics/utils/loss.py:19-41), written from the
    library's documented contract so the JDE embed term can be crosschecked
    without the wheel:

    * Both classes use the library default distance, LpDistance(p=2,
      normalize_embeddings=True): pairwise L2 on UNIT-normalized embeddings.
    * BatchEasyHardMiner(pos_strategy='hard', neg_strategy='semihard'):
      per anchor, the positive is the FARTHEST same-label element (self
      excluded); the negative is the CLOSEST different-label element that is
      strictly farther than that positive. Anchors lacking either are dropped
      (the library has no hardest-negative fallback). Returns (a, p, n) index
      tensors.
    * TripletMarginLoss(margin): relu(d(a,p) - d(a,n) + margin) per mined
      triplet, reduced by the default AvgNonZeroReducer — mean over VIOLATING
      triplets only, 0 when none (or no triplets).
    """
    import torch
    import torch.nn.functional as F

    class BatchEasyHardMiner:
        def __init__(self, pos_strategy="hard", neg_strategy="semihard"):
            assert (pos_strategy, neg_strategy) == ("hard", "semihard"), \
                "oracle implements exactly the reference's configuration"

        def to(self, *a, **k):
            return self

        def __call__(self, embeddings, labels):
            e = F.normalize(embeddings.float(), p=2, dim=1)
            d = torch.cdist(e, e, p=2)
            n = len(labels)
            idx = torch.arange(n)
            a_out, p_out, n_out = [], [], []
            for i in range(n):
                pos = (labels == labels[i]) & (idx != i)
                neg = labels != labels[i]
                if not pos.any() or not neg.any():
                    continue
                pd = torch.where(pos, d[i], torch.tensor(-torch.inf))
                hard_pos = pd.max()
                p_i = int(pd.argmax())
                semi = neg & (d[i] > hard_pos)
                if not semi.any():
                    continue
                nd = torch.where(semi, d[i], torch.tensor(torch.inf))
                n_i = int(nd.argmin())
                a_out.append(i)
                p_out.append(p_i)
                n_out.append(n_i)
            t = lambda v: torch.tensor(v, dtype=torch.long)
            return t(a_out), t(p_out), t(n_out)

    class TripletMarginLoss:
        def __init__(self, margin=0.05):
            self.margin = margin

        def to(self, *a, **k):
            return self

        def __call__(self, embeddings, labels, indices_tuple):
            a, p, nn = indices_tuple
            if len(a) == 0:
                return torch.tensor(0.0)
            e = F.normalize(embeddings.float(), p=2, dim=1)
            d_ap = (e[a] - e[p]).norm(dim=1)
            d_an = (e[a] - e[nn]).norm(dim=1)
            viol = torch.relu(d_ap - d_an + self.margin)
            nz = viol > 0
            return viol[nz].mean() if nz.any() else torch.tensor(0.0)

    return BatchEasyHardMiner, TripletMarginLoss


def _make_torchvision_stub():
    """torchvision.ops.nms stand-in (torchvision is not in this image): the
    textbook exact greedy NMS, which is the algorithm torchvision implements —
    needed so the reference's own non_max_suppression/validator can run for
    end-to-end val crosschecks."""
    import torch

    def nms(boxes, scores, iou_threshold):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            b = boxes[i]
            bb = boxes[rest]
            xx1 = torch.maximum(b[0], bb[:, 0])
            yy1 = torch.maximum(b[1], bb[:, 1])
            xx2 = torch.minimum(b[2], bb[:, 2])
            yy2 = torch.minimum(b[3], bb[:, 3])
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            area_i = (b[2] - b[0]) * (b[3] - b[1])
            area_r = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
            iou = inter / (area_i + area_r - inter)
            order = rest[iou <= iou_threshold]
        return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.zeros(0, dtype=torch.long)
        off = boxes.max() + 1.0
        return nms(boxes + (idxs.to(boxes.dtype) * off)[:, None], scores, iou_threshold)

    import importlib.machinery
    mod = types.ModuleType("torchvision")
    mod.__version__ = "0.19.0-stub"
    # a real ModuleSpec: importlib.util.find_spec raises ValueError on
    # modules with __spec__ None (e.g. transformers' torchvision probe
    # in tests that run after the stubs are installed)
    mod.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    mod.ops = types.ModuleType("torchvision.ops")
    mod.ops.__spec__ = importlib.machinery.ModuleSpec("torchvision.ops", None)
    mod.ops.nms = nms
    mod.ops.batched_nms = batched_nms
    return mod


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
