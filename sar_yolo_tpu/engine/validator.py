"""Validators: eval loop -> on-device decode+NMS -> host mAP accumulation.

Capability parity with reference BaseValidator (engine/validator.py:40-341) and
JDEValidator (models/yolo/jde/val.py): detection mAP50/75/50-95, plus jde's
state-classification accuracy and ReID embedding separation metrics
(utils/metrics.py:1314, utils/loss.py:562).

The whole model fwd + decode + NMS runs as ONE jit per batch; only the final
fixed-size (B, max_det, 6+E) array crosses to host for metric accounting.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sar_yolo_tpu.data import build_dataloader
from sar_yolo_tpu.ops.decode import decode_detect
from sar_yolo_tpu.ops.nms import non_max_suppression
from sar_yolo_tpu.utils import LOGGER
from sar_yolo_tpu.utils.metrics import DetMetrics, IOU_THRESHOLDS, box_iou_np, match_predictions


class BaseValidator:
    """Shared eval-loop machinery; subclasses specialize postprocess/metrics."""

    def __call__(self, model=None, variables=None, meta=None, dataset=None, args=None,
                 data=None):
        self.args = args
        self.meta = meta
        self.data = data or {}
        nc = meta["nc"]
        conf = args.conf if args.conf is not None else 0.001
        max_det = args.max_det
        strides = tuple(meta["strides"])
        extra_sig = meta.get("state_classes") or 0

        @jax.jit
        def predict(variables, img):
            feats = model.apply(variables, img, train=False)
            preds = decode_detect(feats, strides, nc, meta["reg_max"],
                                  extra_sigmoid=extra_sig)
            return non_max_suppression(preds, conf_thres=conf, iou_thres=args.iou,
                                       max_det=max_det, nc=nc)

        loader = build_dataloader(dataset, batch_size=min(args.batch, len(dataset)),
                                  shuffle=False, workers=args.workers)
        self.init_metrics()
        n_img = 0
        t0 = time.time()
        for batch in loader:
            img = jnp.asarray(batch["img"])
            dets = np.asarray(predict(variables, img))
            n_img += img.shape[0]
            self.update_metrics(dets, batch, img.shape[1:3])
        results = self.finalize_metrics()
        dt = time.time() - t0
        if n_img:
            results["speed/ms_per_image"] = dt / n_img * 1000
        self.print_results(results, n_img)
        return results

    # ---- hooks -----------------------------------------------------------
    def init_metrics(self):
        self.det_metrics = DetMetrics(self.data.get("names"))

    def update_metrics(self, dets, batch, hw):
        h, w = hw
        scale = np.array([w, h, w, h], np.float32)
        for bi in range(dets.shape[0]):
            d = dets[bi]
            d = d[d[:, 4] > 0]
            gt_mask = batch["mask"][bi] > 0
            gt_cls = batch["cls"][bi][gt_mask]
            gb = batch["bboxes"][bi][gt_mask] * scale  # xywh pixels
            gt_boxes = np.stack([gb[:, 0] - gb[:, 2] / 2, gb[:, 1] - gb[:, 3] / 2,
                                 gb[:, 0] + gb[:, 2] / 2, gb[:, 1] + gb[:, 3] / 2], 1) \
                if len(gb) else np.zeros((0, 4), np.float32)
            tp = match_predictions(d[:, :4], d[:, 5], gt_boxes, gt_cls)
            self.det_metrics.update(tp, d[:, 4], d[:, 5], gt_cls)
            self._extra_update(d, gt_boxes, gt_cls, batch, bi)

    def _extra_update(self, d, gt_boxes, gt_cls, batch, bi):
        pass

    def finalize_metrics(self) -> dict:
        return self.det_metrics.process()

    def print_results(self, results, n_img):
        if results:
            LOGGER.info("  ".join(f"{k.split('/')[-1]}={v:.4f}" for k, v in results.items()))


class DetectionValidator(BaseValidator):
    pass


class JDEValidator(BaseValidator):
    """Adds posture-state accuracy and ReID embedding separation metrics.

    Detections carry extras: [x1,y1,x2,y2,conf,cls, emb(256), state(6)].
    State/ReID stats follow the fork's JDEValidator (jde/val.py:244-330 state
    detection stats; metrics.py:1314 ReIDMetrics cosine separation).
    """

    def init_metrics(self):
        super().init_metrics()
        self.state_correct = 0
        self.state_total = 0
        self.embeds = []
        self.embed_tags = []

    def _extra_update(self, d, gt_boxes, gt_cls, batch, bi):
        if len(d) == 0 or len(gt_boxes) == 0 or "tags" not in batch:
            return
        embed_dim = self.meta["embed_dim"]
        sc = self.meta["state_classes"] or 0
        iou = box_iou_np(gt_boxes, d[:, :4])
        gt_mask = batch["mask"][bi] > 0
        gt_tags = batch["tags"][bi][gt_mask].astype(int)
        # match each gt to best pred at IoU>=0.5
        for g in range(len(gt_boxes)):
            p = iou[g].argmax()
            if iou[g, p] >= 0.5:
                emb = d[p, 6:6 + embed_dim]
                self.embeds.append(emb)
                self.embed_tags.append(gt_tags[g])
                if sc:
                    state_pred = int(d[p, 6 + embed_dim:6 + embed_dim + sc].argmax())
                    # synthetic/person-search convention: tag doubles as state id
                    state_gt = int(gt_tags[g]) % sc
                    self.state_correct += int(state_pred == state_gt)
                    self.state_total += 1

    def finalize_metrics(self) -> dict:
        results = super().finalize_metrics()
        if self.state_total:
            results["metrics/state_acc"] = self.state_correct / self.state_total
        if len(self.embeds) >= 2:
            E = np.stack(self.embeds)
            E = E / (np.linalg.norm(E, axis=1, keepdims=True) + 1e-9)
            tags = np.asarray(self.embed_tags)
            sim = E @ E.T
            same = tags[:, None] == tags[None, :]
            off = ~np.eye(len(E), dtype=bool)
            pos = sim[same & off]
            neg = sim[~same]
            if len(pos) and len(neg):
                results["metrics/reid_pos_cos"] = float(pos.mean())
                results["metrics/reid_neg_cos"] = float(neg.mean())
                results["metrics/reid_separation"] = float(pos.mean() - neg.mean())
        return results
