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
import jax
import jax.numpy as jnp
import numpy as np

from sar_yolo_tpu.data import build_dataloader
from sar_yolo_tpu.ops.decode import decode_detect
from sar_yolo_tpu.ops.nms import non_max_suppression
from sar_yolo_tpu.utils import LOGGER
from sar_yolo_tpu.utils.metrics import DetMetrics, IOU_THRESHOLDS, box_iou_np, match_predictions


def _trim_batch(batch: dict, n: int) -> dict:
    """Drop trailing pad rows from every batch-dim leaf."""
    return {k: (v[:n] if isinstance(v, np.ndarray) and v.ndim >= 1 and
                len(v) >= n else v) for k, v in batch.items()}


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

        kpt_shape = tuple(meta["kpt_shape"]) if meta.get("kpt_shape") and \
            meta.get("head") == "Pose" else None

        end2end = meta.get("head") == "v10Detect"
        use_tta = bool(getattr(args, "augment", False))
        if use_tta and meta.get("head") != "Detect":
            LOGGER.warning("augment=True is Detect-only (reference nn/tasks.py:360); "
                           "reverting to single-scale eval")
            use_tta = False

        @jax.jit
        def predict(variables, img):
            if img.dtype == jnp.uint8:
                img = img.astype(jnp.float32) / 255.0
            if use_tta:
                from sar_yolo_tpu.ops.tta import forward_tta
                preds = forward_tta(lambda xi: model.apply(variables, xi, train=False),
                                    img, strides, nc, meta["reg_max"])
                dets = non_max_suppression(preds, conf_thres=conf, iou_thres=args.iou,
                                           max_det=max_det, nc=nc)
                return dets
            out = model.apply(variables, img, train=False)
            protos = None
            if isinstance(out, tuple):
                feats, protos = out
            else:
                feats = out
            emb_dim = meta.get("embed_dim") or 0  # JDE: post-NMS embedding gather
            preds = decode_detect(feats, strides, nc, meta["reg_max"],
                                  extra_sigmoid=extra_sig, kpt_shape=kpt_shape,
                                  split_extras=emb_dim)
            bank = None
            if emb_dim:
                preds, bank = preds
            if end2end:  # NMS-free (v10) path
                from sar_yolo_tpu.ops.nms import postprocess_end2end
                dets = postprocess_end2end(preds, max_det=max_det, conf_thres=conf, nc=nc)
            else:
                # reference val-time NMS is multi-label for nc > 1
                # (utils/ops.py non_max_suppression, multi_label=True in val)
                dets = non_max_suppression(preds, conf_thres=conf, iou_thres=args.iou,
                                           max_det=max_det, nc=nc, extras_bank=bank,
                                           multi_label=nc > 1)
            return (dets, protos) if protos is not None else dets

        bs = min(args.batch, len(dataset))
        # multi-chip eval: shard each val batch over a dp mesh — the jitted
        # program is unchanged, XLA partitions it from the input shardings
        # (no reference analog; its DDP does not cover validation)
        mesh = None
        if getattr(args, "mesh_shape", None):
            import jax as _jax
            dp = int(np.prod(args.mesh_shape))
            if dp > 1 and len(_jax.devices()) >= dp and bs % dp == 0:
                from sar_yolo_tpu.parallel import get_mesh
                mesh = get_mesh((dp,), axis_names=("dp",))
                from jax.sharding import NamedSharding, PartitionSpec as P
                variables = _jax.tree.map(
                    lambda x: _jax.device_put(x, NamedSharding(mesh, P())), variables)
            elif dp > 1:
                LOGGER.warning(f"val: mesh_shape={args.mesh_shape} needs {dp} devices "
                               f"and batch divisible by {dp} (batch={bs}); "
                               "running single-device")
        if getattr(args, "rect", False) and getattr(dataset, "shapes", None) is not None:
            # rectangular eval: aspect-sorted batches with bucketed shapes, so
            # executables stay bounded (reference BaseDataset.set_rectangle)
            dataset.init_rect(bs)
        loader = build_dataloader(dataset, batch_size=bs,
                                  shuffle=False, workers=args.workers,
                                  drop_last=False, pad_last=True)
        self.init_metrics()
        self.jdict = []   # COCO-style prediction rows when save_json
        self.gt_anns = [] # COCO-style GT rows (for the no-pycocotools CocoEval)
        # real COCO: category ids are the paper's 1-based 91-index scheme
        # (reference pred_to_json applies coco80_to_coco91_class) — applied to
        # predictions AND the internal GT rows so both stay consistent
        from pathlib import Path as _P
        is_coco = meta["nc"] == 80 and "coco" in _P(str(args.data or "")).stem.lower()
        if is_coco:
            from sar_yolo_tpu.data.converter import coco80_to_coco91_class
            cat_map = coco80_to_coco91_class()
            self._cat_id = lambda c: int(cat_map[int(c)])
        else:
            self._cat_id = int
        n_img = 0
        t0 = time.time()
        for batch in loader:
            npad = int(batch.pop("_pad", 0))
            img = jnp.asarray(batch["img"])
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                img = jax.device_put(img, NamedSharding(
                    mesh, P("dp", *([None] * (img.ndim - 1)))))
            out = predict(variables, img)
            if isinstance(out, tuple):
                dets, self._protos = np.asarray(out[0]), np.asarray(out[1])
            else:
                dets, self._protos = np.asarray(out), None
            n_eff = img.shape[0] - npad  # trailing pad rows are duplicate samples
            self._save_txt_batch(batch, dets, n_eff, n_img)
            if args.save_json:
                h, w = img.shape[1:3]
                scale = np.array([w, h, w, h], np.float32)
                for bi in range(n_eff):
                    d = dets[bi]
                    # COCO-comparable rows (reference detect/val.py pred_to_json
                    # + scale_boxes): boxes back in NATIVE image pixels, ids
                    # from the real file stem — scoreable against an external
                    # instances_*.json. Datasets without file metadata
                    # (synthetic) fall back to letterbox space + sequential ids.
                    stem, rt, padx, pady, oh, ow = self._native_params(
                        batch, bi, h, w, n_img)
                    if "im_file" in batch:
                        image_id = int(stem) if stem.isnumeric() else stem
                    else:
                        image_id = n_img + bi

                    def to_native(x1, y1, x2, y2):
                        x1, y1, x2, y2 = float(x1), float(y1), float(x2), float(y2)
                        x1 = min(max((x1 - padx) / rt, 0.0), ow)
                        x2 = min(max((x2 - padx) / rt, 0.0), ow)
                        y1 = min(max((y1 - pady) / rt, 0.0), oh)
                        y2 = min(max((y2 - pady) / rt, 0.0), oh)
                        return [round(x1, 3), round(y1, 3),
                                round(x2 - x1, 3), round(y2 - y1, 3)]

                    for row in d[d[:, 4] > 0]:
                        self.jdict.append({
                            "image_id": image_id,
                            "category_id": self._cat_id(row[5]),
                            "bbox": to_native(*(float(v) for v in row[:4])),
                            "score": round(float(row[4]), 5),
                        })
                    gmask = batch["mask"][bi] > 0
                    gb = batch["bboxes"][bi][gmask] * scale  # xywh center, pixels
                    gc = batch["cls"][bi][gmask]
                    for (cx, cy, bw, bh), c in zip(gb, gc):
                        self.gt_anns.append({
                            "image_id": image_id,
                            "category_id": self._cat_id(c),
                            "bbox": to_native(cx - bw / 2, cy - bh / 2,
                                              cx + bw / 2, cy + bh / 2),
                        })
            if args.plots and n_img == 0:
                self._plot_first_batch(batch, dets, n_eff, conf)
            self.update_metrics(dets[:n_eff], _trim_batch(batch, n_eff), img.shape[1:3])
            n_img += n_eff
        results = self.finalize_metrics()
        if args.save_json and self.jdict:
            import json
            from pathlib import Path
            save_dir = Path(getattr(args, "save_dir", None) or ".")
            save_dir.mkdir(parents=True, exist_ok=True)
            out_path = save_dir / "predictions.json"
            out_path.write_text(json.dumps(self.jdict))
            LOGGER.info(f"saved {len(self.jdict)} predictions to {out_path}")
            # COCO-protocol eval (reference eval_json -> pycocotools COCOeval)
            from sar_yolo_tpu.utils.coco_eval import eval_json
            try:
                results.update(eval_json(self.jdict, {"annotations": self.gt_anns}))
            except Exception as e:  # never fail a val run on the audit pass
                LOGGER.warning(f"COCO eval failed: {e}")
        if getattr(self, "confusion_matrix", None) is not None and n_img:
            try:
                from pathlib import Path as _P
                save_dir = _P(getattr(args, "save_dir", None) or ".")
                save_dir.mkdir(parents=True, exist_ok=True)
                self.confusion_matrix.plot(save_dir / "confusion_matrix.png",
                                           names=self.data.get("names"))
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"confusion matrix plot failed: {e}")
        dt = time.time() - t0
        if n_img:
            results["speed/ms_per_image"] = dt / n_img * 1000
        self.print_results(results, n_img)
        return results

    # ---- hooks -----------------------------------------------------------
    def init_metrics(self):
        self.det_metrics = DetMetrics(self.data.get("names"))
        self.confusion_matrix = None
        if getattr(self.args, "plots", False):
            from sar_yolo_tpu.utils.plotting import ConfusionMatrix
            self.confusion_matrix = ConfusionMatrix(self.meta["nc"])

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
            if self.confusion_matrix is not None:
                self.confusion_matrix.process_batch(d, gt_boxes, gt_cls)
            self._extra_update(d, gt_boxes, gt_cls, batch, bi)

    def _extra_update(self, d, gt_boxes, gt_cls, batch, bi):
        pass

    def _plot_pred_extras(self, batch, dets, n_eff) -> dict:
        """Task-specific plot_predictions kwargs (masks / kpts overlays)."""
        return {}

    def _native_params(self, batch, bi, h, w, n_img):
        """(stem, ratio, padx, pady, ori_h, ori_w) for un-letterboxing one
        image — shared by save_txt and save_json (single source for the
        de-padding math)."""
        from pathlib import Path as _P
        if "im_file" in batch:
            stem = _P(str(batch["im_file"][bi])).stem
            rt, padx, pady = (float(v) for v in batch["ratio_pad"][bi])
            oh, ow = (float(v) for v in batch["ori_shape"][bi])
            return stem, rt, padx, pady, oh, ow
        return f"image{n_img + bi}", 1.0, 0.0, 0.0, float(h), float(w)

    def _save_txt_batch(self, batch, dets, n_eff, n_img, rotated=False):
        """Per-image YOLO-format label files in NATIVE normalized coords
        (+conf with save_conf) — reference BaseValidator save_txt /
        save_one_txt (validator.py:98, detect/val.py:166-279). `dets` is a
        (B, N, C) array or list of per-image (n, C) arrays; rotated rows are
        [cx cy w h r conf cls] (OBB), else [x1 y1 x2 y2 conf cls...]."""
        args = self.args
        if not getattr(args, "save_txt", False):
            return
        from pathlib import Path as _P
        lbl_dir = _P(getattr(args, "save_dir", None) or ".") / "labels"
        lbl_dir.mkdir(parents=True, exist_ok=True)
        h, w = np.asarray(batch["img"]).shape[1:3]
        conf_c, cls_c = (5, 6) if rotated else (4, 5)
        save_conf = getattr(args, "save_conf", False)
        for bi in range(n_eff):
            d = np.asarray(dets[bi])
            d = d[d[:, conf_c] > 0]
            stem, rt, padx, pady, oh, ow = self._native_params(batch, bi, h, w, n_img)
            lines = []
            for row in d:
                conf_s = f" {float(row[conf_c]):.6f}" if save_conf else ""
                if rotated:
                    # native normalized cxcywh + radians (reference OBB
                    # save_one_txt xywhr rows)
                    cx = min(max((float(row[0]) - padx) / rt, 0.0), ow)
                    cy = min(max((float(row[1]) - pady) / rt, 0.0), oh)
                    bw, bh = float(row[2]) / rt, float(row[3]) / rt
                    lines.append(f"{int(row[cls_c])} {cx / ow:.6f} {cy / oh:.6f} "
                                 f"{bw / ow:.6f} {bh / oh:.6f} {float(row[4]):.6f}"
                                 f"{conf_s}")
                else:
                    x1 = min(max((float(row[0]) - padx) / rt, 0.0), ow)
                    x2 = min(max((float(row[2]) - padx) / rt, 0.0), ow)
                    y1 = min(max((float(row[1]) - pady) / rt, 0.0), oh)
                    y2 = min(max((float(row[3]) - pady) / rt, 0.0), oh)
                    lines.append(f"{int(row[cls_c])} {(x1 + x2) / 2 / ow:.6f} "
                                 f"{(y1 + y2) / 2 / oh:.6f} {(x2 - x1) / ow:.6f} "
                                 f"{(y2 - y1) / oh:.6f}{conf_s}")
            (lbl_dir / f"{stem}.txt").write_text(
                "\n".join(lines) + ("\n" if lines else ""))

    def _plot_first_batch(self, batch, dets, n_eff, conf, rotated=False):
        """First-batch GT + prediction overlay mosaics (reference
        BaseValidator plot_val_samples/plot_predictions); shared by the base
        loop and OBBValidator's own loop."""
        try:
            from pathlib import Path as _P

            from sar_yolo_tpu.utils.plotting import plot_images, plot_predictions
            save_dir = _P(getattr(self.args, "save_dir", None) or ".")
            save_dir.mkdir(parents=True, exist_ok=True)
            nb = {k: np.asarray(v) for k, v in batch.items()
                  if k in ("img", "bboxes", "mask", "cls", "masks", "keypoints")}
            plot_images(nb, save_dir / "val_batch0_labels.jpg",
                        names=self.data.get("names"))
            plot_predictions(np.asarray(batch["img"]), list(dets[:n_eff]),
                             save_dir / "val_batch0_pred.jpg",
                             names=self.data.get("names"),
                             conf=max(conf, 0.25), rotated=rotated,
                             **({} if rotated else
                                self._plot_pred_extras(batch, dets, n_eff)))
        except Exception as e:  # noqa: BLE001 — plots never fail a val run
            LOGGER.warning(f"val batch plotting failed: {e}")

    def finalize_metrics(self) -> dict:
        return self.det_metrics.process()

    def print_results(self, results, n_img):
        if results:
            LOGGER.info("  ".join(f"{k.split('/')[-1]}={v:.4f}" for k, v in results.items()))
        # per-class table (reference detect/val.py print_results with args.verbose)
        pc = getattr(self.det_metrics, "per_class", None) if hasattr(self, "det_metrics") else None
        if pc is not None and getattr(self.args, "verbose", False) and len(pc["unique_classes"]) > 1:
            names = self.data.get("names") or {}
            LOGGER.info(f"{'class':>16} {'instances':>10} {'P':>8} {'R':>8} "
                        f"{'mAP50':>8} {'mAP50-95':>9}")
            for ci, c in enumerate(pc["unique_classes"]):
                LOGGER.info(f"{str(names.get(int(c), int(c))):>16} {pc['nt'][ci]:>10} "
                            f"{pc['p'][ci]:>8.3f} {pc['r'][ci]:>8.3f} "
                            f"{pc['ap'][ci, 0]:>8.3f} {pc['ap'][ci].mean():>9.3f}")


class DetectionValidator(BaseValidator):
    pass


class JDEValidator(BaseValidator):
    """Posture-state + ReID evaluation to full fork parity.

    Detections carry extras: [x1,y1,x2,y2,conf,cls, emb(E), state(S)].
    Covers the reference JDEValidator's whole metric set:
      * state accuracy + per-state P/R/F1 table (jde/val.py:244-330, :796),
      * state-DETECTION mAP second pass — argmax state treated as the class
        (jde/val.py:577-579),
      * ReID cosine AND euclidean pos/neg separation, silhouette,
        Davies-Bouldin (jde/val.py:524-526, utils/metrics.py:1314-1580),
      * consolidated results row appended across runs (jde/val.py:935 —
        CSV here instead of Excel; same capability).
    State ground truth = clamp(tag, 0, state_classes-1), matching the loss
    (utils/loss.py and ref loss.py:512) — NOT tag % sc.
    """

    def init_metrics(self):
        super().init_metrics()
        self.state_correct = 0
        self.state_total = 0
        self.embeds = []
        self.embed_tags = []
        sc = self.meta.get("state_classes") or 0
        self.state_confusion = np.zeros((sc, sc), np.int64) if sc else None
        # second pass: detection mAP with state as the class label
        self.state_det_metrics = DetMetrics(
            {i: f"state{i}" for i in range(sc)}) if sc else None

    @staticmethod
    def _state_gt(tags, sc):
        """Clamp person-id tags into the state label range (ref loss.py:512)."""
        return np.clip(tags.astype(int), 0, sc - 1)

    def _extra_update(self, d, gt_boxes, gt_cls, batch, bi):
        if "tags" not in batch:
            return
        embed_dim = self.meta["embed_dim"]
        sc = self.meta["state_classes"] or 0
        gt_mask = batch["mask"][bi] > 0
        gt_tags = batch["tags"][bi][gt_mask].astype(int)
        # --- state-detection mAP second pass (argmax state as the class) ---
        if sc and self.state_det_metrics is not None:
            ps = d[:, 6 + embed_dim:6 + embed_dim + sc].argmax(1) if len(d) \
                else np.zeros(0)
            gs = self._state_gt(gt_tags, sc).astype(np.float32)
            tp = match_predictions(d[:, :4], ps.astype(np.float32), gt_boxes, gs)
            self.state_det_metrics.update(tp, d[:, 4], ps.astype(np.float32), gs)
        if len(d) == 0 or len(gt_boxes) == 0:
            return
        iou = box_iou_np(gt_boxes, d[:, :4])
        # one-to-one gt<->pred assignment, greedy by IoU (>=0.5): each prediction
        # credits at most ONE gt, matching the reference's unique-assignment
        # match_predictions (jde/val.py:683) — the old per-gt argmax let a single
        # prediction inflate state/ReID stats in crowded scenes
        pairs = np.argwhere(iou >= 0.5)
        if len(pairs) == 0:
            return
        pairs = pairs[iou[pairs[:, 0], pairs[:, 1]].argsort()[::-1]]
        used_g = np.zeros(len(gt_boxes), bool)
        used_p = np.zeros(len(d), bool)
        for g, p in pairs:
            if used_g[g] or used_p[p]:
                continue
            used_g[g] = used_p[p] = True
            self.embeds.append(d[p, 6:6 + embed_dim])
            self.embed_tags.append(gt_tags[g])
            if sc:
                state_pred = int(d[p, 6 + embed_dim:6 + embed_dim + sc].argmax())
                state_gt = int(self._state_gt(gt_tags[g:g + 1], sc)[0])
                self.state_correct += int(state_pred == state_gt)
                self.state_total += 1
                self.state_confusion[state_pred, state_gt] += 1

    def finalize_metrics(self) -> dict:
        results = super().finalize_metrics()
        if self.state_total:
            results["metrics/state_acc"] = self.state_correct / self.state_total
            # per-state P/R/F1 + macro averages (fork StateMetrics, loss.py:562-800)
            cm = self.state_confusion
            tp = np.diag(cm).astype(np.float64)
            pred_n = cm.sum(1)
            gt_n = cm.sum(0)
            prec = np.where(pred_n > 0, tp / np.maximum(pred_n, 1), 0.0)
            rec = np.where(gt_n > 0, tp / np.maximum(gt_n, 1), 0.0)
            f1 = np.where(prec + rec > 0, 2 * prec * rec / np.maximum(prec + rec, 1e-9), 0.0)
            seen = gt_n > 0
            if seen.any():
                results["metrics/state_macro_precision"] = float(prec[seen].mean())
                results["metrics/state_macro_recall"] = float(rec[seen].mean())
                results["metrics/state_macro_f1"] = float(f1[seen].mean())
            self.state_table = {"precision": prec, "recall": rec, "f1": f1,
                                "support": gt_n}
        # state-detection mAP (ref jde/val.py:577-579 second ap_per_class pass)
        if self.state_det_metrics is not None:
            sd = self.state_det_metrics.process()
            for k in ("metrics/mAP50(B)", "metrics/mAP50-95(B)"):
                if k in sd:
                    results[k.replace("(B)", "(S)")] = sd[k]
        if len(self.embeds) >= 2:
            E = np.stack(self.embeds)
            En = E / (np.linalg.norm(E, axis=1, keepdims=True) + 1e-9)
            tags = np.asarray(self.embed_tags)
            sim = En @ En.T
            same = tags[:, None] == tags[None, :]
            off = ~np.eye(len(E), dtype=bool)
            pos, neg = sim[same & off], sim[~same]
            if len(pos) and len(neg):
                results["metrics/reid_pos_cos"] = float(pos.mean())
                results["metrics/reid_neg_cos"] = float(neg.mean())
                results["metrics/reid_separation"] = float(pos.mean() - neg.mean())
                # euclidean distances on the raw embeddings (ref jde/val.py:524-526)
                d2 = ((E[:, None, :] - E[None, :, :]) ** 2).sum(-1) ** 0.5
                results["metrics/reid_pos_euc"] = float(d2[same & off].mean())
                results["metrics/reid_neg_euc"] = float(d2[~same].mean())
            # clustering-quality stats (ref utils/metrics.py:1558-1580, sklearn)
            if len(np.unique(tags)) >= 2 and all(
                    (tags == t).sum() >= 1 for t in np.unique(tags)):
                try:
                    from sklearn.metrics import silhouette_score, davies_bouldin_score
                    if len(E) > len(np.unique(tags)):
                        results["metrics/reid_silhouette"] = float(
                            silhouette_score(En, tags, metric="cosine"))
                        results["metrics/reid_davies_bouldin"] = float(
                            davies_bouldin_score(En, tags))
                except Exception:
                    pass
        self._export_consolidated(results)
        return results

    def _export_consolidated(self, results):
        """Append one row per run to a cumulative CSV AND mirror the full
        table into jde_results.xlsx (ref jde/val.py:935 openpyxl workbook;
        dependency-free writer in utils/xlsx.py)."""
        import csv
        from datetime import datetime
        from pathlib import Path
        save_dir = Path(getattr(self.args, "save_dir", None) or ".")
        save_dir.mkdir(parents=True, exist_ok=True)
        path = save_dir / "jde_results.csv"
        row = {"timestamp": datetime.now().isoformat(timespec="seconds"),
               "model": str(getattr(self.args, "model", ""))}
        row.update({k.split("/")[-1]: f"{v:.5f}" for k, v in results.items()
                    if isinstance(v, float)})
        exists = path.exists()
        with path.open("a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if not exists:
                w.writeheader()
            w.writerow(row)
        try:  # Excel mirror of the cumulative table (never fails a val run)
            from sar_yolo_tpu.utils.xlsx import write_xlsx
            with path.open(newline="") as f:
                rows = list(csv.DictReader(f))
            write_xlsx(save_dir / "jde_results.xlsx", rows)
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"jde_results.xlsx export failed: {e}")

    def print_results(self, results, n_img):
        super().print_results(results, n_img)
        # per-state table (ref jde/val.py:796)
        table = getattr(self, "state_table", None)
        if table is not None:
            names = self.data.get("person_states") or {}
            LOGGER.info(f"{'State':>12} {'Support':>8} {'Prec':>7} {'Rec':>7} {'F1':>7}")
            for i in range(len(table["precision"])):
                name = names.get(i, f"state{i}") if isinstance(names, dict) else f"state{i}"
                LOGGER.info(f"{name:>12} {int(table['support'][i]):>8} "
                            f"{table['precision'][i]:>7.3f} {table['recall'][i]:>7.3f} "
                            f"{table['f1'][i]:>7.3f}")


def _oks_matrix(gt_kpts, gt_areas, pred_kpts, sigmas):
    """OKS between gt (G, K, 3) and pred (P, K, >=2) keypoint sets."""
    d = ((gt_kpts[:, None, :, 0] - pred_kpts[None, :, :, 0]) ** 2 +
         (gt_kpts[:, None, :, 1] - pred_kpts[None, :, :, 1]) ** 2)  # (G, P, K)
    vis = gt_kpts[:, None, :, 2] > 0
    e = d / (2 * sigmas[None, None, :]) ** 2 / (gt_areas[:, None, None] + 1e-9) / 2
    oks = (np.exp(-e) * vis).sum(-1) / np.maximum(vis.sum(-1), 1)
    return oks


class PoseValidator(BaseValidator):
    """Box mAP + pose mAP (OKS-matched across 0.5:0.95 thresholds).

    Capability parity: reference models/yolo/pose/val.py (OKS eval via kpt_iou).
    """

    def init_metrics(self):
        super().init_metrics()
        self.pose_metrics = DetMetrics(self.data.get("names"))
        K = self.meta.get("kpt_shape", (17, 3))[0]
        from sar_yolo_tpu.utils.loss import OKS_SIGMA
        self.sigmas = np.asarray(OKS_SIGMA) if K == 17 else np.ones(K) / K

    def _extra_update(self, d, gt_boxes, gt_cls, batch, bi):
        if "keypoints" not in batch:
            return
        K, kd = self.meta.get("kpt_shape", (17, 3))
        h, w = batch["img"].shape[1:3]
        gt_mask = batch["mask"][bi] > 0
        gt_kpts = batch["keypoints"][bi][gt_mask].copy()  # (G, K, 3) normalized
        gt_kpts[..., 0] *= w
        gt_kpts[..., 1] *= h
        gt_areas = ((gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])) * 0.53
        pred_kpts = d[:, 6:6 + K * kd].reshape(-1, K, kd)
        n_pred, n_thr = len(d), len(IOU_THRESHOLDS)
        tp = np.zeros((n_pred, n_thr), bool)
        if len(gt_kpts) and n_pred:
            oks = _oks_matrix(gt_kpts, gt_areas, pred_kpts, self.sigmas)
            for t, thr in enumerate(IOU_THRESHOLDS):
                gi, pi = np.nonzero(oks >= thr)
                order = oks[gi, pi].argsort()[::-1]
                seen_g, seen_p = set(), set()
                for g, p in zip(gi[order], pi[order]):
                    if g in seen_g or p in seen_p:
                        continue
                    seen_g.add(g)
                    seen_p.add(p)
                    tp[p, t] = True
        self.pose_metrics.update(tp, d[:, 4], d[:, 5], gt_cls)

    def _plot_pred_extras(self, batch, dets, n_eff):
        """Keypoint + skeleton overlays for the first-batch prediction mosaic
        (reference Annotator.kpts path)."""
        K, kd = self.meta.get("kpt_shape", (17, 3))
        kpts = [np.asarray(dets[bi])[:, 6:6 + K * kd].reshape(-1, K, kd)
                if len(dets[bi]) else None
                for bi in range(min(n_eff, len(dets)))]
        return {"kpts": kpts}

    def finalize_metrics(self):
        results = super().finalize_metrics()
        pose = self.pose_metrics.process()
        for k, v in pose.items():
            if k.startswith("metrics/"):
                results[k.replace("(B)", "(P)")] = v
        return results


class SegmentValidator(BaseValidator):
    """Box mAP + mask mAP via prototype mask IoU matching.

    Capability parity: reference models/yolo/segment/val.py.
    """

    def init_metrics(self):
        super().init_metrics()
        self.mask_metrics = DetMetrics(self.data.get("names"))

    def _extra_update(self, d, gt_boxes, gt_cls, batch, bi):
        if "masks" not in batch or self._protos is None or len(d) == 0:
            return
        from sar_yolo_tpu.ops.masks import process_mask
        import jax.numpy as jnp
        nm = self.meta.get("nm", 32)
        h, w = batch["img"].shape[1:3]
        coeffs = d[:, 6:6 + nm]
        pred_masks = np.asarray(process_mask(
            jnp.asarray(self._protos[bi]), jnp.asarray(coeffs),
            jnp.asarray(d[:, :4]), (h, w)))  # (n, mh, mw) bool
        gt_overlap = batch["masks"][bi]  # (mh', mw') instance ids
        mh, mw = pred_masks.shape[1:]
        if gt_overlap.shape != (mh, mw):
            import cv2
            gt_overlap = cv2.resize(gt_overlap, (mw, mh), interpolation=cv2.INTER_NEAREST)
        gt_mask_flags = batch["mask"][bi] > 0
        gt_ids = np.nonzero(gt_mask_flags)[0]
        gt_masks = np.stack([(gt_overlap == gi + 1) for gi in gt_ids]) \
            if len(gt_ids) else np.zeros((0, mh, mw), bool)
        n_pred, n_thr = len(d), len(IOU_THRESHOLDS)
        tp = np.zeros((n_pred, n_thr), bool)
        if len(gt_masks) and n_pred:
            inter = (gt_masks[:, None] & pred_masks[None]).sum((-1, -2)).astype(np.float64)
            union = (gt_masks[:, None] | pred_masks[None]).sum((-1, -2)) + 1e-9
            miou = inter / union
            correct_cls = gt_cls[:, None] == d[None, :, 5]
            miou = miou * correct_cls
            for t, thr in enumerate(IOU_THRESHOLDS):
                gi, pi = np.nonzero(miou >= thr)
                order = miou[gi, pi].argsort()[::-1]
                seen_g, seen_p = set(), set()
                for g, p in zip(gi[order], pi[order]):
                    if g in seen_g or p in seen_p:
                        continue
                    seen_g.add(g)
                    seen_p.add(p)
                    tp[p, t] = True
        self.mask_metrics.update(tp, d[:, 4], d[:, 5], gt_cls)

    def _plot_pred_extras(self, batch, dets, n_eff):
        """Instance-mask overlays for the first-batch prediction mosaic
        (reference plot_images masks path, utils/plotting.py:~450)."""
        if self._protos is None:
            return {}
        from sar_yolo_tpu.ops.masks import process_mask
        import jax.numpy as jnp
        nm = self.meta.get("nm", 32)
        h, w = np.asarray(batch["img"]).shape[1:3]
        masks = []
        for bi in range(min(n_eff, len(dets))):
            d = dets[bi]  # unfiltered: masks stay row-aligned with the mosaic
            if len(d) == 0:
                masks.append(None)
                continue
            masks.append(np.asarray(process_mask(
                jnp.asarray(self._protos[bi]), jnp.asarray(d[:, 6:6 + nm]),
                jnp.asarray(d[:, :4]), (h, w))))
        return {"masks": masks}

    def finalize_metrics(self):
        results = super().finalize_metrics()
        m = self.mask_metrics.process()
        for k, v in m.items():
            if k.startswith("metrics/"):
                results[k.replace("(B)", "(M)")] = v
        return results


class ClassificationValidator(BaseValidator):
    """Top-1 / top-5 accuracy (reference models/yolo/classify/val.py)."""

    def __call__(self, model=None, variables=None, meta=None, dataset=None, args=None,
                 data=None):
        self.args = args
        self.meta = meta
        self.data = data or {}

        @jax.jit
        def predict(variables, img):
            if img.dtype == jnp.uint8:
                img = img.astype(jnp.float32) / 255.0
            return model.apply(variables, img, train=False)

        loader = build_dataloader(dataset, batch_size=min(args.batch, len(dataset)),
                                  shuffle=False, workers=args.workers,
                                  drop_last=False, pad_last=True)
        top1 = top5 = n = 0
        t0 = time.time()
        for batch in loader:
            npad = int(batch.pop("_pad", 0))
            logits = np.asarray(predict(variables, jnp.asarray(batch["img"])))
            labels = batch["cls"].astype(int).reshape(-1)
            if npad:
                logits, labels = logits[:-npad], labels[:-npad]
            order = np.argsort(-logits, axis=1)
            top1 += int((order[:, 0] == labels).sum())
            top5 += int(sum(labels[i] in order[i, :5] for i in range(len(labels))))
            n += len(labels)
        results = {"metrics/accuracy_top1": top1 / max(n, 1),
                   "metrics/accuracy_top5": top5 / max(n, 1),
                   "fitness": top1 / max(n, 1)}
        if n:
            results["speed/ms_per_image"] = (time.time() - t0) / n * 1000
        self.print_results(results, n)
        return results


class OBBValidator(BaseValidator):
    """Rotated-box mAP via probiou matching (reference models/yolo/obb/val.py)."""

    def __call__(self, model=None, variables=None, meta=None, dataset=None, args=None,
                 data=None):
        self.args = args
        self.meta = meta
        self.data = data or {}
        nc = meta["nc"]
        conf = args.conf if args.conf is not None else 0.001
        strides = tuple(meta["strides"])
        from sar_yolo_tpu.ops.decode import decode_obb
        from sar_yolo_tpu.ops.nms import non_max_suppression_rotated
        from sar_yolo_tpu.ops.boxes import probiou as probiou_jnp

        @jax.jit
        def predict(variables, img):
            if img.dtype == jnp.uint8:
                img = img.astype(jnp.float32) / 255.0
            feats = model.apply(variables, img, train=False)
            preds = decode_obb(feats, strides, nc, meta["reg_max"])
            return non_max_suppression_rotated(preds, conf_thres=conf, iou_thres=args.iou,
                                               max_det=args.max_det, nc=nc)

        loader = build_dataloader(dataset, batch_size=min(args.batch, len(dataset)),
                                  shuffle=False, workers=args.workers,
                                  drop_last=False, pad_last=True)
        self.det_metrics = DetMetrics(self.data.get("names"))
        n_img = 0
        t0 = time.time()
        for batch in loader:
            npad = int(batch.pop("_pad", 0))
            img = jnp.asarray(batch["img"])
            dets = np.asarray(predict(variables, img))
            h, w = img.shape[1:3]
            if args.plots and n_img == 0:
                self._plot_first_batch(batch, dets, dets.shape[0] - npad, conf,
                                       rotated=True)
            self._save_txt_batch(batch, dets, dets.shape[0] - npad, n_img,
                                 rotated=True)
            for bi in range(dets.shape[0] - npad):
                d = dets[bi]
                d = d[d[:, 5] > 0]  # conf col 5 for rotated rows
                gt_mask = batch["mask"][bi] > 0
                gt_cls = batch["cls"][bi][gt_mask]
                gb = batch["bboxes"][bi][gt_mask]
                gt5 = np.concatenate([gb[:, :4] * np.array([w, h, w, h]), gb[:, 4:5]], 1) \
                    if len(gb) else np.zeros((0, 5), np.float32)
                n_pred = len(d)
                tp = np.zeros((n_pred, len(IOU_THRESHOLDS)), bool)
                if n_pred and len(gt5):
                    iou = np.asarray(probiou_jnp(
                        jnp.asarray(gt5)[:, None, :], jnp.asarray(d[:, :5])[None, :, :])).squeeze(-1)
                    iou = iou * (gt_cls[:, None] == d[None, :, 6])
                    for t, thr in enumerate(IOU_THRESHOLDS):
                        gi, pi = np.nonzero(iou >= thr)
                        order = iou[gi, pi].argsort()[::-1]
                        seen_g, seen_p = set(), set()
                        for g, p in zip(gi[order], pi[order]):
                            if g in seen_g or p in seen_p:
                                continue
                            seen_g.add(g)
                            seen_p.add(p)
                            tp[p, t] = True
                self.det_metrics.update(tp, d[:, 5], d[:, 6], gt_cls)
                n_img += 1
        results = self.det_metrics.process()
        if n_img:
            results["speed/ms_per_image"] = (time.time() - t0) / n_img * 1000
        self.print_results(results, n_img)
        return results


class RTDETRValidator(BaseValidator):
    """RT-DETR eval: last decoder layer, conf filter, no NMS (rtdetr/val.py parity)."""

    def __call__(self, model=None, variables=None, meta=None, dataset=None, args=None,
                 data=None):
        self.args = args
        self.meta = meta
        self.data = data or {}
        nc = meta["nc"]
        conf = args.conf if args.conf is not None else 0.001

        @jax.jit
        def predict(variables, img):
            if img.dtype == jnp.uint8:
                img = img.astype(jnp.float32) / 255.0
            dec_b, dec_s, _, _ = model.apply(variables, img, train=False)
            boxes = dec_b[-1]                     # (B, nq, 4) normalized cxcywh
            scores = jax.nn.sigmoid(dec_s[-1])    # (B, nq, nc)
            return boxes, scores

        loader = build_dataloader(dataset, batch_size=min(args.batch, len(dataset)),
                                  shuffle=False, workers=args.workers,
                                  drop_last=False, pad_last=True)
        self.init_metrics()
        n_img = 0
        t0 = time.time()
        for batch in loader:
            npad = int(batch.pop("_pad", 0))
            img = jnp.asarray(batch["img"])
            boxes, scores = (np.asarray(o) for o in predict(variables, img))
            h, w = img.shape[1:3]
            B = img.shape[0]
            batch_dets = []  # per-image rows for the shared save_txt helper
            for bi in range(B - npad):
                s = scores[bi]
                cls_conf = s.max(-1)
                keep = cls_conf >= conf
                b = boxes[bi][keep] * np.array([w, h, w, h])
                d = np.concatenate([
                    np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                              b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], 1),
                    cls_conf[keep, None], s[keep].argmax(-1)[:, None]], 1) \
                    if keep.any() else np.zeros((0, 6), np.float32)
                order = np.argsort(-d[:, 4])
                d = d[order][: args.max_det]
                batch_dets.append(d)
                gt_mask = batch["mask"][bi] > 0
                gt_cls = batch["cls"][bi][gt_mask]
                gb = batch["bboxes"][bi][gt_mask] * np.array([w, h, w, h])
                gt_boxes = np.stack([gb[:, 0] - gb[:, 2] / 2, gb[:, 1] - gb[:, 3] / 2,
                                     gb[:, 0] + gb[:, 2] / 2, gb[:, 1] + gb[:, 3] / 2], 1) \
                    if len(gb) else np.zeros((0, 4), np.float32)
                tp = match_predictions(d[:, :4], d[:, 5], gt_boxes, gt_cls)
                self.det_metrics.update(tp, d[:, 4], d[:, 5], gt_cls)
                n_img += 1
            self._save_txt_batch(batch, batch_dets, len(batch_dets),
                                 n_img - len(batch_dets))
            if args.plots and n_img - len(batch_dets) == 0:
                self._plot_first_batch(batch, batch_dets, len(batch_dets), conf)
        results = self.finalize_metrics()
        if n_img:
            results["speed/ms_per_image"] = (time.time() - t0) / n_img * 1000
        self.print_results(results, n_img)
        return results
