"""Benchmark harness: format x {size, mAP, latency, FPS} table.

Capability parity with reference utils/benchmarks.py (benchmark:50, table :164):
every exported format is reloaded through AutoBackend and gets REAL predict
latency and a REAL mAP50-95 evaluated on the same dataset as the native path —
not just a file size.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from sar_yolo_tpu.utils import LOGGER


def _dataset_for(model, data, imgsz):
    from sar_yolo_tpu.data import SyntheticDataset
    if data in (None, "synthetic"):
        return SyntheticDataset(n=8, imgsz=imgsz, nc=min(model.meta["nc"], 3),
                                max_labels=16, seed=1)
    from sar_yolo_tpu.data import YOLODataset, check_det_dataset
    info = check_det_dataset(data)
    return YOLODataset(info.get("val") or info["train"], imgsz=imgsz, augment=False,
                       max_labels=64)


def _map_over_dataset(predict_fn, dataset, imgsz):
    """mAP50-95 of a predict callable over a padded-label dataset."""
    from sar_yolo_tpu.utils.metrics import DetMetrics, match_predictions
    dm = DetMetrics()
    for i in range(len(dataset)):
        s = dataset[i]
        img = np.ascontiguousarray(s["img"][..., ::-1])  # RGB -> BGR frame
        res = predict_fn(img)
        d = res[0].boxes.data[:, :6] if res[0].boxes is not None else np.zeros((0, 6))
        gm = s["mask"] > 0
        h, w = img.shape[:2]
        gb = s["bboxes"][gm] * np.array([w, h, w, h])
        gt = np.stack([gb[:, 0] - gb[:, 2] / 2, gb[:, 1] - gb[:, 3] / 2,
                       gb[:, 0] + gb[:, 2] / 2, gb[:, 1] + gb[:, 3] / 2], 1) \
            if len(gb) else np.zeros((0, 4), np.float32)
        gc = s["cls"][gm]
        tp = match_predictions(d[:, :4], d[:, 5], gt, gc)
        dm.update(tp, d[:, 4], d[:, 5], gc)
    r = dm.process()
    return r.get("metrics/mAP50-95(B)")


def _size_mb(path):
    p = Path(path)
    if p.is_file():
        return p.stat().st_size / 1e6
    if p.is_dir():
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file()) / 1e6
    return None


def benchmark(model, imgsz: int = 640, data: str | None = None, n_iter: int = 10,
              formats=("stablehlo", "saved_model", "tflite"), verbose: bool = True,
              half: bool = False, int8: bool = False, device=None):
    """Export to every format, reload, and measure latency + mAP per format.

    Mirrors reference benchmark() (utils/benchmarks.py:50-178): rows
    [format, size_mb, mAP50-95, ms_per_image, fps]; a failing format degrades
    to an error row instead of aborting the table.
    """
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (imgsz, imgsz, 3), dtype=np.uint8)
    dataset = _dataset_for(model, data, imgsz)
    rows = []

    def time_predict(m):
        m.predict(img, imgsz=imgsz)  # warm/compile
        t0 = time.perf_counter()
        for _ in range(n_iter):
            m.predict(img, imgsz=imgsz)
        return (time.perf_counter() - t0) / n_iter

    # native jax path
    dt = time_predict(model)
    rows.append({"format": "jax", "size_mb": None, "ms_per_image": dt * 1e3,
                 "fps": 1.0 / dt,
                 "mAP50-95": _map_over_dataset(
                     lambda im: model.predict(im, imgsz=imgsz, conf=0.01), dataset, imgsz)})

    for fmt in formats:
        try:
            from sar_yolo_tpu import YOLO
            path = model.export(format=fmt, imgsz=imgsz)
            m2 = YOLO(path)
            dt = time_predict(m2)
            rows.append({"format": fmt, "size_mb": _size_mb(path),
                         "ms_per_image": dt * 1e3, "fps": 1.0 / dt,
                         "mAP50-95": _map_over_dataset(
                             lambda im: m2.predict(im, conf=0.01), dataset, imgsz)})
        except Exception as e:  # noqa: BLE001 — benchmark rows degrade gracefully
            rows.append({"format": fmt, "error": str(e)[:120]})

    if verbose:
        LOGGER.info(f"{'Format':<12} {'Size(MB)':>9} {'mAP50-95':>9} "
                    f"{'ms/im':>8} {'FPS':>8}")
        for r in rows:
            if "error" in r:
                LOGGER.info(f"{r['format']:<12} ERROR: {r['error']}")
            else:
                LOGGER.info(
                    f"{r['format']:<12} "
                    f"{(f'{r['size_mb']:.1f}' if r['size_mb'] else '-'):>9} "
                    f"{(f'{r['mAP50-95']:.3f}' if r['mAP50-95'] is not None else '-'):>9} "
                    f"{r['ms_per_image']:>8.1f} {r['fps']:>8.1f}")
    return rows


class ProfileModels:
    """Latency/FLOPs sweep over a list of models (reference ProfileModels,
    utils/benchmarks.py:315).

    The reference profiles ONNX + TensorRT engines; here every model runs as
    one deploy-fused (Conv+BN folded, optionally bf16) jitted XLA executable on
    the current JAX backend — the TPU serving path. Per-model output: params and
    GFLOPs from the compiled executable's cost analysis, and mean±std latency
    from adaptive-count timed runs with the reference's iterative sigma
    clipping (utils/benchmarks.py:449).
    """

    def __init__(self, paths, num_timed_runs: int = 100, num_warmup_runs: int = 10,
                 min_time: float = 10.0, imgsz: int = 640, half: bool = True,
                 batch: int = 1, device=None):
        self.paths = [paths] if isinstance(paths, (str, Path)) else list(paths)
        self.num_timed_runs = num_timed_runs
        self.num_warmup_runs = num_warmup_runs
        self.min_time = min_time
        self.imgsz = imgsz
        self.half = half
        self.batch = batch
        self.device = device

    def get_files(self):
        """Expand dirs/globs into model yamls + exported/ckpt dirs (reference
        get_files, utils/benchmarks.py:427)."""
        import glob
        files = []
        for p in self.paths:
            p = Path(p)
            if p.is_dir() and (p / "metadata.json").exists():
                files.append(p)  # checkpoint / exported artifact dir
            elif p.is_dir():
                files.extend(sorted(p.glob("*.yaml")))
                files.extend(d for d in sorted(p.iterdir())
                             if (d / "metadata.json").exists())
            elif p.suffix in {".yaml", ".yml"} or p.exists():
                files.append(p)
            else:
                files.extend(Path(f) for f in sorted(glob.glob(str(p))))
        LOGGER.info(f"Profiling: {[str(f) for f in files]}")
        return files

    @staticmethod
    def iterative_sigma_clipping(data, sigma: float = 2.0, max_iters: int = 3):
        """Outlier-robust latency stats (reference utils/benchmarks.py:449)."""
        data = np.asarray(data, np.float64)
        for _ in range(max_iters):
            mean, std = data.mean(), data.std()
            keep = data[(data > mean - sigma * std) & (data < mean + sigma * std)]
            if len(keep) == len(data) or len(keep) == 0:
                break
            data = keep
        return data

    def _profile_jax_model(self, model):
        """(mean_ms, std_ms, params, gflops) of the deploy-fused jitted forward."""
        import dataclasses
        import time

        import jax
        import jax.numpy as jnp

        from sar_yolo_tpu.nn.fuse import fuse

        model._ensure_variables(self.imgsz)
        net, variables = fuse(model.model, model.variables)
        if self.half:
            net = dataclasses.replace(net, dtype=jnp.bfloat16)
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                variables)
        x = jnp.zeros((self.batch, self.imgsz, self.imgsz, 3),
                      jnp.bfloat16 if self.half else jnp.float32)
        fn = jax.jit(lambda v, xx: net.apply(v, xx, train=False))
        compiled = fn.lower(variables, x).compile()
        cost = compiled.cost_analysis() or {}
        params = int(sum(np.prod(p.shape) for p in jax.tree.leaves(model.variables["params"])))
        gflops = cost.get("flops", 0.0) / 1e9

        def run_once():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(variables, x))
            return (time.perf_counter() - t0) * 1e3

        elapsed = sum(run_once() for _ in range(max(self.num_warmup_runs, 1))) / 1e3
        per_run = elapsed / max(self.num_warmup_runs, 1)
        num_runs = max(int(round(self.min_time / max(per_run, 1e-6))), self.num_timed_runs)
        times = self.iterative_sigma_clipping([run_once() for _ in range(num_runs)])
        return float(times.mean()), float(times.std()), params, gflops

    def generate_table_row(self, name, t, params, gflops):
        return (f"| {name:18s} | {self.imgsz} | {t[0]:.2f}±{t[1]:.2f} ms | "
                f"{params / 1e6:.1f} | {gflops:.1f} |")

    @staticmethod
    def generate_results_dict(name, t, params, gflops):
        return {"model/name": name, "model/parameters": params,
                "model/GFLOPs": round(gflops, 3),
                "model/speed_JAX(ms)": round(t[0], 3),
                "model/speed_JAX_std(ms)": round(t[1], 3)}

    def profile(self):
        """Profile every model; print the markdown table; return result dicts."""
        from sar_yolo_tpu import YOLO
        rows, output = [], []
        for f in self.get_files():
            try:
                model = YOLO(str(f))
                mean, std, params, gflops = self._profile_jax_model(model)
            except Exception as e:  # noqa: BLE001 — one bad model must not kill the sweep
                LOGGER.warning(f"ProfileModels: {f} failed: {e}")
                continue
            rows.append(self.generate_table_row(Path(f).stem, (mean, std), params, gflops))
            output.append(self.generate_results_dict(Path(f).stem, (mean, std), params, gflops))
        if rows:
            import jax
            dev = self.device or jax.devices()[0].platform
            LOGGER.info(f"\n| Model | size<br><sup>(pixels) | Speed<br><sup>{dev} "
                        f"(ms) | params<br><sup>(M) | FLOPs<br><sup>(B) |\n"
                        f"|-------|-------|-------|-------|-------|")
            for r in rows:
                LOGGER.info(r)
        return output


class RF100Benchmark:
    """Multi-dataset benchmark harness (reference RF100Benchmark,
    utils/benchmarks.py:180).

    The reference pulls the Roboflow-100 suite via the `roboflow` SDK; that
    download path is import-gated here (zero-egress image). The working core —
    fix_yaml path normalization, per-dataset evaluation, and the aggregated
    eval log — runs on any local list of dataset yamls.
    """

    def __init__(self):
        self.ds_names: list[str] = []
        self.ds_cfg_list: list[Path] = []
        self.rf = None
        self.val_metrics = ["class", "images", "targets", "precision", "recall",
                            "map50", "map95"]

    def set_key(self, api_key: str):
        """Authenticate the Roboflow SDK (import-gated; reference :191)."""
        from sar_yolo_tpu.utils.checks import check_requirements
        check_requirements("roboflow")
        from roboflow import Roboflow
        self.rf = Roboflow(api_key=api_key)

    def parse_dataset(self, ds_link_txt: str = "datasets_links.txt"):
        """Download the linked datasets via Roboflow (reference :208). Each line:
        https://universe.roboflow.com/<workspace>/<project>/<version>."""
        import re
        if self.rf is None:
            raise RuntimeError("call set_key(api_key) first (requires the roboflow package)")
        out = Path("rf-100")
        out.mkdir(exist_ok=True)
        for line in Path(ds_link_txt).read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                _, url, workspace, project, version = re.split("/+", line)
            except ValueError:
                continue
            self.ds_names.append(project)
            proj_version = out / f"{project}-{version}"
            if not proj_version.exists():
                self.rf.workspace(workspace).project(project).version(version) \
                    .download("yolov8", location=str(proj_version))
            self.ds_cfg_list.append(proj_version / "data.yaml")
        return self.ds_names, self.ds_cfg_list

    def add_local_datasets(self, yaml_paths):
        """Zero-egress path: register already-downloaded dataset yamls."""
        for p in yaml_paths:
            p = Path(p)
            self.ds_names.append(p.parent.name or p.stem)
            self.ds_cfg_list.append(p)
        return self.ds_names, self.ds_cfg_list

    @staticmethod
    def fix_yaml(path):
        """Normalize train/val paths inside a downloaded data.yaml (reference :241)."""
        import yaml
        p = Path(path)
        d = yaml.safe_load(p.read_text())
        d["train"] = "train/images"
        d["val"] = "valid/images"
        p.write_text(yaml.safe_dump(d))

    def evaluate(self, yaml_path, model, eval_log_file, list_ind: int,
                 imgsz: int = 640, **val_kwargs):
        """Validate `model` on one dataset and append `name: mAP50` to the eval
        log (reference :259 — which scrapes console logs; we read the metrics
        dict directly)."""
        metrics = model.val(data=str(yaml_path), imgsz=imgsz, **val_kwargs)
        map50 = float(metrics.get("metrics/mAP50(B)", 0.0))
        with open(eval_log_file, "a") as f:
            f.write(f"{self.ds_names[list_ind]}: {map50}\n")
        return map50

    def benchmark(self, model, eval_log_file="rf100_eval.txt", imgsz: int = 640,
                  **val_kwargs):
        """Run evaluate() over every registered dataset; returns {name: mAP50}."""
        results = {}
        for i, cfg in enumerate(self.ds_cfg_list):
            try:
                results[self.ds_names[i]] = self.evaluate(
                    cfg, model, eval_log_file, i, imgsz=imgsz, **val_kwargs)
            except Exception as e:  # noqa: BLE001 — keep sweeping remaining datasets
                LOGGER.warning(f"RF100Benchmark: {cfg} failed: {e}")
                results[self.ds_names[i]] = None
        return results
