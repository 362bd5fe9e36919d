"""Model-hub integration: login, model registry, dataset checks, exports.

Capability parity with reference hub/__init__.py (login:26, logout:70,
reset_model:85, export_fmts_hub:94, export_model:101, get_export:111,
check_dataset:123). Offline-first: every function is a no-op-with-a-clear-error
until the user points `SARYOLO_HUB_API` at a hub server, so the zero-egress
default build never makes network calls.
"""

from __future__ import annotations

from pathlib import Path

from sar_yolo_tpu.utils import LOGGER
from sar_yolo_tpu.utils.settings import update_settings

from .client import PREFIX, Auth, events, hub_api_root, hub_web_root, smart_request
from .session import HUBTrainingSession

__all__ = ("login", "logout", "reset_model", "export_fmts_hub", "export_model",
           "get_export", "check_dataset", "HUBTrainingSession", "Auth", "events")


def _require_endpoint():
    if not hub_api_root():
        raise ConnectionError(
            f"{PREFIX}no hub endpoint configured. Set SARYOLO_HUB_API to your "
            "hub server URL (this offline-first build has no default endpoint).")


def login(api_key: str | None = None, save: bool = True) -> bool:
    """Validate an API key against the configured hub; persist it on success."""
    _require_endpoint()
    auth = Auth(api_key or "", verbose=True)
    if auth.authenticated and save:
        auth.save()
    return auth.authenticated


def logout():
    """Drop the persisted API key (≙ reference hub.logout)."""
    update_settings(api_key="")
    LOGGER.info(f"{PREFIX}logged out (key removed from settings)")


def reset_model(model_id: str = ""):
    """Reset a hub model to the untrained state."""
    _require_endpoint()
    r = smart_request("post", f"{hub_api_root()}/v1/models/{model_id}/reset",
                      headers=Auth().header(), thread=False)
    ok = r is not None and r.status_code < 300
    LOGGER.info(f"{PREFIX}model reset" if ok else f"{PREFIX}model reset failed")
    return ok


def export_fmts_hub() -> list:
    """Export formats a hub can request from this framework."""
    from sar_yolo_tpu.engine.exporter import EXPORT_FORMATS

    return list(EXPORT_FORMATS)


def export_model(model_id: str = "", format: str = "stablehlo"):
    """Ask the hub to export a trained model server-side."""
    if format not in export_fmts_hub():
        raise ValueError(f"unsupported export format '{format}'; "
                         f"valid: {export_fmts_hub()}")
    _require_endpoint()
    r = smart_request("post", f"{hub_api_root()}/v1/models/{model_id}/export",
                      json={"format": format}, headers=Auth().header(),
                      thread=False)
    if r is None or r.status_code >= 300:
        raise ConnectionError(f"{PREFIX}export request failed")
    LOGGER.info(f"{PREFIX}{format} export started")
    return r.json()


def get_export(model_id: str = "", format: str = "stablehlo") -> dict:
    """Fetch the download descriptor for a completed hub export."""
    if format not in export_fmts_hub():
        raise ValueError(f"unsupported export format '{format}'; "
                         f"valid: {export_fmts_hub()}")
    _require_endpoint()
    r = smart_request("get", f"{hub_api_root()}/v1/models/{model_id}/export",
                      params={"format": format}, headers=Auth().header(),
                      thread=False)
    if r is None or r.status_code >= 300:
        raise ConnectionError(f"{PREFIX}get_export failed")
    return r.json()


def check_dataset(path: str, task: str = "detect") -> dict:
    """Error-check a dataset (yaml or zip with a yaml inside) before upload.

    Loads the dataset definition through the framework's own verifier
    (data/dataset.py check_det_dataset), counts per-split images, and returns
    the stats dict a hub needs to register the dataset. ≙ reference
    hub.check_dataset -> HUBDatasetStats.get_json.
    """
    from sar_yolo_tpu.data.dataset import IMG_FORMATS, check_det_dataset

    path = Path(path)
    root = path
    if path.suffix == ".zip":
        import zipfile

        root = path.with_suffix("")
        with zipfile.ZipFile(path) as zf:
            zf.extractall(root)
        yamls = list(root.rglob("*.yaml")) + list(root.rglob("*.yml"))
        if not yamls:
            raise FileNotFoundError(f"no data yaml found inside {path}")
        yaml_path = yamls[0]
    elif path.suffix in {".yaml", ".yml"}:
        yaml_path = path
    else:
        raise ValueError(f"expected a .zip or .yaml dataset, got '{path}'")

    data = check_det_dataset(str(yaml_path))
    stats = {"task": task, "nc": int(data.get("nc", len(data.get("names", {})))),
             "names": {int(k): str(v) for k, v in dict(data.get("names", {})).items()},
             "splits": {}}
    for split in ("train", "val", "test"):
        src = data.get(split)
        if not src:
            continue
        p = Path(src)
        n = sum(1 for f in p.rglob("*") if f.suffix[1:].lower() in IMG_FORMATS) \
            if p.is_dir() else sum(1 for _ in open(p)) if p.is_file() else 0
        stats["splits"][split] = {"images": n}
    if not stats["splits"]:
        raise ValueError(f"dataset '{yaml_path}' defines no train/val/test split")
    LOGGER.info(f"{PREFIX}dataset checks passed: {stats['splits']}")
    return stats
