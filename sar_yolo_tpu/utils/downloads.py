"""Model-asset registry + download shim (capability parity with reference
utils/downloads.py: GITHUB_ASSETS_NAMES, attempt_download_asset, safe_download).

This deployment targets zero-egress TPU pods, so downloads are OPT-IN
(SARYOLO_ALLOW_DOWNLOADS=1); by default the resolver only searches local paths
(cwd, SETTINGS weights_dir) and otherwise raises with the canonical URL so the
operator can pre-stage the file.
"""

from __future__ import annotations

import os
from pathlib import Path

from sar_yolo_tpu.utils import LOGGER
from sar_yolo_tpu.utils.errors import ModelNotFoundError
from sar_yolo_tpu.utils.settings import SETTINGS

GITHUB_ASSETS_REPO = "ultralytics/assets"
GITHUB_ASSETS_TAG = "v8.3.0"
# released .pt weights the reference can name-resolve (fed to torch_convert.py
# to produce our orbax checkpoints); mirrors reference GITHUB_ASSETS_NAMES
GITHUB_ASSETS_NAMES = frozenset(
    [f"yolov8{s}{t}.pt" for s in "nsmlx" for t in ("", "-cls", "-seg", "-pose", "-obb")]
    + [f"yolo11{s}{t}.pt" for s in "nsmlx" for t in ("", "-cls", "-seg", "-pose", "-obb")]
    + [f"yolov12{s}.pt" for s in "nsmlx"]
    + [f"yolov5{s}u.pt" for s in "nsmlx"]
    + [f"yolov3{t}u.pt" for t in ("", "-tiny", "-spp")]
    + [f"yolov9{s}.pt" for s in "tsmce"]
    + [f"yolov10{s}.pt" for s in "nsmblx"]
    + [f"yolo_nas_{s}.pt" for s in "sml"]
    + [f"sam_{s}.pt" for s in "bl"] + [f"sam2_{s}.pt" for s in ("t", "s", "b", "l")]
    + ["FastSAM-s.pt", "FastSAM-x.pt", "mobile_sam.pt"]
    + [f"rtdetr-{s}.pt" for s in "lx"])


def asset_url(name: str) -> str:
    return f"https://github.com/{GITHUB_ASSETS_REPO}/releases/download/{GITHUB_ASSETS_TAG}/{name}"


def safe_download(url: str, file: Path, retry: int = 3) -> Path:
    """Download url -> file with retries (requires SARYOLO_ALLOW_DOWNLOADS=1)."""
    if os.environ.get("SARYOLO_ALLOW_DOWNLOADS") != "1":
        raise ModelNotFoundError(
            file.name, f"Downloads are disabled on this host (zero-egress). "
            f"Pre-stage the file from {url} into {file.parent} or set "
            f"SARYOLO_ALLOW_DOWNLOADS=1.")
    import urllib.request
    file.parent.mkdir(parents=True, exist_ok=True)
    last_err = None
    for i in range(retry):
        try:
            LOGGER.info(f"downloading {url} -> {file}")
            urllib.request.urlretrieve(url, file)
            return file
        except OSError as e:
            last_err = e
            LOGGER.warning(f"download attempt {i + 1}/{retry} failed: {e}")
    raise ModelNotFoundError(file.name, f"download failed after {retry} tries: {last_err}")


def attempt_download_asset(name: str | Path) -> str:
    """Resolve a weight-file name to a local path (reference downloads.py:454).

    Search order: the path as given, then SETTINGS['weights_dir']; finally the
    GitHub release URL via safe_download (opt-in, see module docstring).
    """
    p = Path(str(name).strip().replace("'", ""))
    if p.exists():
        return str(p)
    wdir = Path(SETTINGS.get("weights_dir", "weights"))
    if (wdir / p.name).exists():
        return str(wdir / p.name)
    if p.name in GITHUB_ASSETS_NAMES:
        return str(safe_download(asset_url(p.name), wdir / p.name))
    raise ModelNotFoundError(name, f"(not a known release asset; known: "
                                   f"{len(GITHUB_ASSETS_NAMES)} names like yolov8n.pt)")
