"""Hub training session: model registration, metric streaming, checkpoint upload.

Capability parity with reference hub/session.py (HUBTrainingSession:19 —
create/load model, rate-limited metric queue, retrying uploads, heartbeats).
TPU-native differences:

  * checkpoints here are orbax DIRECTORIES, not single .pt files — uploads
    zip the directory to one artifact on the fly;
  * the retrying queue is the shared smart_request (client.py) instead of a
    per-session re-implementation;
  * heartbeats run on one daemon thread with a stop event the trainer can
    join, so tests (and clean exits) are deterministic — the reference
    delegates this to hub_sdk and cannot stop it.
"""

from __future__ import annotations

import io
import json
import threading
import time
import zipfile
from pathlib import Path
from urllib.parse import parse_qs, urlparse

from sar_yolo_tpu.utils import LOGGER

from .client import PREFIX, Auth, hub_api_root, hub_web_root, smart_request

RATE_LIMITS = {"metrics": 3.0, "ckpt": 900.0, "heartbeat": 300.0}  # seconds


def zip_checkpoint(path) -> bytes:
    """Pack an orbax checkpoint directory (or any single file) into zip bytes.

    Returns bytes (held in RAM for the upload's lifetime) deliberately: the
    smart_request retry loop re-sends `files=` kwargs verbatim, and a consumed
    file object would silently upload an empty body on the second attempt —
    retry-safety over memory flatness for checkpoint-sized artifacts."""
    path = Path(path)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        if path.is_dir():
            for f in sorted(path.rglob("*")):
                if f.is_file():
                    zf.write(f, f.relative_to(path))
        else:
            zf.write(path, path.name)
    return buf.getvalue()


class HUBTrainingSession:
    """One training run's connection to a hub server.

    identifier forms accepted (reference session.py:146 _parse_identifier):
      * "<web_root>/models/<id>"            — existing hub model (api_key may
        ride the query string: ...?api_key=KEY)
      * a bare model id (no suffix, no '/')
      * a local "*.yaml" / "*.pt" name      — a new model to register
    """

    def __init__(self, identifier: str, api_key: str = ""):
        self.rate_limits = dict(RATE_LIMITS)
        self.timers: dict[str, float] = {}
        self.metrics_queue: dict[int, str] = {}
        self.metrics_upload_failed_queue: dict[int, str] = {}
        self._metrics_lock = threading.Lock()  # guards the two queues above
        self.model: dict = {}
        self.model_id = None
        self.model_url = None
        self.filename = None
        self.request_retries = 3    # per-upload transient-error retries
        self._hb_stop = threading.Event()
        self._hb_thread = None

        key_from_url, model_id, self.filename = self._parse_identifier(identifier)
        self.auth = Auth(api_key or key_from_url or "")
        if model_id:
            self.load_model(model_id)

    # -- lifecycle -----------------------------------------------------------

    @classmethod
    def create_session(cls, identifier, args: dict | None = None):
        """Returns an authenticated session or None (never raises into train)."""
        if not hub_api_root():
            return None  # hub not configured: training proceeds offline
        try:
            session = cls(str(identifier))
            if args and not session.model_id:
                session.create_model(args)
                if not session.model_id:
                    return None
            return session
        except Exception as e:  # any hub failure must not kill training
            LOGGER.warning(f"{PREFIX}session unavailable: {e}")
            return None

    @staticmethod
    def _parse_identifier(identifier: str):
        api_key = model_id = filename = None
        s = str(identifier)
        if s.endswith((".pt", ".yaml", ".yml")):
            filename = s
        elif "/models/" in s:
            parsed = urlparse(s)
            model_id = Path(parsed.path).stem
            api_key = parse_qs(parsed.query).get("api_key", [None])[0]
        elif s and "/" not in s:
            model_id = s
        else:
            raise ValueError(
                f"invalid hub model identifier '{identifier}'; expected a "
                f"model URL ({hub_web_root()}/models/ID), a model id, or a "
                "local yaml/checkpoint name")
        return api_key, model_id, filename

    def _url(self, path: str) -> str:
        return f"{hub_api_root()}{path}"

    def load_model(self, model_id: str):
        r = smart_request("get", self._url(f"/v1/models/{model_id}"),
                          headers=self.auth.header(), thread=False)
        if r is None or r.status_code >= 300:
            raise ValueError(f"hub model '{model_id}' does not exist or is "
                             "not accessible")
        self.model = r.json().get("data", {})
        self.model_id = model_id
        self.model_url = f"{hub_web_root()}/models/{model_id}"
        self.start_heartbeat()
        LOGGER.info(f"{PREFIX}loaded model {self.model_url}")

    def create_model(self, train_args: dict):
        payload = {
            "config": {
                "batchSize": train_args.get("batch", -1),
                "epochs": train_args.get("epochs", 100),
                "imageSize": train_args.get("imgsz", 640),
                "patience": train_args.get("patience", 100),
                "device": "tpu",
                "cache": str(train_args.get("cache", False)),
            },
            "dataset": {"name": str(train_args.get("data", ""))},
            "lineage": {"architecture":
                        {"name": Path(self.filename or "model.yaml").stem}},
            "meta": {"name": self.filename},
        }
        r = smart_request("post", self._url("/v1/models"), json=payload,
                          headers=self.auth.header(), thread=False)
        if r is None or r.status_code >= 300:
            LOGGER.warning(f"{PREFIX}model registration failed")
            return
        self.model = r.json().get("data", {})
        self.model_id = self.model.get("id")
        if self.model_id:
            self.model_url = f"{hub_web_root()}/models/{self.model_id}"
            self.start_heartbeat()
            LOGGER.info(f"{PREFIX}registered model {self.model_url}")

    # -- rate limiting -------------------------------------------------------

    def rate_limited(self, kind: str) -> bool:
        """True if a `kind` upload would exceed its rate limit right now."""
        last = self.timers.get(kind)
        return last is not None and (time.time() - last) < self.rate_limits[kind]

    def _mark(self, kind: str):
        self.timers[kind] = time.time()

    # -- uploads -------------------------------------------------------------

    def upload_metrics(self, thread: bool = True):
        """Flush the queued {epoch: metrics-json} dict (plus any previously
        failed epochs) to the hub. Clears the queue optimistically; a failed
        synchronous upload re-queues into metrics_upload_failed_queue."""
        if not self.model_id or not (self.metrics_queue or
                                     self.metrics_upload_failed_queue):
            return None
        with self._metrics_lock:  # a slow threaded send() may requeue concurrently
            batch = {**self.metrics_upload_failed_queue, **self.metrics_queue}
            self.metrics_queue = {}
            self.metrics_upload_failed_queue = {}
        self._mark("metrics")

        def send():
            r = smart_request("post", self._url(f"/v1/models/{self.model_id}/metrics"),
                              json={"metrics": batch}, headers=self.auth.header(),
                              retry=self.request_retries, thread=False)
            if r is None or r.status_code >= 300:
                with self._metrics_lock:
                    # setdefault: an epoch already requeued by a newer flush
                    # wins over this (older) batch's copy
                    for k, v in batch.items():
                        self.metrics_upload_failed_queue.setdefault(k, v)
            return r

        if thread:
            threading.Thread(target=send, daemon=True).start()
            return None
        return send()

    def upload_model(self, epoch: int, weights, is_best: bool = False,
                     map: float = 0.0, final: bool = False, thread: bool = True):
        """Upload a checkpoint (orbax dir or file) as one zip artifact."""
        weights = Path(weights)
        if not weights.exists():
            LOGGER.warning(f"{PREFIX}checkpoint {weights} missing, skipping upload")
            return None
        data = {"epoch": epoch, "isBest": bool(is_best), "map": float(map),
                "isFinal": bool(final)}
        blob = zip_checkpoint(weights)
        self._mark("ckpt")

        def send():
            return smart_request(
                "post", self._url(f"/v1/models/{self.model_id}/upload"),
                data={"payload": json.dumps(data)},
                files={"file": (f"{weights.name}.zip", blob)},
                headers=self.auth.header(), retry=5 if final else 3,
                timeout=3600 if final else 60, thread=False)

        if thread and not final:
            threading.Thread(target=send, daemon=True).start()
            return None
        return send()

    # -- heartbeat -----------------------------------------------------------

    def start_heartbeat(self, interval: float | None = None):
        if self._hb_thread is not None:
            return
        interval = interval or self.rate_limits["heartbeat"]

        def beat():
            while not self._hb_stop.wait(interval):
                smart_request("post", self._url(f"/v1/agent/{self.model_id}/heartbeat"),
                              headers=self.auth.header(), retry=0,
                              verbose=False, thread=False)

        self._hb_thread = threading.Thread(target=beat, daemon=True)
        self._hb_thread.start()

    def stop(self):
        """Stop the heartbeat thread (idempotent; used on train end + tests)."""
        self._hb_stop.set()
        if self._hb_thread is not None:
            self._hb_thread.join(timeout=5)
            self._hb_thread = None
