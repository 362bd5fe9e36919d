"""Hub integration tests against a local in-process HTTP server.

Covers the subsystem the reference implements in hub/{__init__,auth,session,
utils}.py: key auth, model registration, the rate-limited retrying metric
queue, checkpoint upload (orbax dir -> zip artifact), heartbeats, and the
trainer callbacks — all offline (127.0.0.1 only; no external endpoints exist
in this build by design).
"""

from __future__ import annotations

import io
import json
import threading
import time
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence request logging
        pass

    def _reply(self, code: int, body: dict | None = None):
        data = json.dumps(body or {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _record(self):
        n = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(n) if n else b""
        self.server.log.append(
            {"method": self.command, "path": self.path, "body": body,
             "key": self.headers.get("x-api-key")})
        return body

    def do_GET(self):
        self._record()
        if self.path.startswith("/v1/models/"):
            mid = self.path.split("/")[3]
            if mid in self.server.models:
                return self._reply(200, {"data": self.server.models[mid]})
            return self._reply(404, {"message": "no such model"})
        self._reply(404)

    def do_POST(self):
        body = self._record()
        fails = self.server.fail_next
        if fails:
            self.server.fail_next = fails - 1
            return self._reply(500, {"message": "transient"})
        if self.path == "/v1/auth":
            key = self.headers.get("x-api-key")
            ok = key in self.server.valid_keys
            return self._reply(200 if ok else 401, {"success": ok})
        if self.path == "/v1/models":
            mid = f"m{len(self.server.models)}"
            self.server.models[mid] = {"id": mid,
                                       **json.loads(body or b"{}")}
            return self._reply(200, {"data": self.server.models[mid]})
        if self.path.endswith("/metrics"):
            self.server.metrics.append(json.loads(body))
            return self._reply(200, {"success": True})
        if self.path.endswith("/upload"):
            self.server.uploads.append(body)
            return self._reply(200, {"success": True})
        if "/agent/" in self.path:
            self.server.heartbeats.append(self.path)
            return self._reply(200, {"success": True})
        if self.path.endswith("/reset") or self.path.endswith("/export"):
            return self._reply(200, {"success": True})
        self._reply(404)


@pytest.fixture()
def hub_server(monkeypatch, tmp_path):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.log, srv.models, srv.metrics = [], {}, []
    srv.uploads, srv.heartbeats = [], []
    srv.valid_keys = {"goodkey"}
    srv.fail_next = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_port}"
    monkeypatch.setenv("SARYOLO_HUB_API", url)
    # keep persisted settings out of the real user config
    from sar_yolo_tpu.utils import settings as S
    monkeypatch.setattr(S, "SETTINGS_FILE", tmp_path / "settings.json")
    monkeypatch.setitem(S.SETTINGS, "api_key", "")
    yield srv
    srv.shutdown()
    srv.server_close()


def test_login_logout_roundtrip(hub_server):
    from sar_yolo_tpu import hub
    from sar_yolo_tpu.utils.settings import SETTINGS

    assert hub.login("goodkey") is True
    assert SETTINGS["api_key"] == "goodkey"
    assert hub.login("badkey") is False        # rejected key is not persisted
    assert SETTINGS["api_key"] == "goodkey"
    hub.logout()
    assert SETTINGS["api_key"] == ""


def test_smart_request_retries_transient_500(hub_server):
    from sar_yolo_tpu.hub.client import smart_request

    hub_server.fail_next = 2  # two 500s, then success
    r = smart_request("post", f"http://127.0.0.1:{hub_server.server_port}/v1/auth",
                      headers={"x-api-key": "goodkey"}, retry=3, timeout=30)
    assert r is not None and r.status_code == 200
    assert len([e for e in hub_server.log if e["path"] == "/v1/auth"]) == 3


def test_smart_request_does_not_retry_client_error(hub_server):
    from sar_yolo_tpu.hub.client import smart_request

    r = smart_request("post", f"http://127.0.0.1:{hub_server.server_port}/v1/auth",
                      headers={"x-api-key": "badkey"}, retry=3, timeout=30)
    assert r.status_code == 401
    assert len([e for e in hub_server.log if e["path"] == "/v1/auth"]) == 1


def test_session_create_model_and_metrics_queue(hub_server):
    from sar_yolo_tpu.hub import HUBTrainingSession

    s = HUBTrainingSession.create_session(
        "tinydet.yaml", {"batch": 4, "epochs": 2, "imgsz": 64, "data": "d.yaml"})
    assert s is not None and s.model_id == "m0"
    assert hub_server.models["m0"]["config"]["device"] == "tpu"

    s.metrics_queue[0] = json.dumps({"loss": 1.0})
    s.metrics_queue[1] = json.dumps({"loss": 0.5})
    r = s.upload_metrics(thread=False)
    assert r.status_code == 200
    assert hub_server.metrics[-1]["metrics"]["1"] == json.dumps({"loss": 0.5})
    assert s.metrics_queue == {}
    # rate limit engaged right after a flush
    assert s.rate_limited("metrics") is True
    s.stop()


def test_session_failed_metrics_requeue_and_resend(hub_server):
    from sar_yolo_tpu.hub import HUBTrainingSession

    s = HUBTrainingSession("tiny.yaml")
    s.model_id = "m9"                  # point at a route the server accepts
    s.request_retries = 0              # fail fast in tests
    s.metrics_queue[3] = json.dumps({"loss": 9.0})
    hub_server.fail_next = 99          # exhaust retries -> requeue
    r = s.upload_metrics(thread=False)
    assert s.metrics_upload_failed_queue  # kept for the next flush
    hub_server.fail_next = 0
    s.metrics_queue[4] = json.dumps({"loss": 8.0})
    r = s.upload_metrics(thread=False)
    assert r.status_code == 200
    sent = hub_server.metrics[-1]["metrics"]
    assert set(sent) == {"3", "4"}     # failed epoch was re-sent with the new one
    s.stop()


def test_upload_model_zips_orbax_dir(hub_server, tmp_path):
    from sar_yolo_tpu.hub import HUBTrainingSession
    from sar_yolo_tpu.hub.session import zip_checkpoint

    ckpt = tmp_path / "last"
    (ckpt / "state").mkdir(parents=True)
    (ckpt / "state" / "arr.npy").write_bytes(np.arange(8, dtype=np.float32).tobytes())
    (ckpt / "metadata.json").write_text('{"epoch": 3}')

    # the zip round-trips the directory contents
    blob = zip_checkpoint(ckpt)
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert set(zf.namelist()) == {"state/arr.npy", "metadata.json"}
        assert zf.read("metadata.json") == b'{"epoch": 3}'

    s = HUBTrainingSession("tiny.yaml")
    s.model_id = "m0"
    r = s.upload_model(3, ckpt, is_best=True, map=0.5, final=True, thread=False)
    assert r.status_code == 200
    raw = hub_server.uploads[-1]
    assert b'"isBest": true' in raw and b"metadata.json" in raw
    s.stop()


def test_heartbeat_fires_and_stops(hub_server):
    from sar_yolo_tpu.hub import HUBTrainingSession

    s = HUBTrainingSession("tiny.yaml")
    s.model_id = "m0"
    s.start_heartbeat(interval=0.05)
    time.sleep(0.4)
    s.stop()
    n = len(hub_server.heartbeats)
    assert n >= 2
    time.sleep(0.2)
    assert len(hub_server.heartbeats) == n  # no beats after stop()


def test_trainer_callbacks_flow(hub_server, tmp_path):
    """Drive the callback glue with a trainer stand-in: session creation,
    per-epoch metric queueing, rate-limited ckpt upload, final sync."""
    import importlib
    from types import SimpleNamespace

    import sar_yolo_tpu.utils.callbacks.hub as hubcb
    hubcb = importlib.reload(hubcb)  # re-evaluate the endpoint gate
    assert hubcb.callbacks, "callbacks should be active with SARYOLO_HUB_API set"

    wdir = tmp_path / "weights"
    (wdir / "last").mkdir(parents=True)
    (wdir / "last" / "a.bin").write_bytes(b"x")
    (wdir / "best").mkdir()
    (wdir / "best" / "a.bin").write_bytes(b"y")

    trainer = SimpleNamespace(
        hub_session=None,
        args=SimpleNamespace(model="tinydet.yaml", batch=2, epochs=2, imgsz=64,
                             patience=5, cache=False, data="d.yaml"),
        metrics={"loss": 1.25, "metrics/mAP50-95(B)": 0.3},
        epoch=0, fitness=0.3, best_fitness=0.3, wdir=wdir)

    hubcb.on_pretrain_routine_start(trainer)
    assert trainer.hub_session is not None and trainer.hub_session.model_id

    trainer.hub_session.rate_limits["metrics"] = 0.0  # no waiting in tests
    hubcb.on_fit_epoch_end(trainer)
    hubcb.on_model_save(trainer)
    trainer.epoch = 1
    hubcb.on_train_end(trainer)
    trainer.hub_session.stop()

    time.sleep(0.3)  # drain daemon-thread uploads
    assert hub_server.metrics, "epoch metrics reached the server"
    assert len(hub_server.uploads) >= 2  # rate-limited last + final best

    # restore the module gate so later tests in this process see hub disabled
    monkeypatch = pytest.MonkeyPatch()
    monkeypatch.delenv("SARYOLO_HUB_API", raising=False)
    try:
        hubcb = importlib.reload(hubcb)
        assert not hubcb.callbacks
    finally:
        monkeypatch.undo()


def test_check_dataset_counts_splits(tmp_path):
    import cv2

    from sar_yolo_tpu.hub import check_dataset

    for split in ("train", "val"):
        d = tmp_path / "images" / split
        d.mkdir(parents=True)
        for i in range(3 if split == "train" else 2):
            cv2.imwrite(str(d / f"{i}.jpg"),
                        np.zeros((16, 16, 3), np.uint8))
    yaml_path = tmp_path / "data.yaml"
    yaml_path.write_text(
        f"path: {tmp_path}\ntrain: images/train\nval: images/val\n"
        "names:\n  0: thing\n")
    stats = check_dataset(yaml_path, task="detect")
    assert stats["splits"]["train"]["images"] == 3
    assert stats["splits"]["val"]["images"] == 2
    assert stats["names"][0] == "thing"


def test_hub_api_requires_endpoint(monkeypatch):
    monkeypatch.delenv("SARYOLO_HUB_API", raising=False)
    from sar_yolo_tpu import hub

    with pytest.raises(ConnectionError):
        hub.login("anykey")
    assert hub.HUBTrainingSession.create_session("x.yaml", {}) is None
