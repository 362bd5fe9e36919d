"""REST object-detection server on the TPU stack — stdlib only.

Capability parity with the reference's FastAPI example
(examples/YOLOv13-FastAPI-REST-API/yolov13_fastapi_api.py:100-222): the same
three endpoints and the same /detect JSON shape, but served by
http.server.ThreadingHTTPServer so it runs on a zero-egress TPU pod with no
web-framework dependency. Models are cached after first load, so the jitted
executable is reused across requests (first request pays the XLA compile).

Run:    python examples/rest-api-server/server.py [--port 8000] [--models yolov8n.yaml,...]
Query:  curl -X POST "http://localhost:8000/detect?model=yolov8n&conf=0.25" \
             --data-binary @image.jpg -H "Content-Type: image/jpeg"
"""

from __future__ import annotations

import argparse
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

MODELS: dict = {}           # name -> YOLO instance (jit executables cached inside)
VALID: dict = {}            # name -> yaml path
PERF: dict = {}             # name -> [inference seconds]


def load_model(name: str):
    if name not in MODELS:
        from sar_yolo_tpu import YOLO
        MODELS[name] = YOLO(VALID[name])
    return MODELS[name]


def decode_image(data: bytes) -> np.ndarray:
    from PIL import Image
    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img)


class Handler(BaseHTTPRequestHandler):
    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet default access log
        pass

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/":
            self._json(200, {"service": "sar_yolo_tpu detection API",
                             "endpoints": ["/", "/models", "/performance", "POST /detect"]})
        elif path == "/models":
            self._json(200, {"models": sorted(VALID), "loaded": sorted(MODELS)})
        elif path == "/performance":
            stats = {m: {"requests": len(t),
                         "mean_ms": round(1e3 * sum(t) / len(t), 2),
                         "last_ms": round(1e3 * t[-1], 2)}
                     for m, t in PERF.items() if t}
            self._json(200, {"performance": stats})
        else:
            self._json(404, {"error": "unknown endpoint"})

    def do_POST(self):
        url = urlparse(self.path)
        if url.path != "/detect":
            self._json(404, {"error": "unknown endpoint"})
            return
        q = parse_qs(url.query)
        name = q.get("model", ["yolov8n"])[0]
        conf = float(q.get("conf", [0.25])[0])
        iou = float(q.get("iou", [0.45])[0])
        if name not in VALID:
            self._json(400, {"error": f"invalid model; choose from {sorted(VALID)}"})
            return
        length = int(self.headers.get("Content-Length", 0))
        if length <= 0:
            self._json(400, {"error": "send the image bytes as the request body"})
            return
        try:
            img = decode_image(self.rfile.read(length))
        except Exception as e:  # noqa: BLE001
            self._json(400, {"error": f"could not decode image: {e}"})
            return
        model = load_model(name)
        t0 = time.perf_counter()
        results = model.predict(img, conf=conf, iou=iou, verbose=False)
        dt = time.perf_counter() - t0
        PERF.setdefault(name, []).append(dt)
        r = results[0]
        dets = []
        if r.boxes is not None:
            names = r.names or {}
            for b in np.asarray(r.boxes.data):
                dets.append({"bbox": [float(v) for v in b[:4]],
                             "confidence": float(b[4]),
                             "class_id": int(b[5]),
                             "class_name": str(names.get(int(b[5]), int(b[5])))})
        self._json(200, {"success": True, "model_used": name,
                         "inference_time": round(dt, 4),
                         "detections": dets, "num_detections": len(dets),
                         "image_info": {"height": int(img.shape[0]),
                                        "width": int(img.shape[1])}})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--models", default="yolov8n.yaml,yolov13n-JDE.yaml",
                    help="comma-separated yaml/ckpt paths; name = stem")
    args = ap.parse_args()
    for p in args.models.split(","):
        VALID[p.strip().rsplit("/", 1)[-1].removesuffix(".yaml")] = p.strip()
    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port} — models: {sorted(VALID)}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
