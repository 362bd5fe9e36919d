"""Triton Inference Server HTTP client (capability parity: reference utils/triton.py:9).

Minimal dependency-free client over urllib; used to serve exported SavedModel/
StableHLO artifacts behind Triton's TF backend.
"""

from __future__ import annotations

import json
import urllib.request

import numpy as np

_DTYPES = {"FP32": np.float32, "FP16": np.float16, "UINT8": np.uint8,
           "INT32": np.int32, "INT64": np.int64}


class TritonRemoteModel:
    """Call a model on a Triton server: `TritonRemoteModel(url, name)(img)`."""

    def __init__(self, url: str, endpoint: str):
        self.url = url.rstrip("/")
        self.endpoint = endpoint
        meta = json.loads(urllib.request.urlopen(
            f"{self.url}/v2/models/{endpoint}").read())
        self.inputs = meta["inputs"]
        self.outputs = meta["outputs"]

    def __call__(self, *arrays: np.ndarray):
        inputs = []
        raw = b""
        for spec, arr in zip(self.inputs, arrays):
            arr = np.ascontiguousarray(arr, _DTYPES.get(spec["datatype"], np.float32))
            inputs.append({"name": spec["name"], "shape": list(arr.shape),
                           "datatype": spec["datatype"],
                           "parameters": {"binary_data_size": arr.nbytes}})
            raw += arr.tobytes()
        header = json.dumps({
            "inputs": inputs,
            "outputs": [{"name": o["name"], "parameters": {"binary_data": True}}
                        for o in self.outputs],
        }).encode()
        body = header + raw
        req = urllib.request.Request(
            f"{self.url}/v2/models/{self.endpoint}/infer", data=body,
            headers={"Inference-Header-Content-Length": str(len(header)),
                     "Content-Type": "application/octet-stream"})
        resp = urllib.request.urlopen(req)
        hlen = int(resp.headers["Inference-Header-Content-Length"])
        payload = resp.read()
        meta = json.loads(payload[:hlen])
        data = payload[hlen:]
        outs = []
        off = 0
        for o in meta["outputs"]:
            n = o["parameters"]["binary_data_size"]
            dt = _DTYPES.get(o["datatype"], np.float32)
            outs.append(np.frombuffer(data[off:off + n], dt).reshape(o["shape"]))
            off += n
        return outs[0] if len(outs) == 1 else outs
