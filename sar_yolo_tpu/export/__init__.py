"""Native export backends (ONNX writer/runtime, shared by engine.exporter)."""
