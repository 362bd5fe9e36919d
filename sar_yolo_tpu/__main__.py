"""`python -m sar_yolo_tpu TASK MODE k=v` — the CLI without pip-installing the
`saryolo` console script (≙ reference `python -m ultralytics` via cfg entrypoint)."""

from sar_yolo_tpu.cfg import entrypoint

if __name__ == "__main__":
    entrypoint()
