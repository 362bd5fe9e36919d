"""Orbax checkpointing: train state + EMA + run args (reference ckpt parity).

The reference stores a .pt pickle {epoch, best_fitness, ema(fp16), optimizer,
train_args, ...} (engine/trainer.py:513-546). Here: an Orbax composite
checkpoint directory with the same logical contents; EMA params are the
'model' the way the reference treats them.
"""

from __future__ import annotations

import json
from pathlib import Path

import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir, state_dict: dict, metadata: dict | None = None):
    """Save a pytree dict (params/ema/opt_state/...) + json metadata."""
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.parent.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, state_dict, force=True)
    if metadata is not None:
        (ckpt_dir / "run_meta.json").write_text(json.dumps(metadata, default=str))


def load_checkpoint(ckpt_dir, target=None):
    """Load a checkpoint dir. Returns (state_dict, metadata)."""
    ckpt_dir = Path(ckpt_dir).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(ckpt_dir, item=target)
    meta_path = ckpt_dir / "run_meta.json"
    metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, metadata


def is_checkpoint(path) -> bool:
    p = Path(path)
    return p.is_dir() and (p / "run_meta.json").exists()
