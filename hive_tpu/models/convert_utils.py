"""Shared armour for torch-checkpoint converters.

Real released checkpoints drift: key names move across torchvision/timm
versions, heads get renamed, extra buffers appear. Every converter in
:mod:`hive_tpu.models` wraps its source state dict in :class:`TrackedState`
so that the first real checkpoint either loads cleanly or fails with a
COMPLETE report — every expected-but-missing key (with close-name hints) and
every present-but-unconsumed tensor — instead of silently producing a
half-initialised model. (The complementary direction — every Flax parameter
written exactly once, with the model's own ``init`` tree as oracle — is
pinned by tests/test_weight_conversion.py.)
"""

from __future__ import annotations

import difflib
import re
from typing import Dict, Iterable, Sequence

import numpy as np


class TrackedState:
    """A read-tracking view of a flat ``{name: array}`` checkpoint dict.

    * ``state[key]`` marks ``key`` consumed; a missing key raises with
      close-match suggestions (key-name drift reads as a rename, not a
      mystery KeyError).
    * :meth:`assert_fully_consumed` raises if any tensor was never read,
      listing all leftovers (minus explicitly ignored patterns).
    """

    def __init__(self, state: Dict[str, np.ndarray], name: str = "checkpoint"):
        self._state = dict(state)
        self._consumed: set = set()
        self.name = name

    def __getitem__(self, key: str) -> np.ndarray:
        if key not in self._state:
            hints = difflib.get_close_matches(key, self._state.keys(), n=3,
                                              cutoff=0.6)
            hint_text = f" Close matches: {hints}." if hints else ""
            raise KeyError(f"{self.name} has no tensor {key!r} — the source "
                           f"layout may have drifted.{hint_text}")

        self._consumed.add(key)
        return self._state[key]

    def __contains__(self, key: str) -> bool:
        # Membership probes guard optional tensors; a probe alone does not
        # consume.
        return key in self._state

    def __len__(self) -> int:
        return len(self._state)

    def get(self, key: str, default=None):
        return self[key] if key in self._state else default

    def keys(self):
        return self._state.keys()

    def mark_consumed(self, *keys: str) -> None:
        """Explicitly discharge keys that are intentionally not converted."""
        self._consumed.update(k for k in keys if k in self._state)

    def unconsumed(self, ignore: Sequence[str] = ()) -> list:
        """Tensors never read, minus keys matching any ``ignore`` regex."""
        patterns = [re.compile(p) for p in ignore]
        return sorted(
            key for key in self._state
            if key not in self._consumed
            and not any(p.search(key) for p in patterns))

    def assert_fully_consumed(self, ignore: Sequence[str] = ()) -> None:
        """Raise ``ValueError`` listing every tensor the converter ignored.

        :param ignore: regex patterns for tensors that are legitimately
            unused (e.g. a classification head the model does not keep).
        """
        leftovers = self.unconsumed(ignore)

        if leftovers:
            shapes = {k: tuple(np.shape(self._state[k])) for k in leftovers[:20]}
            raise ValueError(
                f"{len(leftovers)} tensor(s) in {self.name} were not "
                f"consumed by the converter — the source layout has likely "
                f"drifted. First leftovers (name: shape): {shapes}. "
                f"Full list: {leftovers}")


def unflatten_params(flat, leaf=None):
    """'a/b/c'-keyed flat mapping -> nested params tree (inverse of the
    converters' flattening). ``leaf`` optionally maps each value (e.g.
    ``jnp.asarray``). THE single definition — the per-model load_params
    used to carry three byte-similar copies (review finding, r5)."""
    tree = {}
    for key in (flat.files if hasattr(flat, "files") else flat):
        value = flat[key]
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = leaf(value) if leaf is not None else value
    return tree


class WriteOnceDict(dict):
    """A dict that refuses duplicate writes (converter output side).

    Two mappings landing on one Flax parameter would silently drop the first
    — make it loud instead.
    """

    def __setitem__(self, key, value):
        if key in self:
            raise ValueError(f"parameter {key!r} written twice by the "
                             f"converter (mapping collision)")
        super().__setitem__(key, value)


def iter_flat_numpy(raw: Iterable) -> Dict[str, np.ndarray]:
    """torch state dict → plain {name: np.ndarray} (detaching tensors)."""
    out = {}
    for key, value in raw.items():
        out[key] = np.asarray(value.detach().numpy()
                              if hasattr(value, "detach") else value)
    return out
