"""Config plumbing: ml_collections configs, YAML round-trip, frozen view.

The reference's config system is per-experiment `get_config()` python modules
returning ml_collections.ConfigDict, serialized to YAML next to checkpoints
and reloaded on resume (lib/utils/bookkeeping.py:374-394). We keep that: the
YAML round-trip is the source of truth for reproducing a run.

`FrozenCfg` is a hashable immutable view used as a flax-module attribute
(modules must be hashable for jit caching).
"""

from __future__ import annotations

import os
from typing import Any

import ml_collections
import yaml


class FrozenCfg:
    """Immutable, hashable, attribute-access view of a (nested) ConfigDict."""

    __slots__ = ("_items", "_hash")

    def __init__(self, cfg: Any):
        if isinstance(cfg, FrozenCfg):
            object.__setattr__(self, "_items", cfg._items)
            object.__setattr__(self, "_hash", cfg._hash)
            return
        d = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
        items = tuple(sorted((k, _freeze_value(v)) for k, v in d.items()))
        object.__setattr__(self, "_items", items)
        object.__setattr__(self, "_hash", hash(items))

    def __getattr__(self, name: str):
        for k, v in self._items:
            if k == name:
                return v
        raise AttributeError(name)

    def __getitem__(self, name: str):
        return getattr(self, name)

    def get(self, name: str, default=None):
        for k, v in self._items:
            if k == name:
                return v
        return default

    def __contains__(self, name: str) -> bool:
        return any(k == name for k, _ in self._items)

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return isinstance(other, FrozenCfg) and self._items == other._items

    def keys(self):
        return [k for k, _ in self._items]

    def to_dict(self):
        return {k: _thaw_value(v) for k, v in self._items}


class _FrozenDictView(FrozenCfg):
    pass


def _freeze_value(v):
    if isinstance(v, dict):
        return FrozenCfg(v)
    if isinstance(v, (list, tuple)):
        return tuple(_freeze_value(x) for x in v)
    return v


def _thaw_value(v):
    if isinstance(v, FrozenCfg):
        return v.to_dict()
    if isinstance(v, tuple):
        return [_thaw_value(x) for x in v]
    return v


def save_config(cfg: ml_collections.ConfigDict, path: str) -> str:
    """Serialize a config to YAML (ref bookkeeping.py:374-387)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=True)
    return path


def load_config(path: str) -> ml_collections.ConfigDict:
    """Load a YAML config back into a ConfigDict (ref bookkeeping.py:389-394)."""
    with open(path) as f:
        d = yaml.safe_load(f)
    return ml_collections.ConfigDict(d)
