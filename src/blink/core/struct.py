"""Pytree dataclass helpers.

Every scene/BVH/hit container in blink is a frozen dataclass registered as a
JAX pytree via ``jax.tree_util.register_dataclass``.  Array fields are leaves
(differentiable, shardable); fields declared with ``static_field`` are part of
the treedef (shape/config metadata that must be hashable).

Capability parity note: the reference (bindingflare/bling) mount is empty
(SURVEY.md §0); structures here implement the spec in BASELINE.json:5.
"""
from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs: Any) -> Any:
    """Mark a dataclass field as static pytree metadata (not a leaf)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["blink_static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree node."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("blink_static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def replace(self: _T, **updates: Any) -> _T:
        return dataclasses.replace(self, **updates)

    cls.replace = replace  # type: ignore[attr-defined]
    return cls
