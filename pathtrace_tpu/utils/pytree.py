"""Small helper to declare frozen dataclasses as JAX pytrees.

`static` fields are hashable aux data (shapes, counts, flags); everything
else is a child (arrays / sub-pytrees).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def pytree_dataclass(cls=None, *, static: tuple = ()):  # noqa: ANN001
    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        fields = [f.name for f in dataclasses.fields(c)]
        data_fields = [f for f in fields if f not in static]
        meta_fields = [f for f in fields if f in static]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj: Any, **kwargs: Any) -> Any:
    return dataclasses.replace(obj, **kwargs)
