"""Tiny string registries used for models / datasets / algorithms.

The reference wires everything through if/elif chains
(model/builder.py:14-62, datasets/builder.py:9-77); a registry gives the same
string-keyed public API with an extension point.
"""

from __future__ import annotations

from typing import Callable, Dict, Generic, Iterable, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, T] = {}

    def register(self, name: str | Iterable[str]) -> Callable[[T], T]:
        names = [name] if isinstance(name, str) else list(name)

        def deco(obj: T) -> T:
            for n in names:
                key = n.lower()
                if key in self._entries:
                    raise KeyError(f"{self.kind} {key!r} registered twice")
                self._entries[key] = obj
            return obj

        return deco

    def get(self, name: str) -> T:
        key = str(name).lower()
        if key not in self._entries:
            known = ", ".join(sorted(self._entries))
            raise KeyError(f"unknown {self.kind} {name!r}; known: {known}")
        return self._entries[key]

    def __contains__(self, name: str) -> bool:
        return str(name).lower() in self._entries

    def names(self) -> list[str]:
        return sorted(self._entries)
