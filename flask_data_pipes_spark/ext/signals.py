"""Generic named-signal registry (O9 — reference ext/signals.py:4-37:
a dict of blinker NamedSignals with `register(name, subscriber)` and
attribute access; `etl_tables_imported` drives model registration,
reference data_pipes/__init__.py:155-159).

Dependency-free re-implementation: a NamedSignal carries an ordered
receiver list; `send` invokes each receiver with the sender and kwargs
and returns `[(receiver, result), ...]` (blinker's documented return
shape). Driver-side only — signals are orchestration events (models
registered, stage committed), never per-row hooks.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

__all__ = ["NamedSignal", "Signal", "signals"]


class NamedSignal:
    def __init__(self, name: str, doc: Optional[str] = None) -> None:
        self.name = name
        self.__doc__ = doc
        self._receivers: list[Callable] = []

    def connect(self, receiver: Callable) -> Callable:
        if receiver not in self._receivers:
            self._receivers.append(receiver)
        return receiver

    def disconnect(self, receiver: Callable) -> None:
        if receiver in self._receivers:
            self._receivers.remove(receiver)

    @property
    def receivers(self) -> list[Callable]:
        return list(self._receivers)

    def send(self, sender: Any = None, **kwargs: Any) -> list[tuple[Callable, Any]]:
        return [(r, r(sender, **kwargs)) for r in list(self._receivers)]

    def __repr__(self) -> str:  # pragma: no cover
        return f"NamedSignal({self.name!r}, receivers={len(self._receivers)})"


class Signal(dict):
    """Mapping of signal names → NamedSignal with register/attribute
    access (reference ext/signals.py:4-37 semantics: unknown attribute
    → KeyError('Unregistered signal requested: ...'); truthy even when
    empty so `if app.signal:` guards work)."""

    def register(
        self,
        name: str,
        doc: Optional[str] = None,
        subscriber: Optional[Callable] = None,
    ) -> NamedSignal:
        sig = self.get(name) or NamedSignal(name, doc)
        self[name] = sig
        if subscriber:
            sig.connect(subscriber)
        return sig

    def __getattr__(self, name: str) -> NamedSignal:
        try:
            return self[name]
        except KeyError as error:
            raise KeyError(f"Unregistered signal requested: {name}") from error

    def __bool__(self) -> bool:
        return True


# Default engine-wide registry with the reference's one built-in signal:
# `etl_tables_imported` fires after a pipeline pushes a model's version
# row into the metadata store (reference __init__.py:155-159, where the
# subscriber IS the registration push; here registration is direct and
# the signal is the extension point for user code).
signals = Signal()
signals.register(
    "etl_tables_imported",
    doc="sent by Pipeline.register_model after the DataModel row is upserted; "
    "kwargs: model (Model subclass), row (metadata dict)",
)
