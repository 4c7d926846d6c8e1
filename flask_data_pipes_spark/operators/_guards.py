"""Reserved internal-column guards shared by the operators.

Several operators add temporary `__`-prefixed working columns (salt
keys, presence tags, window candidates) and drop them before
returning. If an INPUT frame already carries one of those names, the
operator would silently read its own scratch space from user data and
corrupt the result — so each operator rejects such inputs up front
with a clear error instead (round-9 VERDICT item 3 / round-8 ADVICE
item 4).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame

__all__ = ["reject_reserved"]


def reject_reserved(op: str, reserved: Iterable[str], **frames: DataFrame) -> None:
    """Raise ValueError if any of `reserved` is already a column of any
    of the named input `frames`. `op` names the operator for the error
    message; frame kwarg names identify which input is at fault."""
    reserved = list(reserved)
    for name, df in frames.items():
        clash = [c for c in df.columns if c in reserved]
        if clash:
            raise ValueError(
                f"{op}: input {name!r} already has reserved internal "
                f"column(s) {clash}; rename them before calling (the "
                f"operator uses these names as scratch space)"
            )
