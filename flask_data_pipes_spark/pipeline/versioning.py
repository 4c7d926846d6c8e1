"""Pipeline versioning by source hash (reference:
flask_data_pipes/data_pipes/pipeline.py:176-221 + tables.py:66-84).

Per-stage SHA-224 over the concatenated source of (sync pre-processors
+ core stage fn + executor name + kwargs); the transform hash
additionally mixes in the Model source (model.py:89-93). Version
increments ONLY when a previously-set hash changes — first-time hash
set flips the mapping bit without bumping the version (the
`version_setter` truth table, tables.py:66-84, replicated exactly in
`version_setter` below).
"""

from __future__ import annotations

import hashlib
import inspect
from typing import Any, Optional, Sequence

TASK_KEYS = ["upload", "extract", "transform", "load"]
FINGERPRINT = [f"{k}_sha256" for k in TASK_KEYS]


def sha224_hex(s: str) -> str:
    """The reference's `sha256` helper is *actually* SHA-224
    (utils.py:35-36); versioning parity requires the same digest."""
    return hashlib.sha224(s.encode("utf-8")).hexdigest()


def source_of(fn: Any) -> str:
    """`inspect.getsource` with a stable fallback for builtins/partials/
    lambdas defined in REPLs (reference relies on getsource directly;
    in a Spark submit context sources are importable files, but we
    degrade to qualname+module rather than crash)."""
    try:
        return inspect.getsource(fn)
    except (OSError, TypeError):
        return f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', repr(fn))}"


def stage_hash(
    processors: Sequence[Any],
    core_fn: Optional[Any],
    executor_name: str,
    kwargs: Optional[dict] = None,
) -> Optional[str]:
    """Hash of one stage's logic (pipeline.py:176-221): sync
    pre-processors + core fn + executor + kwargs, order-stable."""
    if core_fn is None:
        return None
    parts = [source_of(p) for p in processors]
    parts.append(source_of(core_fn))
    parts.append(executor_name)
    if kwargs:
        parts.append(repr(sorted(kwargs.items())))
    return sha224_hex(" ".join(parts))


def mix_model_hash(transform_hash: str, model_cls: type) -> str:
    """Transform hash mixes the model source (model.py:89-93) since the
    model defines the transformation logic."""
    return sha224_hex(" ".join([transform_hash, source_of(model_cls)]))


def version_setter(
    new_hashes: dict[str, Optional[str]],
    prev_version: Optional[int],
    prev_mapping: Optional[Sequence[int]],
    prev_hashes: Optional[dict[str, Optional[str]]],
) -> tuple[int, list[int]]:
    """Exact replica of DataModel.version_setter (tables.py:66-84).

    mapping bit i counts changes to stage i's hash; the version bumps
    only if some stage whose mapping bit was already nonzero changed
    ("version not incremented if mapping previously 0").
    """
    mapping = [int(bool(new_hashes.get(k))) for k in FINGERPRINT]
    version = 1
    if prev_version is not None:
        prev_hashes = prev_hashes or {}
        prev_mapping = list(prev_mapping or [0, 0, 0, 0])
        changes = [
            int((new_hashes.get(k) or 0) != (prev_hashes.get(k) or 0))
            for k in FINGERPRINT
        ]
        mapping = [a + b for a, b in zip(prev_mapping, changes)]
        existed = [bool(i) & bool(j) for i, j in zip(prev_mapping, changes)]
        version = prev_version + 1 if sum(existed) > 0 else prev_version
    return version, mapping
