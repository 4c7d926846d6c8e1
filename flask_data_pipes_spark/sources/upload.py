"""Upload ingest (S4/S5; reference:
flask_data_pipes/data_pipes/__init__.py:209-275 upload endpoint +
pipeline.py:487-497 persist, filetypes.py, ext/roles.py).

The engine is web-framework-agnostic: `ingest_upload` is the function a
Flask/FastAPI view (or a watcher on a landing bucket) calls. Parity:

- extension validation against the model's accept group
  (__init__.py:245-247; groups from filetypes.py:5-14)
- role check (ext/roles.py:7-25: caller's role >= required)
- content-hash filename prefix (the reference hashes a prefix onto the
  name, __init__.py:249-250) → dedup-safe landing names
- file saved verbatim under `<upload_dir>/<model dir>/YYYY/MM/DD/`
  (pipeline.py:487-497), then the pipeline is launched at the stage
  after upload with the returned meta.
"""

from __future__ import annotations

import enum
import hashlib
import os
import shutil
from datetime import datetime, timezone
from typing import Optional, Union

from ..sinks.writers import dated_path

__all__ = ["FileType", "Role", "UploadError", "ingest_upload"]


class FileType(enum.Enum):
    """Accepted upload extension groups (reference filetypes.py:5-14)."""

    data = ("csv", "json", "jsonl", "txt")
    image = ("png", "jpg")
    archive = ("zip", "gz")
    any = ("csv", "json", "jsonl", "txt", "png", "jpg", "zip", "gz", "parquet")


class Role(enum.IntEnum):
    """Upload RBAC (reference ext/roles.py:7-25): ordered comparison."""

    viewer = 1
    editor = 2
    admin = 3
    superuser = 4


class UploadError(Exception):
    def __init__(self, message: str, status: int) -> None:
        super().__init__(message)
        self.status = status  # 400/403/415 parity with the HTTP layer


def ingest_upload(
    src_path: str,
    model_cls,
    upload_dir: str,
    accept: FileType = FileType.data,
    role: Optional[Role] = None,
    required_role: Role = Role.superuser,
    active: bool = True,
    created: Optional[Union[str, datetime]] = None,
    store=None,
    user=None,
    meta: Optional[dict] = None,
) -> dict:
    """Validate + persist one uploaded file; returns the meta dict to
    launch the pipeline at extract (reference __init__.py:255-263)."""
    if not active:
        raise UploadError("uploads disabled for model", 400)
    name = os.path.basename(src_path)
    ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
    if ext == "gz" and name.count(".") >= 2:
        ext = name.rsplit(".", 2)[-2].lower()
    if ext not in accept.value:
        raise UploadError(f"unsupported file type '.{ext}'", 415)
    if role is not None and role < required_role:
        raise UploadError("insufficient role", 403)

    created = created or datetime.now(timezone.utc)
    with open(src_path, "rb") as fh:
        prefix = hashlib.sha224(fh.read(1 << 20)).hexdigest()[:8]
    dest = dated_path(upload_dir, model_cls.directory(), f"{prefix}_{name}", created)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copy2(src_path, dest)  # verbatim persist (pipeline.py:487-497)

    result = dict(
        pkey=None,
        model=model_cls.__qname__,
        file=dest,
        created=str(created)[:10],
    )
    if store is not None:
        upserted = store.upsert(
            "upload", dest, created=result["created"], model=result["model"],
            user=user, meta=meta,
        )
        result["pkey"] = upserted["pkey"]
    return result
