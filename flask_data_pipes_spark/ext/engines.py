"""Multi-DB engine registry (O10 — reference ext/engines.py:4-24:
one SQLAlchemy engine + MetaData per SQLALCHEMY_BINDS entry, attribute
access, missing bind → InvalidRequestError).

Spark analog: a named bind is a JDBC connection profile (url, driver,
credentials, default reader/writer options). The registry resolves
names to `JdbcBind`s and fronts `read_jdbc`/`write_jdbc` so callers
address databases by name, never by raw URL:

    reg = EngineRegistry({"warehouse": {"url": "jdbc:postgresql://...",
                                        "driver": "org.postgresql.Driver",
                                        "user": "etl", "password": "..."}})
    df = reg.warehouse.read(spark, "SELECT ...", partition_column="id",
                            lower_bound=0, upper_bound=1_000_000)
    reg.warehouse.write(df2, "target_table", mode="append")

Scale: the bind carries per-database defaults (fetchsize, batchsize,
numPartitions) so every read is partition-parallel and every write
batches — the knobs live with the connection profile, not scattered
through job code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

__all__ = ["JdbcBind", "EngineRegistry", "BindNotFound"]


class BindNotFound(KeyError):
    """Unknown bind name (reference raises InvalidRequestError)."""


@dataclass
class JdbcBind:
    """One named JDBC connection profile."""

    url: str
    driver: Optional[str] = None
    user: Optional[str] = None
    password: Optional[str] = None
    options: dict = field(default_factory=dict)  # default per-call options

    def connection_options(self, **overrides: Any) -> dict:
        opts = dict(self.options)
        if self.driver:
            opts.setdefault("driver", self.driver)
        if self.user is not None:
            opts.setdefault("user", self.user)
        if self.password is not None:
            opts.setdefault("password", self.password)
        opts.update(overrides)
        return opts

    def read(self, spark, query: str, **kwargs: Any):
        from ..sources.files import read_jdbc

        opts = self.connection_options()
        # read_jdbc's named params pass through; everything else is an option
        for k in ("partition_column", "lower_bound", "upper_bound", "num_partitions"):
            if k in kwargs:
                opts[k] = kwargs.pop(k)
        opts.update(kwargs)
        return read_jdbc(spark, self.url, query, **opts)

    def write(self, df, table: str, mode: str = "append", **kwargs: Any) -> None:
        from ..sinks.writers import write_jdbc

        write_jdbc(df, self.url, table, mode=mode, **self.connection_options(**kwargs))


class EngineRegistry(dict):
    """Named binds → JdbcBind, attribute access (ext/engines.py:4-24)."""

    def __init__(self, binds: Optional[dict] = None) -> None:
        super().__init__()
        for name, cfg in (binds or {}).items():
            self.bind(name, cfg)

    def bind(self, name: str, cfg) -> JdbcBind:
        b = cfg if isinstance(cfg, JdbcBind) else JdbcBind(**cfg)
        self[name] = b
        return b

    def __getattr__(self, item: str) -> JdbcBind:
        try:
            return self[item]
        except KeyError:
            raise BindNotFound(
                f"[EngineRegistryUsage] JDBC bind does not exist: '{item}'"
            ) from None
