"""Declarative Model: fields → compiled Spark projection (+ optional
denormalize explode), with the reference's registry semantics.

Reference parity (flask_data_pipes/data_pipes/model.py):
- single shared registry across subclasses (model.py:41-55)
- at most ONE Denormalized* field per model, enforced at class creation
  (model.py:19-35 → ModelFieldDeclarationError)
- `__filename__` defaults to tableized class name, `__directory__` to
  the defining module (model.py:57-63)
- `__pipeline__` binds the model to a pipeline at class creation
  (model.py:73-74); the pipeline's transform hash mixes in the model
  source (model.py:89-93 — replicated in pipeline/versioning.py)

The transform contract is the reference's `o.dump(o._data)`
(pipeline.py:596-604): keep only declared fields, apply each field's
serialization, rename via attribute/data_key — compiled here to ONE
`select` (columnar, codegen) followed by `explode_outer` when a
denormalize field is present (utils.py:39-55 semantics: N items → N
rows, empty list → one NULL row, scalar/missing → unchanged).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST

from ..functions.scalars import camel_to_snake_case
from .fields import (
    DenormalizedFunction,
    DenormalizedList,
    DenormalizedMethod,
    Field,
    Method,
)


# Canonical definition lives in the package-level taxonomy
# (exceptions.py); re-exported here for back-compat.
from ..exceptions import ModelError, ModelFieldDeclarationError  # noqa: F401


def tableize(name: str) -> str:
    """snake_case + naive pluralize (inflection.tableize analog)."""
    snake = camel_to_snake_case(name)
    if snake.endswith("s"):
        return snake
    if snake.endswith("y") and not re.search(r"[aeiou]y$", snake):
        return snake[:-1] + "ies"
    return snake + "s"


class ModelMeta(type):
    __registry: dict = {}

    def __new__(mcs, name, bases, attrs):
        denormalize = [
            k
            for k, v in attrs.items()
            if isinstance(v, (DenormalizedList, DenormalizedMethod, DenormalizedFunction))
        ]
        if len(denormalize) > 1:
            raise ModelFieldDeclarationError(
                f"More than one denormalized field declared on model {name}: {denormalize}"
            )
        cls = super().__new__(mcs, name, bases, attrs)
        cls._denormalize_on = denormalize[0] if denormalize else None
        return cls

    def __init__(cls, name, bases, attrs):
        super().__init__(name, bases, attrs)
        cls.__qname__ = f"{cls.__module__}.{cls.__name__}"

        # collect fields from MRO (base-class fields inherited, subclass wins)
        fields: dict[str, Field] = {}
        for klass in reversed(cls.__mro__):
            for k, v in vars(klass).items():
                if isinstance(v, Field):
                    fields[k] = v
        for k, f in fields.items():
            f.bind(k)
            if isinstance(f, Method):
                f._model_cls = cls
        cls._fields = dict(
            sorted(fields.items(), key=lambda kv: kv[1]._order)
        )

        if not hasattr(cls, "_registry"):
            cls._registry = ModelMeta.__registry
            return  # base Model class itself

        ModelMeta.__registry.setdefault(
            cls.__qname__,
            dict(cls=cls, version=None, pipeline=None, pipeline_config={}),
        )
        if "__filename__" not in attrs:
            cls.__filename__ = tableize(name)
        if "__directory__" not in attrs:
            cls.__directory__ = cls.__module__.split(".")[-1]
        if "__pipeline__" in attrs and attrs["__pipeline__"] is not None:
            cls._register_pipeline(attrs["__pipeline__"])

    def _register_pipeline(cls, pipeline):
        """Bind pipeline; mirror of reference model.py:78-101 (the
        transform-hash mix-in happens in pipeline/versioning.py)."""
        p = pipeline(cls)
        ModelMeta.__registry[cls.__qname__]["pipeline"] = p.__qname__
        ModelMeta.__registry[cls.__qname__]["pipeline_config"] = p.version_config(cls)


class Model(metaclass=ModelMeta):
    """Base declarative model.

    Class options (reference README.md:105-118):
    - ``__filename__`` / ``__directory__``: staged-file layout
    - ``__table__``: load-target table name (JDBC/catalog)
    - ``__pipeline__``: pipeline class to bind
    """

    __filename__: Optional[str] = None
    __directory__: Optional[str] = None
    __table__: Optional[str] = None

    # -- compilation ------------------------------------------------------

    @classmethod
    def projection(cls, df: DataFrame):
        """Compiled select list (+ companions) for this model over df."""
        cols = []
        for f in cls._fields.values():
            cols.append(f.expr(df).alias(f.output))
            cols.extend(f.companions(df))
        return cols

    @classmethod
    def transform(cls, df: DataFrame) -> DataFrame:
        """The reference's transform stage for one model: projection +
        (optional) denormalize explode."""
        out = df.select(*cls.projection(df))
        if cls._denormalize_on:
            key = cls._fields[cls._denormalize_on].output
            dtype = dict(out.dtypes).get(key, "")
            # scalar/missing key → row unchanged (reference utils.py:41-48);
            # arrays explode with empty→NULL-row semantics
            if dtype.startswith("array"):
                out = out.withColumn(key, F.explode_outer(key))
        return out

    @classmethod
    def spark_schema(cls) -> ST.StructType:
        struct = ST.StructType()
        for f in cls._fields.values():
            t = f.spark_type
            if cls._denormalize_on == f.name and isinstance(t, ST.ArrayType):
                t = t.elementType
            struct.add(f.output, t, True)
        return struct

    @classmethod
    def filename(cls) -> str:
        return cls.__filename__ or tableize(cls.__name__)

    @classmethod
    def directory(cls) -> str:
        return cls.__directory__ or cls.__module__.split(".")[-1]
