"""Exception taxonomy — parity with the reference's error hierarchy
(reference data_pipes/exceptions.py:1-49), including its quirk of
rooting both trees at NameError.

Raise-site mapping (reference → here):
- nonconsecutive task schema (pipeline.py:114)  → PipelineTaskSchemaError
- model resolution 0-or-multiple matches (pipeline.py:427,431,453)
                                                → PipelineModelError
- advance without pkey / unregistered model / bad meta
  (pipeline.py:472,481,725)                     → PipelineExecutionError
- invalid stage data (pipeline.py:815)          → PipelineDataError
- advance on a completed object (pipeline.py:477) → StopPipeline
- version mismatch on resume (tables.py:196)    → PipelineVersionError
- invalid field declaration (io/model)          → ModelFieldDeclarationError
"""

from __future__ import annotations


class PipelineError(NameError):
    """Core pipeline error."""


class PipelineModelError(PipelineError, LookupError):
    """Invalid operation on the pipeline model registry (also a
    LookupError so pre-taxonomy callers that caught LookupError keep
    working)."""


class PipelineTaskSchemaError(PipelineError):
    """Invalid task schema declared on a pipeline: tasks enabled
    without their preceding dependant tasks (e.g. load=True while
    transform=False)."""


class PipelineExecutionError(PipelineError):
    """Invalid pipeline execution attempted."""


class PipelineDataError(PipelineError):
    """Invalid data handed to a pipeline stage."""


class StopPipeline(PipelineError):
    """Execution attempted on a completed pipeline object."""


class PipelineVersionError(PipelineError):
    """Execution attempted on a data object registered to an outdated
    pipeline version or no-longer-existing model."""


class ModelError(NameError):
    """Core model error."""


class ModelFieldDeclarationError(ModelError):
    """Attempted invalid field declaration."""
