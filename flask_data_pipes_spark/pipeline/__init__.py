from . import decorators  # noqa: F401
from .pipeline import Pipeline, PipelineMeta, PipelineTaskError  # noqa: F401
from .state import MetadataStore, PipelineVersionError  # noqa: F401
from .state_sql import DbMetadataStore  # noqa: F401
from .versioning import (  # noqa: F401
    TASK_KEYS,
    mix_model_hash,
    sha224_hex,
    stage_hash,
    version_setter,
)
