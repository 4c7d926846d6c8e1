"""flask_data_pipes_spark — a PySpark-native data-pipeline & analytics
engine with the capabilities of Nasdaq/flask-data-pipes, built Spark-first.

Public surface:
- session: EngineConfig + get_spark
- functions: scalar / text / vector column-expression libraries
- models: declarative Model → schema + compiled select
- operators: denormalize, dedup, similarity, multimodal
- sources/sinks: JSONL/CSV/Parquet/JDBC/HTTP/upload
- pipeline: staged ETL with hooks, state, versioning
- plans: the query catalog (driver correctness surface)
- streaming: structured-streaming stage wrappers
"""

from .exceptions import (  # noqa: F401
    ModelError,
    ModelFieldDeclarationError,
    PipelineDataError,
    PipelineError,
    PipelineExecutionError,
    PipelineModelError,
    PipelineTaskSchemaError,
    PipelineVersionError,
    StopPipeline,
)
from .session import EngineConfig, get_spark  # noqa: F401

__version__ = "0.1.0"
