from .engines import EngineRegistry, JdbcBind  # noqa: F401
from .signals import NamedSignal, Signal, signals  # noqa: F401
