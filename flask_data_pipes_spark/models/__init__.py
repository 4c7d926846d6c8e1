from . import fields  # noqa: F401
from .model import Model, ModelFieldDeclarationError, ModelMeta, tableize  # noqa: F401
