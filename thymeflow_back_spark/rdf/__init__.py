from .model import QUAD_COLUMNS, QUAD_SCHEMA, V
from .store import StatementStore

__all__ = ["QUAD_COLUMNS", "QUAD_SCHEMA", "V", "StatementStore"]
