from .updater import apply_update, USER_GRAPH

__all__ = ["apply_update", "USER_GRAPH"]
