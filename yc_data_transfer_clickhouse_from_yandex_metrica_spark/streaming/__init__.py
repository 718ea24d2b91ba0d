from . import cdc

__all__ = ["cdc"]
