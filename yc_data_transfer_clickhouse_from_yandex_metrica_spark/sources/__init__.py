from . import bindings, csvgz, jdbc, warehouse

__all__ = ["bindings", "csvgz", "jdbc", "warehouse"]
