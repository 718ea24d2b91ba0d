from .driver import QUERIES, oracle_sql, queries

__all__ = ["QUERIES", "queries", "oracle_sql"]
