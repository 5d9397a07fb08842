from .queries import QUERIES, oracle_sql_map, query_map

__all__ = ["QUERIES", "oracle_sql_map", "query_map"]
