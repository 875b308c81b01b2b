from bzzz_spark.serve.local import LocalIndex, local_search

__all__ = ["LocalIndex", "local_search"]
