from bzzz_spark.build.indexer import build_index  # noqa: F401
