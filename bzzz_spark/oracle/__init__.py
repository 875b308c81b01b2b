from bzzz_spark.oracle.pyoracle import PyIndex  # noqa: F401
