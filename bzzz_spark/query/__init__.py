# Import submodules directly (bzzz_spark.query.executor, .ast, .scoring);
# keeping this __init__ empty avoids a build ↔ query import cycle.
