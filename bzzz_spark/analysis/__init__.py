from bzzz_spark.analysis.tokenizer import (  # noqa: F401
    TOKEN_PATTERN_JVM,
    py_tokenize,
    standard_tokenize,
    tokenize_query_string,
)
