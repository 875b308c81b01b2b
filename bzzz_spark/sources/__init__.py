# Storage layer: table catalog with Iceberg-or-parquet backends, alias
# indirection, and the reference's store/delete maintenance operations.
