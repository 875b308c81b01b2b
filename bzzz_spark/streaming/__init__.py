# Structured Streaming ingestion (the reference is batch-only with a
# ≤5 s searcher-refresh visibility lag; streaming ingest is our analog).
