"""Large-scale training-data pipeline operators (beyond-reference surface):
deduplication, similarity search, text analysis, multimodal columns.

Everything here is built from JVM-side column expressions (xxhash64,
array transforms, aggregates) — no Python in the hot path — so the
operators run at whole-stage-codegen speed and scale linearly with
executors.
"""
