"""reader_spark — a PySpark-native rebuild of the capabilities of
artie-labs/reader (CDC + snapshot engine), extended with the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Design principles (see SURVEY.md):
  * DataFrame/SQL first — declare logical plans, let Catalyst pick the
    physical strategy.
  * The reference's per-row ValueConverter pipeline becomes ONE
    `select()` of column expressions (whole-stage codegen'd).
  * Chunked keyset pagination becomes partitioned parallel reads.
  * Offset stores become Structured Streaming checkpoints.
  * Every operator is designed for 100 TB / 1000-executor scale:
    broadcast small dims, partial aggregation, no driver-side loops.
"""

__version__ = "0.1.0"
