"""Ray-Data-native schema + constraint validation engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference validator ``goddtriffin/json-schema-rs`` (see ``SURVEY.md``),
re-expressed as vectorized Arrow predicates evaluated via
``ray.data.Dataset.map_batches`` over tables of interleaved text+media
documents, plus the corpus-level checks (stats / uniqueness / referential /
drift) and training-data operators (dedup / similarity / text analysis) that a
100 TB pipeline needs.

Reference semantics are cited per-module as ``/root/reference/<file>:<lines>``.
"""

from engine.schema import Schema, parse_schema, SchemaParseError
from engine.oracle import validate as oracle_validate
from engine.errors import render_message

__all__ = [
    "Schema",
    "parse_schema",
    "SchemaParseError",
    "oracle_validate",
    "render_message",
]
