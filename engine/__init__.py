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

from engine.schema import (Schema, SchemaParseError, parse_schema,
                           parse_schema_path, schema_to_dict)
from engine.oracle import validate as oracle_validate
from engine.errors import render_message
from engine.registry import (CheckSpec, register_check, registered_keywords,
                             unregister_check)

__all__ = [
    "Schema",
    "parse_schema",
    "parse_schema_path",
    "schema_to_dict",
    "SchemaParseError",
    "oracle_validate",
    "render_message",
    "CheckSpec",
    "register_check",
    "unregister_check",
    "registered_keywords",
    # heavier entry points are imported from their modules to keep
    # `import engine` light: engine.compile.compile_plan,
    # engine.kernels.validate_batch, engine.dataset.validate_dataset,
    # engine.checkpoint.run_validation_job, engine.schema_compiler.*
]
