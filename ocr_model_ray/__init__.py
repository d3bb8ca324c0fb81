"""ocr_model_ray — Ray-Data-native document/web-page extraction engine.

A from-scratch reimplementation of the extraction semantics of the
reference repo (Sagexd08/Ocr-Model, read-only at /root/reference) as
streaming ray.data.Dataset pipelines over zero-copy Arrow batches.
See SURVEY.md for the blueprint and spec.py for the frozen
determinism spec.
"""
__version__ = "0.1.0"

import logging as _logging


class _SchemaHashNoise(_logging.Filter):
    """Drop Ray Data's benign 'Failed to hash the schemas' warning.

    Parquet files whose schema carries key/value metadata (pandas
    writes these) make ``hash(pa.Schema)`` raise ``unhashable type:
    'dict'`` on this pyarrow version; Ray's ``unify_schemas`` only uses
    the hash as a dedup fast path and falls through to the full unify,
    so the warning is pure noise — but it fires once per schema-unify
    in every pandas-batch stage. Filtering beats stripping the
    metadata at read time, which would insert a map op and break the
    pure-Read plan shape that ``_input_size_hint`` relies on."""

    def filter(self, record: _logging.LogRecord) -> bool:
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoise())


class _EmptyBundleNoise(_logging.Filter):
    """Drop the RefBundle schema-change warning ONLY for the benign
    empty-block case: Ray's hash aggregate emits zero-row partition
    blocks whose schema is empty, tripping the executor's schema-drift
    check on every aggregate over few groups. A REAL drift (two
    non-empty schemas) still logs."""

    def filter(self, record: _logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not ("RefBundle with a different schema" in msg
                    and "new schema: ." in msg)


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyBundleNoise())
