"""Explode stages: `extracted` -> flat `rows` / `regions` / `tables` side
tables (M12 output records; SURVEY.md §1.3).

Vectorized with pyarrow list kernels (list_flatten + list_parent_indices
+ take) — no Python loop over rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _explode(batch: pa.Table, list_col: str,
             keep_cols: tuple[str, ...] = ("url",)) -> pa.Table:
    col = batch[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col)
    arrays = []
    names = []
    for k in keep_cols:
        arrays.append(pc.take(batch[k], parents))
        names.append(k)
    for fi in range(flat.type.num_fields):
        field = flat.type.field(fi)
        arrays.append(pc.struct_field(flat, fi))
        names.append(field.name)
    return pa.Table.from_arrays(arrays, names=names)


def rows_batch(batch: pa.Table) -> pa.Table:
    """`extracted` batch -> flat rows table (url, row_id, page, region_id,
    bbox, text, min_conf, needs_review) — postprocess.py:9-37 shape."""
    return _explode(batch, "rows")


def regions_batch(batch: pa.Table) -> pa.Table:
    """`extracted` batch -> flat regions/spans table."""
    return _explode(batch, "regions")


def tables_batch(batch: pa.Table) -> pa.Table:
    """`extracted` batch -> flat tables table (cells stay nested)."""
    return _explode(batch, "tables")
