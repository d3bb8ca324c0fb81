"""Join strategies (SURVEY.md §2.5 — the reference has no relational
joins; these are the engine's scale-conscious primitives).

* ``broadcast_join`` — small side goes through ``ray.put`` ONCE; every
  map task reads the object-store copy (zero-copy within a node) and
  merges per batch. No shuffle. Use when one side fits in worker heap
  (dimension tables, filtered keys).
* ``hash_bucket_join`` — both sides large: add ``__bucket = hash(key) %
  B`` to each, tag provenance, union, ``groupby(__bucket)`` (ONE
  shuffle moves each row once), and pandas-merge the two sides inside
  ``map_groups``. Skewed hot keys can be salted into sub-buckets via
  ``salt`` (key -> extra murmur of a second column).
* ``broadcast_semi_filter`` — membership filter against a broadcast key
  set (semi/anti join) inside ``map_batches``.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _key_cols(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def broadcast_join(large: rd.Dataset, small: pa.Table | pd.DataFrame,
                   on: str | Sequence[str], how: str = "inner") -> rd.Dataset:
    """Merge a broadcast small table into every batch of ``large``.

    ``small`` is put in the object store once; tasks deserialize the
    shared copy (per node), not per batch.
    """
    if how not in ("inner", "left"):
        # right/outer are NOT expressible per batch: every batch would
        # re-emit the small side's rows unmatched in THAT batch,
        # duplicating them once per batch — use hash_bucket_join
        raise ValueError(
            f"broadcast_join supports how='inner'|'left', got {how!r}; "
            "right/outer joins need hash_bucket_join")
    if isinstance(small, pa.Table):
        small = small.to_pandas()
    keys = _key_cols(on)
    ref = ray.put(small)

    def _merge(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        return batch.merge(s, on=keys, how=how)

    return large.map_batches(_merge, batch_format="pandas")


def broadcast_semi_filter(large: rd.Dataset, keys: pa.Array | Sequence,
                          on: str, anti: bool = False) -> rd.Dataset:
    """Semi (or anti) join: keep rows whose ``on`` value is (not) in the
    broadcast key set."""
    arr = pa.array(list(keys)) if not isinstance(keys, (pa.Array, pa.ChunkedArray)) else keys
    ref = ray.put(arr)

    def _filter(batch: pa.Table) -> pa.Table:
        value_set = ray.get(ref)
        mask = pc.is_in(batch[on], value_set=value_set)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return large.map_batches(_filter, batch_format="pyarrow")


class BloomFilter:
    """Simple numpy Bloom filter for broadcast semi-joins when the key
    set itself is too big to ship (guide: 'broadcast the key set (or a
    Bloom filter of it)'). k hash probes derived from two mixes of the
    int64 key; false-positive rate ~ (1-e^{-kn/m})^k."""

    def __init__(self, capacity: int, bits_per_key: int = 12,
                 num_probes: int = 4) -> None:
        import numpy as np
        self.m = max(64, capacity * bits_per_key)
        self.k = num_probes
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _probes(self, keys):
        import numpy as np
        x = np.asarray(keys, dtype=np.uint64)
        with np.errstate(over="ignore"):
            h1 = (x * np.uint64(0x9E3779B97F4A7C15)) ^ (x >> np.uint64(31))
            h2 = (x * np.uint64(0xC2B2AE3D27D4EB4F)) ^ (x >> np.uint64(29)) | np.uint64(1)
            return [((h1 + np.uint64(i) * h2) % np.uint64(self.m))
                    for i in range(self.k)]

    def add(self, keys) -> None:
        import numpy as np
        for pos in self._probes(keys):
            # ufunc.at: fancy-index |= silently drops duplicate indices
            np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def might_contain(self, keys):
        import numpy as np
        out = np.ones(len(keys), dtype=bool)
        for pos in self._probes(keys):
            word = self.bits[(pos >> np.uint64(6))]
            out &= ((word >> (pos & np.uint64(63))) & np.uint64(1)) == 1
        return out


def bloom_semi_filter(large: rd.Dataset, keys, on: str) -> rd.Dataset:
    """Approximate semi-join: keep rows whose integer ``on`` value might
    be in ``keys`` (no false negatives; a small false-positive tail that
    a downstream exact join removes). The filter broadcasts as a bit
    array — ~1.5 bytes/key instead of 8+. ``keys`` may be a prebuilt
    BloomFilter (e.g. streamed from a Dataset via bloom_from_dataset)
    or any int sequence."""
    import numpy as np
    if isinstance(keys, BloomFilter):
        bf = keys
    else:
        arr = np.asarray(list(keys), dtype=np.int64)
        bf = BloomFilter(capacity=len(arr))
        bf.add(arr)
    ref = ray.put(bf)

    def _filter(batch: pa.Table) -> pa.Table:
        f = ray.get(ref)
        vals = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(f.might_contain(vals)))

    return large.map_batches(_filter, batch_format="pyarrow")


def bloom_from_dataset(keys: rd.Dataset, on: str, capacity: int,
                       bits_per_key: int = 12) -> BloomFilter:
    """Build a BloomFilter from a key Dataset by STREAMING its batches
    through the driver — memory is O(filter bits), never O(keys); the
    key set itself is never materialized. At 10^12-key scale, swap the
    driver stream for per-block partial filters OR-merged in a tree
    (bloom bit arrays are mergeable); the driver stream is the right
    plan while the key COLUMN (8B/key) outstreams faster than the
    filter would ship."""
    import numpy as np
    bf = BloomFilter(capacity=capacity, bits_per_key=bits_per_key)
    # batch_size=None: whole blocks per fetch — the default small
    # batches cost one object-store round trip per few thousand keys
    # (measured 49 s -> ~2 s streaming 9.5M keys)
    for batch in keys.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
        bf.add(batch[on].to_numpy(zero_copy_only=False).astype(np.int64))
    return bf


def salted_group_count(ds: rd.Dataset, key: str, num_salts: int = 8) -> "pd.DataFrame":
    """Skew-safe grouped count: hot keys are salted into ``num_salts``
    sub-groups for the wide shuffle, then the (tiny) salted partials
    collapse in a second pass — no single reducer ever sees a hot key's
    full row set."""
    import numpy as np

    from .bucketed import bucketed_agg

    def add_salt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # deterministic per-row salt: hash of row position within batch
        salt = pa.array((np.arange(n) % num_salts).astype(np.int32))
        counts = pa.table({key: batch[key], "__salt": salt})
        g = counts.group_by([key, "__salt"]).aggregate([([], "count_all")])
        # select by NAME: pyarrow's key/aggregate column order has
        # flipped between releases, so a positional rename can silently
        # mislabel the count as the key
        return g.select([key, "__salt", "count_all"]) \
                .rename_columns([key, "__salt", "n"])

    salted = bucketed_agg(ds.map_batches(add_salt, batch_format="pyarrow"),
                          [key, "__salt"], {"n": ("n", "sum")})
    collected = salted.to_pandas()
    if collected.empty and key not in collected.columns:
        # zero-row input: schema-less all-empty collect
        return pd.DataFrame({key: pd.Series([], dtype="object"),
                             "count": pd.Series([], dtype="int64")})
    final = collected.groupby(key, as_index=False)["n"].sum()
    final["n"] = final["n"].astype("int64")
    return final.rename(columns={"n": "count"})


def _bucket_of(batch: pa.Table, keys: list[str], num_buckets: int) -> pa.Array:
    """Vectorized bucket id — delegates to ``bucketed._bucket_ids``
    (integer keys: multiplicative numpy hash; strings: pandas' cython
    siphash), never a Python loop per row. The assignment is an
    IN-RUN exchange tag only — nothing persisted is keyed by it (the
    persistent indexes and manifests use their own crc32/digest
    layouts), so the scheme can evolve freely."""
    from .bucketed import _bucket_ids
    return _bucket_ids(batch, list(keys), num_buckets)


def _arrow_schema(ds: rd.Dataset) -> pa.Schema:
    """Dataset schema as a pa.Schema (pandas-block datasets report
    numpy/python types — map them; object dtype means strings in this
    engine's frames)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            fields.append((name, t))
            continue
        try:
            fields.append((name, pa.from_numpy_dtype(t)))
        except (pa.ArrowNotImplementedError, TypeError):
            fields.append((name, pa.string()))
    return pa.schema(fields)


def _collect_arrow(ds: rd.Dataset) -> pa.Table:
    """Materialize a (small) dataset as ONE arrow table, exact types
    preserved. Zero-row blocks are dropped unless they're all there is
    (they can carry degenerate schemas); a dataset that materializes to
    no blocks at all yields a typed empty table."""
    blocks = ray.get(ds.to_arrow_refs())
    nonempty = [b for b in blocks if b.num_rows]
    use = nonempty if nonempty else blocks[:1]
    if not use:
        return _arrow_schema(ds).empty_table()
    return pa.concat_tables(use, promote_options="default")


#: how= -> pa.Table.join join_type (shared by both join plans so a
#: new mode can't silently diverge between them)
_JOIN_TYPE = {"inner": "inner", "left": "left outer",
              "right": "right outer", "outer": "full outer"}


def local_join_table(left: rd.Dataset, right: rd.Dataset,
                     on: str | Sequence[str], how: str = "inner",
                     suffixes: tuple[str, str] = ("", "_r"),
                     left_agg=None, post_merge=None) -> pa.Table:
    """The small-input join plan as a plain arrow table: collect both
    sides, complete ``left_agg`` globally, one ``pa.Table.join``.
    hash_bucket_join(mode='local') wraps this in a Dataset for API
    parity; call this directly when the caller consumes the (small)
    result in-process anyway — wrapping and re-collecting costs an
    extra object-store round trip for nothing."""
    keys = _key_cols(on)
    join_type = _JOIN_TYPE[how]
    lf = _collect_arrow(left)
    rf = _collect_arrow(right)
    if left_agg is not None:
        lf = left_agg(lf)
    out = lf.join(rf, keys=keys, join_type=join_type,
                  left_suffix=suffixes[0], right_suffix=suffixes[1])
    if post_merge is not None:
        out = post_merge(out)
    return out


def hash_bucket_join(left: rd.Dataset, right: rd.Dataset,
                     on: str | Sequence[str], num_buckets: int = 32,
                     how: str = "inner",
                     suffixes: tuple[str, str] = ("", "_r"),
                     left_agg=None, post_merge=None,
                     mode: str = "distributed") -> rd.Dataset:
    """Partitioned hash join: one shuffle, pairwise merge per bucket.

    ``mode='local'`` is the small-input plan (the caller picks it when
    it KNOWS both sides are small, e.g. from the input parquet
    metadata): both sides — usually per-batch pre-aggregates, not raw
    rows — collect to one arrow table each, ``left_agg`` completes
    globally, and one ``pa.Table.join`` runs in-process. Identical
    results (every per-key aggregate is distributive and exact-integer;
    join semantics are the same C++ kernel), pinned by test; it exists
    because Ray's sort-shuffle costs seconds of fixed driver time that
    swamps sub-128MB joins. The distributed plan below is the default.

    Both inputs gain ``__bucket`` and a provenance tag, are unioned (the
    union is free — no data movement), shuffled once by
    ``groupby(__bucket)``, and each group is split back into its two
    sides and pandas-merged. For right/left outer joins the unmatched
    side keeps NaNs per pandas semantics.

    ``left_agg(df) -> df`` runs on the left frame INSIDE each bucket
    task before the merge: because every join key lands wholly in one
    bucket, a per-key aggregation here is COMPLETE — feeding per-batch
    partials into the join and finishing them in the bucket saves the
    pre-join global groupby shuffle entirely. ``post_merge(df) -> df``
    runs on the merged frame in the same task (e.g. a partial
    re-aggregation by a different key before the next small shuffle).
    """
    keys = _key_cols(on)

    if mode == "local":
        return rd.from_arrow(local_join_table(
            left, right, on, how=how, suffixes=suffixes,
            left_agg=left_agg, post_merge=post_merge))

    # pad both sides to a shared schema (nulls for the other side's
    # columns) so the union's blocks concatenate cleanly in the shuffle
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    union_fields = list(lschema)
    seen = {f.name for f in lschema}
    for f in rschema:
        if f.name not in seen:
            union_fields.append(f)
    union_schema = pa.schema(union_fields)

    def _tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            cols = []
            for f in union_schema:
                if f.name in batch.schema.names:
                    cols.append(batch[f.name].cast(f.type))
                else:
                    cols.append(pa.nulls(batch.num_rows, f.type))
            b = pa.Table.from_arrays(cols, schema=union_schema)
            b = b.append_column(
                "__bucket", _bucket_of(batch, keys, num_buckets))
            return b.append_column("__side", pa.array([side] * batch.num_rows))
        return fn

    lt = left.map_batches(_tag("l"), batch_format="pyarrow")
    rt = right.map_batches(_tag("r"), batch_format="pyarrow")

    lnames = list(lschema.names)
    rnames = list(rschema.names)
    join_type = _JOIN_TYPE[how]

    # the whole merge stays in ARROW: splitting sides by filter keeps
    # each side's own columns null-free (so no int64->float64 dtype
    # decay), pa.Table.join is the C++ hash join, and the emitted
    # blocks are Arrow — pandas blocks from map_groups sent every
    # downstream shuffle through Ray's slow pandas sort path (measured
    # 10x on the q10 post-join groupby). Typed empties throughout (no
    # schema-less blocks).
    def _merge_group(g: pa.Table) -> pa.Table:
        # coerce to the planned tagged schema: Ray never applies UDFs
        # to EMPTY blocks, so zero-column empties from an upstream
        # shuffle's empty reduce partitions sail through _tag untyped;
        # schema unification then NULL-types any column a one-sided
        # bucket only saw as padding, and acero rejects null-typed join
        # fields. Casting per field is value-safe: a column with real
        # values always unifies to its real type, never to null.
        tagged = pa.schema(list(union_schema)
                           + [pa.field("__side", pa.string())])
        cols = []
        for f in tagged:
            if (f.name in g.schema.names
                    and not pa.types.is_null(g[f.name].type)):
                cols.append(g[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(g.num_rows, f.type))
        g = pa.Table.from_arrays(cols, schema=tagged)
        lmask = pc.equal(g["__side"], "l")
        lf = g.filter(lmask).select(lnames)
        rf = g.filter(pc.invert(lmask)).select(rnames)
        if left_agg is not None:
            # run on EMPTY left frames too: an aggregation typically
            # changes the column set, and a right-only bucket must emit
            # the same (aggregated) schema as every other bucket
            lf = left_agg(lf)
        out = lf.join(rf, keys=keys, join_type=join_type,
                      left_suffix=suffixes[0], right_suffix=suffixes[1])
        if post_merge is not None:
            out = post_merge(out)
        return out

    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(_merge_group,
                                               batch_format="pyarrow")


def hash_bucket_semi(left: rd.Dataset, right: rd.Dataset,
                     on: str, num_buckets: int = 32,
                     anti: bool = False,
                     left_unique: bool = False) -> rd.Dataset:
    """Exact bucketed semi (``anti=True``: anti) filter: keep left rows
    whose key appears (does not appear) in ``right`` — WITHOUT a join.

    ``left_unique=True`` additionally DEDUPES the left side by ``on``
    (keep-first) in the same exchange — per block before the shuffle
    (a combiner: duplicate keys never ship) and per bucket after it
    (the key lands wholly in one bucket, so the fold is complete).
    This fuses a ``bucketed_distinct`` + semi pair into ONE exchange
    (round-4 verdict #4: the harmonic-BFS per-round pattern); only
    valid when the caller doesn't care which duplicate row survives
    (e.g. the non-key columns are determined by the key).

    Exists because the bucket JOIN's acero merge rejects nested
    non-key payload (list/struct columns — e.g. the full extraction
    layout), and a semi filter doesn't need a merge at all: both sides
    take the one key-hash exchange, and each bucket task filters its
    left rows with ``is_in`` over the bucket's right keys — any left
    schema passes through untouched, left rows are never duplicated
    by right-side multiplicity, and the filter is exact (the Bloom
    variant ``bloom_semi_filter`` trades false positives for no
    shuffle on the left). Single key column; right is projected to
    the key before the exchange."""
    left_schema = _arrow_schema(left)
    if on not in left_schema.names:
        raise ValueError(f"left has no column {on!r}")
    key_type = left_schema.field(on).type

    def _dedup_by_key(t: pa.Table) -> pa.Table:
        import numpy as np
        k = t[on].to_numpy(zero_copy_only=False)
        _, idx = np.unique(k, return_index=True)
        if len(idx) == t.num_rows:
            return t
        return t.take(pa.array(np.sort(idx)))

    def tag_left(batch: pa.Table) -> pa.Table:
        if left_unique:
            batch = _dedup_by_key(batch)
        return (batch.replace_schema_metadata(None)
                .append_column("__bucket",
                               _bucket_of(batch, [on], num_buckets))
                .append_column("__side",
                               pa.array(["l"] * batch.num_rows)))

    def tag_right(batch: pa.Table) -> pa.Table:
        # right-side rows carry ONLY the key, deduped per block (the
        # filter is set membership, so multiplicity is pure exchange
        # weight — a 10:1 fact-side fan drops 10x of shuffle volume
        # here), padded to the left's column set with nulls so the
        # union's blocks unify
        keys = pc.unique(batch[on].cast(key_type))
        kb = pa.table({on: keys})
        cols = [kb[on] if f.name == on else pa.nulls(len(keys), f.type)
                for f in left_schema]
        b = pa.Table.from_arrays(cols, schema=left_schema)
        return (b.append_column("__bucket",
                                _bucket_of(kb, [on], num_buckets))
                .append_column("__side",
                               pa.array(["r"] * len(keys))))

    def per_bucket(g: pa.Table) -> pa.Table:
        if "__side" not in g.schema.names or g.num_rows == 0:
            # untyped empty reduce partitions (the _merge_group caveat)
            return left_schema.empty_table()
        rmask = pc.equal(g["__side"], "r")
        wanted = g.filter(rmask)[on]
        lf = g.filter(pc.invert(rmask)).drop_columns(
            ["__bucket", "__side"])
        if left_unique:
            # complete: the key lands wholly in this bucket
            lf = _dedup_by_key(lf)
        if len(wanted) == 0:
            keep = pa.array([anti] * lf.num_rows, pa.bool_())
        else:
            keep = pc.fill_null(
                pc.is_in(lf[on], value_set=wanted.combine_chunks()),
                False)
            if anti:
                keep = pc.invert(keep)
        return lf.filter(keep)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    return lt.union(rt).groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow")
