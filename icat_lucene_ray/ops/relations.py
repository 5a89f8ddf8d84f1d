"""Relationship denormalization — the reference's write-time join fan-out.

``updateByRelation`` (``Lucene.java:1846-1939``; relationship table
``DocumentMapping.java:66-118``) propagates a parent-entity change into
every child document: find children via the joining field, rewrite the
mapped fields, paginating 10,000 docs at a time; ``cascadeDelete``
optionally deletes the children instead.

Ray-Data-first mapping: the parent side of each relationship is small
(it is one changed entity's rows), so it is broadcast — ``ray.put`` once,
every ``map_batches`` task reads the same plasma object — and the child
table streams through a vectorized hash join; no shuffle at any size of
the child side. The reference's 10k pagination is replaced by Ray's
block streaming (its purpose — bounded memory — is the default here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def update_by_relation(
    children: ray.data.Dataset,
    parents: pa.Table,
    *,
    child_key: str,
    parent_key: str,
    field_mapping: dict[str, str],
) -> ray.data.Dataset:
    """Rewrite child rows with fields from their (changed) parents.

    ``field_mapping``: {parent_column -> child_output_column}. Children
    with no matching parent keep null in the mapped columns (same as the
    reference writing an absent field). The parent table is broadcast
    via ``ray.put``; the join inside each batch is a vectorized
    searchsorted lookup.
    """
    order = pc.sort_indices(parents[parent_key])
    parents_sorted = parents.take(order)
    pref = ray.put(parents_sorted)

    def join_batch(batch: pa.Table, *, pref=pref) -> pa.Table:
        p = ray.get(pref) if isinstance(pref, ray.ObjectRef) else pref
        pkeys = p[parent_key].to_numpy(zero_copy_only=False)
        ckeys = batch[child_key].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pkeys, ckeys)
        pos_c = np.minimum(pos, len(pkeys) - 1) if len(pkeys) else pos
        hit = (pkeys[pos_c] == ckeys) if len(pkeys) else \
            np.zeros(len(ckeys), bool)
        out = batch
        idx = pa.array(np.where(hit, pos_c, 0))
        valid = pa.array(hit)
        for pcol, ccol in field_mapping.items():
            vals = p[pcol].take(idx)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            vals = pc.if_else(valid, vals, pa.scalar(None, vals.type))
            if ccol in out.column_names:
                out = out.set_column(
                    out.schema.get_field_index(ccol), ccol, vals)
            else:
                out = out.append_column(ccol, vals)
        return out

    return children.map_batches(join_batch, batch_format="pyarrow")


def cascade_delete(
    children: ray.data.Dataset,
    deleted_parent_keys: pa.Array | list,
    *,
    child_key: str,
) -> ray.data.Dataset:
    """Drop children whose parent was deleted (``cascadeDelete=True``,
    ``Lucene.java:1901-1913``): a broadcast anti-join mask."""
    keys = pa.array(deleted_parent_keys) \
        if not isinstance(deleted_parent_keys, pa.Array) else deleted_parent_keys
    kref = ray.put(keys)

    def keep_batch(batch: pa.Table, *, kref=kref) -> pa.Table:
        ks = ray.get(kref) if isinstance(kref, ray.ObjectRef) else kref
        mask = pc.invert(pc.is_in(batch[child_key], value_set=ks))
        return batch.filter(mask)

    return children.map_batches(keep_batch, batch_format="pyarrow")
