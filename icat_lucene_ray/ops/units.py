"""Unit conversion to SI (M7) — the reference's ``convertUnits`` /
``convertValue`` normalizer (``Lucene.java:1650-1692``): when a row
carries a units string, its numeric value columns gain ``{col}SI``
companions converted to SI, plus a ``type_unitsSI`` label — queries can
then range-filter on the SI columns regardless of recorded units.

The unit table uses the reference's ``run.properties`` DSL
(``run.properties:12``): ``SI: alias factor?, alias2 ...; SI2: ...`` —
each alias converts by multiplication (factor defaults to 1). Affine
units (celsius → kelvin) carry an offset, which the reference delegates
to the indriya library; here the offset is part of the parsed table.
Unknown units leave the SI columns null (the reference simply skips the
SI fields), so downstream filters exclude those rows naturally.

Vectorized: the units column is dictionary-encoded once per batch;
factor/offset arrays are gathered by code — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: mirrors the reference's shipped grammar (run.properties:12) with the
#: celsius offset made explicit
DEFAULT_UNITS_SPEC = "J: eV 1.602176634e-19; K: celsius 1 273.15, degC 1 273.15; K: kelvin"


def parse_units_spec(spec: str) -> dict[str, tuple[str, float, float]]:
    """``"SI: alias factor? offset?, ..."`` -> {alias: (si, factor,
    offset)} with value_SI = value * factor + offset. The SI unit itself
    is always accepted as its own alias (factor 1)."""
    out: dict[str, tuple[str, float, float]] = {}
    for group in spec.split(";"):
        group = group.strip()
        if not group or ":" not in group:
            continue
        si, rest = group.split(":", 1)
        si = si.strip()
        out.setdefault(si.lower(), (si, 1.0, 0.0))
        for entry in rest.split(","):
            toks = entry.split()
            if not toks:
                continue
            alias = toks[0]
            factor = float(toks[1]) if len(toks) > 1 else 1.0
            offset = float(toks[2]) if len(toks) > 2 else 0.0
            out[alias.lower()] = (si, factor, offset)
    return out


class UnitConverter:
    """map_batches stage: adds ``{col}SI`` float64 columns + a
    ``type_unitsSI`` string column (null where the unit is unknown)."""

    def __init__(self, value_cols: list[str], unit_col: str = "type_units",
                 spec: str = DEFAULT_UNITS_SPEC):
        self.value_cols = list(value_cols)
        self.unit_col = unit_col
        self.table = parse_units_spec(spec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        units = batch[self.unit_col]
        if isinstance(units, pa.ChunkedArray):
            units = units.combine_chunks()
        enc = pc.utf8_lower(pc.coalesce(units, "")).dictionary_encode()
        dictionary = enc.dictionary.to_pylist()
        si = np.array([self.table.get(u, (None, np.nan, np.nan))[0]
                       for u in dictionary], dtype=object)
        factor = np.array([self.table.get(u, (None, np.nan, np.nan))[1]
                           for u in dictionary])
        offset = np.array([self.table.get(u, (None, np.nan, np.nan))[2]
                           for u in dictionary])
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        f = factor[codes]
        o = offset[codes]
        known = ~np.isnan(f)
        out = batch
        for c in self.value_cols:
            v = batch[c].cast(pa.float64()).to_numpy(zero_copy_only=False)
            si_vals = v * f + o
            out = out.append_column(
                f"{c}SI", pa.array(si_vals, pa.float64(),
                                   mask=~known | np.isnan(v)))
        # vectorized label gather: take() with null indices yields nulls
        take = pc.if_else(
            pa.array(known), pa.array(codes, pa.int64()),
            pa.nulls(len(codes), pa.int64()))
        labels = pa.array(list(si), pa.string()).take(take)
        out = out.append_column("type_unitsSI", labels)
        return out
