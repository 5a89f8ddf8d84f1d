"""Terminology-CSV → Solr synonym rules — parity with the reference's
``src/main/scripts/parse_synonyms.py`` utility (reimplemented from its
observable contract, not copied).

Input: a CSV export of an ontology / terminology table whose header row
names the columns — ``Label`` (the canonical term), any number of
columns containing ``Alt Label`` (alternative spellings), ``Parent
IRI`` (broader-term links, matched against other rows' labels) and
``Equivalent`` (cross-links between labels). Data rows are only
considered when their FIRST cell parses as an integer id (the
reference skips section-header rows this way).

Output: Solr mapping rules, one per label that has alternatives or
(injected) children::

    label, alt1, alt2 => label, alt1, alt2, child1, ...

so that searching any surface form of a term also matches documents
about its narrower terms — the "synonym injection" the reference's
``IcatSynonymAnalyzer`` consumes. ``max_child_depth`` bounds how many
generations of narrower terms are injected (0 = alternatives only,
negative = unlimited).

Semantics pinned to the reference script:

- a label is injected into its parents' child lists AND into each
  parent's *equivalent* labels' child lists, then recursively into
  grandparents (depth decremented per generation); unknown parents are
  skipped silently;
- equivalence is symmetrized first (A "Equivalent" B adds B→A) so both
  sides share children;
- left-hand side = sorted set {label + alternatives}; right-hand side
  adds the children; rows with neither alternatives nor children emit
  nothing.

One deliberate divergence: ancestor traversal tracks the best
remaining depth per label, so cyclic parent links terminate (the
reference would recurse forever); on acyclic data the output is
identical — dedup via sets matches its duplicate-append + set() at
output time, and the per-label depth bookkeeping preserves the
exhaustive recursion's reach on diamond-shaped hierarchies.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field


@dataclass
class _Entry:
    alternatives: list[str] = field(default_factory=list)
    parents: list[str] = field(default_factory=list)
    equivalent: list[str] = field(default_factory=list)
    children: set[str] = field(default_factory=set)


def _read_terminology(rows) -> dict[str, _Entry]:
    header = next(rows)
    label_i = None
    alt_is, parent_is, equiv_is = [], [], []
    for i, name in enumerate(header):
        name = name.strip()
        if name == "Label":
            label_i = i
        elif "Alt Label" in name:
            alt_is.append(i)
        elif name == "Parent IRI":
            parent_is.append(i)
        elif name == "Equivalent":
            equiv_is.append(i)
    if label_i is None:
        raise ValueError("terminology CSV has no 'Label' header column")

    entries: dict[str, _Entry] = {}
    for cells in rows:
        try:
            int(cells[0])
        except (ValueError, IndexError):
            continue  # rows without a numeric id are headers/sections
        # csv does not pad short rows: a truncated row with a numeric
        # id but no Label cell is malformed data, not an IndexError
        label = cells[label_i] if label_i < len(cells) else ""
        if not label:
            continue
        if label in entries:
            raise ValueError(f"duplicate terminology label {label!r}")
        e = _Entry()
        e.alternatives = [cells[i] for i in alt_is if i < len(cells)
                          and cells[i]]
        e.parents = [cells[i] for i in parent_is if i < len(cells)
                     and cells[i]]
        e.equivalent = [cells[i] for i in equiv_is if i < len(cells)
                        and cells[i]]
        entries[label] = e

    # symmetrize equivalence so both sides collect the same children
    for label, e in list(entries.items()):
        for eq in e.equivalent:
            if eq in entries and label not in entries[eq].equivalent:
                entries[eq].equivalent.append(label)
    return entries


def _inject_into_ancestors(entries: dict[str, _Entry], label: str,
                           parents: list[str], depth: int) -> None:
    """Add ``label`` as a child of each parent (and the parent's
    equivalents), then of grandparents, up to ``depth`` generations
    (negative = unlimited). Iterative worklist with a visited set —
    identical output to the reference's recursion on acyclic data,
    terminates on cycles."""
    # negative = unlimited; any simple ancestor path is <= |entries|
    # hops, so this cap changes nothing on acyclic data
    depth = len(entries) if depth < 0 else depth
    # best remaining depth seen per ancestor: re-visit only when a
    # SHORTER path grants more remaining generations (diamond DAGs),
    # matching the reference's exhaustive recursion without looping
    best: dict[str, int] = {}
    work = [(p, depth) for p in parents]
    while work:
        parent, d = work.pop()
        if d == 0 or parent not in entries or best.get(parent, -1) >= d:
            continue
        best[parent] = d
        pe = entries[parent]
        pe.children.add(label)
        for eq in pe.equivalent:
            if eq in entries:
                entries[eq].children.add(label)
        work.extend((gp, d - 1) for gp in pe.parents)


def terminology_to_synonym_lines(rows, max_child_depth: int = 0
                                 ) -> list[str]:
    """Core transform over an iterable of CSV rows (lists of cells).
    Returns Solr ``lhs => rhs`` rule lines (no trailing newline)."""
    entries = _read_terminology(rows)
    for label, e in entries.items():
        _inject_into_ancestors(entries, label, e.parents, max_child_depth)
    out: list[str] = []
    for label, e in entries.items():
        if not e.alternatives and not e.children:
            continue
        lhs = sorted(set([label] + e.alternatives))
        rhs = sorted(set([label] + e.alternatives) | e.children)
        out.append(", ".join(lhs) + " => " + ", ".join(rhs))
    return out


def csv_to_solr_synonyms(input_path: str, output_path: str, *,
                         mode: str = "a",
                         max_child_depth: int = 0) -> int:
    """File-level wrapper (the reference CLI's contract: default mode
    'a' appends so hand-written rules survive regeneration). Returns
    the number of rules written."""
    with open(input_path, newline="") as f:
        lines = terminology_to_synonym_lines(csv.reader(f),
                                             max_child_depth)
    with open(output_path, mode) as f:
        for line in lines:
            f.write(line + "\n")
    return len(lines)
