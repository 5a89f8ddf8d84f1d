"""Synonym support — Solr-format synonym rules applied post-stemming.

Mirrors the reference's ``IcatSynonymAnalyzer``
(``IcatSynonymAnalyzer.java:28-57``): a Solr-format synonym file is
parsed *through the base analyzer* (``SolrSynonymParser(true, true,
new IcatAnalyzer())``) so rule entries are themselves stemmed, and the
resulting map is applied as the last stage of the chain with
``expand=true`` (every member of an equivalence class emits the whole
class).

The reference ships a ``synonym.txt`` of chemical element names ↔
symbols plus alternate spellings (``src/main/resources/synonym.txt``).
That data is public knowledge (the periodic table); we regenerate it
programmatically in :func:`default_synonym_lines` rather than copying
the file.

Multi-token rule entries ("new york, ny") are supported with
bag-of-stems semantics (SynonymGraphFilter inserts the class's other
members as position-overlaid tokens; since our postings are positional
only behind a flag, insertion means extra term occurrences): matching a
multi-token sequence in the stream adds the class's other members'
stems; a single-token member adds the multi-token members' stems.
``parse_solr_synonyms`` returns both the single-token map and the
multi-token rules.
"""

from __future__ import annotations

from typing import Callable, Iterable

# Public periodic-table data: (name, symbol). Elements whose symbol
# collides with a stop word are exactly why the reference keeps
# As/At/Be/In/No out of its stop set (IcatAnalyzer.java:21-24).
_ELEMENTS = [
    ("Hydrogen", "H"), ("Helium", "He"), ("Lithium", "Li"), ("Beryllium", "Be"),
    ("Boron", "B"), ("Carbon", "C"), ("Nitrogen", "N"), ("Oxygen", "O"),
    ("Fluorine", "F"), ("Neon", "Ne"), ("Sodium", "Na"), ("Magnesium", "Mg"),
    ("Aluminum", "Al"), ("Silicon", "Si"), ("Phosphorus", "P"), ("Sulfur", "S"),
    ("Chlorine", "Cl"), ("Argon", "Ar"), ("Potassium", "K"), ("Calcium", "Ca"),
    ("Scandium", "Sc"), ("Titanium", "Ti"), ("Vanadium", "V"), ("Chromium", "Cr"),
    ("Manganese", "Mn"), ("Iron", "Fe"), ("Cobalt", "Co"), ("Nickel", "Ni"),
    ("Copper", "Cu"), ("Zinc", "Zn"), ("Gallium", "Ga"), ("Germanium", "Ge"),
    ("Arsenic", "As"), ("Selenium", "Se"), ("Bromine", "Br"), ("Krypton", "Kr"),
    ("Rubidium", "Rb"), ("Strontium", "Sr"), ("Yttrium", "Y"), ("Zirconium", "Zr"),
    ("Niobium", "Nb"), ("Molybdenum", "Mo"), ("Technetium", "Tc"), ("Ruthenium", "Ru"),
    ("Rhodium", "Rh"), ("Palladium", "Pd"), ("Silver", "Ag"), ("Cadmium", "Cd"),
    ("Indium", "In"), ("Tin", "Sn"), ("Antimony", "Sb"), ("Tellurium", "Te"),
    ("Iodine", "I"), ("Xenon", "Xe"), ("Caesium", "Cs"), ("Barium", "Ba"),
    ("Lanthanum", "La"), ("Cerium", "Ce"), ("Praseodymium", "Pr"), ("Neodymium", "Nd"),
    ("Promethium", "Pm"), ("Samarium", "Sm"), ("Europium", "Eu"), ("Gadolinium", "Gd"),
    ("Terbium", "Tb"), ("Dysprosium", "Dy"), ("Holmium", "Ho"), ("Erbium", "Er"),
    ("Thulium", "Tm"), ("Ytterbium", "Yb"), ("Lutetium", "Lu"), ("Hafnium", "Hf"),
    ("Tantalum", "Ta"), ("Tungsten", "W"), ("Rhenium", "Re"), ("Osmium", "Os"),
    ("Iridium", "Ir"), ("Platinum", "Pt"), ("Gold", "Au"), ("Mercury", "Hg"),
    ("Thallium", "Tl"), ("Lead", "Pb"), ("Bismuth", "Bi"), ("Polonium", "Po"),
    ("Astatine", "At"), ("Radon", "Rn"), ("Francium", "Fr"), ("Radium", "Ra"),
    ("Actinium", "Ac"), ("Thorium", "Th"), ("Protactinium", "Pa"), ("Uranium", "U"),
    ("Neptunium", "Np"), ("Plutonium", "Pu"), ("Americium", "Am"), ("Curium", "Cm"),
]

_ALTERNATES = [
    ["ionise", "ionize"],
    ["aluminium", "aluminum"],
    ["sulphur", "sulfur"],
    ["cesium", "caesium"],
]


def default_synonym_lines() -> list[str]:
    """Solr-format rule lines equivalent in spirit to the reference's
    ``synonym.txt`` (elements ↔ symbols, alternate spellings)."""
    lines = [", ".join(alts) for alts in _ALTERNATES]
    lines += [f"{name}, {sym}" for name, sym in _ELEMENTS]
    return lines


def parse_solr_synonyms(
    lines: Iterable[str], analyze_entry: Callable[[str], list[str]]
) -> dict[str, tuple[str, ...]]:
    """Single-token ``token -> expansion tuple`` map (back-compat view
    of :func:`parse_solr_synonyms_full`)."""
    return parse_solr_synonyms_full(lines, analyze_entry)[0]


def parse_solr_synonyms_full(
    lines: Iterable[str], analyze_entry: Callable[[str], list[str]]
) -> tuple[dict[str, tuple[str, ...]],
           list[tuple[tuple[str, ...], tuple[str, ...]]]]:
    """Parse Solr-format synonym rules.

    ``analyze_entry`` runs the base analysis chain over each rule entry
    (mirrors SolrSynonymParser feeding entries through IcatAnalyzer).
    Supports ``a, b, c`` equivalence classes (expand) and ``a, b => c``
    mappings, including MULTI-TOKEN entries.

    Returns ``(single_map, multi_rules)``:

    - ``single_map``: stem -> expansion tuple applied per token (the
      expansion includes flattened stems of any multi-token class
      members — bag-of-stems insertion);
    - ``multi_rules``: [(stem sequence to match in the stream, extra
      stems to ADD on a match)] — the matched original stems stay.
    """

    def entry_stems(entry: str) -> tuple[str, ...]:
        return tuple(analyze_entry(entry.strip()))

    # class id -> list of member stem tuples (len 1 = single token)
    classes: list[tuple[list[tuple[str, ...]], list[tuple[str, ...]]]] = []
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            srcs = [s for s in (entry_stems(e) for e in lhs.split(",")) if s]
            tgts = [t for t in (entry_stems(e) for e in rhs.split(",")) if t]
            classes.append((srcs, tgts))
        else:
            mem = [m for m in (entry_stems(e) for e in line.split(",")) if m]
            classes.append((mem, mem))  # expand=true: each maps to class

    single: dict[str, set[str]] = {}
    multi: dict[tuple[str, ...], set[str]] = {}
    for srcs, tgts in classes:
        for src in srcs:
            add: set[str] = set()
            for t in tgts:
                # equivalence classes skip self here and re-add below;
                # mapping rules keep a self-target ("a => a, b" must
                # still emit a — Solr keeps whatever the RHS lists)
                if srcs is not tgts or t != src:
                    add.update(t)  # multi-token targets flatten (bag)
            if len(src) == 1:
                s = src[0]
                if srcs is tgts:  # equivalence class keeps self
                    add.add(s)
                single.setdefault(s, set()).update(add)
            else:
                multi.setdefault(src, set()).update(add - set(src))
    final: dict[str, tuple[str, ...]] = {}
    for src, targets in single.items():
        rest = sorted(t for t in targets if t != src)
        final[src] = (src, *rest) if src in targets else tuple(rest)
    multi_rules = sorted(
        (seq, tuple(sorted(extra))) for seq, extra in multi.items() if extra)
    return final, multi_rules
