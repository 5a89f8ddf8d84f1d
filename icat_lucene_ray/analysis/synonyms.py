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

Limitations vs Lucene's SynonymGraphFilter: only single-token rule
entries are supported (multi-token entries are skipped); this matches
every rule the reference actually ships.
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
    """Parse Solr-format synonym rules into ``token -> expansion tuple``.

    ``analyze_entry`` runs the base analysis chain over each rule entry
    (mirrors SolrSynonymParser feeding entries through IcatAnalyzer).
    Supports ``a, b, c`` equivalence classes (expand) and ``a, b => c``
    mappings. Multi-token analyzed entries are skipped.
    """

    def one_token(entry: str) -> str | None:
        toks = analyze_entry(entry.strip())
        return toks[0] if len(toks) == 1 else None

    out: dict[str, set[str]] = {}
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            targets = [t for t in (one_token(e) for e in rhs.split(",")) if t]
            for e in lhs.split(","):
                src = one_token(e)
                if src:
                    out.setdefault(src, set()).update(targets)
        else:
            cls = [t for t in (one_token(e) for e in line.split(",")) if t]
            for src in cls:
                out.setdefault(src, set()).update(cls)
    # deterministic ordering: self first, then sorted others
    final: dict[str, tuple[str, ...]] = {}
    for src, targets in out.items():
        rest = sorted(t for t in targets if t != src)
        final[src] = (src, *rest) if src in targets else tuple(rest)
    return final
