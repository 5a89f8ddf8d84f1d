"""Terminology CSV → Solr synonym rules (reference parse_synonyms.py
parity) — golden transform tests, a differential run against the
actual reference script when present, and the full round-trip into the
synonym analyzer."""

import csv
import io
import os
import subprocess
import sys

import pytest

from icat_lucene_ray.analysis.terminology import (
    csv_to_solr_synonyms, terminology_to_synonym_lines,
)

CSV_TEXT = """\
ID,Label,Alt Label 1,Alt Label 2,Parent IRI,Equivalent
1,technique,,,,
2,spectroscopy,spectral analysis,,technique,
3,raman spectroscopy,raman,,spectroscopy,
4,xray diffraction,xrd,x-ray diffraction,technique,
5,probe,,,,measurement
6,measurement,,,,
not-an-id,skip me,,,,
7,neutron probe,,,probe,
"""


def _rows():
    return csv.reader(io.StringIO(CSV_TEXT))


def test_alternatives_only_depth0():
    lines = terminology_to_synonym_lines(_rows(), max_child_depth=0)
    assert "spectral analysis, spectroscopy => spectral analysis, spectroscopy" in lines
    assert "raman, raman spectroscopy => raman, raman spectroscopy" in lines
    assert ("x-ray diffraction, xray diffraction, xrd => "
            "x-ray diffraction, xray diffraction, xrd") in lines
    # no children injected, so childless/alternative-less rows emit nothing
    assert not any(line.startswith("technique") for line in lines)


def test_child_injection_depth1_and_unlimited():
    lines1 = terminology_to_synonym_lines(_rows(), max_child_depth=1)
    # direct children only at depth 1
    tech1 = next(line for line in lines1 if line.startswith("technique"))
    assert "spectroscopy" in tech1 and "raman spectroscopy" not in tech1
    # equivalent labels share children: probe ~ measurement
    meas = next(line for line in lines1 if line.startswith("measurement"))
    assert "neutron probe" in meas

    lines_all = terminology_to_synonym_lines(_rows(), max_child_depth=-1)
    tech_all = next(line for line in lines_all if line.startswith("technique"))
    assert "raman spectroscopy" in tech_all and "raman" not in \
        tech_all.split(" => ")[0]


def test_cyclic_parents_terminate():
    rows = csv.reader(io.StringIO(
        "ID,Label,Alt Label,Parent IRI\n"
        "1,a,aa,b\n2,b,,a\n"))
    lines = terminology_to_synonym_lines(rows, max_child_depth=-1)
    a = next(line for line in lines if line.startswith("a,"))
    assert "b" in a.split(" => ")[1]


def test_duplicate_label_raises():
    rows = csv.reader(io.StringIO("ID,Label\n1,x\n2,x\n"))
    with pytest.raises(ValueError, match="duplicate"):
        terminology_to_synonym_lines(rows)


REF_SCRIPT = "/root/reference/src/main/scripts/parse_synonyms.py"


@pytest.mark.skipif(not os.path.exists(REF_SCRIPT),
                    reason="reference script not available")
@pytest.mark.parametrize("depth", [0, 1, 2, -1])
def test_differential_vs_reference_script(tmp_path, depth):
    """Rule-set identity with the actual reference utility across
    depths (order-insensitive: the reference emits dict order, ours
    emits dict order too, but we compare as sets to stay robust)."""
    src = tmp_path / "term.csv"
    src.write_text(CSV_TEXT)
    ref_out = tmp_path / "ref.txt"
    subprocess.run(
        [sys.executable, REF_SCRIPT, str(src), str(ref_out), "w",
         str(depth)],
        check=True, capture_output=True)
    ours = set(terminology_to_synonym_lines(
        csv.reader(io.StringIO(CSV_TEXT)), max_child_depth=depth))
    theirs = {line for line in ref_out.read_text().splitlines() if line}
    assert ours == theirs


def test_roundtrip_into_analyzer(tmp_path):
    """CSV → rules file → parse_solr_synonyms → golden tokens: a doc
    mentioning 'xrd' analyzes to the same class as 'xray diffraction'."""
    src = tmp_path / "term.csv"
    src.write_text(CSV_TEXT)
    out = tmp_path / "synonyms.txt"
    n = csv_to_solr_synonyms(str(src), str(out), mode="w",
                             max_child_depth=0)
    assert n == len(out.read_text().splitlines())

    from icat_lucene_ray.analysis.analyzer import IcatSynonymAnalyzer

    an = IcatSynonymAnalyzer(synonym_lines=out.read_text().splitlines())
    # both surface forms of the equivalence class share stems: 'xrd'
    # expands to the class, overlapping the multi-token form's stems
    xrd = set(an.tokens("xrd"))
    full = set(an.tokens("xray diffraction"))
    assert xrd & full, (xrd, full)
    assert "xrd" in xrd


def test_cli_verb(tmp_path):
    src = tmp_path / "term.csv"
    src.write_text(CSV_TEXT)
    out = tmp_path / "syn.txt"
    from icat_lucene_ray.__main__ import main

    main(["synonyms", "--input", str(src), "--out", str(out),
          "--overwrite", "--max-child-depth", "1"])
    text = out.read_text()
    assert "=>" in text
    # default mode appends (regeneration keeps hand-written rules)
    main(["synonyms", "--input", str(src), "--out", str(out),
          "--max-child-depth", "1"])
    assert out.read_text() == text + text
