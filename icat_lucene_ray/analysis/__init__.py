from icat_lucene_ray.analysis.analyzer import (  # noqa: F401
    IcatAnalyzer,
    IcatSynonymAnalyzer,
    SimpleAnalyzer,
    SeparatorAnalyzer,
    PathHierarchyAnalyzer,
    get_analyzer,
    SCIENTIFIC_STOP_WORDS,
)
from icat_lucene_ray.analysis.porter import porter_stem  # noqa: F401
