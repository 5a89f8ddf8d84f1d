from icat_lucene_ray.ops import (  # noqa: F401
    decontam, dedup, multimodal, relations, sampling, similarity, stats,
    text, units, web, windows)
