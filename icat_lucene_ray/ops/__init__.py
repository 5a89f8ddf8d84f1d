from icat_lucene_ray.ops import (  # noqa: F401
    decontam, dedup, multimodal, similarity, stats, text)
