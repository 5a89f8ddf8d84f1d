from icat_lucene_ray.ops import dedup, multimodal, similarity, text  # noqa: F401
