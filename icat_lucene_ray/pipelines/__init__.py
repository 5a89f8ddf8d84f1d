from icat_lucene_ray.pipelines.flagship import (  # noqa: F401
    flagship, get_cached_index, get_cached_multifield_index,
    get_cached_positional_index,
)
