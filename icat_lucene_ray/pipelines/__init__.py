from icat_lucene_ray.pipelines.flagship import flagship, get_cached_index  # noqa: F401
