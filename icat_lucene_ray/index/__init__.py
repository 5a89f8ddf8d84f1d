from icat_lucene_ray.index.codec import (  # noqa: F401
    encode_u64_blocks,
    decode_u64_blocks,
    encode_postings,
    decode_postings,
)
from icat_lucene_ray.index.build import build_index  # noqa: F401
from icat_lucene_ray.index.manifest import IndexManifest  # noqa: F401
