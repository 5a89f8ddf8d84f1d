from icat_lucene_ray.sources.ingest import (
    docs_dataset_from_jsonl,
    pages_dataset,
    read_modify_ops,
)

__all__ = ["read_modify_ops", "docs_dataset_from_jsonl", "pages_dataset"]
