"""PySpark-native entity-resolution (record-linkage) engine.

A from-scratch re-architecture of the capabilities of
``yalelibrary-metadata-services/entity_resolution_pipeline`` (reference read-only at
/root/reference) as idiomatic PySpark: DataFrames over parquet tables,
vectorized Arrow pandas UDFs, MinHash-LSH blocking, locally-computed
deterministic embeddings, iterative large-star/small-star connected
components, and manifest-based per-partition lineage/resume.

Nothing here is a port: the reference is a single-machine Python pipeline
(ProcessPoolExecutor + Weaviate + OpenAI); this engine expresses the same
semantics as distributed dataflow designed for 1000-executor clusters.
"""

__version__ = "0.1.0"
