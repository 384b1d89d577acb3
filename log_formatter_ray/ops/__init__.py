"""Large-scale training-data operators (beyond the reference's surface).

The reference is a per-doc log formatter; a 100 TB token pipeline also needs
corpus-level operators: deduplication, similarity search, text analysis,
multimodal decode plumbing, and windowed event aggregation.  Everything here
follows the same Ray Data discipline as the stages: vectorized Arrow/numpy
kernels inside ``map_batches``, actor pools for stages with state (hash
matrices, centroids, broadcast query sets), partial aggregation before any
shuffle, and no full materialization of big data.
"""
