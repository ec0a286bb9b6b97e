"""archi_tpu — TPU-native RAG framework (archi-class).

Rebuilds archi-physics/archi's capabilities with a JAX/XLA/Pallas retrieval
core: jitted embedding inference, a sharded device-array vector index with a
fused matmul+top-k Pallas kernel, device-resident BM25, and archi-compatible
retriever/pipeline/provider/orchestration layers above it.

Public facade mirrors the reference's ``archi`` class
(``src/archi/archi.py:9``).  Imports are lazy so kernel-only users don't pay
for the service stack.
"""

from archi_tpu.version import __version__

__all__ = [
    "__version__",
    # orchestration
    "Archi", "PipelineOutput",
    # engine
    "FlatIndex", "ShardedFlatIndex", "IVFIndex", "ShardedIVFIndex",
    "PQCodec", "PQFlatIndex", "IVFPQIndex", "ShardedIVFPQIndex",
    "HostVectorStore", "AnnFlatIndex", "SegmentedFlatIndex",
    "MicroBatcher",
    "TpuVectorStore",
    "BM25Index", "MaxSimReranker",
    # models
    "JaxEmbedder", "BertConfig",
    # retrievers
    "SemanticRetriever", "HybridRetriever", "GradingRetriever",
    "RerankingRetriever",
    # data
    "DataManager", "CatalogService",
    # services
    "build_context",
]

_LAZY = {
    "Archi": "archi_tpu.orchestrator.archi",
    "PipelineOutput": "archi_tpu.orchestrator.output",
    "FlatIndex": "archi_tpu.engine.flat_index",
    "ShardedFlatIndex": "archi_tpu.engine.sharded_index",
    "IVFIndex": "archi_tpu.engine.ivf_index",
    "ShardedIVFIndex": "archi_tpu.engine.sharded_ivf",
    "TpuVectorStore": "archi_tpu.engine.vectorstore",
    "PQCodec": "archi_tpu.engine.pq",
    "PQFlatIndex": "archi_tpu.engine.pq",
    "IVFPQIndex": "archi_tpu.engine.ivfpq_index",
    "ShardedIVFPQIndex": "archi_tpu.engine.sharded_ivfpq",
    "HostVectorStore": "archi_tpu.engine.host_store",
    "AnnFlatIndex": "archi_tpu.engine.ann_index",
    "SegmentedFlatIndex": "archi_tpu.engine.segmented_index",
    "MicroBatcher": "archi_tpu.engine.batcher",
    "BM25Index": "archi_tpu.engine.bm25",
    "MaxSimReranker": "archi_tpu.engine.reranker",
    "RerankingRetriever": "archi_tpu.engine.reranker",
    "JaxEmbedder": "archi_tpu.models.embedder",
    "BertConfig": "archi_tpu.models.bert",
    "SemanticRetriever": "archi_tpu.retrievers.semantic",
    "HybridRetriever": "archi_tpu.retrievers.hybrid",
    "GradingRetriever": "archi_tpu.retrievers.grading",
    "DataManager": "archi_tpu.data.data_manager",
    "CatalogService": "archi_tpu.data.catalog",
    "build_context": "archi_tpu.bin.bootstrap",
}


def __getattr__(name):
    module = _LAZY.get(name)
    if module is None:
        raise AttributeError(name)
    import importlib

    return getattr(importlib.import_module(module), name)
