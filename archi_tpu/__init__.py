"""archi_tpu — TPU-native RAG framework (archi-class).

Rebuilds archi-physics/archi's capabilities with a JAX/XLA/Pallas retrieval
core: jitted embedding inference, a sharded device-array vector index with a
fused matmul+top-k Pallas kernel, device-resident BM25, and archi-compatible
retriever/pipeline/provider/orchestration layers above it.

Public facade mirrors the reference's ``archi`` class
(``src/archi/archi.py:9``).
"""

from archi_tpu.version import __version__

__all__ = ["__version__", "Archi"]


def __getattr__(name):
    # Lazy: importing the facade pulls in pipelines/providers; keep
    # `import archi_tpu` light for kernel-only users.
    if name == "Archi":
        from archi_tpu.orchestrator.archi import Archi

        return Archi
    raise AttributeError(name)
