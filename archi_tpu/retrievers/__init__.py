from archi_tpu.retrievers.base import BaseRetriever
from archi_tpu.retrievers.semantic import SemanticRetriever
from archi_tpu.retrievers.hybrid import HybridRetriever
from archi_tpu.retrievers.grading import GradingRetriever

__all__ = [
    "BaseRetriever", "SemanticRetriever", "HybridRetriever",
    "GradingRetriever",
]
