"""Retriever contract over the TPU vectorstore.

Mirrors the reference retrievers' LangChain ``BaseRetriever`` shape
(``src/data_manager/vectorstore/retrievers/``): ``invoke(query)`` returns
(Document, score) tuples (or bare Documents for the grading variant).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional

from archi_tpu.engine.vectorstore import TpuVectorStore


class BaseRetriever(ABC):
    def __init__(self, vectorstore: TpuVectorStore, *, k: int = 5,
                 metadata_filter: Optional[dict] = None,
                 enabled_ids: Optional[set] = None):
        self.vectorstore = vectorstore
        self.k = k
        self.metadata_filter = metadata_filter
        self.enabled_ids = enabled_ids

    @abstractmethod
    def _get_relevant_documents(self, query: str):
        ...

    def invoke(self, query: str):
        return self._get_relevant_documents(query)

    def __call__(self, query: str):
        return self.invoke(query)
