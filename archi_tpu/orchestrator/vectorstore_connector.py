"""VectorstoreConnector: builds the embedding model + vectorstore handle.

Mirrors the reference's ``VectorstoreConnector``
(``src/archi/utils/vectorstore_connector.py:9-81``): resolves the embedding
model from the config's ``embedding_class_map`` equivalent and returns a
vectorstore per request.  Here the store is process-resident (the TPU index
is stateful), so "per request" returns the shared store, refreshed with
per-conversation enablement by callers.
"""

from __future__ import annotations

from typing import Any, Optional

from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.models.registry import resolve_embedder


class VectorstoreConnector:
    def __init__(self, config: dict[str, Any] | None = None,
                 vectorstore: Optional[TpuVectorStore] = None):
        self.config = config or {}
        dm = self.config.get("data_manager", {})
        if vectorstore is not None:
            self._store = vectorstore
        else:
            embedder = resolve_embedder(dm)
            self._store = TpuVectorStore(
                embedder,
                collection_name=dm.get("collection_name", "default"),
            )

    def get_vectorstore(self) -> TpuVectorStore:
        return self._store
