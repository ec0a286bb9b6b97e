"""RemoteVectorStore: the engine's query surface over HTTP.

In the reference, all services share one Postgres+pgvector instance, so any
process can query the vector plane.  Here the TPU index is process-resident:
ONE process (the data-manager service) owns the device arrays and exposes
query endpoints (``archi_tpu/web/data_app.py`` /api/query/*); other services
(chat, grader, bots) query through this client, which implements the same
retriever-facing surface as ``TpuVectorStore`` (hybrid_search /
similarity_search_with_score / count).  Query embedding happens server-side
on the TPU.  Writes go through the data-manager's ingestion API, not here.
"""

from __future__ import annotations

from typing import Optional, Sequence

from archi_tpu.utils.documents import Document


class RemoteVectorStore:
    def __init__(self, base_url: str, *, timeout: float = 600.0,
                 auth_token: Optional[str] = None):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._headers = {"x-data-token": auth_token} if auth_token else {}

    def _post(self, path: str, payload: dict):
        import requests

        r = requests.post(f"{self.base_url}{path}", json=payload,
                          headers=self._headers, timeout=self.timeout)
        r.raise_for_status()
        return r.json()

    @staticmethod
    def _to_results(data) -> list[tuple[Document, float]]:
        return [
            (Document(page_content=d["page_content"],
                      metadata=d.get("metadata") or {}),
             float(d.get("score", 0.0)))
            for d in data
        ]

    # ------------------------------------------------------ query interface
    def hybrid_search(self, query: str, k: int = 4, *,
                      semantic_weight: float = 0.7, bm25_weight: float = 0.3,
                      filter: Optional[dict] = None,
                      enabled_ids: Optional[set] = None):
        data = self._post("/api/query/hybrid", {
            "query": query, "k": k,
            "semantic_weight": semantic_weight,
            "bm25_weight": bm25_weight,
            "filter": filter,
            "enabled_ids": sorted(enabled_ids) if enabled_ids else None,
        })
        return self._to_results(data)

    def similarity_search_with_score(self, query: str, k: int = 4, *,
                                     filter: Optional[dict] = None,
                                     enabled_ids: Optional[set] = None):
        data = self._post("/api/query/semantic", {
            "query": query, "k": k, "filter": filter,
            "enabled_ids": sorted(enabled_ids) if enabled_ids else None,
        })
        return self._to_results(data)

    def similarity_search(self, query: str, k: int = 4, **kw):
        return [d for d, _s in
                self.similarity_search_with_score(query, k, **kw)]

    def count(self) -> int:
        import requests

        r = requests.get(f"{self.base_url}/api/query/count",
                         headers=self._headers, timeout=self.timeout)
        r.raise_for_status()
        return int(r.json()["count"])

    def warmup(self) -> None:
        try:
            self.count()
        except Exception:
            pass

    # writes are the data-manager's job
    def add_texts(self, texts: Sequence[str], *a, **kw):
        raise NotImplementedError(
            "RemoteVectorStore is read-only; ingest via the data-manager API"
        )

    def delete(self, *a, **kw):
        raise NotImplementedError(
            "RemoteVectorStore is read-only; delete via the data-manager API"
        )
