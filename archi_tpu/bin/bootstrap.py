"""Service bootstrap: build the full stack from a config dict.

The analog of the reference's per-service entrypoints' shared setup
(``src/bin/service_*.py`` + ``src/utils/postgres_service_factory.py:17``
singleton): read secrets, open the app database, seed config, construct the
engine/data-manager/orchestrator, and return a context the service wires to
its HTTP app.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

if os.environ.get("ARCHI_TPU_FORCE_CPU"):
    # Dev/CI escape hatch: run the whole service stack on the host CPU
    # backend (UI smokes, machines without a chip).  Must happen before
    # any backend initialization; the machine's sitecustomize overrides
    # env vars, so set the config directly after importing jax.
    import jax

    jax.config.update("jax_platforms", "cpu")

from archi_tpu.config.manager import ConfigurationManager
from archi_tpu.config.service import ConfigService
from archi_tpu.data.catalog import CatalogService
from archi_tpu.data.data_manager import DataManager
from archi_tpu.data.scheduler import CronScheduler
from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.models.registry import resolve_embedder
from archi_tpu.providers.byok import BYOKResolver, BYOKStore
from archi_tpu.providers.registry import configure_providers
from archi_tpu.utils.app_db import AppDatabase
from archi_tpu.utils.conversation_service import ConversationService
from archi_tpu.utils.logging_utils import setup_logging
from archi_tpu.utils.prompt_service import PromptService
from archi_tpu.utils.trace_service import TraceService
from archi_tpu.utils.user_service import UserService


@dataclasses.dataclass
class ServiceContext:
    config: dict
    app_db: AppDatabase
    config_service: ConfigService
    users: UserService
    conversations: ConversationService
    traces: TraceService
    prompts: PromptService
    catalog: CatalogService
    vectorstore: TpuVectorStore
    data_manager: DataManager
    scheduler: CronScheduler
    byok_store: Optional[BYOKStore]
    byok_resolver: Optional[BYOKResolver]


def _build_index(dim: int, index_cfg: dict):
    """data_manager.index config → index instance.

    type: "flat" (default) | "sharded" (corpus rows over the device mesh,
    per-shard fused top-k + ICI merge) | "ivf" (ANN serving: IVF snapshot +
    exact fresh-row tail, engine/ann_index.py) | "ivfpq" (same serving
    shape with a PQ-compressed snapshot — 16x smaller, 100M-chunk scale;
    pq_m / pq_refine_m tune the code budget).  hot_tail: wrap appends in
    the segmented hot-tail path (docs/streaming_ingest.md).
    """
    kw = dict(dtype=index_cfg.get("dtype", "bfloat16"),
              tile_n=index_cfg.get("tile_n", 4096))
    index_type = index_cfg.get("type", "flat")
    if index_type == "sharded":
        from archi_tpu.engine.sharded_index import ShardedFlatIndex

        return ShardedFlatIndex(dim, **kw)
    if index_type == "ivfpq_xl_sharded":
        # pod-slice XL: one XlPQIndex per device, per-shard host memmap
        # rerank tier, global merge (engine/sharded_xl.py)
        from archi_tpu.engine.sharded_xl import ShardedXlPQIndex

        return ShardedXlPQIndex(
            dim,
            store_dir=index_cfg.get("store_dir"),
            nlist=index_cfg.get("nlist", 4096),
            block=index_cfg.get("block", 512),
            pq_m=index_cfg.get("pq_m", 48),
            pq_refine_m=index_cfg.get("pq_refine_m", 48),
            nprobe_blocks=index_cfg.get("nprobe_blocks") or 128,
            cell_gate=index_cfg.get("cell_gate"),
            block_rank_sub=index_cfg.get("block_rank_sub", 8),
            extract=index_cfg.get("extract", "auto"),
            hier_t=index_cfg.get("hier_t", 64),
            rerank_overfetch=index_cfg.get("rerank_overfetch", 16),
            min_snapshot_rows=index_cfg.get("min_snapshot_rows", 1 << 17),
            build_block_rows=index_cfg.get("build_block_rows", 1 << 17),
            **kw)
    if index_type == "ivfpq_xl":
        # beyond-HBM scale: host memmap full-precision plane + device
        # IVF-PQ snapshot + device exact fresh tail (engine/xl_index.py)
        from archi_tpu.engine.xl_index import XlPQIndex

        return XlPQIndex(
            dim,
            store_path=index_cfg.get("store_path"),
            nlist=index_cfg.get("nlist", 4096),
            block=index_cfg.get("block", 512),
            pq_m=index_cfg.get("pq_m", 48),
            pq_refine_m=index_cfg.get("pq_refine_m", 48),
            nprobe_blocks=index_cfg.get("nprobe_blocks") or 128,
            cell_gate=index_cfg.get("cell_gate"),
            block_rank_sub=index_cfg.get("block_rank_sub", 8),
            # stage-1 extraction: "hier" with hier_t >= the corpus's
            # near-duplicate cluster size cuts the high-probe device
            # step ~1.5x at identical recall (docs/pq_scale.md)
            extract=index_cfg.get("extract", "auto"),
            hier_t=index_cfg.get("hier_t", 64),
            rerank_overfetch=index_cfg.get("rerank_overfetch", 16),
            min_snapshot_rows=index_cfg.get("min_snapshot_rows", 1 << 17),
            async_refresh=index_cfg.get("async_refresh", True),
            **kw)
    if index_type in ("ivf", "ivfpq"):
        from archi_tpu.engine.ann_index import AnnFlatIndex

        return AnnFlatIndex(
            dim,
            nlist=index_cfg.get("nlist", 1024),
            nprobe=index_cfg.get("nprobe", 64),
            nprobe_blocks=index_cfg.get("nprobe_blocks"),
            cell_gate=index_cfg.get("cell_gate"),
            block_rank_sub=index_cfg.get("block_rank_sub", 8),
            min_snapshot_rows=index_cfg.get("min_snapshot_rows", 1 << 15),
            snapshot_kind=index_type,
            pq_m=index_cfg.get("pq_m", 48),
            pq_refine_m=index_cfg.get("pq_refine_m", 48),
            extract=index_cfg.get("extract", "auto"),
            hier_t=index_cfg.get("hier_t", 64),
            async_refresh=index_cfg.get("async_refresh", True),
            **kw)
    if index_cfg.get("hot_tail"):
        from archi_tpu.engine.segmented_index import SegmentedFlatIndex

        return SegmentedFlatIndex(
            dim, merge_rows=index_cfg.get("merge_rows", 1 << 16), **kw)
    from archi_tpu.engine.flat_index import FlatIndex

    return FlatIndex(dim, **kw)


def build_context(config_paths=(), overrides: Optional[dict] = None,
                  *, vectorstore: Optional[TpuVectorStore] = None
                  ) -> ServiceContext:
    cm = ConfigurationManager(config_paths, overrides)
    cm.validate()
    config = cm.config
    setup_logging(config.get("verbosity"))
    configure_providers(config.get("providers", {}))

    # persistent jit compilation cache: service restarts skip first-compile
    # (minutes through a remote-compile tunnel, tens of seconds otherwise)
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/archi_tpu_jax_cache"),
        )
    except Exception:
        pass

    dm_cfg = config["data_manager"]
    data_path = dm_cfg["data_path"]
    os.makedirs(data_path, exist_ok=True)

    from archi_tpu.utils.app_db_postgres import open_app_database

    # 'app_db' may be a SQLite path or a postgresql:// DSN
    app_db = open_app_database(
        config.get("app_db") or os.path.join(data_path, "app.db")
    )
    config_service = ConfigService(app_db)
    config_service.seed(config)

    catalog = CatalogService(dm_cfg["db_path"])
    checkpoint_dir = os.path.join(data_path, "engine_checkpoint")
    if vectorstore is None:
        embedder = resolve_embedder(dm_cfg)
        from archi_tpu.engine.bm25 import BM25Index

        stemming = bool((dm_cfg.get("stemming") or {}).get("enabled"))
        index_cfg = dm_cfg.get("index") or {}
        if os.path.isdir(checkpoint_dir):
            # restart-resume: reload embeddings instead of re-embedding the
            # corpus (the catalog diff-sync reconciles any drift after load)
            try:
                index_cls = None
                index_loader = None
                itype = index_cfg.get("type", "flat")
                if itype in ("ivf", "ivfpq"):
                    # restart keeps the configured ANN mode (and reuses the
                    # checkpointed snapshot sidecar when present, skipping
                    # the rebuild)
                    from archi_tpu.engine.ann_index import AnnFlatIndex

                    def index_loader(p, _cfg=index_cfg, _t=itype):
                        return AnnFlatIndex.load(
                            p,
                            nlist=_cfg.get("nlist", 1024),
                            nprobe=_cfg.get("nprobe", 64),
                            min_snapshot_rows=_cfg.get(
                                "min_snapshot_rows", 1 << 15),
                            snapshot_kind=_t,
                            pq_m=_cfg.get("pq_m", 48),
                            pq_refine_m=_cfg.get("pq_refine_m", 48),
                            async_refresh=_cfg.get("async_refresh", True))
                elif index_cfg.get("hot_tail"):
                    from archi_tpu.engine.segmented_index import (
                        SegmentedFlatIndex,
                    )

                    index_cls = SegmentedFlatIndex
                vectorstore = TpuVectorStore.load(
                    checkpoint_dir, embedder, index_cls=index_cls,
                    index_loader=index_loader)
            except Exception:
                vectorstore = None
        else:
            vectorstore = None
        if vectorstore is None:
            index = _build_index(embedder.dim, index_cfg)
            vectorstore = TpuVectorStore(
                embedder,
                index=index,
                bm25=BM25Index(stemming=stemming),
            )
    mb_cfg = (dm_cfg.get("serving") or {}).get("micro_batch") or {}
    if mb_cfg.get("enabled"):
        vectorstore.enable_micro_batching(
            max_batch=mb_cfg.get("max_batch", 32),
            max_wait_ms=mb_cfg.get("max_wait_ms", 4.0),
            workers=mb_cfg.get("workers", 2),
        )
    data_manager = DataManager(
        data_path=data_path,
        catalog=catalog,
        vectorstore=vectorstore,
        sources_config=dm_cfg.get("sources", {}),
        chunk_size=dm_cfg.get("chunk_size", 1000),
        chunk_overlap=dm_cfg.get("chunk_overlap", 0),
        parallel_workers=dm_cfg.get("parallel_workers", 32),
    )

    scheduler = CronScheduler()
    schedules = dm_cfg.get("schedules") or {}
    if schedules:
        scheduler.set_config_loader(
            lambda: config_service.get(
                "data_manager.schedules", schedules) or schedules,
            lambda name, spec: (lambda **kw: data_manager.run_ingestion()),
        )

    secret = os.environ.get("ARCHI_SECRET", "archi-tpu-dev-secret")
    byok_store = BYOKStore(os.path.join(data_path, "byok.db"), secret=secret)

    return ServiceContext(
        config=config,
        app_db=app_db,
        config_service=config_service,
        users=UserService(app_db),
        conversations=ConversationService(app_db),
        traces=TraceService(app_db),
        prompts=PromptService(app_db),
        catalog=catalog,
        vectorstore=vectorstore,
        data_manager=data_manager,
        scheduler=scheduler,
        byok_store=byok_store,
        byok_resolver=BYOKResolver(byok_store),
    )
