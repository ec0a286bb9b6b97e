"""Batched, bucketed TPU embedding inference.

Drop-in for the LangChain ``Embeddings`` contract the reference uses
(``embed_documents``/``embed_query`` — invoked at
``src/data_manager/vectorstore/manager.py:373`` for ingest and
``src/data_manager/vectorstore/postgres_vectorstore.py:390`` for queries),
but the forward pass is a jitted JAX encoder (``archi_tpu.models.bert``)
instead of torch sentence-transformers.

TPU mapping of the reference's long-input strategies (SURVEY.md §5.7):
sequences are padded into static (batch, seq) buckets sized to MXU tiles so
each distinct shape compiles once; batches fill the largest bucket first.
Optionally shards the batch axis over a device mesh (data-parallel encode).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.models.bert import BertConfig, encode
from archi_tpu.models.hf_loader import load_or_init
from archi_tpu.models.tokenizer import WordPieceTokenizer

SEQ_BUCKETS = (64, 128, 256, 512)
BATCH_BUCKETS = (8, 32, 128, 256)


def _bucket_up(x: int, buckets) -> int:
    for b in buckets:
        if x <= b:
            return b
    return buckets[-1]


class JaxEmbedder:
    """Text → normalized embedding vectors on TPU.

    Args:
      model_dir: local HF snapshot dir (config.json + weights + vocab.txt);
        falls back to deterministic random weights + corpus-free char vocab.
      config: explicit BertConfig override (ignored if model_dir loads).
      instruction_prefix: prepended to queries only (Qwen3/bge-style query
        instructions — reference ``retrievers/utils.py:7-19``).
    """

    def __init__(
        self,
        model_dir: str | None = None,
        config: BertConfig | None = None,
        tokenizer: WordPieceTokenizer | None = None,
        *,
        compute_dtype=jnp.bfloat16,
        max_length: int = 256,
        instruction_prefix: str = "",
        pooling: str | None = None,
        mesh: jax.sharding.Mesh | None = None,
        batch_axis: str = "data",
        attention_impl: str | None = None,
    ):
        if pooling is None:
            # bge-family checkpoints use CLS pooling; MiniLM et al. mean-pool
            name = (model_dir or "").lower()
            pooling = "cls" if "bge" in name else "mean"
        self.config, self.params, vocab_path = load_or_init(
            model_dir, config, pooling=pooling)
        if tokenizer is not None:
            self.tokenizer = tokenizer
        elif vocab_path:
            self.tokenizer = WordPieceTokenizer.from_vocab_file(vocab_path)
        else:
            # Vocab-less fallback: ASCII char-level vocab; deterministic.
            chars = [chr(c) for c in range(32, 127)]
            self.tokenizer = WordPieceTokenizer.build_vocab(
                ["".join(chars)], size=max(512, self.config.vocab_size)
            )
        self.compute_dtype = compute_dtype
        self.max_length = min(max_length, self.config.max_position_embeddings)
        self.instruction_prefix = instruction_prefix
        self.mesh = mesh
        self.batch_axis = batch_axis
        if attention_impl is None:
            # Fused Pallas attention on real TPU hardware; portable XLA
            # attention everywhere else (CPU mesh tests, interpreters).
            from archi_tpu.utils.hardware import on_tpu

            attention_impl = "pallas" if on_tpu() else "xla"
        self.attention_impl = attention_impl
        if mesh is not None:
            bspec = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(batch_axis)
            )
            rspec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            self.params = jax.device_put(self.params, rspec)
            self._fwd = jax.jit(
                functools.partial(encode, config=self.config,
                                  compute_dtype=compute_dtype,
                                  attention_impl=attention_impl),
                in_shardings=(rspec, bspec, bspec),
                out_shardings=bspec,
            )
        else:
            self._fwd = jax.jit(
                functools.partial(encode, config=self.config,
                                  compute_dtype=compute_dtype,
                                  attention_impl=attention_impl)
            )

    @property
    def dim(self) -> int:
        return self.config.hidden_size

    # ----------------------------------------------------------------- core
    def _pad_batch(self, id_lists: list[list[int]]):
        """Pad a group of token-id lists into one (batch, seq) bucket."""
        seq = _bucket_up(max(len(i) for i in id_lists), SEQ_BUCKETS)
        seq = min(seq, self.max_length)
        bsz = _bucket_up(len(id_lists), BATCH_BUCKETS)
        if self.mesh is not None:
            n_dev = self.mesh.shape[self.batch_axis]
            bsz = max(bsz, n_dev)
            bsz = int(np.ceil(bsz / n_dev) * n_dev)
        ids = np.zeros((bsz, seq), np.int32)
        mask = np.zeros((bsz, seq), np.int32)
        for r, lst in enumerate(id_lists):
            lst = lst[:seq]
            ids[r, : len(lst)] = lst
            mask[r, : len(lst)] = 1
        # Pad rows replicate row 0's mask=0 — fully masked, cheap.
        return ids, mask

    def _encode_ids(self, id_lists: list[list[int]]) -> np.ndarray:
        out = np.zeros((len(id_lists), self.dim), np.float32)
        # Group by sequence bucket so each shape compiles once.
        order = np.argsort([len(i) for i in id_lists], kind="stable")
        groups: list[list[int]] = []
        pos = 0
        while pos < len(order):
            seq_b = _bucket_up(len(id_lists[order[pos]]), SEQ_BUCKETS)
            group = [order[pos]]
            pos += 1
            while (
                pos < len(order)
                and _bucket_up(len(id_lists[order[pos]]), SEQ_BUCKETS) == seq_b
                and len(group) < BATCH_BUCKETS[-1]
            ):
                group.append(order[pos])
                pos += 1
            groups.append(group)
        # Dispatch every group first (jit dispatch is async), THEN collect —
        # device compute of group k overlaps host padding of group k+1 and
        # the result downloads, instead of serializing on each np.asarray.
        pending = []
        for group in groups:
            ids, mask = self._pad_batch([id_lists[g] for g in group])
            pending.append(
                (group, self._fwd(self.params, jnp.asarray(ids),
                                  jnp.asarray(mask)))
            )
        for group, emb_dev in pending:
            emb = np.asarray(emb_dev)
            out[np.asarray(group)] = emb[: len(group)]
        return out

    # ------------------------------------------------- Embeddings interface
    def embed_documents(self, texts: Sequence[str]) -> list[list[float]]:
        if not texts:
            return []
        id_lists = [self.tokenizer.encode(t, self.max_length) for t in texts]
        return self._encode_ids(id_lists).tolist()

    def embed_query(self, text: str) -> list[float]:
        if self.instruction_prefix:
            text = self.instruction_prefix + text
        return self.embed_documents([text])[0]

    # Convenience for the engine (ndarray, no list conversion)
    def encode_numpy(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        id_lists = [self.tokenizer.encode(t, self.max_length) for t in texts]
        return self._encode_ids(id_lists)
