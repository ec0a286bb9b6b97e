"""JaxEmbedder: bucketing invariance, interface shape, mesh sharding."""

import jax
import numpy as np

from archi_tpu.models.bert import BertConfig
from archi_tpu.models.embedder import JaxEmbedder
from archi_tpu.models.tokenizer import WordPieceTokenizer

_CFG = BertConfig(
    vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=128,
)


def _embedder(**kw):
    tok = WordPieceTokenizer.build_vocab(
        ["the quick brown fox jumps over the lazy dog " * 3,
         "retrieval augmented generation on tpu hardware"]
    )
    return JaxEmbedder(config=_CFG, tokenizer=tok, compute_dtype=np.float32, **kw)


def test_embed_documents_shapes_and_norm():
    emb = _embedder()
    vecs = emb.embed_documents(["the quick fox", "lazy dog", "tpu retrieval"])
    assert len(vecs) == 3 and len(vecs[0]) == 32
    norms = np.linalg.norm(np.asarray(vecs), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_batch_composition_invariance():
    """A text's embedding must not depend on what else is in the batch
    (padding/bucketing correctness)."""
    emb = _embedder()
    solo = np.asarray(emb.embed_documents(["the quick brown fox"]))
    batch = np.asarray(
        emb.embed_documents(
            ["the quick brown fox", "a much longer sentence " * 20, "dog"]
        )
    )
    np.testing.assert_allclose(solo[0], batch[0], rtol=1e-4, atol=1e-5)


def test_embed_query_instruction_prefix():
    emb = _embedder()
    emb_pref = _embedder(instruction_prefix="query: ")
    q = "what is tpu"
    a = np.asarray(emb.embed_query(q))
    b = np.asarray(emb_pref.embed_query(q))
    c = np.asarray(emb.embed_query("query: " + q))
    assert not np.allclose(a, b)
    np.testing.assert_allclose(b, c, rtol=1e-4, atol=1e-5)


def test_empty_input():
    emb = _embedder()
    assert emb.embed_documents([]) == []
    assert emb.encode_numpy([]).shape == (0, 32)


def test_mesh_sharded_encode():
    devs = jax.devices()
    mesh = jax.sharding.Mesh(np.array(devs), ("data",))
    emb = _embedder(mesh=mesh)
    vecs = emb.embed_documents(["alpha beta", "gamma delta", "epsilon"])
    solo = _embedder().embed_documents(["alpha beta"])
    np.testing.assert_allclose(vecs[0], solo[0], rtol=1e-4, atol=1e-5)
