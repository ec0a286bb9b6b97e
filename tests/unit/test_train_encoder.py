"""Contrastive encoder training (models/train_encoder.py): loss learns,
retrieval works with the LEARNED weights, and the HF-snapshot export
round-trips through JaxEmbedder bit-compatibly."""

import numpy as np
import pytest

from archi_tpu.models.bert import BertConfig, encode
from archi_tpu.models.train_encoder import (
    make_pairs, save_model_dir, state_dict_from_params, train,
)

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run

CORPUS = [
    "submit slurm array jobs with sbatch on the batch cluster partition",
    "gpu quota allocation increase request for the gpu partition",
    "xrootd transfer timeout when copying files with xrdcp redirector",
    "eos storage namespace quota exceeded mount fuse filesystem",
    "kubernetes pod eviction due to node memory pressure limits",
    "grafana dashboard provisioning with postgres datasource panels",
    "jira ticket workflow transitions and project permission schemes",
    "condor dagman workflow rescue dag after node failure resubmit",
] * 3   # enough rows for in-batch negatives


def _tiny_train(**kw):
    cfg = BertConfig(vocab_size=2048, hidden_size=64, num_layers=2,
                     num_heads=2, intermediate_size=128,
                     max_position_embeddings=64, pooling="mean")
    defaults = dict(vocab_size=2048, steps=60, batch=16, seq_len=32,
                    seed=0, log_every=0)
    defaults.update(kw)
    losses = []
    cfg_out, params, tok = train(
        CORPUS, config=cfg, log=lambda s: losses.append(s), **defaults)
    return cfg_out, params, tok, losses


@pytest.fixture(scope="module")
def trained():
    return _tiny_train()


def test_pairs_generation():
    rng = np.random.default_rng(0)
    pairs = make_pairs(CORPUS, rng)
    assert len(pairs) >= len(CORPUS)
    for q, d in pairs[:10]:
        assert q and d in CORPUS
        # query view derives from its positive's vocabulary
        assert any(w in d.lower() for w in q.split())


def test_training_learns_retrieval(trained):
    cfg, params, tok = trained[:3]
    import jax.numpy as jnp

    def emb(texts):
        ids = [tok.encode(t, max_length=32) for t in texts]
        m = max(len(i) for i in ids)
        import numpy as np
        a = np.zeros((len(ids), m), np.int32)
        mask = np.zeros((len(ids), m), np.int32)
        for r, lst in enumerate(ids):
            a[r, :len(lst)] = lst
            mask[r, :len(lst)] = 1
        return np.asarray(encode(params, jnp.asarray(a), jnp.asarray(mask),
                                 cfg))

    docs = CORPUS[:8]
    d = emb(docs)
    queries = ["slurm sbatch array", "gpu quota", "xrdcp transfer",
               "eos fuse mount", "kubernetes eviction", "grafana postgres",
               "jira permissions", "dagman rescue"]
    q = emb(queries)
    top1 = np.argmax(q @ d.T, axis=1)
    # learned encoder must route most queries to their own topic
    assert (top1 == np.arange(8)).mean() >= 0.75, top1


def test_state_dict_roundtrip(trained):
    """params -> HF names -> params must be exact (the export is the
    inverse of hf_loader.params_from_state_dict)."""
    cfg, params, _tok = trained[:3]
    from archi_tpu.models.hf_loader import params_from_state_dict

    sd = state_dict_from_params(params, cfg)
    assert "encoder.layer.1.output.dense.weight" in sd
    back = params_from_state_dict(sd, cfg)
    np.testing.assert_allclose(
        np.asarray(params["embeddings"]["word"]),
        np.asarray(back["embeddings"]["word"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["ffn_i_w"]),
        np.asarray(back["layers"]["ffn_i_w"]), rtol=1e-6)


def test_saved_snapshot_loads_in_jax_embedder(trained, tmp_path):
    cfg, params, tok = trained[:3]
    model_dir = str(tmp_path / "model")
    save_model_dir(model_dir, cfg, params, tok)
    import os

    assert {"config.json", "model.safetensors", "vocab.txt"} <= \
        set(os.listdir(model_dir))

    from archi_tpu.models.embedder import JaxEmbedder

    emb = JaxEmbedder(model_dir=model_dir, compute_dtype=np.float32,
                      max_length=32)
    assert emb.dim == cfg.hidden_size
    v1 = np.asarray(emb.embed_query("slurm sbatch array"))
    v2 = np.asarray(emb.embed_query("gpu quota increase"))
    d1 = np.asarray(emb.embed_query(CORPUS[0]))
    # loaded weights retrieve like the in-memory ones
    assert v1 @ d1 > v2 @ d1
    np.testing.assert_allclose(np.linalg.norm(v1), 1.0, rtol=1e-4)


# --------------------------------------------------- corpus-mined pairs (r4)
def test_mine_pairs_acronyms_definitions_aliases():
    from archi_tpu.models.train_encoder import mine_pairs

    texts = [
        "The Compact Muon Solenoid (CMS) records collisions. "
        "CMS data flows through the tier sites.",
        "WLCG (Worldwide Lhc Computing Grid) coordinates the sites.",
        "xrootd is a protocol for streaming remote files efficiently.",
        "The fair-share scheduler, also known as fairshare, balances jobs.",
        "A Mismatched Thing (NOPE) should not match initials.",
    ] * 2
    pairs = mine_pairs(texts)
    qs = {q for q, _d in pairs}
    # acronym both ways + expansion↔acronym cross pairs
    assert "CMS" in qs and "Compact Muon Solenoid" in qs
    assert ("CMS", "Compact Muon Solenoid") in pairs
    assert "WLCG" in qs
    # initials mismatch rejected
    assert "NOPE" not in qs
    # definition sentence: term retrieves its defining chunk
    assert any(q == "xrootd" for q, d in pairs if "protocol" in d)
    # alias: both names retrieve the chunk, alias maps to term
    assert any("fairshare" == q for q, _d in pairs)
    # salient-term views exist and avoid the highest-DF words
    sal = [q for q, _d in pairs if len(q.split()) >= 2
           and "the" not in q.split()]
    assert sal


def test_noise_vocab_and_query_splicing():
    from archi_tpu.models.train_encoder import make_pairs, noise_vocab

    texts = [f"service note {w} covers topic{i} details and checks"
             for i, w in enumerate(["alpha", "beta", "gamma", "delta"])] * 8
    noise = noise_vocab(texts, n_pseudo=16)
    assert "service" in noise or "note" in noise   # high-DF register
    assert any(w not in " ".join(texts) for w in noise)  # pseudo-words
    rng = np.random.default_rng(0)
    noisy = make_pairs(texts, rng, noise=noise)
    clean = make_pairs(texts, np.random.default_rng(0), noise=None)
    # some query views contain injected tokens absent from their chunk
    injected = sum(
        1 for q, d in noisy
        if any(w not in d.lower().split() for w in q.split()))
    assert injected > len(noisy) // 10
    assert len(noisy) == len(clean)
