"""Encoder numerical parity vs HuggingFace transformers BertModel.

The analog of the reference's mocked-embedding unit tests
(tests/unit/test_postgres_vectorstore.py uses fixed 384-d vectors); here we
go further: our pure-JAX forward must match torch BertModel bit-for-bit-ish
(fp32, same random weights) — tolerance-based, per SURVEY.md §7 "embedding
numerical parity".
"""

import numpy as np
import pytest

from archi_tpu.models.bert import BertConfig, encode, init_params
from archi_tpu.models.hf_loader import params_from_state_dict
from archi_tpu.models.tokenizer import WordPieceTokenizer

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_bert():
    cfg = transformers.BertConfig(
        vocab_size=500,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=128,
        type_vocab_size=2,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg, add_pooling_layer=False)
    model.eval()
    return cfg, model


def test_forward_matches_transformers(tiny_bert, rng):
    hf_cfg, model = tiny_bert
    config = BertConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        pooling="mean",
        normalize=False,
    )
    sd = {k: v for k, v in model.state_dict().items()}
    params = params_from_state_dict(
        {k: v.numpy() for k, v in sd.items()}, config
    )

    b, s = 3, 17
    ids = rng.integers(0, hf_cfg.vocab_size, (b, s))
    mask = np.ones((b, s), np.int64)
    mask[0, 10:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        hf_out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    ours = encode(params, ids.astype(np.int32), mask.astype(np.int32), config)
    # mean-pool HF output the sentence-transformers way
    m = mask[:, :, None].astype(np.float32)
    hf_pooled = (hf_out * m).sum(1) / np.maximum(m.sum(1), 1e-9)
    np.testing.assert_allclose(np.asarray(ours), hf_pooled, rtol=2e-4, atol=2e-4)


def test_cls_pooling_and_normalize(tiny_bert, rng):
    hf_cfg, model = tiny_bert
    config = BertConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        pooling="cls",
        normalize=True,
    )
    params = params_from_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, config
    )
    b, s = 2, 9
    ids = rng.integers(0, hf_cfg.vocab_size, (b, s))
    mask = np.ones((b, s), np.int64)
    with torch.no_grad():
        hf_out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    hf_cls = hf_out[:, 0, :]
    hf_cls = hf_cls / np.linalg.norm(hf_cls, axis=-1, keepdims=True)
    ours = np.asarray(
        encode(params, ids.astype(np.int32), mask.astype(np.int32), config)
    )
    np.testing.assert_allclose(ours, hf_cls, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.linalg.norm(ours, axis=-1), 1.0, rtol=1e-5)


def test_padding_invariance(rng):
    """Padding a batch to a longer bucket must not change embeddings."""
    config = BertConfig(
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64,
    )
    params = init_params(config, seed=1)
    ids = rng.integers(0, 200, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    short = np.asarray(encode(params, ids, mask, config))
    ids_pad = np.zeros((2, 32), np.int32)
    ids_pad[:, :10] = ids
    mask_pad = np.zeros((2, 32), np.int32)
    mask_pad[:, :10] = 1
    long = np.asarray(encode(params, ids_pad, mask_pad, config))
    np.testing.assert_allclose(short, long, rtol=1e-5, atol=1e-5)


def test_attn_pooling_zero_init_equals_mean(rng):
    """pooling="attn" (learned token-relevance gate) is zero-initialised →
    uniform softmax over valid tokens → EXACTLY mean pooling at step 0, so
    training only departs from the mean where gradients push it."""
    mk = lambda p: BertConfig(  # noqa: E731
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, pooling=p)
    cfg_attn, cfg_mean = mk("attn"), mk("mean")
    params = init_params(cfg_attn, seed=3)
    assert np.all(np.asarray(params["pool_attn"]["w"]) == 0.0)
    ids = rng.integers(0, 200, (3, 20)).astype(np.int32)
    mask = np.ones((3, 20), np.int32)
    mask[1, 7:] = 0
    za = np.asarray(encode(params, ids, mask, cfg_attn))
    zm = np.asarray(encode(params, ids, mask, cfg_mean))
    np.testing.assert_allclose(za, zm, rtol=1e-5, atol=1e-6)


def test_attn_pooling_padding_invariance(rng):
    """The gate's -1e9 mask keeps padded tokens out of the softmax."""
    config = BertConfig(
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, pooling="attn")
    params = init_params(config, seed=1)
    params["pool_attn"]["w"] = rng.normal(size=32).astype(np.float32)
    ids = rng.integers(0, 200, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    short = np.asarray(encode(params, ids, mask, config))
    ids_pad = np.zeros((2, 32), np.int32)
    ids_pad[:, :10] = ids
    mask_pad = np.zeros((2, 32), np.int32)
    mask_pad[:, :10] = 1
    long = np.asarray(encode(params, ids_pad, mask_pad, config))
    np.testing.assert_allclose(short, long, rtol=1e-5, atol=1e-5)


def test_attn_pooling_hf_roundtrip(tmp_path, rng):
    """save_model_dir writes the gate as an extra `pooler_attn.weight`
    tensor + `archi_pooling` config key; load_model_dir restores both
    and the loaded model embeds identically."""
    from archi_tpu.models.hf_loader import load_model_dir
    from archi_tpu.models.train_encoder import save_model_dir

    tok = WordPieceTokenizer.build_vocab(
        ["slurm array jobs on the batch cluster",
         "gpu quota increase for the gpu partition"])
    config = BertConfig(
        vocab_size=tok.vocab_size, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, pooling="attn")
    params = init_params(config, seed=2)
    # non-zero gate so the round-trip actually exercises the attn path
    params["pool_attn"]["w"] = rng.normal(size=32).astype(np.float32)
    d = str(tmp_path / "snap")
    save_model_dir(d, config, params, tok)

    cfg2, params2, vocab = load_model_dir(d)  # pooling read from config.json
    assert cfg2.pooling == "attn"
    assert vocab is not None
    np.testing.assert_allclose(np.asarray(params2["pool_attn"]["w"]),
                               np.asarray(params["pool_attn"]["w"]),
                               rtol=1e-6)
    ids = rng.integers(0, tok.vocab_size, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    z1 = np.asarray(encode(params, ids, mask, config))
    z2 = np.asarray(encode(params2, ids, mask, cfg2))
    np.testing.assert_allclose(z1, z2, rtol=1e-5, atol=1e-6)


def test_tokenizer_basics():
    tok = WordPieceTokenizer.build_vocab(
        ["the quick brown fox jumps over the lazy dog", "hello world, hello TPU!"]
    )
    ids = tok.encode("hello world")
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
    assert tok.decode(ids) == "hello world"
    # unseen word falls back to pieces/UNK without crashing
    ids2 = tok.encode("transmogrification")
    assert len(ids2) >= 3


def test_tokenizer_punctuation_and_case():
    tok = WordPieceTokenizer.build_vocab(["a b c d e f, punct. test!"])
    toks = tok.tokenize("Punct, test!")
    assert "," in toks and "!" in toks
    assert all(t == t.lower() for t in toks if t.isalpha())


def test_pallas_attention_matches_xla(rng):
    """Fused Pallas attention (interpret mode on CPU) vs the XLA path."""
    config = BertConfig(
        vocab_size=200, hidden_size=64, num_layers=2, num_heads=2,
        intermediate_size=128, max_position_embeddings=64,
    )
    params = init_params(config, seed=2)
    ids = rng.integers(0, 200, (3, 24)).astype(np.int32)
    mask = np.ones((3, 24), np.int32)
    mask[1, 12:] = 0  # padding in the middle of the batch
    ref = np.asarray(encode(params, ids, mask, config, attention_impl="xla"))
    fused = np.asarray(encode(params, ids, mask, config,
                              attention_impl="pallas",
                              attention_interpret=True))
    np.testing.assert_allclose(fused, ref, rtol=2e-5, atol=2e-5)


def test_pallas_attention_kernel_direct(rng):
    """Kernel-level parity on raw q/k/v with a key-side padding bias."""
    import jax.numpy as jnp

    from archi_tpu.ops.pallas_attention import encoder_attention

    b, nh, s, hd = 2, 4, 32, 16
    q = rng.standard_normal((b, nh, s, hd)).astype(np.float32)
    k = rng.standard_normal((b, nh, s, hd)).astype(np.float32)
    v = rng.standard_normal((b, nh, s, hd)).astype(np.float32)
    bias = np.zeros((b, s), np.float32)
    bias[0, 20:] = -1e9
    scale = 1.0 / np.sqrt(hd)

    logits = np.einsum("bnqd,bnkd->bnqk", q, k) * scale + bias[:, None, None, :]
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bnqk,bnkd->bnqd", p, v)

    # kernel consumes/produces the transposed [B, nh, hd, S] layout
    t = (0, 1, 3, 2)
    got_t = np.asarray(encoder_attention(
        jnp.asarray(q.transpose(t)), jnp.asarray(k.transpose(t)),
        jnp.asarray(v.transpose(t)), jnp.asarray(bias),
        sm_scale=float(scale), interpret=True))
    np.testing.assert_allclose(got_t.transpose(t), want, rtol=1e-5, atol=1e-5)
