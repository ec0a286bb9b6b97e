"""IVF-PQ index: exactness at nprobe=nlist (up to PQ quantization),
residual-coding advantage over flat PQ, bias contract, grouping
invariance, save/load."""

import numpy as np
import pytest

from archi_tpu.engine.ivfpq_index import IVFPQIndex
from archi_tpu.engine.pq import PQFlatIndex
from archi_tpu.ops.pallas_topk import NEG_INF

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run


def _corpus(rng, n=4096, d=64, clusters=32, noise=0.15):
    centers = rng.standard_normal((clusters, d)).astype(np.float32)
    x = centers[rng.integers(0, clusters, n)] + \
        noise * rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    x = _corpus(rng, n=4096, d=64)
    q = _corpus(rng, n=16, d=64)
    idx = IVFPQIndex.build(x, nlist=32, block=256, m=16, seed=0)
    return rng, x, q, idx


def _recall(rows, exact):
    return sum(len(set(rows[b]) & set(exact[b]))
               for b in range(exact.shape[0])) / exact.size


def test_shapes_and_memory(setup):
    _, x, _, idx = setup
    assert idx.code_blocks.dtype == np.uint8
    assert idx.code_blocks.shape[2] == 16
    assert len(idx) == 4096


def test_full_probe_recall(setup):
    """nprobe=nlist scans everything: recall limited only by PQ error;
    residual coding must make over-fetch recall near-perfect."""
    _, x, q, idx = setup
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    _, _, rows = idx.search(q, k=100, nprobe=32)
    assert _recall(rows, exact) >= 0.97, _recall(rows, exact)
    _, _, r10 = idx.search(q, k=10, nprobe=32)
    assert _recall(r10, exact) >= 0.5


def test_residual_beats_flat_pq(setup):
    """Same code budget: residual IVF-PQ strict@10 > flat PQ strict@10."""
    _, x, q, idx = setup
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    flat = PQFlatIndex.build(x, m=16, seed=0, tile=1024)
    _, _, rf = flat.search(q, k=10)
    _, _, ri = idx.search(q, k=10, nprobe=32)
    assert _recall(ri, exact) > _recall(rf, exact)


def test_nprobe_tradeoff(setup):
    _, x, q, idx = setup
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    r_small = _recall(idx.search(q, k=100, nprobe=2)[2], exact)
    r_big = _recall(idx.search(q, k=100, nprobe=16)[2], exact)
    assert r_big >= r_small
    assert r_big >= 0.9


def test_group_invariance(setup):
    """Results identical whatever the query grouping (ownership masking)."""
    _, x, q, idx = setup
    v1, r1 = idx.search_dispatch(q, k=10, nprobe=8,
                                 vmem_budget_rows=1 << 30)   # big group
    v2, r2 = idx.search_dispatch(q, k=10, nprobe=8,
                                 vmem_budget_rows=1)          # group=1
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(r1) == np.asarray(r2)).mean() > 0.95  # tie reorder


def test_score_is_centroid_plus_residual(setup):
    """Reported score must approximate the true inner product q·x."""
    _, x, q, idx = setup
    vals, rows = idx.search_dispatch(q[:4], k=5, nprobe=32)
    vals, rows = np.asarray(vals), np.asarray(rows)
    true_ip = np.stack([x[rows[b]] @ q[b] for b in range(4)])
    assert np.abs(vals - true_ip).max() < 0.15
    assert np.abs(vals - true_ip).mean() < 0.05


def test_bias_tombstone(setup):
    _, x, q, idx = setup
    _, _, base = idx.search(q[:2], k=5, nprobe=8)
    kill = {r for rr in base for r in rr}
    bias = np.zeros(len(x), np.float32)
    for r in kill:
        bias[r] = NEG_INF
    _, vals, rows = idx.search(q[:2], k=5, nprobe=8, bias=bias)
    assert not {r for rr in rows for r in rr} & kill
    assert (vals > NEG_INF / 2).all()


def test_bias_hybrid_boost(setup):
    """A finite bias (BM25 analog) must lift a probed row in the ranking."""
    _, x, q, idx = setup
    _, _, base = idx.search(q[:1], k=50, nprobe=8)
    target = int(base[0][-1])                 # probed but low-ranked
    bias = np.zeros(len(x), np.float32)
    bias[target] = 5.0
    _, _, rows = idx.search(q[:1], k=5, nprobe=8, bias=bias)
    assert rows[0][0] == target


def test_ids_mapping(setup):
    _, x, q, _ = setup
    idx = IVFPQIndex.build(x[:512], ids=[f"doc{i}" for i in range(512)],
                           nlist=8, block=128, m=16)
    ids, _, rows = idx.search(q[:2], k=3, nprobe=8)
    for b in range(2):
        for j in range(3):
            assert ids[b][j] == f"doc{int(rows[b][j])}"


def test_save_load_roundtrip(tmp_path, setup):
    _, x, q, idx = setup
    p = str(tmp_path / "ivfpq.npz")
    idx.save(p)
    loaded = IVFPQIndex.load(p)
    va, ra = idx.search_dispatch(q[:4], k=5, nprobe=8)
    vb, rb = loaded.search_dispatch(q[:4], k=5, nprobe=8)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()


def test_build_streaming_matches_device_build(setup):
    """Streaming build over blocks == device build quality (same corpus)."""
    import jax.numpy as jnp
    _, x, q, _ = setup
    n_blocks, block_rows = 8, 512
    blocks = [jnp.asarray(x[i * block_rows:(i + 1) * block_rows])
              for i in range(n_blocks)]
    idx = IVFPQIndex.build_streaming(
        lambda i: blocks[i], n_blocks, block_rows,
        nlist=32, block=256, m=16, seed=0, train_blocks=8)
    assert len(idx) == 4096
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    _, _, rows = idx.search(q, k=100, nprobe=32)
    assert _recall(rows, exact) >= 0.95
    # tombstone contract still honored through the streaming-built layout
    bias = np.zeros(len(x), np.float32)
    bias[exact[0][0]] = NEG_INF
    _, _, r2 = idx.search(q[:1], k=10, nprobe=32, bias=bias)
    assert exact[0][0] not in set(r2[0])


@pytest.fixture(scope="module")
def refined(setup):
    _, x, _, _ = setup
    return IVFPQIndex.build(x, nlist=32, block=256, m=16, refine_m=8,
                            seed=0)


def test_refine_improves_strict_recall(setup, refined):
    """The refinement re-rank must beat stage-1-only strict@10."""
    _, x, q, base = setup
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    _, _, r_base = base.search(q, k=10, nprobe=32)
    _, _, r_ref = refined.search(q, k=10, nprobe=32)
    assert _recall(r_ref, exact) > _recall(r_base, exact)
    assert _recall(r_ref, exact) >= 0.7


def test_refine_score_accuracy(setup, refined):
    """Refined scores approximate q·x tighter than stage-1 scores."""
    _, x, q, base = setup
    vb, rb = base.search_dispatch(q[:8], k=5, nprobe=32)
    vr, rr = refined.search_dispatch(q[:8], k=5, nprobe=32)
    vb, rb = np.asarray(vb), np.asarray(rb)
    vr, rr = np.asarray(vr), np.asarray(rr)
    err_b = np.abs(vb - np.stack([x[rb[b]] @ q[b] for b in range(8)])).mean()
    err_r = np.abs(vr - np.stack([x[rr[b]] @ q[b] for b in range(8)])).mean()
    assert err_r < err_b


def test_refine_respects_tombstones(setup, refined):
    _, x, q, _ = setup
    _, _, base = refined.search(q[:2], k=5, nprobe=8)
    kill = {r for rr in base for r in rr}
    bias = np.zeros(len(x), np.float32)
    for r in kill:
        bias[r] = NEG_INF
    _, vals, rows = refined.search(q[:2], k=5, nprobe=8, bias=bias)
    assert not {r for rr in rows for r in rr} & kill
    assert (vals > NEG_INF / 2).all()


def test_refine_save_load(tmp_path, setup, refined):
    _, x, q, _ = setup
    p = str(tmp_path / "ivfpqr.npz")
    refined.save(p)
    loaded = IVFPQIndex.load(p)
    assert loaded.refine_codec is not None
    va, ra = refined.search_dispatch(q[:4], k=5, nprobe=8)
    vb, rb = loaded.search_dispatch(q[:4], k=5, nprobe=8)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()


def test_streaming_build_with_refine(setup):
    import jax.numpy as jnp
    _, x, q, _ = setup
    n_blocks, block_rows = 8, 512
    blocks = [jnp.asarray(x[i * block_rows:(i + 1) * block_rows])
              for i in range(n_blocks)]
    idx = IVFPQIndex.build_streaming(
        lambda i: blocks[i], n_blocks, block_rows,
        nlist=32, block=256, m=16, refine_m=8, seed=0, train_blocks=8)
    dev = IVFPQIndex.build(x, nlist=32, block=256, m=16, refine_m=8, seed=0)
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    rs = _recall(idx.search(q, k=10, nprobe=32)[2], exact)
    rd = _recall(dev.search(q, k=10, nprobe=32)[2], exact)
    assert abs(rs - rd) < 0.1 and rs >= 0.7


def test_packed_4bit_mode(setup, tmp_path):
    """ksub=16 packs two codes per byte: same contract, better stage-1
    recall per byte (the LUT16 kernel path on TPU)."""
    _, x, q, _ = setup
    idx4 = IVFPQIndex.build(x, nlist=32, block=256, m=32, ksub=16,
                            refine_m=16, seed=0)
    assert idx4.packed
    assert idx4.code_blocks.shape[2] == 16          # 32 codes / 2
    assert idx4.refine_codes.shape[1] == 8          # 16 codes / 2
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    _, _, rows = idx4.search(q, k=100, nprobe=32)
    assert _recall(rows, exact) >= 0.9
    # bias contract through the packed path
    bias = np.zeros(len(x), np.float32)
    bias[exact[0][0]] = NEG_INF
    _, _, r2 = idx4.search(q[:1], k=10, nprobe=32, bias=bias)
    assert exact[0][0] not in set(r2[0])
    # save/load keeps packing
    p = str(tmp_path / "pq4.npz")
    idx4.save(p)
    loaded = IVFPQIndex.load(p)
    assert loaded.packed
    va, ra = idx4.search_dispatch(q[:4], k=5, nprobe=8)
    vb, rb = loaded.search_dispatch(q[:4], k=5, nprobe=8)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()


def test_packed_streaming_build(setup):
    import jax.numpy as jnp
    _, x, q, _ = setup
    blocks = [jnp.asarray(x[i * 512:(i + 1) * 512]) for i in range(8)]
    s4 = IVFPQIndex.build_streaming(
        lambda i: blocks[i], 8, 512, nlist=32, block=256, m=32, ksub=16,
        refine_m=16, seed=0, train_blocks=8)
    d4 = IVFPQIndex.build(x, nlist=32, block=256, m=32, ksub=16,
                          refine_m=16, seed=0)
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    rs = _recall(s4.search(q, k=10, nprobe=32)[2], exact)
    rd = _recall(d4.search(q, k=10, nprobe=32)[2], exact)
    assert abs(rs - rd) < 0.1


def test_4bit_stage1_matches_8bit_at_equal_bytes():
    """The reason LUT16 exists: at ds=4 (384-d, m=96) 4-bit codes match or
    beat 8-bit ds=8 at the same bytes/row with 8x fewer ADC compares.
    (At ds=2 the 16-centroid codebook loses — the engine keeps ksub
    configurable for exactly this reason.)"""
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((64, 384)).astype(np.float32)
    x = centers[rng.integers(0, 64, 2048)] + \
        0.3 * rng.standard_normal((2048, 384)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.choice(2048, 8, replace=False)] + \
        0.05 * rng.standard_normal((8, 384)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    i8 = IVFPQIndex.build(x, nlist=16, block=256, m=48, ksub=256, seed=0)
    i4 = IVFPQIndex.build(x, nlist=16, block=256, m=96, ksub=16, seed=0)
    r8 = _recall(i8.search(q, k=10, nprobe=16)[2], exact)
    r4 = _recall(i4.search(q, k=10, nprobe=16)[2], exact)
    assert r4 >= r8 - 0.05, (r4, r8)


def test_opq_through_ivfpq(tmp_path):
    """opq_iters rotates both codec stages; contract + save/load hold."""
    rng = np.random.default_rng(31)
    basis = np.linalg.qr(rng.standard_normal((64, 64)))[0].astype(np.float32)
    z = rng.standard_normal((4096, 6)).astype(np.float32) * 3.0
    x = z @ basis[:6] + 0.1 * rng.standard_normal((4096, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.choice(4096, 16, replace=False)] + \
        0.05 * rng.standard_normal((16, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T

    plain = IVFPQIndex.build(x, nlist=32, block=256, m=8, refine_m=8, seed=0)
    opq = IVFPQIndex.build(x, nlist=32, block=256, m=8, refine_m=8, seed=0,
                           opq_iters=4)
    assert opq.codec.rotation is not None
    r_plain = _recall(plain.search(q, k=10, nprobe=32)[2], exact)
    r_opq = _recall(opq.search(q, k=10, nprobe=32)[2], exact)
    assert r_opq >= r_plain - 0.02, (r_opq, r_plain)

    # bias contract through the rotated path
    bias = np.zeros(len(x), np.float32)
    bias[exact[0][0]] = NEG_INF
    _, _, rows = opq.search(q[:1], k=10, nprobe=32, bias=bias)
    assert exact[0][0] not in set(rows[0])

    p = str(tmp_path / "opq_ivfpq.npz")
    opq.save(p)
    loaded = IVFPQIndex.load(p)
    assert loaded.codec.rotation is not None
    va, ra = opq.search_dispatch(q[:4], k=5, nprobe=8)
    vb, rb = loaded.search_dispatch(q[:4], k=5, nprobe=8)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()


def test_approx_extract_matches_exact(setup, refined):
    """Forced ApproxTopK stage-1 extraction (the high-nprobe wide-k fast
    path, incl. the strided anti-duplicate relayout and its flat-position
    recovery) must agree with the exact path: same top-1, >= 0.9 overlap
    of the final top-10, and identical scores on common rows."""
    _, x, q, _ = setup
    ve, re_ = refined.search_dispatch(q, k=10, nprobe=16, extract="exact")
    va, ra = refined.search_dispatch(q, k=10, nprobe=16, extract="approx",
                                     approx_recall=0.99)
    ve, re_, va, ra = map(np.asarray, (ve, re_, va, ra))
    assert np.array_equal(re_[:, 0], ra[:, 0])
    overlap = np.mean([
        len(set(re_[b]) & set(ra[b])) / 10 for b in range(q.shape[0])])
    assert overlap >= 0.9
    for b in range(q.shape[0]):
        se = dict(zip(re_[b].tolist(), ve[b].tolist()))
        for r, v in zip(ra[b].tolist(), va[b].tolist()):
            if r in se:
                assert abs(se[r] - v) < 1e-4


# --------------------------------------------------------- block probing
def test_block_probe_full_budget_matches_full_nprobe(setup):
    """nprobe_blocks = n_blocks scans every block — results must match
    nprobe = nlist exactly (same candidate set, same scoring)."""
    _, x, q, idx = setup
    va, ra = idx.search_dispatch(q, k=10, nprobe=32)
    nb = idx.code_blocks.shape[0]
    vb, rb = idx.search_dispatch(q, k=10, nprobe_blocks=nb)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()


def test_block_probe_recall_at_fraction_of_budget(setup):
    """A small block budget must reach the recall cell probing needs a
    much larger scanned volume for (mini-centroids rank at block
    granularity)."""
    _, x, q, idx = setup
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    # 8 blocks/query = 2048 slots of 4096 total
    _, _, rows = idx.search(q, k=10, nprobe_blocks=8)
    assert _recall(rows, exact) >= 0.5
    _, _, r100 = idx.search(q, k=100, nprobe_blocks=8)
    assert _recall(r100, exact) >= 0.9


def test_block_probe_bias_tombstone(setup):
    _, x, q, idx = setup
    _, _, base = idx.search(q[:2], k=5, nprobe_blocks=8)
    kill = {r for rr in base for r in rr}
    bias = np.zeros(len(x), np.float32)
    for r in kill:
        bias[r] = NEG_INF
    _, vals, rows = idx.search(q[:2], k=5, nprobe_blocks=8, bias=bias)
    assert not {r for rr in rows for r in rr} & kill
    assert (vals > NEG_INF / 2).all()


def test_block_probe_per_query_bias(setup):
    """2-D (per-query) bias must apply row-wise on the block path."""
    _, x, q, idx = setup
    _, _, base = idx.search(q[:2], k=50, nprobe_blocks=16)
    t0, t1 = int(base[0][-1]), int(base[1][-1])
    bias = np.zeros((2, len(x)), np.float32)
    bias[0, t0] = 5.0
    bias[1, t1] = 5.0
    _, _, rows = idx.search(q[:2], k=5, nprobe_blocks=16, bias=bias)
    assert rows[0][0] == t0 and rows[1][0] == t1
    assert t1 not in set(rows[0]) or t1 == t0


def test_block_probe_save_load_roundtrip(tmp_path, setup):
    _, x, q, idx = setup
    idx.ensure_block_centroids()
    p = str(tmp_path / "ivfpq_bc.npz")
    idx.save(p)
    loaded = IVFPQIndex.load(p)
    assert loaded.block_centroids is not None
    va, ra = idx.search_dispatch(q[:4], k=5, nprobe_blocks=8)
    vb, rb = loaded.search_dispatch(q[:4], k=5, nprobe_blocks=8)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()


def test_block_probe_group_invariance(setup):
    """Results must not depend on the group size chosen by the vmem
    heuristic — force different groups via vmem_budget_rows."""
    _, x, q, idx = setup
    va, ra = idx.search_dispatch(q, k=10, nprobe_blocks=8,
                                 vmem_budget_rows=1 << 11)  # group=1
    vb, rb = idx.search_dispatch(q, k=10, nprobe_blocks=8,
                                 vmem_budget_rows=1 << 17)  # group=4
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()


def test_cell_gate_full_budget_is_noop(setup):
    """With nprobe_blocks = n_blocks every block is probed whatever its
    gated rank, so any cell_gate must reproduce ungated results; and
    cell_gate >= nlist disables the gate entirely."""
    _, x, q, idx = setup
    nb = idx.code_blocks.shape[0]
    va, ra = idx.search_dispatch(q, k=10, nprobe_blocks=nb)
    for gate in (4, 32, 64):
        vg, rg = idx.search_dispatch(q, k=10, nprobe_blocks=nb,
                                     cell_gate=gate)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vg),
                                   atol=1e-5)
        assert (np.asarray(ra) == np.asarray(rg)).all()


def test_cell_gate_recall_at_small_budget(setup):
    """Gating the block ranking to the query's top cells must not hurt
    recall at a small block budget (it shrinks the mini-centroid noise
    field), and results must stay inside the gated cells' blocks."""
    _, x, q, idx = setup
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    _, _, r_un = idx.search(q, k=100, nprobe_blocks=8)
    _, _, r_g = idx.search(q, k=100, nprobe_blocks=8, cell_gate=8)
    assert _recall(r_g, exact) >= 0.85
    assert _recall(r_g, exact) >= _recall(r_un, exact) - 0.05


def test_cell_gate_with_bias(setup):
    """Gate composes with the tombstone bias stream."""
    _, x, q, idx = setup
    _, _, base = idx.search(q[:2], k=5, nprobe_blocks=8, cell_gate=8)
    kill = {r for rr in base for r in rr}
    bias = np.zeros(len(x), np.float32)
    for r in kill:
        bias[r] = NEG_INF
    _, vals, rows = idx.search(q[:2], k=5, nprobe_blocks=8, cell_gate=8,
                               bias=bias)
    assert not {r for rr in rows for r in rr} & kill
    assert (vals > NEG_INF / 2).all()


def test_sub_block_full_budget_matches_full_nprobe(setup):
    """Sub-block ranking only changes WHICH blocks are probed; at the
    full block budget every block is probed, so results must match
    nprobe=nlist exactly (and the rebuild must leave sub=4 cached)."""
    _, x, q, _ = setup
    idx = IVFPQIndex.build(x, nlist=32, block=256, m=16, seed=0)
    idx.block_rank_sub = 4
    nb = idx.code_blocks.shape[0]
    va, ra = idx.search_dispatch(q, k=10, nprobe=32)
    vb, rb = idx.search_dispatch(q, k=10, nprobe_blocks=nb)
    assert idx._bc_sub == 4
    assert idx.block_centroids.shape[0] == nb * 4
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()


def test_sub_block_recall_not_worse_at_small_budget(setup):
    """On a clustered corpus, max-of-finer-means resolves multi-modal
    blocks: recall at a small block budget must be >= the diluted
    whole-block-mean ranking."""
    _, x, q, _ = setup
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    i1 = IVFPQIndex.build(x, nlist=32, block=256, m=16, seed=0)
    i1.block_rank_sub = 1
    _, _, r1 = i1.search(q, k=100, nprobe_blocks=6)
    i4 = IVFPQIndex.build(x, nlist=32, block=256, m=16, seed=0)
    i4.block_rank_sub = 4
    _, _, r4 = i4.search(q, k=100, nprobe_blocks=6)
    assert _recall(r4, exact) >= _recall(r1, exact) - 1e-9
    assert _recall(r4, exact) >= 0.8


def test_sub_block_save_load_roundtrip(tmp_path, setup):
    """sub is derived from the saved sub-centroid shape on load."""
    _, x, q, _ = setup
    idx = IVFPQIndex.build(x, nlist=32, block=256, m=16, seed=0)
    idx.ensure_block_centroids(sub=4)
    p = str(tmp_path / "ivfpq_sub.npz")
    idx.save(p)
    loaded = IVFPQIndex.load(p)
    assert loaded._bc_sub == 4 and loaded.block_rank_sub == 4
    va, ra = idx.search_dispatch(q[:4], k=5, nprobe_blocks=8)
    vb, rb = loaded.search_dispatch(q[:4], k=5, nprobe_blocks=8)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()


def test_sub_block_rebuild_on_sub_change(setup):
    _, x, q, _ = setup
    idx = IVFPQIndex.build(x, nlist=32, block=256, m=16, seed=0)
    bc1 = idx.ensure_block_centroids(sub=1)
    nb = idx.code_blocks.shape[0]
    assert bc1.shape[0] == nb
    bc4 = idx.ensure_block_centroids(sub=4)
    assert bc4.shape[0] == nb * 4 and idx._bc_sub == 4
    with pytest.raises(ValueError):
        idx.ensure_block_centroids(sub=3)   # 256 % 3 != 0


def test_block_probe_packed_refined(setup):
    """Block probing through the packed-4bit + refinement config (the
    config-4 shape): full budget matches full nprobe; small budget keeps
    high recall; mini-centroids decode through the packed codes."""
    _, x, q, _ = setup
    idx4 = IVFPQIndex.build(x, nlist=32, block=256, m=32, ksub=16,
                            refine_m=16, seed=0)
    nb = idx4.code_blocks.shape[0]
    va, ra = idx4.search_dispatch(q, k=10, nprobe=32)
    vb, rb = idx4.search_dispatch(q, k=10, nprobe_blocks=nb)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    _, _, rows = idx4.search(q, k=10, nprobe_blocks=8)
    assert _recall(rows, exact) >= 0.5


# ------------------------------------------------- hierarchical extraction
def test_hier_extract_full_t_identical(setup):
    """hier_t = blk sorts every slot of every block before the merge —
    mathematically the same selection as exact lax.top_k, both probe
    modes."""
    _, x, q, idx = setup
    for skw in ({"nprobe": 16}, {"nprobe_blocks": 32}):
        ve, re_ = idx.search_dispatch(q, k=10, extract="exact", **skw)
        vh, rh = idx.search_dispatch(q, k=10, extract="hier",
                                     hier_t=idx.block, **skw)
        np.testing.assert_allclose(np.asarray(ve), np.asarray(vh),
                                   atol=1e-5)
        assert (np.asarray(re_) == np.asarray(rh)).all(), skw


def test_hier_extract_small_t_agrees(setup, refined):
    """hier_t << blk truncates only blocks contributing > hier_t of the
    stage-1 top-k1; at k=10 the final ranking must keep the exact top-1
    and near-total overlap."""
    _, x, q, _ = setup
    ve, re_ = refined.search_dispatch(q, k=10, nprobe=16, extract="exact")
    vh, rh = refined.search_dispatch(q, k=10, nprobe=16, extract="hier",
                                     hier_t=64)
    re_, rh = np.asarray(re_), np.asarray(rh)
    assert np.array_equal(re_[:, 0], rh[:, 0])
    overlap = np.mean([
        len(set(re_[b]) & set(rh[b])) / 10 for b in range(q.shape[0])])
    # this corpus's clusters are ~128 rows; hier_t=64 truncates some
    # (hier_t=128 measures 1.0 — the sizing rule in the docstring)
    assert overlap >= 0.95, overlap
    # identical scores on common rows (same scoring, different extraction)
    ve, vh = np.asarray(ve), np.asarray(vh)
    for b in range(q.shape[0]):
        se = dict(zip(re_[b].tolist(), ve[b].tolist()))
        for r, v in zip(rh[b].tolist(), vh[b].tolist()):
            if r in se:
                assert abs(se[r] - v) < 1e-4


def test_hier_extract_with_bias_and_blocks(setup):
    """hier extraction must honor the additive-bias contract (tombstones
    stay dead) on the block-budget path."""
    _, x, q, idx = setup
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    bias = np.zeros(len(x), np.float32)
    bias[exact[0][0]] = NEG_INF
    _, _, rows = idx.search(q[:1], k=10, nprobe_blocks=16, extract="hier",
                            hier_t=32, bias=bias)
    assert exact[0][0] not in set(rows[0])


# ------------------------------------------------------------- probe-spill
def test_spill_build_improves_budget_recall_and_dedups():
    """spill_frac > 0 duplicates cell-boundary rows into their 2nd cell:
    candidate recall at a SMALL block budget must not fall (and typically
    rises), len() counts distinct rows, no duplicate rows in results,
    and save/load keeps the distinct-row count (VERDICT r3 item 1)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = _corpus(rng, n=8192, d=64, clusters=96, noise=0.3)
    q = x[rng.choice(8192, 16, replace=False)] + \
        0.05 * rng.standard_normal((16, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    n_blocks, block_rows = 8, 1024
    blocks = [jnp.asarray(x[i * block_rows:(i + 1) * block_rows])
              for i in range(n_blocks)]

    def build(frac):
        return IVFPQIndex.build_streaming(
            lambda i: blocks[i], n_blocks, block_rows,
            nlist=64, block=64, m=16, ksub=16, refine_m=16,
            seed=0, train_blocks=8, spill_frac=frac)

    base, spilled = build(0.0), build(0.25)
    assert len(base) == len(spilled) == 8192
    assert int((spilled.block_rows >= 0).sum()) > 8192   # dup slots exist
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    for idx in (base, spilled):
        idx.ensure_block_centroids(dtype=jnp.float32)

    def coverage(idx, npb):
        # k = all probed slots → measures pure probe COVERAGE of the true
        # top-10 (what spill changes), not ADC extraction resolution
        _, rows = idx.search_dispatch(q, k=npb * 64, nprobe_blocks=npb,
                                      refine_overfetch=1)
        rows = np.asarray(rows)
        return np.mean([len(set(rows[b]) & set(exact[b])) / 10
                        for b in range(16)])

    # duplicates must buy coverage at tight budgets (boundary misses
    # dominate there) and cost at most noise at moderate ones
    gains = [coverage(spilled, nb) - coverage(base, nb) for nb in (1, 2)]
    assert max(gains) > 0.0, gains
    assert coverage(spilled, 8) >= coverage(base, 8) - 0.06

    # ADC-only search output carries no duplicate rows AND still fills
    # all k slots with live rows (dedup over-fetches before truncating —
    # duplicates must not silently burn result slots)
    _, vals, rows = spilled.search(q, k=20, nprobe_blocks=32)
    assert vals.shape == (16, 20) and rows.shape == (16, 20)
    for b in range(16):
        live = [int(r) for r, v in zip(rows[b], vals[b]) if v > -1e29]
        assert len(live) == len(set(live))
        assert len(live) == 20, f"dedup burned {20 - len(live)} slots"

    # save/load: distinct-row count survives (slots stay > rows)
    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "spilled")
    spilled.save(p)
    re = IVFPQIndex.load(p)
    assert len(re) == 8192
    assert int((re.block_rows >= 0).sum()) > 8192


def test_spill_rerank_path_dedups_candidates():
    """Host exact rerank on a spilled index: duplicates never burn top-k
    slots (exact_rerank keeps one copy per row per query)."""
    import ml_dtypes

    from archi_tpu.engine.host_store import HostVectorStore, exact_rerank

    store = HostVectorStore(8, dtype=ml_dtypes.bfloat16)
    v = np.random.default_rng(0).standard_normal((32, 8)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    store.add(v)
    q = v[:2]
    # candidate stream with row 5 duplicated (as a spilled copy would)
    rows = np.asarray([[5, 5, 3, 9, 1, 7], [5, 2, 2, 8, 0, 6]])
    vals = np.ones_like(rows, np.float32)
    rv, rr = exact_rerank(store, q, vals, rows, k=5)
    for b in range(2):
        live = [int(r) for r, val in zip(rr[b], rv[b]) if val > -1e29]
        assert len(live) == len(set(live)), rr[b]
    # and the true best row still wins
    assert int(rr[0][0]) == 5 or int(rr[0][0]) == 0
