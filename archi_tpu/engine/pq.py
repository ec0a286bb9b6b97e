"""Product quantization (PQ) on TPU — the 100M-chunk-scale index codec.

BASELINE config 4 asks for 100M chunks; at 384-d bf16 that is ~77 GB — five
v5e chips of HBM for the *flat* corpus alone.  The reference has no answer at
this scale either (pgvector IVFFlat keeps full-precision vectors,
``src/cli/templates/init.sql:287-289``).  PQ compresses each vector to
``m`` uint8 codes (48 B/row at m=48: 16x smaller than bf16), putting 100M
rows in ~4.8 GB of HBM on ONE chip.

TPU-first design:
- **Training** (``PQCodec.train``): all ``m`` subspace k-means run
  *simultaneously* as one vmapped Lloyd's iteration — assignment is a single
  ``[m, Ns, ds] x [m, ksub, ds]`` batched matmul on the MXU, update is a
  vmapped segment-sum.  No per-subspace Python loop.
- **Encoding** (``PQCodec.encode``): blocked argmin over the same batched
  matmul; the corpus never leaves the device and only uint8 codes are kept.
- **ADC search** (``adc_topk``): per query, a ``[m, ksub]`` lookup table of
  ``q_sub · centroid`` inner products; a row's approximate score is the sum
  of ``m`` table entries selected by its codes.  Two device implementations
  with identical semantics, dispatched by measurement:
  - ``gather``: ``lax.scan`` over subspaces of batched [B, T] takes — one
    HBM pass over the codes, VPU-bound.
  - ``onehot``: codes expanded tile-wise to one-hot and contracted with the
    LUT on the MXU ([B, ksub] x [ksub, T] per subspace) — trades 256x FLOPs
    for MXU throughput.
  Both honor the engine's additive-bias contract (tombstones / metadata
  filters as NEG_INF, hybrid BM25 as finite values), same as
  ``archi_tpu.engine.topk``.

Scoring is IP-ADC: score(q, i) ~= q · x̂_i = sum_j q_j · C_j[code_ij] — an
approximation of the exact inner product, so recall is swept (not assumed)
by ``benchmarking/pq_sweep.py``.
"""

from __future__ import annotations

import functools
import json
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.engine.flat_index import jsonable_ids, load_npz
from archi_tpu.ops.pallas_topk import NEG_INF


# --------------------------------------------------------------------- train

@functools.partial(jax.jit, static_argnames=("ksub", "chunk"))
def _pq_assign(xs, codebooks, *, ksub, chunk=1 << 13):
    """xs [m, Nb, ds], codebooks [m, ksub, ds] → codes [m, Nb] i32.

    L2 argmin per subspace; ||x||^2 is constant per row so argmin of
    ``||c||^2 - 2 x·c`` suffices.  The x·c term is one batched MXU matmul,
    chunked over rows so the [m, chunk, ksub] distance tensor stays ~1.5 GB
    (unchunked it is 26 GB at m=96, N=262k — instant OOM)."""
    m, n, ds = xs.shape
    c2 = jnp.sum(codebooks.astype(jnp.float32) ** 2, axis=-1)  # [m, ksub]
    cb = codebooks.astype(jnp.float32)

    def assign_rows(rows):  # [m, c, ds] → [m, c] i32
        xc = jnp.einsum("mnd,mkd->mnk", rows.astype(jnp.float32), cb,
                        preferred_element_type=jnp.float32)
        return jnp.argmin(c2[:, None, :] - 2.0 * xc, axis=-1).astype(
            jnp.int32)

    if n <= chunk:
        return assign_rows(xs)
    pad = (-n) % chunk
    if pad:
        xs = jnp.concatenate(
            [xs, jnp.zeros((m, pad, ds), xs.dtype)], axis=1)
    parts = jnp.transpose(
        xs.reshape(m, (n + pad) // chunk, chunk, ds), (1, 0, 2, 3))
    codes = jax.lax.map(assign_rows, parts)          # [nc, m, chunk]
    return jnp.transpose(codes, (1, 0, 2)).reshape(m, n + pad)[:, :n]


@functools.partial(jax.jit, static_argnames=("ksub",))
def _pq_update_stats(xs, codes, *, ksub):
    """→ (sums [m, ksub, ds], counts [m, ksub]) for one training batch."""
    def one(x, a):
        s = jax.ops.segment_sum(x.astype(jnp.float32), a, num_segments=ksub)
        c = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), a,
                                num_segments=ksub)
        return s, c
    return jax.vmap(one)(xs, codes)


def _split_subspaces(x, m):
    """[N, D] → [m, N, ds] (device reshape/transpose, no copy churn)."""
    n, d = x.shape
    ds = d // m
    return jnp.transpose(x.reshape(n, m, ds), (1, 0, 2))


class PQCodec:
    """Trained product quantizer: ``codebooks [m, ksub, ds]`` f32.

    Optional **OPQ rotation** (``rotation [D, D]`` orthogonal): real
    embedding corpora are strongly anisotropic (the quality fixture puts
    76% of variance in 16 of 384 directions), which starves most PQ
    subspaces.  OPQ learns R by alternating PQ training with a Procrustes
    update so variance spreads across subspaces — measured 10x lower
    reconstruction MSE on the fixture corpus.  Inner products are
    preserved exactly (``q·x = (qR)·(xR)``), so the codec applies R to
    rows at encode and to queries at LUT time; ``decode`` returns vectors
    in the ORIGINAL space.
    """

    def __init__(self, codebooks, rotation=None):
        self.codebooks = jnp.asarray(codebooks, jnp.float32)
        self.m, self.ksub, self.ds = self.codebooks.shape
        self.dim = self.m * self.ds
        self.rotation = (None if rotation is None
                         else jnp.asarray(rotation, jnp.float32))

    def _rotate(self, x):
        return x if self.rotation is None else x @ self.rotation

    # ------------------------------------------------------------------
    @classmethod
    def train(cls, x, m: int, *, ksub: int = 256, iters: int = 12,
              seed: int = 0, sample: int = 1 << 18,
              opq_iters: int = 0) -> "PQCodec":
        """Train on (a sample of) ``x [N, D]``; D must be divisible by m.

        x may be host or device; only ``min(N, sample)`` rows are used and
        they stay on device throughout (config-4 corpora never fit on the
        host of this rig anyway).

        opq_iters > 0 learns an OPQ rotation first (alternate short PQ
        trainings with Procrustes updates of R on the sample — SVD of a
        [D, D] matrix per iteration, trivial on any backend), then trains
        the final codebooks in the rotated space.
        """
        x = jnp.asarray(x)
        n, d = x.shape
        if d % m:
            raise ValueError(f"dim {d} not divisible by m={m}")
        rng = np.random.default_rng(seed)
        if n > sample:
            rows = np.sort(rng.choice(n, size=sample, replace=False))
            x = x[jnp.asarray(rows)]
            n = sample
        if opq_iters > 0:
            x0 = x.astype(jnp.float32)
            rot = jnp.eye(d, dtype=jnp.float32)
            xr = x0
            for _ in range(opq_iters):
                cdc = cls.train(xr, m, ksub=ksub, iters=max(4, iters // 2),
                                seed=seed, sample=n)
                rec = cdc.decode(cdc.encode(xr))
                u, _sv, vt = jnp.linalg.svd(x0.T @ rec,
                                            full_matrices=False)
                rot = u @ vt
                xr = x0 @ rot
            codec = cls.train(xr, m, ksub=ksub, iters=iters, seed=seed,
                              sample=n)
            codec.rotation = rot
            return codec
        xs = _split_subspaces(x.astype(jnp.float32), m)      # [m, n, ds]
        ksub_eff = min(ksub, n)
        init = np.stack([
            np.sort(rng.choice(n, size=ksub_eff, replace=False))
            for _ in range(m)
        ])                                                    # [m, ksub]
        codebooks = jnp.take_along_axis(
            xs, jnp.asarray(init)[:, :, None], axis=1)        # [m, ksub, ds]
        # accumulate assignment stats over row batches: the vmapped
        # segment-sum over all n rows at once peaks >9 GB at m=96 — too
        # much next to a device-resident config-4 corpus
        tb = 1 << 16
        for _ in range(iters):
            sums = jnp.zeros((m, ksub_eff, xs.shape[2]), jnp.float32)
            counts = jnp.zeros((m, ksub_eff), jnp.float32)
            for s in range(0, n, tb):
                xb = xs[:, s: s + tb]
                codes = _pq_assign(xb, codebooks, ksub=ksub_eff)
                sb, cb = _pq_update_stats(xb, codes, ksub=ksub_eff)
                sums, counts = sums + sb, counts + cb
            means = sums / jnp.maximum(counts[:, :, None], 1.0)
            codebooks = jnp.where(counts[:, :, None] > 0, means, codebooks)
        if ksub_eff < ksub:   # tiny corpora: pad so codes stay uint8-valid
            pad = jnp.tile(codebooks[:, :1], (1, ksub - ksub_eff, 1))
            codebooks = jnp.concatenate([codebooks, pad], axis=1)
        return cls(codebooks)

    # ------------------------------------------------------------------
    def encode(self, x, *, block: int = 1 << 20) -> jax.Array:
        """[N, D] (host/device) → device codes [N, m] uint8, blocked so HBM
        holds one f32 block + codes at a time."""
        x = jnp.asarray(x)
        n = x.shape[0]
        out = []
        for s in range(0, n, block):
            xb = self._rotate(x[s: s + block].astype(jnp.float32))
            xb = _split_subspaces(xb, self.m)
            codes = _pq_assign(xb, self.codebooks, ksub=self.ksub)
            out.append(jnp.transpose(codes).astype(jnp.uint8))  # [Nb, m]
        return out[0] if len(out) == 1 else jnp.concatenate(out, axis=0)

    def decode(self, codes, *, chunk: int = 8192) -> jax.Array:
        """[N, m] uint8 → reconstructed [N, D] f32.

        Chunked over rows: the natural ``[m, N, ds]`` gather layout is
        lane-padded ds→128 on TPU (16x memory at ds=8 — a full-block decode
        materializes 25 GB), so only [m, chunk, ds] ever exists."""
        codes = jnp.asarray(codes).astype(jnp.int32)           # [N, m]
        n = codes.shape[0]

        def dec(rows):  # [c, m] → [c, D]
            sub = jnp.take_along_axis(
                self.codebooks,                                # [m, ksub, ds]
                jnp.transpose(rows)[:, :, None], axis=1)       # [m, c, ds]
            return jnp.transpose(sub, (1, 0, 2)).reshape(
                rows.shape[0], self.dim)

        if n <= chunk:
            out = dec(codes)
        else:
            pad = (-n) % chunk
            if pad:
                codes = jnp.concatenate(
                    [codes, jnp.zeros((pad, self.m), codes.dtype)], axis=0)
            out = jax.lax.map(dec, codes.reshape(-1, chunk, self.m))
            out = out.reshape(-1, self.dim)[:n]
        # rotation is orthogonal: un-rotate back to the original space
        return out if self.rotation is None else out @ self.rotation.T

    def luts(self, queries) -> jax.Array:
        """[B, D] → ADC lookup tables [B, m, ksub] f32 (q_sub · centroid);
        queries rotate with the codec (q·x == (qR)·(xR))."""
        q = self._rotate(jnp.asarray(queries, jnp.float32))
        qs = q.reshape(q.shape[0], self.m, self.ds)
        return jnp.einsum("bmd,mkd->bmk", qs, self.codebooks,
                          preferred_element_type=jnp.float32)

    # ------------------------------------------------------------------
    def save_arrays(self):
        out = {"codebooks": np.asarray(self.codebooks)}
        if self.rotation is not None:
            out["rotation"] = np.asarray(self.rotation)
        return out

    @classmethod
    def from_arrays(cls, arrs):
        return cls(arrs["codebooks"], rotation=arrs.get("rotation"))


# ----------------------------------------------------------------- ADC top-k

@functools.partial(jax.jit, static_argnames=("k", "tile", "impl"))
def adc_topk(luts, codes_t, bias, n_active, *, k=10, tile=1 << 20,
             impl="gather"):
    """Approximate top-k by ADC over PQ codes.

    Args:
      luts: [B, m, ksub] f32 from ``PQCodec.luts`` (pre-scaled by
        semantic_weight for hybrid — the bias carries the lexical part).
      codes_t: [m, N_pad] uint8 — TRANSPOSED code matrix so each subspace's
        codes are contiguous for the per-subspace HBM stream.
      bias: [N_pad] f32 additive bias (NEG_INF = dead row).
      n_active: scalar; rows >= n_active are padding.
      k, tile: top-k size / corpus tile rows (tile must divide N_pad).
      impl: "gather" (VPU takes) | "onehot" (MXU contraction) | "pallas"
        (fused VMEM one-hot kernel, ``ops/pallas_adc`` — the TPU default
        via ``PQFlatIndex``).
    Returns: (vals [B, k] f32, idx [B, k] i32) — idx are physical rows.
    """
    b, m, ksub = luts.shape
    n_pad = codes_t.shape[1]
    tile = min(tile, n_pad)
    assert n_pad % tile == 0, (n_pad, tile)  # silent floor would drop rows
    n_tiles = n_pad // tile
    k = min(k, n_pad)

    def score_tile_gather(codes_tile):
        # scan over subspaces: scores[b, t] += luts[b, j, codes[j, t]]
        ct = codes_tile.astype(jnp.int32)                    # [m, T]
        def step(acc, j_lut_codes):
            lut_j, codes_j = j_lut_codes                     # [B,ksub], [T]
            return acc + jnp.take(lut_j, codes_j, axis=1), None
        acc0 = jnp.zeros((b, ct.shape[1]), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0, (jnp.transpose(luts, (1, 0, 2)), ct))
        return acc

    def score_tile_onehot(codes_tile):
        from archi_tpu.ops.pallas_adc import adc_scores_xla

        return adc_scores_xla(jnp.transpose(luts, (1, 0, 2)), codes_tile)

    def score_tile_pallas(codes_tile):
        from archi_tpu.ops.pallas_adc import adc_scores

        t = codes_tile.shape[1]
        sub = 2048 if t % 2048 == 0 else (1024 if t % 1024 == 0 else t)
        return adc_scores(jnp.transpose(luts, (1, 0, 2)), codes_tile,
                          tile=sub)

    score_tile = {"onehot": score_tile_onehot,
                  "pallas": score_tile_pallas}.get(impl, score_tile_gather)

    def one_tile(i):
        start = i * tile
        ct = jax.lax.dynamic_slice(codes_t, (0, start), (m, min(tile, n_pad)))
        s = score_tile(ct)
        s = s + jax.lax.dynamic_slice(bias, (start,), (ct.shape[1],))[None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        s = jnp.where(col < jnp.asarray(n_active, jnp.int32), s, NEG_INF)
        vals, pos = jax.lax.top_k(s, min(k, s.shape[1]))
        return vals, pos + start

    if n_tiles == 1:
        return one_tile(0)
    vals, idx = jax.lax.map(one_tile, jnp.arange(n_tiles))   # [nt, B, k]
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(b, -1)
    idx = jnp.transpose(idx, (1, 0, 2)).reshape(b, -1)
    mvals, mpos = jax.lax.top_k(vals, k)
    return mvals, jnp.take_along_axis(idx, mpos, axis=1).astype(jnp.int32)


# ------------------------------------------------------------------- index

class PQFlatIndex:
    """Flat PQ index: device-resident uint8 codes + exhaustive ADC top-k.

    API mirrors ``FlatIndex`` where it matters to the serving stack: rows
    are append-ordered physical positions, ``bias`` is indexed by row, and
    capacity grows by doubling without recompiles (tile-aligned padding).
    """

    def __init__(self, codec: PQCodec, *, capacity: int = 1 << 15,
                 tile: int = 1 << 20):
        self.codec = codec
        self.tile = tile
        self._cap = self._round_cap(capacity)
        self.codes_t = jnp.zeros((codec.m, self._cap), jnp.uint8)
        self.n_rows = 0
        self._ids: list = []
        self._buf_lock = threading.Lock()

    def _round_cap(self, cap: int) -> int:
        t = min(self.tile, 1 << 14)
        return max(t, -(-cap // t) * t)

    def __len__(self):
        return self.n_rows

    @property
    def capacity(self):
        return self._cap

    # ---------------------------------------------------------------- build
    @classmethod
    def build(cls, x, ids=None, *, m: int = 48, ksub: int = 256,
              iters: int = 12, seed: int = 0, tile: int = 1 << 20,
              codec: PQCodec | None = None) -> "PQFlatIndex":
        """Train (unless a codec is supplied) + encode a corpus in one go.
        ``x`` may be a device array — nothing round-trips the host."""
        x = jnp.asarray(x)
        codec = codec or PQCodec.train(x, m, ksub=ksub, iters=iters,
                                       seed=seed)
        idx = cls(codec, capacity=x.shape[0], tile=tile)
        idx.add(x, ids)
        return idx

    def add(self, x, ids=None) -> np.ndarray:
        """Encode + append rows; returns their physical row numbers."""
        x = jnp.asarray(x)
        n_new = x.shape[0]
        codes = self.codec.encode(x)                         # [n_new, m] u8
        with self._buf_lock:
            start = self.n_rows
            if start + n_new > self._cap:
                new_cap = self._round_cap(
                    max(self._cap * 2, start + n_new))
                grown = jnp.zeros((self.codec.m, new_cap), jnp.uint8)
                self.codes_t = jax.lax.dynamic_update_slice(
                    grown, self.codes_t, (0, 0))
                self._cap = new_cap
            self.codes_t = jax.lax.dynamic_update_slice(
                self.codes_t, jnp.transpose(codes), (0, start))
            self.n_rows = start + n_new
            if ids is None:
                self._ids.extend(range(start, start + n_new))
            else:
                self._ids.extend(ids)
        return np.arange(start, start + n_new)

    # --------------------------------------------------------------- search
    def search_dispatch(self, queries, k: int = 10, *, bias=None,
                        normalize_queries: bool = True, impl="auto"):
        """Device-only ADC top-k → (vals [B,k] f32 dev, rows [B,k] i32 dev).
        bias is indexed by physical row ([capacity] or [n_rows],
        zero-padded here).  impl="auto": fused Pallas kernel on TPU,
        gather elsewhere."""
        if impl == "auto":
            from archi_tpu.utils.hardware import on_tpu

            impl = "pallas" if on_tpu() else "gather"
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if normalize_queries:
            q = q / jnp.maximum(
                jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        with self._buf_lock:
            codes_t, n_rows, cap = self.codes_t, self.n_rows, self._cap
        if bias is None:
            bias_full = jnp.zeros((cap,), jnp.float32)
        else:
            bias = jnp.asarray(bias, jnp.float32)
            bias_full = (bias if bias.shape[0] == cap else
                         jnp.zeros((cap,), jnp.float32).at[
                             : bias.shape[0]].set(bias))
        luts = self.codec.luts(q)
        tile = min(self.tile, cap)
        while cap % tile:  # capacity is a multiple of min(tile, 16k)
            tile //= 2
        return adc_topk(luts, codes_t, bias_full, n_rows, k=k,
                        tile=tile, impl=impl)

    def search(self, queries, k: int = 10, *, bias=None,
               normalize_queries: bool = True, impl="auto"):
        """→ (ids [B][k], vals [B,k] np, rows [B,k] np; None id = dead)."""
        vals, rows = self.search_dispatch(
            queries, k, bias=bias, normalize_queries=normalize_queries,
            impl=impl)
        vals = np.asarray(vals)
        rows = np.asarray(rows)
        dead = vals <= NEG_INF / 2
        ids = [[None if dead[b, j] else self._ids[int(rows[b, j])]
                for j in range(rows.shape[1])] for b in range(rows.shape[0])]
        return ids, vals, np.where(dead, -1, rows)

    # ------------------------------------------------------------ serialize
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(
            path,
            codes_t=np.asarray(self.codes_t[:, : self.n_rows]),
            **self.codec.save_arrays(),
            meta=json.dumps({
                "n_rows": self.n_rows, "tile": self.tile,
                "ids": jsonable_ids(self._ids),
            }),
        )

    @classmethod
    def load(cls, path: str) -> "PQFlatIndex":
        z = load_npz(path)
        meta = json.loads(str(z["meta"]))
        codec = PQCodec.from_arrays(
            {"codebooks": z["codebooks"],
             **({"rotation": z["rotation"]} if "rotation" in z else {})})
        idx = cls(codec, capacity=max(1, meta["n_rows"]), tile=meta["tile"])
        codes_t = jnp.asarray(z["codes_t"])
        idx.codes_t = jax.lax.dynamic_update_slice(
            idx.codes_t, codes_t, (0, 0))
        idx.n_rows = meta["n_rows"]
        idx._ids = list(meta["ids"])
        return idx
