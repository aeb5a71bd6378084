"""Streaming log-domain Sinkhorn-Knopp potential updates (Pallas, TPU).

The SwAV trainer runs sinkhorn_knopp on a (20000, nprototypes) fp32
score matrix 10 times per sample (2 views x 5 patches) — at the generic
config (K=8000) it was 94% of the pretrain step (profiled 448.7 of
476.4 ms, scripts/swav_step_profile.py, docs/PERFORMANCE.md). The computation is
pure HBM streaming: each half-iteration is one logsumexp reduction over
the 400 MB matrix. `jnp`'s logsumexp costs two passes per reduction (amax,
then exp-sum), and the array-free potentials rewrite of the iteration
still pays 4 read passes per iteration. This kernel computes each
reduction in ONE pass with a flash-attention-style ONLINE max:

    m_new = max(m, max(tile));  s = s * exp(m - m_new) + sum(exp(tile - m_new))

so each update's reduction costs one streaming read. The twopass
variant issues one such pass per update (20 reads for 10 iterations);
the FUSED variant (see below) shares a single pass between an
iteration's v-update and the next u-accumulation — whole-row tiles
make v row-local — bringing 10 iterations down to 11 reads of the
score matrix, the Gauss–Seidel minimum.

Two exact algebraic eliminations (derived in swav.sinkhorn_knopp's
docstring notation, pinned by tests/test_ops.py):

  * The reference's global pre-normalization log_q -= lse(log_q) shifts
    every iterate by a constant that cancels in the final per-pixel
    renormalization — skipped entirely (saves a full pass + a 400 MB
    materialization of scores/eps).
  * v factors out of both its own update and the final renormalization:
    t_b = lse_k(base + u + v) = v_b + lse_k(base + u), and the last
    v-update computed exactly v = log_c - lse_k(base + u), so the final
    codes are q = exp(base + u - (log_c - v_last)) — one fused XLA
    elementwise over the ORIGINAL (unpadded) scores, no extra kernel.

Layout notes (the Mosaic rules measured in ops/modulated_conv_pallas.py):
K is padded to a lane multiple (128) with -1e30 scores and -3e32 log_r so
padded prototypes contribute exp(-huge) = 0 everywhere while keeping all
arithmetic finite (true -inf turns exp(-inf - -inf) into NaN); per-pixel
vectors ride as (B, 1) columns (lane-broadcast native), per-prototype
vectors as (1, K) rows (sublane-broadcast native).

Reference parity: /root/reference/hfc_with_swav/swav_clustering.py:509-544
(distributed_sinkhorn); same fixed point as swav.sinkhorn_knopp's jnp
potentials iteration (parity-tested; max |Δq| observed 3.1e-5 interpret,
1.1e-4 on the real v5e at (8000, 2000) eps=0.05 — online-max vs two-pass
lse reassociation on codes in [0, 1]).

Measured (v5e, fp32, 10 iters, chained-fori + value readback), per
sinkhorn call: ffhq config (20000, 5000): jnp potentials 29.9 ms →
twopass kernel 18.8 ms → FUSED kernel 14.5 ms; generic config
(20000, 8000): old array iteration 44.9 ms → potentials 45.2 ms →
twopass 27.0–31.6 ms → FUSED 19.2 ms. End-to-end the generic-config
pretrain FULL STEP drops 476.4 → 309.4 ms with twopass
(scripts/swav_step_profile.py) and further with fused.

The FUSED variant (default wherever whole-row tiles fit VMEM) streams
ONE pass over the matrix per iteration instead of two: whole-row tiles
make v per-ROW-local, so each b-tile computes v_i = log_c - lse_k(base
+ u_i) exactly in-registers from the completed u_i (VMEM scratch) and
immediately folds v_i into the online accumulation for u_{i+1} —
niters+1 passes total vs 2·niters. The enabling measurement: a probe
with exp stripped from the kernel showed exp costs only ~0.3 ms/pass
unhidden vs a 1.35 ms DMA-bound pass (i.e. the kernel is DMA-bound,
not VPU-bound), so doubling per-pass exp work while halving passes
nets ~1.3–1.65×. Parity fused-vs-twopass: 3.7e-6 on hardware.
Training equivalence (not just per-call parity): a 10-epoch production
ffhq-256 pretrain A/B on the v5e (GANECDOTES_SINKHORN_IMPL=jnp vs
auto) matches the per-epoch loss trajectory to ≤4e-6 at every epoch —
the per-call 1e-4-scale reassociation does not compound.

Known remaining headroom, deliberately left: the fused pass runs
1.75 ms vs a ~1.3 ms DMA floor (compute-bound on its 2 exps + 4 VPU
reductions). A rank-1 reassociation exp(z2) = E1·exp(rm+v)·exp(-u)
could reuse t's exp pass and move the column sum onto the MXU as a
(1,tb)@(tb,kp) matvec, but it forfeits per-column max shifting: a
prototype whose scores sit ≳87/inv_eps below the global max underflows
its whole accumulator (log 0 → ±inf → NaN next pass), and clamping
distorts exactly the starved-prototype boosts SwAV's equipartition
depends on. ~1.3× on the solve was not worth that hazard.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INIT = -3e38  # online-max init: below any finite f32 input
_PAD_SCORE = -1e30  # padded-prototype score: exp(pad/eps - m) == 0
_PAD_LOGR = -3e32  # keeps u_pad hugely negative after the -m-log(s) shift


def _u_kernel(x_ref, v_ref, logr_ref, u_ref, m_ref, s_ref, *, inv_eps, nb):
    """u_k = log_r_k - lse_b(x_bk/eps + v_b); streams over b-tiles."""
    bt = pl.program_id(1)

    @pl.when(bt == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INIT)
        s_ref[...] = jnp.zeros_like(s_ref)

    z = x_ref[...].astype(jnp.float32) * inv_eps + v_ref[...].astype(
        jnp.float32
    )  # (tb, tk) + (tb, 1) lane-broadcast
    bm = jnp.max(z, axis=0, keepdims=True)  # (1, tk)
    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, bm)
    s_ref[...] = s_ref[...] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(z - m_new), axis=0, keepdims=True
    )
    m_ref[...] = m_new

    @pl.when(bt == nb - 1)
    def _():
        u_ref[...] = logr_ref[...] - (m_ref[...] + jnp.log(s_ref[...]))


def _t_kernel(x_ref, u_ref, t_ref, m_ref, s_ref, *, inv_eps, nk):
    """t_b = lse_k(x_bk/eps + u_k); streams over k-tiles (v = log_c - t)."""
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INIT)
        s_ref[...] = jnp.zeros_like(s_ref)

    z = x_ref[...].astype(jnp.float32) * inv_eps + u_ref[...].astype(
        jnp.float32
    )  # (tb, tk) + (1, tk) sublane-broadcast
    bm = jnp.max(z, axis=1, keepdims=True)  # (tb, 1)
    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, bm)
    s_ref[...] = s_ref[...] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(z - m_new), axis=1, keepdims=True
    )
    m_ref[...] = m_new

    @pl.when(kt == nk - 1)
    def _():
        t_ref[...] = m_ref[...] + jnp.log(s_ref[...])


def _fused_kernel(x_ref, logr_ref, logc_ref, u_ref, t_ref,
                  m_ref, s_ref, uc_ref, *, inv_eps, niters, nb):
    """One streamed pass over b-tiles per Sinkhorn iteration.

    Whole-row tiles make v per-ROW-local: with the completed u_i held in
    VMEM scratch, each tile computes t = lse_k(x/eps + u_i) exactly
    in-registers, v_i = log_c - t, and immediately folds v_i into the
    online (m, s) accumulation for u_{i+1} — so iteration i costs ONE
    read of the score matrix instead of two (grid = (niters+1, nb);
    the final outer step only materializes t_fin = lse_k(x/eps + u_N)).
    Measured DMA-bound (docstring header): exp adds ~0.3 ms/pass over a
    pure streaming sum, so doubling per-pass exp work while halving
    passes is a straight ~1.8x.
    """
    it = pl.program_id(0)
    bt = pl.program_id(1)

    # finalize u_{it} from pass it-1's accumulators, then reset them
    @pl.when(bt == 0)
    def _():
        @pl.when(it == 0)
        def _():
            uc_ref[...] = jnp.zeros_like(uc_ref)

        @pl.when(it > 0)
        def _():
            uc_ref[...] = logr_ref[...] - (m_ref[...] + jnp.log(s_ref[...]))

        m_ref[...] = jnp.full_like(m_ref, _NEG_INIT)
        s_ref[...] = jnp.zeros_like(s_ref)

    x = x_ref[...].astype(jnp.float32) * inv_eps  # (tb, kp)

    # v_it per row (exact two-pass lse within the whole-row tile).
    # At it==0 the Gauss-Seidel order gives v_0 = 0 (uc holds zeros, and
    # the t computed here is discarded by the where).
    z1 = x + uc_ref[...]  # (tb, kp) + (1, kp) sublane-broadcast
    rm = jnp.max(z1, axis=1, keepdims=True)  # (tb, 1)
    t = rm + jnp.log(jnp.sum(jnp.exp(z1 - rm), axis=1, keepdims=True))
    v = jnp.where(it == 0, 0.0, logc_ref[...] - t)  # (tb, 1)

    # accumulate u_{it+1} = log_r - lse_b(x/eps + v_it) online over b
    z2 = x + v  # lane-broadcast
    bm = jnp.max(z2, axis=0, keepdims=True)  # (1, kp)
    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, bm)
    s_ref[...] = s_ref[...] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(z2 - m_new), axis=0, keepdims=True
    )
    m_ref[...] = m_new

    # outputs: u converges to u_N (finalized at it==niters's bt==0);
    # t_fin tiles are only correct on the last outer step — pallas writes
    # the out blocks every grid step, the final write wins
    u_ref[...] = uc_ref[...]
    t_ref[...] = t


def _tiles(n, cap):
    """Largest divisor of n that is a multiple of 8 and <= cap, or None.

    The start must itself be rounded DOWN to a multiple of 8: stepping -8
    from a non-multiple start yields no multiples of 8 at all, and Mosaic
    rejects non-8-divisible second-minor block dims at lowering time —
    one of the rules interpret mode does not check (caught on the real
    v5e at the production K=8000 → cap 146 → tb=50).
    """
    for t in range(min(cap, n) // 8 * 8, 7, -8):
        if n % t == 0:
            return t
    return None


def sinkhorn_supported(b, k, vmem_budget=9 * 2**20):
    """(tile_b, tile_k, k_padded) when the kernels can run, else None.

    Prefers WHOLE-ROW blocks (tile_k == k_padded): each double-buffered
    block is then one fully contiguous HBM slab, vs 4 KB strided runs for
    partial-row tiles — measured 478 GB/s strided vs ~700 GB/s contiguous
    on v5e at the production (20000, 5000).

    Whole-row blocks run UNPADDED (k_padded == k): Mosaic's lane rule is
    "multiple of 128 OR equal to the array dim", and a block equal to the
    logical row satisfies it — the compiler masks the internal lane pad
    itself. That elides the 400–645 MB jnp.pad materialization the
    wrapper otherwise pays per call (measured 14.5 → 13.3 ms at
    (20000, 5000), bitwise-identical codes). The VMEM budget still uses
    the 128-rounded width (what Mosaic physically allocates). Strided
    k-tiles keep explicit padding: a partial non-final block has no
    equal-to-dim escape hatch.
    """
    kp = -(-k // 128) * 128
    tb_cap = vmem_budget // (2 * kp * 4)
    tb = _tiles(b, min(tb_cap, 2048))
    if tb is not None:
        return tb, k, k
    # rows too wide for VMEM: fall back to strided k-tiles
    tk = next((t for t in (1024, 512, 256, 128) if kp % t == 0), None)
    if tk is None:
        return None
    for cap in (1024, 512, 256):
        tb = _tiles(b, cap)
        if tb is not None and 2 * tb * tk * 4 <= vmem_budget:
            return tb, tk, kp
    return None


@functools.partial(
    jax.jit, static_argnames=("niters", "eps", "tiles", "variant")
)
def _sinkhorn_pallas(scores, r, c, *, niters, eps, tiles, variant="auto"):
    b, k = scores.shape
    tb, tk, kp = tiles
    inv_eps = 1.0 / eps
    interpret = jax.default_backend() != "tpu"

    xp = jnp.pad(
        scores.astype(jnp.float32), ((0, 0), (0, kp - k)),
        constant_values=_PAD_SCORE,
    )
    log_r = jnp.pad(
        jnp.log(r.astype(jnp.float32)), (0, kp - k),
        constant_values=_PAD_LOGR,
    ).reshape(1, kp)
    log_c = jnp.log(c.astype(jnp.float32)).reshape(b, 1)

    nb, nk = b // tb, kp // tk

    if variant == "auto":
        variant = "fused" if tk == kp else "twopass"
    if variant == "fused":
        assert tk == kp, "fused variant needs whole-row tiles"
        u, t_fin = pl.pallas_call(
            functools.partial(_fused_kernel, inv_eps=inv_eps,
                              niters=niters, nb=nb),
            grid=(niters + 1, nb),
            in_specs=[
                pl.BlockSpec((tb, kp), lambda it, bt: (bt, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kp), lambda it, bt: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 1), lambda it, bt: (bt, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=(
                jax.ShapeDtypeStruct((1, kp), jnp.float32),
                jax.ShapeDtypeStruct((b, 1), jnp.float32),
            ),
            out_specs=(
                pl.BlockSpec((1, kp), lambda it, bt: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 1), lambda it, bt: (bt, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, kp), jnp.float32),
                pltpu.VMEM((1, kp), jnp.float32),
                pltpu.VMEM((1, kp), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=(niters + 1) * 6 * b * kp,
                transcendentals=(niters + 1) * 2 * b * kp,
                bytes_accessed=(niters + 1) * b * kp * 4,
            ),
            interpret=interpret,
        )(xp, log_r, log_c)
        return jnp.exp(
            scores.astype(jnp.float32) * inv_eps + u[:, :k] - t_fin
        )

    u_update = pl.pallas_call(
        functools.partial(_u_kernel, inv_eps=inv_eps, nb=nb),
        grid=(nk, nb),
        in_specs=[
            pl.BlockSpec((tb, tk), lambda kt, bt: (bt, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda kt, bt: (bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda kt, bt: (0, kt),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        out_specs=pl.BlockSpec((1, tk), lambda kt, bt: (0, kt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, tk), jnp.float32),
            pltpu.VMEM((1, tk), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * b * kp, transcendentals=b * kp,
            bytes_accessed=(b * kp + b + 2 * kp) * 4,
        ),
        interpret=interpret,
    )

    t_update = pl.pallas_call(
        functools.partial(_t_kernel, inv_eps=inv_eps, nk=nk),
        grid=(nb, nk),
        in_specs=[
            pl.BlockSpec((tb, tk), lambda bt, kt: (bt, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda bt, kt: (0, kt),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        out_specs=pl.BlockSpec((tb, 1), lambda bt, kt: (bt, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * b * kp, transcendentals=b * kp,
            bytes_accessed=(b * kp + b + kp) * 4,
        ),
        interpret=interpret,
    )

    def body(_, uv):
        _, v = uv
        u = u_update(xp, v, log_r)
        v = log_c - t_update(xp, u)
        return (u, v)

    u0 = jnp.zeros((1, kp), jnp.float32)
    v0 = jnp.zeros((b, 1), jnp.float32)
    u, v = jax.lax.fori_loop(0, niters, body, (u0, v0))

    # final renorm: q = exp(base + u - lse_k(base + u)); the last v-update
    # already computed lse_k(base + u) = log_c - v, so this is one fused
    # XLA elementwise over the ORIGINAL scores (padded columns never read)
    t_fin = log_c - v  # (b, 1)
    return jnp.exp(scores.astype(jnp.float32) * inv_eps + u[:, :k] - t_fin)


def sinkhorn_knopp_pallas(scores, niters, eps, r, c, variant="auto"):
    """Drop-in for swav.sinkhorn_knopp: codes (B, K) from scores (B, K).

    variant: 'auto' (fused single-pass-per-iteration when whole-row
    tiles fit VMEM, else the two-kernel pass-per-update), 'fused',
    'twopass'.
    """
    tiles = sinkhorn_supported(*scores.shape)
    if tiles is None:
        raise ValueError(
            f"no Mosaic-legal tiling for sinkhorn at {scores.shape}"
        )
    return _sinkhorn_pallas(scores, r, c, niters=int(niters),
                            eps=float(eps), tiles=tiles, variant=variant)


def sinkhorn_impl_flag():
    """'auto' (default) | 'jnp' | 'pallas' via GANECDOTES_SINKHORN_IMPL."""
    return os.environ.get("GANECDOTES_SINKHORN_IMPL", "auto")
