"""Pallas TPU kernel for the shear warp's 1-D resample passes.

The XLA form of ``ops/affine_warp._resample_pass`` executes the
bit-decomposed per-line roll as ~10 full-tensor roll+select sweeps in HBM
plus one-hot einsums — measured 2.89 ms per select sweep inside the fused
ADA augment program on a v5e at (16, 792², 3) bf16 (scripts/ada_profile.py),
because XLA's layout assignment propagates the NHWC producer's C-minor
layout through the pass (3 of 128 lanes active). The isolated pass with a
free layout choice runs 9.3 ms; the fused program's ~50 ms of rolls is
pure layout coupling. ADA augmentation is the GAN trainer's largest
remaining cost (63 ms of the 145 ms bf16 D step, 69 ms of the 95 ms G
step — docs/PERFORMANCE.md 2026-08-20), so the pass gets a kernel.

This kernel performs one whole resample pass per HBM read+write:

    out[n, v, w] = lerp over taps t of  x[n, (U(n,w) + q(n,v) + t), w]

with the per-column integer shift U = floor(intercept), the per-output-row
tap base q = floor(alpha·v), and the bilinear weights split exactly as in
the XLA pass (same U/q/r/v/e/f algebra — see ``affine_warp.py``). Per
(image, channel, column-tile) block it:

1. rolls the (S, Wt) source block along sublanes by U mod S with the same
   ⌈log₂S⌉ conditional-shift decomposition — but on VMEM-resident data
   (VPU selects, no HBM round trips);
2. selects the 3 tap rows per output row with a one-hot (Vt, S) matrix
   built by iota-compare in VMEM and contracted on the MXU — exact in any
   dtype (single nonzero per row);
3. applies the out-of-range validity mask and the fractional lerp, and
   writes the (Vt, Wt) output tile.

The roll runs once per column tile (output-row tiles are the innermost
grid dimension; the rolled block persists in scratch).

Transpose kernel (for the VJP): same structure mirrored — weight the
cotangents with the lerp/validity coefficients, contract with the
TRANSPOSED one-hot (exact adjoint by construction), accumulate over
output-row tiles in an f32 scratch, and apply the inverse roll once at
the end. The resample is linear in ``x``, so forward and transpose close
each other under differentiation: ``resample_rows`` and
``resample_rows_t`` are mutually-referencing ``jax.custom_vjp`` functions,
giving exact derivatives of EVERY order wrt the image — which R1
regularization needs (grad-of-grad through the augment,
gan/losses.py). Cotangents wrt (alpha, intercept) are returned as zeros:
ADA's transform parameters come from RNG sampling and are never
differentiated; use the XLA pass if you need ∂/∂M.

Reference analog: the composed `grid_sample` warp inside ADA
(lib/gan/ada.py:455-517); this is its TPU-native separable form.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["resample_rows", "resample_rows_t"]

_LANE_TILE = 256  # Wt: columns per block (two 128-lane groups per DMA row)
_ROW_TILE = 128  # Vt: output rows per grid step


def _n_bits(length):
    return max(1, int(np.ceil(np.log2(length))))


def _roll_up(block, amt, length):
    """roll ``block`` (S, Wt) upward along sublanes by per-column ``amt``
    (int32 (Wt,), already reduced mod ``length``) — bit-decomposed
    conditional shifts, all VMEM-resident."""
    out = block
    for k in range(_n_bits(length)):
        sh = 1 << k
        if sh >= length:
            break
        cond = ((amt >> k) & 1) == 1  # (Wt,)
        shifted = jnp.concatenate([out[sh:], out[:sh]], axis=0)
        out = jnp.where(cond[None, :], shifted, out)
    return out


def _pass_geometry(alpha_ref, icpt_ref, v_idx, wt, vt, src_len):
    """Shared index algebra — identical to the XLA pass (affine_warp.py):
    U/vfrac per column, q/r per output row, carry e and fraction f."""
    w_idx = pl.program_id(2)
    # the whole (host-padded) intercept row rides in VMEM; slice this
    # tile's columns (padding keeps the ds in bounds at the ragged tail)
    icpt = icpt_ref[0, 0, pl.ds(w_idx * wt, wt)].astype(jnp.float32)
    U = jnp.floor(icpt)
    vfrac = icpt - U
    Ui = U.astype(jnp.int32)

    alpha = alpha_ref[pl.program_id(0), 0]
    v0 = (v_idx * vt).astype(jnp.float32)
    # Mosaic's tpu.iota is integer-only; build int32 and convert
    vi = jax.lax.broadcasted_iota(jnp.int32, (vt, 1), 0).astype(
        jnp.float32
    ) + v0
    au = alpha * vi  # (Vt, 1)
    q = jnp.floor(au)
    r = au - q
    qi = q.astype(jnp.int32)  # (Vt, 1)

    e_in = r + vfrac[None, :]  # (Vt, Wt)
    e = jnp.floor(e_in)
    f32 = e_in - e
    e1 = e == 1
    return Ui, qi, e1, f32


def _fwd_kernel(wt, alpha_ref, icpt_ref, x_ref, out_ref, rolled_ref):
    v_idx = pl.program_id(3)
    s = x_ref.shape[2]
    vt = out_ref.shape[2]
    dtype = x_ref.dtype

    Ui, qi, e1, f32 = _pass_geometry(alpha_ref, icpt_ref, v_idx, wt, vt, s)

    @pl.when(v_idx == 0)
    def _():
        rolled_ref[:] = _roll_up(x_ref[0, 0], jnp.mod(Ui, s), s)

    rolled = rolled_ref[:]
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (vt, s), 1)

    gs = []
    for t in range(3):
        tgt = jnp.mod(qi + t, s)  # (Vt, 1)
        onehot = (s_iota == tgt).astype(dtype)  # (Vt, S)
        g = jnp.dot(onehot, rolled, preferred_element_type=jnp.float32)
        k_idx = Ui[None, :] + qi + t  # (Vt, Wt) — unwrapped position
        valid = (k_idx >= 0) & (k_idx <= s - 1)
        # cast to the data dtype BEFORE the lerp to match the XLA pass
        # bit-for-bit (it multiplies g by the mask and lerps in x.dtype)
        gs.append(jnp.where(valid, g, 0.0).astype(dtype))

    lo = jnp.where(e1, gs[1], gs[0])
    hi = jnp.where(e1, gs[2], gs[1])
    f = f32.astype(dtype)
    out_ref[0, 0] = ((1.0 - f) * lo + f * hi).astype(out_ref.dtype)


def _bwd_kernel(v_total, wt, alpha_ref, icpt_ref, g_ref, out_ref, acc_ref):
    v_idx = pl.program_id(3)
    n_v = pl.num_programs(3)
    s = out_ref.shape[2]
    vt = g_ref.shape[2]

    Ui, qi, e1, f32 = _pass_geometry(alpha_ref, icpt_ref, v_idx, wt, vt, s)

    @pl.when(v_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gbar = g_ref[0, 0].astype(jnp.float32)  # (Vt, Wt)
    # ragged tail of the V grid: block rows past the true output length
    # read garbage — they must not contribute to the accumulation
    v0 = v_idx * vt
    v_live = (
        jax.lax.broadcasted_iota(jnp.int32, (vt, 1), 0) + v0
    ) < v_total
    gbar = jnp.where(v_live, gbar, 0.0)

    one = jnp.float32(1.0)
    e1f = e1.astype(jnp.float32)
    w_taps = (
        (one - f32) * (one - e1f),  # coefficient of tap 0
        (one - f32) * e1f + f32 * (one - e1f),  # tap 1
        f32 * e1f,  # tap 2
    )

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (vt, s), 1)
    acc = acc_ref[:]
    for t in range(3):
        tgt = jnp.mod(qi + t, s)
        onehot = (s_iota == tgt).astype(jnp.float32)  # (Vt, S)
        k_idx = Ui[None, :] + qi + t
        valid = ((k_idx >= 0) & (k_idx <= s - 1)).astype(jnp.float32)
        contrib = w_taps[t] * valid * gbar  # (Vt, Wt) f32
        acc = acc + jax.lax.dot_general(
            onehot, contrib,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, Wt)
    acc_ref[:] = acc

    @pl.when(v_idx == n_v - 1)
    def _():
        # inverse of the forward's upward roll: roll by (S - U) mod S
        inv_amt = jnp.mod(-Ui, s)
        out_ref[0, 0] = _roll_up(acc_ref[:], inv_amt, s).astype(
            out_ref.dtype
        )


def _scalar_operands(alpha, intercept, wt):
    """Mosaic requires block trailing dims (8,128)-divisible or equal to
    the array dims. alpha rides whole in SMEM as (B, 1), indexed by
    program_id in-kernel; intercept is host-padded to a tile multiple and
    rides whole per block as (B, 1, Wpad) — the kernel slices its tile
    (the pad keeps the ragged-tail ds aligned instead of clamped)."""
    b, w = intercept.shape
    w_pad = int(np.ceil(w / wt)) * wt
    icpt = jnp.pad(intercept.astype(jnp.float32), ((0, 0), (0, w_pad - w)))
    icpt = icpt.reshape(b, 1, w_pad)
    alpha_spec = pl.BlockSpec(
        (b, 1), lambda bb, cc, ww, vv: (0, 0), memory_space=pltpu.SMEM
    )
    icpt_spec = pl.BlockSpec(
        (1, 1, w_pad), lambda bb, cc, ww, vv: (bb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return alpha.reshape(b, 1).astype(jnp.float32), icpt, alpha_spec, icpt_spec


def _lane_tile(w):
    # the in-kernel intercept ds loads wt lanes — Mosaic requires 128-lane
    # granularity, so round small widths UP to 128 (BlockSpec pads the
    # overhang; a 120-wide tile crashed vector.load on hardware)
    return min(_LANE_TILE, int(np.ceil(w / 128)) * 128)


def _fwd_pallas(x, alpha, intercept, out_len):
    b, c, s, w = x.shape
    wt = _lane_tile(w)
    vt = min(_ROW_TILE, out_len)
    grid = (b, c, pl.cdiv(w, wt), pl.cdiv(out_len, vt))
    alpha_op, icpt_op, alpha_spec, icpt_spec = _scalar_operands(
        alpha, intercept, wt
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, wt),
        grid=grid,
        in_specs=[
            alpha_spec,
            icpt_spec,
            pl.BlockSpec(
                (1, 1, s, wt),
                lambda bb, cc, ww, vv: (bb, cc, 0, ww),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, vt, wt),
            lambda bb, cc, ww, vv: (bb, cc, vv, ww),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, out_len, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((s, wt), x.dtype)],
        # interpreter mode keeps the kernel testable on CPU meshes
        interpret=jax.default_backend() != "tpu",
    )(alpha_op, icpt_op, x)


def _bwd_pallas(g, alpha, intercept, src_len):
    b, c, v_total, w = g.shape
    wt = _lane_tile(w)
    vt = min(_ROW_TILE, v_total)
    grid = (b, c, pl.cdiv(w, wt), pl.cdiv(v_total, vt))
    alpha_op, icpt_op, alpha_spec, icpt_spec = _scalar_operands(
        alpha, intercept, wt
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, v_total, wt),
        grid=grid,
        in_specs=[
            alpha_spec,
            icpt_spec,
            pl.BlockSpec(
                (1, 1, vt, wt),
                lambda bb, cc, ww, vv: (bb, cc, vv, ww),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, src_len, wt),
            lambda bb, cc, ww, vv: (bb, cc, 0, ww),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, src_len, w), g.dtype),
        scratch_shapes=[pltpu.VMEM((src_len, wt), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(alpha_op, icpt_op, g)


# --------------------------------------------------------------------------
# mutually-closing custom VJPs: the pass is linear in x, so the derivative
# of the forward is the transpose and vice versa — exact at every order
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def resample_rows(x, alpha, intercept, out_len):
    """Fused 1-D bilinear row-resample (see module docstring).

    x: (B, C, S, W) — resampled along S per column w with source position
    ``alpha[b]·v + intercept[b, w]``. Returns (B, C, out_len, W).
    Derivatives wrt ``alpha``/``intercept`` are ZEROS (documented above).
    """
    return _fwd_pallas(x, alpha, intercept, out_len)


def _resample_rows_fwd(x, alpha, intercept, out_len):
    # call the WRAPPED function (not _fwd_pallas): under higher-order
    # differentiation the fwd rule's trace is differentiated again, and a
    # raw pallas_call there has no JVP rule — the custom_vjp wrapper must
    # protect every level (R1 = grad-of-grad through the augment)
    out = resample_rows(x, alpha, intercept, out_len)
    return out, (alpha, intercept, x.shape[2])


def _resample_rows_bwd(out_len, res, g):
    alpha, intercept, src_len = res
    return (
        resample_rows_t(g, alpha, intercept, src_len),
        jnp.zeros_like(alpha),
        jnp.zeros_like(intercept),
    )


resample_rows.defvjp(_resample_rows_fwd, _resample_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def resample_rows_t(g, alpha, intercept, src_len):
    """Exact adjoint of ``resample_rows``: splat cotangents back to the
    (B, C, src_len, W) source. Linear in ``g``; its own VJP is the
    forward resample (mutual closure — infinitely differentiable wrt g)."""
    return _bwd_pallas(g, alpha, intercept, src_len)


def _resample_rows_t_fwd(g, alpha, intercept, src_len):
    out = resample_rows_t(g, alpha, intercept, src_len)  # see fwd-rule note
    return out, (alpha, intercept, g.shape[2])


def _resample_rows_t_bwd(src_len, res, gg):
    alpha, intercept, out_len = res
    return (
        resample_rows(gg, alpha, intercept, out_len),
        jnp.zeros_like(alpha),
        jnp.zeros_like(intercept),
    )


resample_rows_t.defvjp(_resample_rows_t_fwd, _resample_rows_t_bwd)
