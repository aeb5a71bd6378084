"""Pallas fused FIR blur — upfirdn2d's up=down=1 case in one VMEM pass.

TPU-native counterpart of the reference's templated CUDA kernel
(lib/gan/optim/upfirdn2d_kernel.cu:53-215): like the CUDA kernel's tiled
shared-memory specializations, this stages a zero-padded channel tile in
VMEM and accumulates the separable FIR as static tap loops — row taps as
leading-dim slices, column taps as sublane slices — so the row-pass
intermediate never touches HBM. Honest device timing (fori_loop-chained, see
the measurement table in ``upfirdn2d.py``) has XLA's depthwise dilated conv
ahead of this kernel on every production blur shape (e.g. 130²×256 fp32:
3.78 ms conv vs 5.94 pallas), so the kernel remains an explicit opt-in and
``upfirdn2d``'s 'auto' policy dispatches between the conv and the MXU
banded-matmul factorization by channel width.

Backward is the reference's autograd algebra (lib/gan/optim/upfirdn2d.py:
104-143): a blur's gradient is the blur with the flipped kernel and
"gradient padding" — wired through ``jax.custom_vjp``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ganecdotes_tpu.ops.upfirdn2d import _normalize_args

# per-buffer VMEM budget (padded input + intermediate + output tiles)
_VMEM_BYTES = 4 * 1024 * 1024


def _tiles(hp, wp, oy, ox, kh, itemsize, c):
    """(row_tile, channel_tile) keeping scratch + intermediates in VMEM.

    The channel tile is full C or a 128-multiple dividing C (Mosaic block
    rule); the row tile divides the padded output row count (the caller pads
    rows up to a multiple and crops after).
    """
    # lane-padded buffers can only be DMA-sliced at 128-channel granularity;
    # smaller channel counts (e.g. ADA's RGB blurs) use the matmul path
    if c % 128 != 0:
        return 0, 0
    ct = 128
    # per output row: double-buffered halo'd input + f32 row-pass + f32
    # col accumulator + double-buffered output block
    per_row = (2 * wp * itemsize + wp * 4 + ox * (4 + 2 * itemsize)) * ct
    budget_rows = (2 * _VMEM_BYTES) // max(per_row, 1)
    if budget_rows < 8:
        # a row tile below 8 can't honor the VMEM budget — not eligible
        # (flooring to 8 anyway would approve scratch far beyond VMEM)
        return 0, 0
    th = min(oy, budget_rows, 512)
    return th, ct


def fits(x_shape, taps_y, taps_x, up, down, pad):
    """True when the fused blur kernel covers this configuration."""
    (up_x, up_y), (down_x, down_y), (px0, px1, py0, py1) = _normalize_args(
        up, down, pad
    )
    if (up_x, up_y, down_x, down_y) != (1, 1, 1, 1):
        return False
    b, h, w, c = x_shape
    hp = h + max(py0, 0) + max(py1, 0)
    wp = w + max(px0, 0) + max(px1, 0)
    oy = hp + min(py0, 0) + min(py1, 0) - len(taps_y) + 1
    ox = wp + min(px0, 0) + min(px1, 0) - len(taps_x) + 1
    if oy <= 0 or ox <= 0:
        return False
    th, ct = _tiles(hp, wp, oy, ox, len(taps_y), 4, c)
    return th > 0


def _make_kernel_fn(taps_y, taps_x, th, ox, n_ht, n_ct):
    """Kernel over one (row-tile, channel-tile): double-buffered DMA of the
    halo'd input rows from HBM into VMEM scratch (next tile's copy overlaps
    this tile's FIR), then the separable FIR as static tap loops (rows =
    leading-dim slices, cols = sublane slices)."""
    ky = tuple(float(t) for t in taps_y)
    kx = tuple(float(t) for t in taps_x)
    kh, kw = len(ky), len(kx)

    def kernel(x_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        ht = pl.program_id(1)
        jc = pl.program_id(2)
        step = (i * n_ht + ht) * n_ct + jc
        n_steps = pl.num_programs(0) * n_ht * n_ct
        ct = scratch.shape[-1]
        tiled_c = ct != x_hbm.shape[-1]

        def dma_for(s, slot):
            # flat step -> (batch, row-tile, channel-tile) indices
            b_i = s // (n_ht * n_ct)
            r = s % (n_ht * n_ct)
            ht_i = r // n_ct
            jc_i = r % n_ct
            # slice channels only when actually tiled (a partial slice of an
            # untiled 128-padded buffer violates Mosaic's lane alignment)
            ch = pl.ds(jc_i * ct, ct) if tiled_c else slice(None)
            return pltpu.make_async_copy(
                x_hbm.at[b_i, pl.ds(ht_i * th, th + kh - 1), slice(None), ch],
                scratch.at[slot],
                sem.at[slot],
            )

        @pl.when(step == 0)
        def _():
            dma_for(0, 0).start()

        @pl.when(step + 1 < n_steps)
        def _():
            dma_for(step + 1, (step + 1) % 2).start()

        dma_for(step, step % 2).wait()
        xp = scratch[step % 2].astype(jnp.float32)  # (th + kh - 1, WP, Ct)
        # rows: true convolution = correlation with the flipped taps
        t = ky[kh - 1] * xp[0:th]
        for j in range(1, kh):
            t = t + ky[kh - 1 - j] * xp[j : j + th]
        # cols
        y = kx[kw - 1] * t[:, 0:ox]
        for i2 in range(1, kw):
            y = y + kx[kw - 1 - i2] * t[:, i2 : i2 + ox]
        out_ref[0] = y.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def upfirdn2d_pallas(x, taps_y, taps_x, up, down, pad):
    """Fused separable FIR blur on a (B, H, W, C) NHWC array (up=down=1).

    ``taps_y``/``taps_x`` are tuples of 1-D kernel taps (gain included);
    ``pad`` follows the reference's (x0, x1, y0, y1) convention, negative
    values crop. ``up``/``down`` must normalize to 1 (checked by ``fits``).
    """
    return _forward(x, taps_y, taps_x, up, down, pad)


def _forward(x, taps_y, taps_x, up, down, pad):
    (up_x, up_y), (down_x, down_y), (px0, px1, py0, py1) = _normalize_args(
        up, down, pad
    )
    assert (up_x, up_y, down_x, down_y) == (1, 1, 1, 1), "blur kernel only"
    b, h, w, c = x.shape
    kh, kw = len(taps_y), len(taps_x)

    # positive padding materializes outside (fused by XLA into the producer);
    # negative padding is a crop folded into the same slice
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (max(py0, 0), max(py1, 0)),
            (max(px0, 0), max(px1, 0)),
            (0, 0),
        ),
    )
    if py0 < 0 or py1 < 0 or px0 < 0 or px1 < 0:
        hp_full, wp_full = xp.shape[1], xp.shape[2]
        xp = xp[
            :,
            -min(py0, 0) : hp_full + min(py1, 0),
            -min(px0, 0) : wp_full + min(px1, 0),
        ]
    hp, wp = xp.shape[1], xp.shape[2]
    oy, ox = hp - kh + 1, wp - kw + 1

    # the DMA'd region's sublane (width) extent must be tile-aligned
    # (observed: unaligned widths fault the TPU worker); pad with zero
    # columns and crop the extra FIR outputs after
    sublane = 8 if x.dtype.itemsize == 4 else 16
    wpad = -wp % sublane
    if wpad:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wpad), (0, 0)))
    wp_a = wp + wpad
    ox_a = wp_a - kw + 1

    th, ct = _tiles(hp, wp_a, oy, ox_a, kh, x.dtype.itemsize, c)
    if th <= 0:
        raise ValueError(
            f"upfirdn2d_pallas: shape {x.shape} exceeds VMEM tiling; "
            "check fits() before calling"
        )
    # pad output rows up to the tile multiple (extra rows read zero-padded
    # input and are cropped after)
    n_ht = -(-oy // th)
    oy_pad = n_ht * th
    extra = oy_pad - oy
    if extra:
        xp = jnp.pad(xp, ((0, 0), (0, extra), (0, 0), (0, 0)))

    n_ct = c // ct
    y = pl.pallas_call(
        _make_kernel_fn(taps_y, taps_x, th, ox_a, n_ht, n_ct),
        out_shape=jax.ShapeDtypeStruct((b, oy_pad, ox_a, c), x.dtype),
        grid=(b, n_ht, n_ct),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, th, ox_a, ct), lambda i, j, k: (i, j, 0, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + kh - 1, wp_a, ct), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * (kh * oy_pad * wp_a + kw * oy_pad * ox_a),
            bytes_accessed=b * c * (hp * wp_a + oy_pad * ox_a) * 4,
            transcendentals=0,
        ),
        # interpreter mode keeps the kernel testable on CPU meshes
        interpret=jax.default_backend() != "tpu",
    )(xp)
    return y[:, :oy, :ox]


def _fwd(x, taps_y, taps_x, up, down, pad):
    return _forward(x, taps_y, taps_x, up, down, pad), (x.shape,)


def _bwd(taps_y, taps_x, up, down, pad, res, g):
    """Gradient blur: flipped taps + "gradient padding" (reference algebra,
    lib/gan/optim/upfirdn2d.py:104-143 with up=down=1)."""
    (x_shape,) = res
    _, _, (px0, px1, py0, py1) = _normalize_args(up, down, pad)
    kh, kw = len(taps_y), len(taps_x)

    gpy0 = kh - py0 - 1
    gpy1 = kh - py1 - 1
    gpx0 = kw - px0 - 1
    gpx1 = kw - px1 - 1

    dx = _forward(
        g,
        tuple(reversed(taps_y)),
        tuple(reversed(taps_x)),
        1,
        1,
        (gpx0, gpx1, gpy0, gpy1),
    )
    return (dx,)


upfirdn2d_pallas.defvjp(_fwd, _bwd)
