"""Parity tests for ops: upfirdn2d (ref vs matmul vs numpy oracle), fused act.

Mirrors the reference's own dual-path testing seam: the CUDA kernels keep
pure-PyTorch fallbacks precisely so outputs can be cross-checked
(lib/gan/optim/upfirdn2d.py:156-160).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganecdotes_tpu.ops import (
    blur_2d,
    downsample_2d,
    fused_leaky_relu,
    make_kernel,
    resize_bilinear,
    resize_nearest,
    upfirdn2d,
    upfirdn2d_ref,
    upsample_2d,
)
from ganecdotes_tpu.ops.fused_act import fused_leaky_relu_pallas
from ganecdotes_tpu.ops.grid_sample import grid_sample_bilinear


def upfirdn2d_numpy_oracle(x, kernel, up, down, pad):
    """Direct per-pixel spec implementation: zero-insert, pad, convolve, subsample."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    up_h = np.zeros((b, h * up, w * up, c), x.dtype)
    up_h[:, ::up, ::up, :] = x
    padded = np.zeros(
        (b, h * up + pad0 + pad1, w * up + pad0 + pad1, c), x.dtype
    )
    if pad0 >= 0 and pad1 >= 0:
        padded[:, pad0 : pad0 + h * up, pad0 : pad0 + w * up, :] = up_h
    else:
        raise NotImplementedError
    oh = (h * up + pad0 + pad1 - kh) // down + 1
    ow = (w * up + pad0 + pad1 - kw) // down + 1
    out = np.zeros((b, oh, ow, c), np.float64)
    # true convolution: out[i,j] = sum_k K[p,q] * padded[i*down + (kh-1-p), ...]
    # equivalently cross-correlate with the flipped kernel
    kf = kernel[::-1, ::-1]
    for i in range(oh):
        for j in range(ow):
            patch = padded[:, i * down : i * down + kh, j * down : j * down + kw, :]
            out[:, i, j, :] = np.einsum("bhwc,hw->bc", patch, kf)
    return out.astype(x.dtype)


@pytest.mark.parametrize(
    "up,down,pad",
    [
        (1, 1, (1, 1)),
        (2, 1, (2, 1)),
        (1, 2, (2, 1)),
        (2, 1, (1, 1)),
        (1, 2, (1, 1)),
        (1, 1, (2, 2)),
    ],
)
def test_upfirdn2d_matches_numpy_oracle(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]))

    want = upfirdn2d_numpy_oracle(x, k, up, down, pad)
    got_ref = upfirdn2d_ref(jnp.asarray(x), jnp.asarray(k), up, down, pad)
    got_mm = upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad, impl="matmul")

    np.testing.assert_allclose(got_ref, want, atol=1e-5)
    np.testing.assert_allclose(got_mm, want, atol=1e-5)


def test_upfirdn2d_grad_paths_agree():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    k = make_kernel([1, 3, 3, 1], gain=4.0)

    f_ref = lambda v: upfirdn2d_ref(v, k, 2, 1, (2, 1)).sum()
    f_mm = lambda v: upfirdn2d(v, k, 2, 1, (2, 1), impl="matmul").sum()

    g_ref = jax.grad(f_ref)(x)
    g_mm = jax.grad(f_mm)(x)
    np.testing.assert_allclose(g_ref, g_mm, atol=1e-5)


def test_stylegan_resampling_shapes():
    x = jnp.zeros((2, 16, 16, 8))
    assert upsample_2d(x).shape == (2, 32, 32, 8)
    assert downsample_2d(x).shape == (2, 8, 8, 8)
    # blur used after conv_transpose in ModulatedConv2d upsample: pad (1,1),
    # gain 4 — shrinks 2h+1 -> 2h
    y = jnp.zeros((2, 33, 33, 8))
    assert blur_2d(y, pad=(1, 1), upsample_factor=2).shape == (2, 32, 32, 8)


def test_upsample_downsample_roundtrip_dc():
    # a constant image must stay (nearly) constant through up/down sampling
    x = jnp.ones((1, 16, 16, 2))
    up = upsample_2d(x)
    np.testing.assert_allclose(up[0, 4:-4, 4:-4, 0], 1.0, atol=1e-4)
    down = downsample_2d(x)
    np.testing.assert_allclose(down[0, 2:-2, 2:-2, 0], 1.0, atol=1e-4)


def test_fused_leaky_relu_matches_formula():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    got = fused_leaky_relu(x, b)
    v = np.asarray(x) + np.asarray(b)
    want = np.where(v >= 0, v, 0.2 * v) * np.sqrt(2.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fused_leaky_relu_pallas_parity_and_grad():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))

    np.testing.assert_allclose(
        fused_leaky_relu_pallas(x, b), fused_leaky_relu(x, b), rtol=1e-6
    )

    g1 = jax.grad(lambda v, w: (fused_leaky_relu_pallas(v, w) ** 2).sum(), (0, 1))(
        x, b
    )
    g2 = jax.grad(lambda v, w: (fused_leaky_relu(v, w) ** 2).sum(), (0, 1))(x, b)
    np.testing.assert_allclose(g1[0], g2[0], rtol=1e-5)
    np.testing.assert_allclose(g1[1], g2[1], rtol=1e-5)


def test_resize_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(4)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    for size in [(10, 14), (256, 256), (3, 4)]:
        want = (
            F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size, mode="nearest")
            .permute(0, 2, 3, 1)
            .numpy()
        )
        got = resize_nearest(jnp.asarray(x), size)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_nearest_wide_channel_conv_path():
    """C>=64 integer upscales dispatch to the depthwise lhs-dilated conv
    (upfirdn2d's measured policy); it must equal the broadcast form and
    torch F.interpolate exactly, including non-square factors."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(5)
    for (h, w, c), size in [
        ((4, 4, 64), (8, 8)),      # s=2, the acc-transition shape family
        ((4, 6, 128), (12, 12)),   # s=(3, 2)
        ((2, 2, 64), (8, 8)),      # s=4
    ]:
        x = rng.randn(2, h, w, c).astype(np.float32)
        want = (
            F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size,
                          mode="nearest")
            .permute(0, 2, 3, 1)
            .numpy()
        )
        got = resize_nearest(jnp.asarray(x), size)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
        # int dtypes must stay on the broadcast/gather path (labels)
        xi = (x * 10).astype(np.int32)
        got_i = resize_nearest(jnp.asarray(xi), size)
        want_i = (
            F.interpolate(torch.from_numpy(xi.astype(np.float32))
                          .permute(0, 3, 1, 2), size, mode="nearest")
            .permute(0, 2, 3, 1).numpy().astype(np.int32)
        )
        np.testing.assert_array_equal(np.asarray(got_i), want_i)


def test_resize_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(5)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    for size, ac in [((16, 16), False), ((5, 9), False), ((16, 16), True)]:
        want = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                size,
                mode="bilinear",
                align_corners=ac,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        got = resize_bilinear(jnp.asarray(x), size, align_corners=ac)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(6)
    x = rng.randn(2, 9, 9, 3).astype(np.float32)
    grid = (rng.rand(2, 6, 6, 2).astype(np.float32) * 2.4) - 1.2  # incl. OOB

    want = (
        F.grid_sample(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize(
    "shape,pad",
    [
        ((2, 16, 16, 128), (2, 1, 2, 1)),
        ((1, 8, 8, 128), (-1, 2, 2, -1)),  # crop + pad mix
        ((2, 17, 13, 256), (2, 1, 1, 2)),  # odd sizes -> alignment padding
    ],
)
def test_upfirdn2d_pallas_blur_parity_and_grad(shape, pad):
    from ganecdotes_tpu.ops.upfirdn2d import (
        _separable_taps,
        make_kernel,
        upfirdn2d_ref,
    )
    from ganecdotes_tpu.ops.upfirdn2d_pallas import fits, upfirdn2d_pallas

    k = make_kernel((1, 3, 3, 1))
    ty, tx = _separable_taps(k)
    assert fits(shape, ty, tx, (1, 1), (1, 1), pad)
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    want = upfirdn2d_ref(x, jnp.asarray(k), up=1, down=1, pad=pad)
    got = upfirdn2d_pallas(x, ty, tx, (1, 1), (1, 1), pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    g_p = jax.grad(lambda v: (upfirdn2d_pallas(v, ty, tx, (1, 1), (1, 1),
                                               pad) ** 2).sum())(x)
    g_r = jax.grad(lambda v: (upfirdn2d_ref(v, jnp.asarray(k), up=1, down=1,
                                            pad=pad) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), atol=1e-4)


def test_upfirdn2d_pallas_impl_flag_falls_back():
    from ganecdotes_tpu.ops.upfirdn2d import make_kernel, upfirdn2d, upfirdn2d_ref

    k = make_kernel((1, 3, 3, 1))
    # c=3 (not 128-divisible) and up=2 both route to the matmul fallback
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 3).astype(np.float32))
    got = upfirdn2d(x, k, up=2, down=1, pad=(2, 1), impl="pallas")
    want = upfirdn2d_ref(x, jnp.asarray(k), up=2, down=1, pad=(2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_upfirdn2d_pallas_vmem_budget_holds():
    """The scratch the kernel actually allocates must stay within the VMEM
    budget the tiling model claims, across a sweep of eligible shapes —
    interpret-mode CPU runs can't catch a real VMEM OOM, so assert the
    accounting itself (VMEM is ~16 MB/core more headroom than the 2x4 MB
    budget + double-buffered output blocks claimed here)."""
    from ganecdotes_tpu.ops.upfirdn2d_pallas import _VMEM_BYTES, _tiles

    kh = kw = 4
    for hp, wp, c in [
        (34, 40, 128), (66, 72, 512), (130, 136, 256), (258, 264, 128),
        (514, 520, 128), (130, 136, 1024), (1026, 1032, 128),
    ]:
        for itemsize in (2, 4):
            oy, ox = hp - kh + 1, wp - kw + 1
            th, ct = _tiles(hp, wp, oy, ox, kh, itemsize, c)
            if th <= 0:
                continue
            # what _forward actually allocates:
            scratch = 2 * (th + kh - 1) * wp * ct * itemsize  # dbl-buf input
            rowpass = (th + kh - 1) * wp * ct * 4             # f32 row FIR
            colacc = th * ox * ct * 4                         # f32 col acc
            out_blk = 2 * th * ox * ct * itemsize             # dbl-buf out
            total = scratch + rowpass + colacc + out_blk
            assert total <= 2 * _VMEM_BYTES + out_blk + rowpass, (
                hp, wp, c, itemsize, th, ct, total
            )
            # hard ceiling: never claim more than a core's 16 MB of VMEM
            assert total <= 16 * 1024 * 1024, (hp, wp, c, itemsize, total)
            assert oy % 1 == 0 and c % ct == 0


# ---------------------------------------------------------------------------
# affine_warp: scatter-free separable warp vs the grid_sample oracle
# ---------------------------------------------------------------------------


def _center_affine(A2, hw, t=(0.0, 0.0)):
    h, w = hw
    cx, cy = (w - 1) / 2, (h - 1) / 2
    A2 = np.asarray(A2, np.float32)
    tx = cx - A2[0, 0] * cx - A2[0, 1] * cy + t[0]
    ty = cy - A2[1, 0] * cx - A2[1, 1] * cy + t[1]
    return np.array(
        [[A2[0, 0], A2[0, 1], tx], [A2[1, 0], A2[1, 1], ty]], np.float32
    )


def _smooth_image(b, h, w, c):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [np.sin(xx / 4 + i) + np.cos(yy / 5 - i) for i in range(c)], -1
    )
    return jnp.asarray(np.broadcast_to(img, (b, h, w, c)).copy())


def test_affine_warp_shear_exact_for_separable_maps():
    """Identity / translation / scale / x-shear / 90-degree maps have eps=0
    in the two-pass factorization, so shear == exact bilinear bit-for-bit
    (away from the border where pad semantics differ)."""
    from ganecdotes_tpu.ops.affine_warp import (
        affine_warp_exact,
        affine_warp_shear,
    )

    h = w = 33
    x = _smooth_image(2, h, w, 2) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (2, h, w, 2)
    )
    cases = [
        _center_affine(np.eye(2), (h, w)),
        _center_affine(np.eye(2), (h, w), (3.3, -2.7)),
        _center_affine(np.diag([1.3, 0.8]), (h, w)),
        _center_affine([[1, 0.4], [0, 1]], (h, w)),
        _center_affine([[0, -1], [1, 0]], (h, w)),
    ]
    for m in cases:
        M = jnp.asarray(np.stack([m, m]), jnp.float32)
        ye = np.asarray(affine_warp_exact(x, M))[:, 8:-8, 8:-8]
        ys = np.asarray(affine_warp_shear(x, M))[:, 8:-8, 8:-8]
        np.testing.assert_allclose(ys, ye, atol=2e-5)


@pytest.mark.slow
def test_affine_warp_shear_close_for_rotations():
    """Rotations interpolate on a sheared lattice (|eps| <= 1 by transpose
    conditioning): tolerance parity on smooth images, mixed per-image
    matrices exercising both the swap and no-swap branches."""
    from ganecdotes_tpu.ops.affine_warp import (
        affine_warp_exact,
        affine_warp_shear,
    )

    h = w = 33
    x = _smooth_image(3, h, w, 2)
    mats = [
        _center_affine(
            [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], (h, w)
        )
        for a in (0.5, 1.4, 2.7)  # 29, 80, 155 degrees
    ]
    M = jnp.asarray(np.stack(mats), jnp.float32)
    ye = np.asarray(affine_warp_exact(x, M))[:, 8:-8, 8:-8]
    ys = np.asarray(affine_warp_shear(x, M))[:, 8:-8, 8:-8]
    assert np.abs(ys - ye).max() < 0.03
    assert np.abs(ys - ye).mean() < 0.005


@pytest.mark.slow
def test_affine_warp_shear_backward_uses_rolls_only():
    """The entire point: jax.grad through the shear warp is rolls + selects
    + transposed matmuls. A scatter (or gather) op in the compiled backward
    would reintroduce the TPU's weakest primitive. (Matched as HLO op
    syntax "scatter(" — the bare word appears in op metadata whenever the
    calling test's *name* contains it.)"""
    from ganecdotes_tpu.ops.affine_warp import affine_warp_shear

    x = _smooth_image(2, 17, 17, 2)
    m = _center_affine(
        [[np.cos(0.5), -np.sin(0.5)], [np.sin(0.5), np.cos(0.5)]], (17, 17)
    )
    M = jnp.asarray(np.stack([m, m]), jnp.float32)
    hlo = (
        jax.jit(jax.grad(lambda v: jnp.sum(affine_warp_shear(v, M) ** 2)))
        .lower(x)
        .compile()
        .as_text()
    )
    assert "scatter(" not in hlo
    assert "gather(" not in hlo

    # linearity sanity: the warp is linear in x, so the adjoint identity
    # <A x, w> == <x, A^T w> must hold to fp precision
    w_r = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    g = jax.grad(lambda v: jnp.sum(affine_warp_shear(v, M) * w_r))(x)
    lhs = float(jnp.sum(affine_warp_shear(x, M) * w_r))
    rhs = float(jnp.sum(x * g))
    assert abs(lhs - rhs) < 1e-3


@pytest.mark.slow
def test_random_apply_affine_shear_matches_exact_impl():
    """End-to-end ADA geometric pipeline (pad -> 2x up -> warp -> 2x down):
    the shear and exact warp impls agree tightly after the wavelet
    supersampling (band-limited input to the warp)."""
    from ganecdotes_tpu.gan.ada import random_apply_affine

    x = _smooth_image(4, 32, 32, 3)
    key = jax.random.PRNGKey(11)
    y_sh, G = random_apply_affine(x, 0.9, key, warp_impl="shear")
    y_ex, G2 = random_apply_affine(x, 0.9, key, warp_impl="exact")
    assert y_sh.shape == y_ex.shape == x.shape
    np.testing.assert_allclose(np.asarray(G), np.asarray(G2), rtol=1e-6)
    d = np.abs(np.asarray(y_sh) - np.asarray(y_ex))
    assert d.mean() < 0.01
    assert d.max() < 0.12  # corner pixels of strong rotations


@pytest.mark.slow
def test_affine_warp_shear_close_over_ada_transform_distribution():
    """Fuzz vs the exact warp across matrices drawn from ADA's OWN
    composed-transform sampler at full augmentation strength (p=1): every
    flip/90°/translate/iso+aniso-scale/rotation composition stays within
    tolerance on a smooth image (interior pixels)."""
    import jax

    from ganecdotes_tpu.gan.ada import sample_affine
    from ganecdotes_tpu.ops.affine_warp import (
        affine_warp_exact,
        affine_warp_shear,
        norm_to_pixel_matrix,
    )

    h = w = 33
    x = _smooth_image(8, h, w, 2)
    worst = 0.0
    for trial in range(4):
        key = jax.random.PRNGKey(100 + trial)
        G = jnp.linalg.inv(sample_affine(key, 1.0, 8, h, w))
        M = norm_to_pixel_matrix(G, (h, w), (h, w))
        ye = np.asarray(affine_warp_exact(x, M))[:, 10:-10, 10:-10]
        ys = np.asarray(affine_warp_shear(x, M))[:, 10:-10, 10:-10]
        worst = max(worst, float(np.abs(ye - ys).max()))
    assert worst < 0.15, f"worst interior deviation {worst:.4f}"


# ---------------------------------------------------------------------------
# fused styled-conv 3x3 Pallas kernel (ops/modulated_conv_pallas.py)
# ---------------------------------------------------------------------------


def _styled_conv_inputs(B=2, H=16, W=16, Cin=128, Cout=128, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.randn(B, H, W, Cin), dtype),
        jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.05, jnp.float32),
        jnp.asarray(rng.rand(B, Cin) + 0.5, jnp.float32),
        jnp.asarray(rng.rand(B, Cout) + 0.5, jnp.float32),
        jnp.asarray(rng.randn(B, H, W, 1), dtype),
        jnp.asarray(0.3, jnp.float32),
        jnp.asarray(rng.randn(Cout) * 0.1, jnp.float32),
    )


def test_styled_conv3x3_pallas_parity():
    """The fused kernel (9 shifted MXU matmuls + in-VMEM epilogue) computes
    exactly the composite: modulate -> conv3x3 -> demod -> noise -> bias ->
    lrelu*sqrt2."""
    from jax.experimental.pallas import tpu as pltpu

    from ganecdotes_tpu.ops.modulated_conv_pallas import (
        styled_conv3x3,
        styled_conv3x3_ref,
    )

    args = _styled_conv_inputs()
    ref = styled_conv3x3_ref(*args)
    with pltpu.force_tpu_interpret_mode():
        out = styled_conv3x3(*args, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_styled_conv3x3_pallas_grad_is_composite_vjp():
    """custom_vjp backward = the XLA composite's VJP, exactly (training
    differentiates through identical math)."""
    from jax.experimental.pallas import tpu as pltpu

    from ganecdotes_tpu.ops.modulated_conv_pallas import (
        styled_conv3x3,
        styled_conv3x3_ref,
    )

    x, w, s, demod, noise, nw, bias = _styled_conv_inputs(H=8, W=8)

    def loss_p(x, w, s, bias):
        with pltpu.force_tpu_interpret_mode():
            return styled_conv3x3(x, w, s, demod, noise, nw, bias,
                                  impl="pallas").sum()

    def loss_r(x, w, s, bias):
        return styled_conv3x3_ref(x, w, s, demod, noise, nw, bias).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, w, s, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, w, s, bias)
    for a, b in zip(gp, gr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_styled_conv3x3_pallas_falls_back_on_unsupported_shapes():
    """Non-lane-aligned channels route to the composite (identical result,
    no error) so a blanket impl='pallas' policy is safe."""
    from ganecdotes_tpu.ops.modulated_conv_pallas import (
        pallas_supported,
        styled_conv3x3,
        styled_conv3x3_ref,
    )

    args = _styled_conv_inputs(Cin=48, Cout=96)
    assert pallas_supported(args[0].shape, 96, 4) is None
    out = styled_conv3x3(*args, impl="pallas")  # no interpret ctx needed
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(styled_conv3x3_ref(*args)))


@pytest.mark.slow
def test_styled_conv3x3_pallas_bf16():
    from jax.experimental.pallas import tpu as pltpu

    from ganecdotes_tpu.ops.modulated_conv_pallas import (
        styled_conv3x3,
        styled_conv3x3_ref,
    )

    args = _styled_conv_inputs(dtype=jnp.bfloat16)
    ref = styled_conv3x3_ref(*args).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = styled_conv3x3(*args, impl="pallas").astype(jnp.float32)
    assert out.dtype == ref.dtype
    # bf16 path: kernel accumulates fp32 and rounds once; composite rounds
    # per op — agree to bf16 resolution
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.15, rtol=0.05)


@pytest.mark.slow
def test_generator_pallas_styled_conv_impl_parity():
    """GANECDOTES_STYLED_CONV_IMPL='pallas' swaps every non-up StyledConv in
    the synthesis stack for the fused kernel without changing the output."""
    from jax.experimental.pallas import tpu as pltpu

    from ganecdotes_tpu.models.stylegan2 import generator as G

    params, meta = G.init_generator(jax.random.PRNGKey(0), 32)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))

    img_ref, feats_ref = G.generator_forward(
        params, meta, [z], randomize_noise=False
    )
    old = G.STYLED_CONV_IMPL
    try:
        G.STYLED_CONV_IMPL = "pallas"
        with pltpu.force_tpu_interpret_mode():
            img_p, feats_p = G.generator_forward(
                params, meta, [z], randomize_noise=False
            )
    finally:
        G.STYLED_CONV_IMPL = old
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_ref),
                               atol=5e-5, rtol=1e-4)
    for a, b in zip(feats_p, feats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_subpixel_upconv_matches_transpose_plus_blur():
    """upsampled_conv2x_blur (blur composed into the kernel, polyphase
    single conv + depth-to-space) == conv_transpose(stride2) then
    blur(pad=(1,1), gain=4), exactly — including odd spatial sizes."""
    from ganecdotes_tpu.nn.layers import conv2d_transpose_nhwc
    from ganecdotes_tpu.ops.subpixel_upconv import upsampled_conv2x_blur
    from ganecdotes_tpu.ops.upfirdn2d import blur_2d

    rng = np.random.RandomState(0)
    for (B, H, W, Ci, Co) in [(2, 8, 8, 16, 24), (2, 5, 7, 4, 6)]:
        x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, Ci, Co) * 0.1, jnp.float32)
        ref = blur_2d(conv2d_transpose_nhwc(x, w, stride=2),
                      (1, 3, 3, 1), pad=(1, 1), upsample_factor=2)
        got = upsampled_conv2x_blur(x, w)
        assert got.shape == ref.shape == (B, 2 * H, 2 * W, Co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_generator_subpixel_up_conv_impl_parity():
    """UP_CONV_IMPL='subpixel' swaps every upsampling StyledConv for the
    fused polyphase conv without changing the synthesis output or the
    feature pyramid."""
    from ganecdotes_tpu.models.stylegan2 import generator as G

    params, meta = G.init_generator(jax.random.PRNGKey(0), 32)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))

    img_ref, feats_ref = G.generator_forward(
        params, meta, [z], randomize_noise=False
    )
    old = G.UP_CONV_IMPL
    try:
        G.UP_CONV_IMPL = "subpixel"
        img_s, feats_s = G.generator_forward(
            params, meta, [z], randomize_noise=False
        )
    finally:
        G.UP_CONV_IMPL = old
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_ref),
                               atol=2e-4, rtol=1e-4)
    for a, b in zip(feats_s, feats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_generator_auto_up_conv_impl_parity_on_narrow_tail():
    """UP_CONV_IMPL='auto' composes the blur into the up-conv ONLY for
    narrow levels (out_ch < 128 — the 512² pyramid tail, where the
    depthwise blur runs with half-empty vector lanes) and must equal the
    xla path bit-for-bit in function value. A narrow res2chlmap triggers
    the policy at CPU-testable sizes."""
    from ganecdotes_tpu.models.stylegan2 import generator as G

    cmap = {4: 256, 8: 96, 16: 64, 32: 64}
    params, meta = G.init_generator(
        jax.random.PRNGKey(0), 32, res2chlmap=cmap
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))

    img_ref, feats_ref = G.generator_forward(
        params, meta, [z], randomize_noise=False
    )
    old = G.UP_CONV_IMPL
    try:
        G.UP_CONV_IMPL = "auto"
        img_a, feats_a = G.generator_forward(
            params, meta, [z], randomize_noise=False
        )
    finally:
        G.UP_CONV_IMPL = old
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_ref),
                               atol=2e-4, rtol=1e-4)
    for a, b in zip(feats_a, feats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_styled_up_conv3x3_pallas_parity_and_grad():
    """The fused up-kernel (polyphase matmuls + in-VMEM depth-to-space +
    epilogue) matches the sub-pixel composite exactly; its custom_vjp is
    the composite's VJP."""
    from jax.experimental.pallas import tpu as pltpu

    from ganecdotes_tpu.ops.modulated_conv_pallas import (
        styled_up_conv3x3,
        styled_up_conv3x3_ref,
        up_pallas_supported,
    )

    rng = np.random.RandomState(0)
    B, H, W, Ci, Co = 2, 8, 8, 128, 256
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Ci, Co) * 0.05, jnp.float32)
    s = jnp.asarray(rng.rand(B, Ci) + 0.5, jnp.float32)
    demod = jnp.asarray(rng.rand(B, Co) + 0.5, jnp.float32)
    noise = jnp.asarray(rng.randn(B, 2 * H, 2 * W, 1), jnp.float32)
    nw = jnp.asarray(0.3, jnp.float32)
    bias = jnp.asarray(rng.randn(Co) * 0.1, jnp.float32)

    assert up_pallas_supported(x.shape, Co, 4) is not None
    ref = styled_up_conv3x3_ref(x, w, s, demod, noise, nw, bias)
    with pltpu.force_tpu_interpret_mode():
        out = styled_up_conv3x3(x, w, s, demod, noise, nw, bias,
                                impl="pallas")
    assert out.shape == (B, 2 * H, 2 * W, Co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

    def loss_p(x, w, bias):
        with pltpu.force_tpu_interpret_mode():
            return styled_up_conv3x3(x, w, s, demod, noise, nw, bias,
                                     impl="pallas").sum()

    # the custom_vjp routes through the conv_transpose+blur composite (the
    # measured-best XLA form) — pin bitwise against THAT, allclose against
    # the sub-pixel oracle (identical math, fp reassociation apart)
    from ganecdotes_tpu.ops.modulated_conv_pallas import styled_up_conv3x3_xla

    def loss_x(x, w, bias):
        return styled_up_conv3x3_xla(x, w, s, demod, noise, nw, bias).sum()

    def loss_r(x, w, bias):
        return styled_up_conv3x3_ref(x, w, s, demod, noise, nw, bias).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, bias)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, w, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, bias)
    for a, b, c in zip(gp, gx, gr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-4, rtol=1e-4)


def test_styled_up_conv3x3_pallas_falls_back_to_conv_transpose_composite():
    """impl='pallas' on shapes the up kernel can't tile must degrade to the
    MEASURED-BEST xla composite (conv_transpose+blur), not the sub-pixel
    form the module's decision table rejects as 2-3x slower. Both are
    identical math, so also pin allclose against the sub-pixel oracle."""
    from ganecdotes_tpu.ops.modulated_conv_pallas import (
        styled_up_conv3x3,
        styled_up_conv3x3_ref,
        styled_up_conv3x3_xla,
        up_pallas_supported,
    )

    rng = np.random.RandomState(1)
    B, H, W, Ci, Co = 2, 8, 8, 64, 96  # channels not lane-aligned
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Ci, Co) * 0.05, jnp.float32)
    s = jnp.asarray(rng.rand(B, Ci) + 0.5, jnp.float32)
    demod = jnp.asarray(rng.rand(B, Co) + 0.5, jnp.float32)
    noise = jnp.asarray(rng.randn(B, 2 * H, 2 * W, 1), jnp.float32)
    nw = jnp.asarray(0.3, jnp.float32)
    bias = jnp.asarray(rng.randn(Co) * 0.1, jnp.float32)

    assert up_pallas_supported(x.shape, Co, 4) is None
    out = styled_up_conv3x3(x, w, s, demod, noise, nw, bias, impl="pallas")
    np.testing.assert_array_equal(
        np.asarray(out),
        np.asarray(styled_up_conv3x3_xla(x, w, s, demod, noise, nw, bias)),
    )
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(styled_up_conv3x3_ref(x, w, s, demod, noise, nw, bias)),
        atol=2e-5, rtol=1e-5,
    )


@pytest.mark.slow
def test_generator_pallas_impl_covers_up_convs_too():
    """STYLED_CONV_IMPL='pallas' routes BOTH conv kinds (up and non-up)
    through the fused kernels without changing the synthesis output."""
    from jax.experimental.pallas import tpu as pltpu

    from ganecdotes_tpu.models.stylegan2 import generator as G

    params, meta = G.init_generator(jax.random.PRNGKey(0), 32)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))

    img_ref, feats_ref = G.generator_forward(
        params, meta, [z], randomize_noise=False
    )
    old = G.STYLED_CONV_IMPL
    try:
        G.STYLED_CONV_IMPL = "pallas"
        with pltpu.force_tpu_interpret_mode():
            img_p, feats_p = G.generator_forward(
                params, meta, [z], randomize_noise=False
            )
    finally:
        G.STYLED_CONV_IMPL = old
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_ref),
                               atol=2e-4, rtol=1e-4)
    for a, b in zip(feats_p, feats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_subpixel_upconv_supports_double_grad():
    """The sub-pixel up path is plain XLA, so PPL-style grad-of-grad through
    an upsampling generator layer works with UP_CONV_IMPL='subpixel' (the
    Pallas impl's custom_vjp intentionally forbids second order — its
    docstring says to keep 'xla' for PPL programs)."""
    from ganecdotes_tpu.ops.subpixel_upconv import upsampled_conv2x_blur

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 4, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)

    def path_len(x, w):
        out = upsampled_conv2x_blur(x, w)
        g = jax.grad(lambda xx: upsampled_conv2x_blur(xx, w).sum())(x)
        return (g ** 2).sum() + 0 * out.sum()

    gg = jax.grad(path_len, argnums=1)(x, w)  # d(grad-norm)/d(weights)
    assert np.isfinite(np.asarray(gg)).all()
    assert float(jnp.abs(gg).max()) > 0
