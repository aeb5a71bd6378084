"""Tests for the GAN stack: discriminator parity, losses, ADA, BagGAN trainer."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganecdotes_tpu.gan.ada import (
    AdaptiveAugment,
    ada_init_state,
    ada_update,
    apply_color,
    augment,
    random_apply_affine,
    sample_affine,
    sample_color,
)
from ganecdotes_tpu.gan.losses import (
    dice_loss,
    gan_loss,
    gradient_penalty,
    normal_nll_loss,
    r1_penalty,
)
from ganecdotes_tpu.models.stylegan2.discriminator import (
    discriminator_forward,
    init_discriminator,
)

REF_PATH = "/root/reference"


def test_discriminator_matches_reference_torch():
    torch = pytest.importorskip("torch")
    import os

    if not os.path.isdir(REF_PATH):
        pytest.skip("reference tree not available")
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    from models.stylegan2.model import Discriminator as TorchD

    from ganecdotes_tpu.models.stylegan2.convert import (
        convert_torch_discriminator_state,
    )

    torch.manual_seed(0)
    d = TorchD(size=32)
    d.eval()
    params, meta = convert_torch_discriminator_state(d.state_dict(), 32)

    x = np.random.RandomState(0).randn(4, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = d(torch.from_numpy(x)).numpy()
    got = discriminator_forward(params, meta, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def test_gan_loss_modes_match_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    pred = np.random.RandomState(1).randn(6, 1).astype(np.float32)
    tp = torch.from_numpy(pred)

    for mode, tloss in [("lsgan", nn.MSELoss()), ("vanilla", nn.BCEWithLogitsLoss())]:
        f = gan_loss(mode)
        for real in (True, False):
            target = torch.ones_like(tp) if real else torch.zeros_like(tp)
            want = float(tloss(tp, target))
            got = float(f(jnp.asarray(pred), real))
            assert abs(got - want) < 1e-5, (mode, real)

    f = gan_loss("wgangp")
    assert abs(float(f(jnp.asarray(pred), True)) + pred.mean()) < 1e-6
    assert abs(float(f(jnp.asarray(pred), False)) - pred.mean()) < 1e-6


def test_r1_penalty_quadratic_oracle():
    # D(x) = sum(a*x²) -> grad = 2a·x, R1 = E_b[Σ (2a x)²]
    a = 0.7
    x = jnp.asarray(np.random.RandomState(2).randn(3, 4, 4, 1).astype(np.float32))
    penalty, pred = r1_penalty(lambda v: jnp.sum(a * v**2, axis=(1, 2, 3),
                                                 keepdims=True)[..., 0], x)
    want = np.mean(np.sum((2 * a * np.asarray(x)) ** 2, axis=(1, 2, 3)))
    assert abs(float(penalty) - want) < 1e-4
    assert pred.shape[0] == 3


def test_gradient_penalty_unit_norm():
    # D(x) = Σx -> grad = 1 everywhere, ‖grad‖ = sqrt(N), penalty=(sqrt(N)-1)²
    x = jnp.ones((2, 4, 4, 1))
    gp, grads = gradient_penalty(
        lambda v: jnp.sum(v, axis=(1, 2, 3)), x, x * 0.5,
        jax.random.PRNGKey(0),
    )
    want = (np.sqrt(16) - 1.0) ** 2
    assert abs(float(gp) - want) < 1e-4


def test_normal_nll_and_dice():
    x = jnp.zeros((2, 3))
    mu = jnp.zeros((2, 3))
    var = jnp.ones((2, 3))
    nll = float(normal_nll_loss(x, mu, var))
    want = 0.5 * np.log(2 * np.pi) * 3  # per-sample sum over 3 dims
    assert abs(nll - want) < 1e-3

    a = jnp.ones((1, 4, 4, 2))
    assert abs(float(dice_loss(a, a))) < 1e-5
    assert abs(float(dice_loss(a, 0 * a)) - 1.0) < 1e-4


def test_affine_identity_reconstruction():
    """p=0 => G=I; the up→gridsample→down chain must roughly reconstruct."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    y, G = random_apply_affine(x, 0.0, jax.random.PRNGKey(0))
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(G), np.tile(np.eye(3), (2, 1, 1)),
                               atol=1e-6)
    # SYM6 up/down is near-perfect-reconstruction away from borders
    err = np.abs(np.asarray(y) - np.asarray(x))[:, 4:-4, 4:-4, :].max()
    assert err < 5e-2, err


def test_color_identity_and_application():
    x = jnp.asarray(np.random.RandomState(4).rand(2, 8, 8, 3).astype(np.float32))
    eye = jnp.tile(jnp.eye(4), (2, 1, 1))
    np.testing.assert_allclose(np.asarray(apply_color(x, eye)), np.asarray(x),
                               atol=1e-6)
    C = sample_color(jax.random.PRNGKey(1), 1.0, 2)
    got = apply_color(x, C)
    want = np.einsum("bhwc,bdc->bhwd", np.asarray(x),
                     np.asarray(C)[:, :3, :3]) + np.asarray(C)[:, None, None, :3, 3]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_augment_shapes_and_grad():
    x = jnp.asarray(np.random.RandomState(5).rand(2, 16, 16, 3).astype(np.float32))
    y, (G, C) = augment(x, 0.5, jax.random.PRNGKey(2))
    assert y.shape == x.shape

    # differentiable through the augmentation (R1 requires this)
    g = jax.grad(lambda v: augment(v, 0.5, jax.random.PRNGKey(2))[0].sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_ada_controller_raises_p_on_confident_real_preds():
    st = ada_init_state()
    for _ in range(16):
        st = ada_update(st, jnp.ones((8,)), target=0.6, aug_len=64,
                        update_every=8)
    assert float(st["p"]) > 0  # overconfident D (all signs +) => p increases

    aug = AdaptiveAugment(0.6, 64, 8)
    for _ in range(8):
        p = aug.tune(jnp.ones((8,)))
    assert p > 0
    assert aug.r_t_stat == 1.0


def test_sample_affine_invertible():
    G = sample_affine(jax.random.PRNGKey(3), 1.0, 4, 32, 32)
    assert G.shape == (4, 3, 3)
    det = np.linalg.det(np.asarray(G))
    assert np.all(np.abs(det) > 1e-3)


@pytest.mark.slow
def test_bagganhq_trainer_smoke(tmp_path):
    """Full GAN iterations on a tiny config: D, R1, G, PPL, ADA, ckpt IO."""
    import types

    from ganecdotes_tpu.gan.train import BagGANHQ

    cfg = types.SimpleNamespace(
        out_dir=str(tmp_path), checkpoint_dir=str(tmp_path / "ckpt"),
        is_train=True, image_size=32, latent_dim=64, num_channels=3,
        batch_size=2, gan_mode="vanilla", use_ppl=True, r1_lambda=10,
        ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01, d_reg_every=2,
        g_reg_every=2, mixing_prob=0.0, chl_multiplier=1,
        g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=True, augment_p=0,
        ada_target=0.6, ada_length=100, lr=0.002, beta1=0.0,
        lr_policy="linear",
        lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
        generator_params=dict(mlp_layers=2),
        losses_to_print=["g_gan", "d", "g_ppl"],
        start_epoch=1, continue_train=False, load_net=False,
    )
    gan = BagGANHQ(cfg)
    gan.setup_gan()
    gan.print_networks()

    real = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    )
    for it in range(2):
        gan.set_input(data_sample={"ct": real}, iter_no=it, epoch_no=0)
        gan.optimize_parameters()

    losses = gan.get_current_losses()
    assert np.isfinite(losses["d"]) and np.isfinite(losses["g_gan"])
    assert "g_ppl" in losses and np.isfinite(losses["g_ppl"])

    img = gan.test()
    assert img.shape == (2, 32, 32, 3)

    gan.save_networks("latest")
    p0 = jax.tree.leaves(gan.generator_params)[0].copy()
    gan.generator_params = jax.tree.map(lambda x: x * 0, gan.generator_params)
    gan.load_networks("latest")
    np.testing.assert_allclose(jax.tree.leaves(gan.generator_params)[0], p0)

    gan.update_learning_rate()


def test_image_pool_semantics():
    from ganecdotes_tpu.gan.image_pool import ImagePool

    imgs = np.arange(4 * 2 * 2 * 1, dtype=np.float32).reshape(4, 2, 2, 1)
    # pool_size=0 is a pass-through
    assert ImagePool(0).query(imgs) is imgs

    pool = ImagePool(2, seed=0)
    out1 = pool.query(imgs[:2])
    np.testing.assert_array_equal(out1, imgs[:2])  # fills the buffer
    assert pool.num_imgs == 2
    out2 = pool.query(imgs[2:])
    assert out2.shape == (2, 2, 2, 1)
    # every returned image is either the fresh one or a previously pooled one
    seen = {float(im.sum()) for im in imgs}
    assert all(float(im.sum()) in seen for im in out2)


def test_initialize_params_types():
    from ganecdotes_tpu.gan.train import initialize_params

    params = {
        "w": jnp.ones((3, 3, 8, 16)),
        "b": jnp.ones((16,)),
        "lin": {"weight": jnp.ones((32, 8)), "bias": jnp.ones((8,))},
    }
    for t in ("normal", "xavier", "kaiming", "orthogonal"):
        new = initialize_params(params, jax.random.PRNGKey(0), t)
        assert np.allclose(np.asarray(new["b"]), 0)
        assert not np.allclose(np.asarray(new["w"]), 1)
        if t == "orthogonal":
            q = np.asarray(new["lin"]["weight"]) / 0.02
            np.testing.assert_allclose(q.T @ q, np.eye(8), atol=1e-4)


def test_discriminator_q_heads():
    from ganecdotes_tpu.models.stylegan2.discriminator import (
        discriminator_forward_q,
        init_discriminator_q,
    )

    params, meta = init_discriminator_q(
        jax.random.PRNGKey(0), 32, q_layers=1, n_cat_c=2, n_classes=5,
        n_cont_c=3,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32, 3),
                    dtype=jnp.float32)
    d, q_cat, q_cont = discriminator_forward_q(params, meta, x)
    assert d.shape == (4, 1)
    assert q_cat.shape == (4, 10)
    # softmax over the flat categorical output (reference nn.Softmax over all)
    np.testing.assert_allclose(np.asarray(q_cat.sum(axis=-1)), 1.0, atol=1e-5)
    assert q_cont.shape == (4, 6)
    assert np.all(np.abs(np.asarray(q_cont)) <= 1.0)  # tanh-bounded


@pytest.mark.slow
def test_bagganhq_style_mixing_g_step(tmp_path):
    """mixing_prob=1 exercises the 2-latent G step (crashed before the fix:
    g_loss_fn dropped inject_index and generator_forward raised under jit)."""
    import types

    from ganecdotes_tpu.gan.train import BagGANHQ

    cfg = types.SimpleNamespace(
        out_dir=str(tmp_path), checkpoint_dir=str(tmp_path / "ckpt"),
        is_train=True, image_size=32, latent_dim=64, num_channels=3,
        batch_size=2, gan_mode="vanilla", use_ppl=False, r1_lambda=10,
        ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01, d_reg_every=16,
        g_reg_every=4, mixing_prob=1.0, chl_multiplier=1,
        g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=False, augment_p=0,
        ada_target=0.6, ada_length=100, lr=0.002, beta1=0.0,
        lr_policy="linear",
        lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
        generator_params=dict(mlp_layers=2),
        losses_to_print=["g_gan", "d"],
        start_epoch=1, continue_train=False, load_net=False,
    )
    gan = BagGANHQ(cfg)
    gan.setup_gan()
    real = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    )
    gan.set_input(data_sample={"ct": real}, iter_no=1, epoch_no=0)
    assert gan.inject_index is not None
    assert 1 <= gan.inject_index <= gan.gen_meta["n_latent"] - 1
    gan.optimize_parameters()
    assert np.isfinite(gan.get_current_losses()["d"])


@pytest.mark.slow
def test_bagganhq_wgangp_step_with_remat(tmp_path):
    """wgangp mode routes every D forward through jax.checkpoint (the
    gradient penalty's grad-of-grad otherwise keeps all D residuals live
    — measured 15.57 GiB peak vs 12.21 rematerialized at the production
    shape). One full D+G iteration must train and produce finite losses
    through the remat'd closures."""
    import types

    from ganecdotes_tpu.gan.train import BagGANHQ

    cfg = types.SimpleNamespace(
        out_dir=str(tmp_path), checkpoint_dir=str(tmp_path / "ckpt"),
        is_train=True, image_size=16, latent_dim=32, num_channels=3,
        batch_size=2, gan_mode="wgangp", use_ppl=False, r1_lambda=10,
        ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01, d_reg_every=4,
        g_reg_every=4, mixing_prob=1.0, chl_multiplier=1,
        g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=True, augment_p=0,
        ada_target=0.6, ada_length=100, lr=0.002, beta1=0.0,
        lr_policy="linear",
        lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
        generator_params=dict(mlp_layers=1),
        losses_to_print=["g_gan", "d"],
        start_epoch=1, continue_train=False, load_net=False,
    )
    gan = BagGANHQ(cfg, seed=3)
    gan.setup_gan()
    before = jax.tree.leaves(gan.disc_params)[0].copy()
    real = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    gan.set_input(data_sample={"ct": real * 2 - 1}, iter_no=1, epoch_no=0)
    gan.optimize_parameters()
    losses = gan.get_current_losses()
    assert np.isfinite(losses["d"]) and np.isfinite(losses["g_gan"])
    after = jax.tree.leaves(gan.disc_params)[0]
    assert float(np.max(np.abs(np.asarray(after) - np.asarray(before)))) > 0

    # retrace regression: a second iteration (plain, same latent-list
    # structure) must REUSE the compiled programs. Weak-typed leaves in
    # the initial ada_state / mean_path_length once made every step
    # silently recompile when the first call's strong-typed outputs were
    # fed back in — minutes of duplicate compiles per run at 256².
    gan.set_input(data_sample={"ct": real * 2 - 1}, iter_no=2, epoch_no=0)
    gan.optimize_parameters()
    assert gan._d_step._cache_size() == 1, gan._d_step._cache_size()
    assert gan._g_step._cache_size() == 1, gan._g_step._cache_size()

    # donation pin: the step programs donate (params, opt_state) so the
    # updated trees alias the incoming buffers — the memory headroom the
    # wgangp 512² peak depends on (docs/PERFORMANCE.md). The CPU backend
    # honors donation, so a dropped donate_argnums shows up here.
    pre_leaf = jax.tree.leaves(gan.disc_params)[0]
    gan.set_input(data_sample={"ct": real * 2 - 1}, iter_no=3, epoch_no=0)
    gan.optimize_parameters()
    assert pre_leaf.is_deleted(), "GAN step no longer donates params"


@pytest.mark.slow
def test_wgangp_selective_remat_matches_full_remat(tmp_path):
    """wgangp_remat='gp' (checkpoint only the gradient-penalty branch,
    leave the plain D(real)/D(fake) forwards unremat'd) is a memory/speed
    knob, NOT a math change: one full D+G iteration must match
    wgangp_remat='all' bit-for-bit given identical seeds and inputs."""
    import types

    from ganecdotes_tpu.gan.train import BagGANHQ

    def make_cfg(sub, remat):
        return types.SimpleNamespace(
            out_dir=str(tmp_path / sub), checkpoint_dir=str(tmp_path / sub),
            is_train=True, image_size=16, latent_dim=32, num_channels=3,
            batch_size=2, gan_mode="wgangp", use_ppl=False, r1_lambda=10,
            ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01,
            d_reg_every=4, g_reg_every=4, mixing_prob=1.0, chl_multiplier=1,
            g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=True,
            augment_p=0, ada_target=0.6, ada_length=100, lr=0.002,
            beta1=0.0, lr_policy="linear",
            lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
            generator_params=dict(mlp_layers=1),
            losses_to_print=["g_gan", "d"],
            start_epoch=1, continue_train=False, load_net=False,
            wgangp_remat=remat,
        )

    real = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    results = {}
    for remat in ("all", "gp"):
        gan = BagGANHQ(make_cfg(remat, remat), seed=3)
        gan.set_input(data_sample={"ct": real * 2 - 1}, iter_no=1,
                      epoch_no=0)
        gan.optimize_parameters()
        results[remat] = (
            float(gan.loss_d), float(gan.loss_g_gan),
            np.asarray(jax.tree.leaves(gan.disc_params)[0]),
        )

    assert results["gp"][0] == results["all"][0]
    assert results["gp"][1] == results["all"][1]
    np.testing.assert_array_equal(results["gp"][2], results["all"][2])


def _tiny_gan_cfg(tmp_path, **overrides):
    import types

    cfg = types.SimpleNamespace(
        out_dir=str(tmp_path), checkpoint_dir=str(tmp_path / "ckpt"),
        is_train=True, image_size=16, latent_dim=32, num_channels=3,
        batch_size=2, gan_mode="wgangp", use_ppl=False, r1_lambda=10,
        ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01, d_reg_every=4,
        g_reg_every=4, mixing_prob=1.0, chl_multiplier=1,
        g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=False, augment_p=0,
        ada_target=0.6, ada_length=100, lr=0.002, beta1=0.0,
        lr_policy="linear",
        lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
        generator_params=dict(mlp_layers=1),
        losses_to_print=["g_gan", "d"],
        start_epoch=1, continue_train=False, load_net=False,
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def test_wgangp_remat_rejects_unknown_values(tmp_path):
    """A wgangp_remat typo ('ALL', 'full', ...) must fail at construction,
    not silently run the higher-peak 'gp' mode (14.85 vs 12.22 GiB at the
    production shape — an intermittent-OOM config bug)."""
    import pytest

    from ganecdotes_tpu.gan.train import BagGANHQ

    with pytest.raises(NotImplementedError, match="wgangp_remat"):
        BagGANHQ(_tiny_gan_cfg(tmp_path, wgangp_remat="ALL"))


def test_compute_dtype_rejects_unknown_values(tmp_path):
    """compute_dtype='float16' (or a typo) must fail at construction —
    fp16 overflows StyleGAN2's unbounded logits; only bf16 shares fp32's
    exponent range (see gan/train.py knob comment)."""
    import pytest

    from ganecdotes_tpu.gan.train import BagGANHQ

    with pytest.raises(NotImplementedError, match="compute_dtype"):
        BagGANHQ(_tiny_gan_cfg(tmp_path, compute_dtype="float16"))


@pytest.mark.slow
def test_compute_dtype_bf16_training_tracks_fp32(tmp_path):
    """compute_dtype='bfloat16' (mixed-precision D/G steps, fp32 master
    params + Adam moments) must (a) keep every param/opt leaf fp32,
    (b) produce first-iteration losses that agree with the fp32 run to
    bf16 rounding, and (c) stay finite over several iterations; and
    compute_dtype='float32' must be bit-identical to the default."""
    import types

    from ganecdotes_tpu.gan.train import BagGANHQ

    def run(tag, n_iters=4, **over):
        cfg = _tiny_gan_cfg(
            tmp_path / tag, gan_mode="vanilla", augment=True,
            mixing_prob=0.0, d_reg_every=3, g_reg_every=3, **over
        )
        gan = BagGANHQ(cfg, seed=0)
        gan.setup_gan()
        real = jnp.asarray(
            np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
            * 2 - 1
        )
        losses = []
        for it in range(n_iters):
            gan.set_input(data_sample={"ct": real}, iter_no=it, epoch_no=0)
            gan.optimize_parameters()
            losses.append(dict(gan.get_current_losses()))
        return gan, losses

    gan32, l32 = run("fp32")
    gan32e, l32e = run("fp32e", compute_dtype="float32")
    ganbf, lbf = run("bf16", compute_dtype="bfloat16")

    # (c) explicit 'float32' is the same program as the default
    for a, b in zip(l32, l32e):
        for k in a:
            assert a[k] == b[k], (k, a[k], b[k])

    # (a) master params and optimizer moments never leave fp32
    for leaf in jax.tree.leaves((ganbf.generator_params, ganbf.disc_params,
                                 ganbf.opt_g_state, ganbf.opt_d_state)):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype

    # (b) iteration-0 losses agree to bf16 rounding; all iterations finite
    for k in ("d", "g_gan"):
        assert abs(l32[0][k] - lbf[0][k]) < 0.05, (k, l32[0][k], lbf[0][k])
    for rec in lbf:
        for k, v in rec.items():
            assert np.isfinite(v), (k, v)


def test_ppl_with_pallas_styled_conv_fails_loud(tmp_path):
    """use_ppl takes grad-of-grad through the generator; the custom_vjp
    pallas styled-conv kernels are first-order only. The combination must
    raise a pointed error at construction, not an opaque AssertionError
    at trace time."""
    import pytest

    from ganecdotes_tpu.gan.train import BagGANHQ
    from ganecdotes_tpu.models.stylegan2 import generator as G

    old = G.STYLED_CONV_IMPL
    try:
        G.STYLED_CONV_IMPL = "pallas"
        with pytest.raises(ValueError, match="GANECDOTES_STYLED_CONV_IMPL"):
            BagGANHQ(_tiny_gan_cfg(tmp_path, use_ppl=True))
    finally:
        G.STYLED_CONV_IMPL = old


def test_update_learning_rate_keeps_hyperparam_avals(tmp_path):
    """The per-epoch LR update must not change the optimizer hyperparam
    leaf aval (strong f32 scalar -> python float would be WEAK f32):
    a changed aval silently retraces + recompiles every jitted step
    program at the second epoch (~12 min of duplicate compiles on TPU,
    and the stale executables once pushed HBM into RESOURCE_EXHAUSTED
    alongside the fused chunk program)."""
    import types

    from ganecdotes_tpu.gan.train import BagGANHQ

    cfg = types.SimpleNamespace(
        out_dir=str(tmp_path), checkpoint_dir=str(tmp_path / "ckpt"),
        is_train=True, image_size=16, latent_dim=32, num_channels=3,
        batch_size=2, gan_mode="vanilla", use_ppl=False, r1_lambda=10,
        ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01, d_reg_every=4,
        g_reg_every=4, mixing_prob=0.0, chl_multiplier=1,
        g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=False, augment_p=0,
        ada_target=0.6, ada_length=100, lr=0.002, beta1=0.0,
        lr_policy="linear",
        lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
        generator_params=dict(mlp_layers=1),
        losses_to_print=["g_gan", "d"],
        start_epoch=1, continue_train=False, load_net=False,
    )
    gan = BagGANHQ(cfg)
    gan.setup_gan()
    before_g = jax.typeof(gan.opt_g_state.hyperparams["learning_rate"])
    before_d = jax.typeof(gan.opt_d_state.hyperparams["learning_rate"])
    gan.update_learning_rate()
    after_g = jax.typeof(gan.opt_g_state.hyperparams["learning_rate"])
    after_d = jax.typeof(gan.opt_d_state.hyperparams["learning_rate"])
    assert after_g == before_g, (before_g, after_g)
    assert after_d == before_d, (before_d, after_d)


@pytest.mark.slow
def test_bagganhq_chunked_training_matches_single_steps(tmp_path):
    """optimize_parameters_chunk (plain (D,G) runs fused in ONE lax.scan
    dispatch, lazy-reg iterations delegated to the single-step path)
    follows the single-step trajectory: identical host-RNG consumption
    (asserted exactly), identical ADA controller statistics (exactly),
    and per-step numerics equal up to XLA fusion reordering.

    Tolerance note (measured): one fused iteration differs from one
    single-stepped iteration by ~8e-5 max — NOT a semantic gap but fp
    reassociation inside the scan amplified by Adam's g/(|g|+eps)
    normalization, which turns O(1e-8) absolute gradient noise on
    tiny-gradient weights into O(lr) update differences. Multi-iteration
    adversarial trajectories amplify further, so the 8-iteration bound is
    loose while the exact asserts above pin the semantics."""
    import types

    from ganecdotes_tpu.gan.train import BagGANHQ
    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    # the two trainers build identical programs at identical shapes —
    # the persistent cache dedupes their compiles (and makes re-runs of
    # this test cheap). Deliberately NOT tmp_path (that would defeat the
    # cross-run reuse) but also not the user's $HOME: a fixed /tmp dir,
    # machine-fingerprinted like every cache dir
    enable_persistent_compilation_cache("/tmp/ganecdotes_test_xla_cache")

    def make_cfg(sub):
        return types.SimpleNamespace(
            out_dir=str(tmp_path / sub),
            checkpoint_dir=str(tmp_path / sub / "ckpt"),
            is_train=True, image_size=16, latent_dim=32, num_channels=3,
            batch_size=2, gan_mode="vanilla", use_ppl=True, r1_lambda=10,
            ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01,
            d_reg_every=4, g_reg_every=4, mixing_prob=0.5,
            chl_multiplier=1, g_reg_ratio=4 / 5, d_reg_ratio=16 / 17,
            augment=True, augment_p=0, ada_target=0.6, ada_length=100,
            lr=0.002, beta1=0.0, lr_policy="linear",
            lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
            generator_params=dict(mlp_layers=1),
            losses_to_print=["g_gan", "d", "g_ppl"],
            start_epoch=1, continue_train=False, load_net=False,
        )

    rng = np.random.RandomState(0)
    batches = [
        rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1 for _ in range(8)
    ]

    def maxdiff(ta, tb):
        return max(
            float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
            for x, y in zip(jax.tree.leaves(ta), jax.tree.leaves(tb))
        )

    gan_a = BagGANHQ(make_cfg("single"), seed=7)
    gan_a.setup_gan()
    gan_b = BagGANHQ(make_cfg("chunk"), seed=7)
    gan_b.setup_gan()

    # --- tight per-step bound: ONE plain iteration both ways ---------
    # host copies, not references: the step programs donate (params,
    # opt_state), so the pre-step device buffers are invalidated by the
    # update and must not be read afterwards
    pre = jax.tree.map(lambda x: np.asarray(x).copy(), gan_a.generator_params)
    gan_a.iter_no = gan_b.iter_no = 1  # not a reg iteration
    gan_a.set_input(data_sample={"ct": batches[0]}, iter_no=1, epoch_no=0)
    gan_a.optimize_parameters()
    gan_b.optimize_parameters_chunk([batches[0]])
    step_mag = maxdiff(pre, gan_a.generator_params)
    one_step = maxdiff(gan_a.generator_params, gan_b.generator_params)
    assert step_mag > 1e-4  # the step actually moved the params
    assert one_step < 5e-4, one_step  # fp-reordering scale, ~6x margin
    # host streams consumed identically — exact
    np.testing.assert_array_equal(
        gan_a._host_key_rng.get_state()[1], gan_b._host_key_rng.get_state()[1]
    )
    np.testing.assert_array_equal(
        np.asarray(gan_a.ada_state["buf"]), np.asarray(gan_b.ada_state["buf"])
    )

    # --- 8-iteration trajectory with reg cadence + chunk boundary ----
    gan_a.iter_no = gan_b.iter_no = 0
    for it, b in enumerate(batches):
        gan_a.set_input(data_sample={"ct": b}, iter_no=it, epoch_no=0)
        gan_a.optimize_parameters()
    # chunks aligned with the reg cadence: each call is [reg iter,
    # 3-iteration fused run]; the second call exercises cross-chunk carry
    gan_b.optimize_parameters_chunk(batches[:4])
    gan_b.optimize_parameters_chunk(batches[4:])

    assert gan_b.iter_no == gan_a.iter_no == 8
    # exact semantic pins: host streams, mixing draws, ADA statistics
    np.testing.assert_array_equal(
        gan_a._host_key_rng.get_state()[1], gan_b._host_key_rng.get_state()[1]
    )
    np.testing.assert_array_equal(
        gan_a._host_rng.get_state()[1], gan_b._host_rng.get_state()[1]
    )
    np.testing.assert_array_equal(
        np.asarray(gan_a.ada_state["buf"]), np.asarray(gan_b.ada_state["buf"])
    )
    assert int(gan_a.ada_state["update"]) == int(gan_b.ada_state["update"])
    # loose numeric drift bound (fp amplification, see docstring): with
    # b1=0 Adam steps are ~sign(g)*lr for eps-scale gradients, so drift
    # accrues up to ~2*lr per iteration on noisy coords (measured ~1e-2
    # after 9 iterations); a real staging bug (wrong key/latent/batch
    # order) diverges to O(0.1-1) immediately
    assert maxdiff(gan_a.generator_params, gan_b.generator_params) < 3e-2
    assert maxdiff(gan_a.disc_params, gan_b.disc_params) < 3e-2
    np.testing.assert_allclose(
        float(gan_a.mean_path_length), float(gan_b.mean_path_length),
        rtol=1e-2, atol=1e-3,
    )
    la, lb = gan_a.get_current_losses(), gan_b.get_current_losses()
    for name in ("d", "g_gan", "g_ppl"):
        assert np.isfinite(lb[name])
        np.testing.assert_allclose(la[name], lb[name], rtol=0.2, atol=1e-2)


def _load_ref_baggan_generator(size=32, mlp_layers=2):
    """Import the reference BagGAN StyleGANGenerator on CPU.

    The reference compiles CUDA kernels at import (lib/gan/optim) and pulls
    astropy via `from lib.util.util import *`; neither exists here, so those
    modules are stubbed with the reference's OWN pure fallbacks
    (models/stylegan2/op) before the import — exactly the CPU dispatch the
    reference documents."""
    import os
    import types

    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF_PATH):
        pytest.skip("reference tree not available")
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)

    from torch.nn import functional as _F

    import lib  # noqa: F401  (plain-os module, safe)
    import lib.util  # noqa: F401  (empty __init__)

    if "lib.util.util" not in sys.modules:
        stub = types.ModuleType("lib.util.util")
        stub.__all__ = []
        sys.modules["lib.util.util"] = stub
        sys.modules["lib.util"].util = stub

    import lib.gan  # noqa: F401  (empty __init__)

    if "lib.gan.optim" not in sys.modules:
        from models.stylegan2.op import upfirdn2d

        # the op/ shim's fused_leaky_relu hardcodes .cuda(); use the CPU
        # fallback exactly as lib/gan/optim/fused_act.py:234-248 defines it
        def fused_leaky_relu(input, bias=None, negative_slope=0.2,
                             scale=2 ** 0.5):
            if bias is not None:
                rest = [1] * (input.ndim - bias.ndim - 1)
                input = input + bias.view(1, bias.shape[0], *rest)
            return _F.leaky_relu(input, negative_slope=0.2) * scale

        class FusedLeakyReLU(torch.nn.Module):
            def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
                super().__init__()
                self.bias = torch.nn.Parameter(torch.zeros(channel))
                self.negative_slope = negative_slope
                self.scale = scale

            def forward(self, x):
                return fused_leaky_relu(
                    x, self.bias, self.negative_slope, self.scale
                )

        gradfix = types.ModuleType("lib.gan.optim.conv2d_gradfix")
        gradfix.conv2d = _F.conv2d
        gradfix.conv_transpose2d = _F.conv_transpose2d
        optim = types.ModuleType("lib.gan.optim")
        optim.FusedLeakyReLU = FusedLeakyReLU
        optim.fused_leaky_relu = fused_leaky_relu
        optim.upfirdn2d = upfirdn2d
        optim.conv2d_gradfix = gradfix
        sys.modules["lib.gan.optim"] = optim
        sys.modules["lib.gan.optim.conv2d_gradfix"] = gradfix
        sys.modules["lib.gan"].optim = optim

    from models.baggan.models import StyleGANGenerator

    torch.manual_seed(0)
    g = StyleGANGenerator(latent_dims=(512, 512), img_resolution=size,
                          mlp_layers=mlp_layers)
    g.eval()
    return torch, g


def test_baggan_import_matches_reference_torch(tmp_path):
    """BagGAN `%s_net_%s.pth` importer golden parity: save the actual
    reference StyleGANGenerator's state_dict the way GANBaseModel does
    (base_model.py:153-175), import it, and require identical outputs."""
    import os

    from ganecdotes_tpu.models.baggan.convert import (
        load_baggan_torch_checkpoint,
    )
    from ganecdotes_tpu.models.stylegan2.generator import generator_forward

    size = 32
    torch, g = _load_ref_baggan_generator(size=size)
    path = os.path.join(str(tmp_path), "latest_net_G.pth")
    torch.save(g.state_dict(), path)

    params, meta = load_baggan_torch_checkpoint(path, size)
    assert meta["n_latent"] == g.n_latent
    assert meta["num_layers"] == g.num_layers

    rng = np.random.RandomState(0)
    w = rng.randn(2, g.n_latent, 512).astype(np.float32)
    mean_w = rng.randn(1, 512).astype(np.float32)

    with torch.no_grad():
        img_t, feats_t = g([torch.from_numpy(w)], input_is_latent=True,
                           truncation=0.7,
                           truncation_latent=torch.from_numpy(mean_w),
                           randomize_noise=False)

    img_j, feats_j = generator_forward(
        params, meta, [jnp.asarray(w)], input_is_latent=True,
        truncation=0.7, truncation_latent=jnp.asarray(mean_w),
        randomize_noise=False,
    )

    assert len(feats_j) == len(feats_t)
    for ft, fj in zip(feats_t, feats_j):
        want = ft.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(fj), want, atol=2e-4,
                                   err_msg=f"feature {want.shape}")
    np.testing.assert_allclose(
        np.asarray(img_j), img_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )

    # z-space path exercises the imported mapping MLP too
    z = rng.randn(1, 512).astype(np.float32)
    with torch.no_grad():
        img_t, _ = g([torch.from_numpy(z)], truncation=0.7,
                     truncation_latent=torch.from_numpy(mean_w),
                     randomize_noise=False)
    img_j, _ = generator_forward(
        params, meta, [jnp.asarray(z)], truncation=0.7,
        truncation_latent=jnp.asarray(mean_w), randomize_noise=False,
    )
    np.testing.assert_allclose(
        np.asarray(img_j), img_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )


@pytest.mark.slow
def test_bagganhq_data_parallel_mesh(tmp_path):
    """data_parallel=True shards the GAN steps over the 8-device mesh:
    replicated params, batch-sharded images/latents, XLA-inserted grad psum
    (the TPU-native form of the reference's DDP branch, gan_util.py:154-160).
    Parity check: one D+G iteration matches the single-device trainer
    bit-for-bit given identical seeds and inputs — WITH ADA on, so the
    scatter-free shear warp (per-image transposes, bit-rolls, one-hot
    matmuls) is proven under batch sharding too."""
    import types

    from ganecdotes_tpu.gan.train import BagGANHQ

    def make_cfg(sub, dp):
        return types.SimpleNamespace(
            out_dir=str(tmp_path / sub), checkpoint_dir=str(tmp_path / sub),
            is_train=True, image_size=32, latent_dim=64, num_channels=3,
            batch_size=8, gan_mode="vanilla", use_ppl=False, r1_lambda=10,
            ppl_lambda=2, path_batch_shrink=1, ppl_decay=0.01,
            d_reg_every=2, g_reg_every=2, mixing_prob=0.0, chl_multiplier=1,
            g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=True,
            augment_p=0, ada_target=0.6, ada_length=100, lr=0.002,
            beta1=0.0, lr_policy="linear",
            lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
            generator_params=dict(mlp_layers=2),
            losses_to_print=["g_gan", "d"],
            start_epoch=1, continue_train=False, load_net=False,
            data_parallel=dp,
        )

    real = jnp.asarray(
        np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32) * 2 - 1
    )

    results = {}
    for dp in (False, True):
        gan = BagGANHQ(make_cfg(f"dp{int(dp)}", dp), seed=3)
        assert (gan.mesh is not None) == dp
        gan.set_input(data_sample={"ct": real}, iter_no=1, epoch_no=0)
        gan.optimize_parameters()
        results[dp] = (
            float(gan.loss_d),
            float(gan.loss_g_gan),
            np.asarray(jax.tree.leaves(gan.generator_params)[0]),
        )

    assert np.isfinite(results[True][0]) and np.isfinite(results[True][1])
    np.testing.assert_allclose(results[True][0], results[False][0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(results[True][1], results[False][1],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(results[True][2], results[False][2],
                               rtol=1e-4, atol=1e-5)


def test_baggan_export_roundtrip_into_reference_torch(tmp_path):
    """res2chlmap init + exporter round-trip (the inverse of the importer):
    initialize the TPU generator with BagGAN's lean channel map, export to
    the reference ``*_net_G.pth`` key layout, load it into the imported
    reference StyleGANGenerator, and require output parity — proving a
    BagGAN trained from scratch here is the reference architecture."""
    import os

    from ganecdotes_tpu.models.baggan.convert import (
        BAGGAN_RES_TO_CHANNEL_MAP,
        save_baggan_torch_checkpoint,
    )
    from ganecdotes_tpu.models.stylegan2.generator import (
        generator_forward,
        init_generator,
    )

    size, n_mlp = 32, 2
    torch, g_ref = _load_ref_baggan_generator(size=size, mlp_layers=n_mlp)

    params, meta = init_generator(
        jax.random.PRNGKey(3), size, n_mlp=n_mlp,
        res2chlmap=BAGGAN_RES_TO_CHANNEL_MAP,
    )
    # lean-map widths actually took effect (reference: 256ch at 16x16)
    assert params["convs"][-1]["conv"]["weight"].shape[-1] == \
        BAGGAN_RES_TO_CHANNEL_MAP[32]

    path = os.path.join(str(tmp_path), "latest_net_G.pth")
    save_baggan_torch_checkpoint(path, params)

    missing, unexpected = g_ref.load_state_dict(
        torch.load(path, weights_only=False), strict=True
    )
    assert not missing and not unexpected
    g_ref.eval()

    rng = np.random.RandomState(0)
    w = rng.randn(2, meta["n_latent"], 512).astype(np.float32)
    mean_w = rng.randn(1, 512).astype(np.float32)

    with torch.no_grad():
        img_t, feats_t = g_ref(
            [torch.from_numpy(w)], input_is_latent=True, truncation=0.7,
            truncation_latent=torch.from_numpy(mean_w),
            randomize_noise=False,
        )
    img_j, feats_j = generator_forward(
        params, meta, [jnp.asarray(w)], input_is_latent=True,
        truncation=0.7, truncation_latent=jnp.asarray(mean_w),
        randomize_noise=False,
    )
    assert len(feats_j) == len(feats_t)
    np.testing.assert_allclose(
        np.asarray(img_j), img_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )


@pytest.mark.slow
def test_ada_warp_impl_auto_resolution(tmp_path):
    """The trainer's ada_warp_impl default 'auto' resolves per backend
    (pallas kernel on TPU, XLA passes elsewhere); explicit values pass
    through; unknown values fail at the first augmented step."""
    import types

    from ganecdotes_tpu.gan.train import BagGANHQ

    def build(**kw):
        cfg = types.SimpleNamespace(
            out_dir=str(tmp_path), checkpoint_dir=str(tmp_path / "ckpt"),
            is_train=True, image_size=32, latent_dim=64, num_channels=3,
            batch_size=2, gan_mode="vanilla", use_ppl=False, r1_lambda=10,
            ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01,
            d_reg_every=2, g_reg_every=2, mixing_prob=0.0,
            chl_multiplier=1, g_reg_ratio=4 / 5, d_reg_ratio=16 / 17,
            augment=True, augment_p=0, ada_target=0.6, ada_length=100,
            lr=0.002, beta1=0.0, lr_policy="linear",
            lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
            generator_params=dict(mlp_layers=2),
            losses_to_print=["g_gan", "d"],
            start_epoch=1, continue_train=False, load_net=False, **kw,
        )
        gan = BagGANHQ(cfg)
        gan.setup_gan()
        return gan

    # tests run on the CPU mesh -> auto must resolve to the XLA passes
    assert build()._ada_warp_impl == "shear"
    assert build(ada_warp_impl="shear_pallas")._ada_warp_impl == (
        "shear_pallas"
    )

    # the pallas impl trains end-to-end on CPU too (interpret mode)
    gan = build(ada_warp_impl="shear_pallas")
    real = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    )
    gan.set_input(data_sample={"ct": real}, iter_no=0, epoch_no=0)
    gan.optimize_parameters()
    assert np.isfinite(gan.get_current_losses()["d"])
