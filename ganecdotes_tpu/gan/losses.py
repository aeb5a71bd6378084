"""GAN losses & regularizers — TPU counterparts of models/baggan/gan_util.py
(GANLoss :289-391, gradient penalty :206-284, NormalNLLLoss :395-413,
DiceLoss :494-534) and the BagGANHQ regularizers (bagganhq.py:225-328).

The reference needs conv2d_gradfix / grid-sample gradfix machinery to take
gradients-of-gradients (R1, PPL, WGAN-GP). JAX autodiff composes natively, so
each regularizer is a plain ``jax.grad`` expression.
"""

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# adversarial objectives
# ---------------------------------------------------------------------------


def gan_loss(mode):
    """GANLoss factory: mode in {'vanilla','lsgan','bce','wgangp'}.

    Returns f(prediction, target_is_real) -> scalar.
    """
    if mode == "lsgan":

        def f(pred, real):
            target = jnp.ones_like(pred) if real else jnp.zeros_like(pred)
            return jnp.mean((pred - target) ** 2)

    elif mode == "vanilla":

        def f(pred, real):
            target = jnp.ones_like(pred) if real else jnp.zeros_like(pred)
            return jnp.mean(
                jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
            )

    elif mode == "bce":

        def f(pred, real):
            target = jnp.ones_like(pred) if real else jnp.zeros_like(pred)
            p = jnp.clip(pred, 1e-7, 1 - 1e-7)
            return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))

    elif mode == "wgangp":

        def f(pred, real):
            return -pred.mean() if real else pred.mean()

    else:
        raise NotImplementedError(f"gan mode {mode} not implemented")
    return f


def logistic_loss(pred_real, pred_fake):
    """softplus(-D(x)) + softplus(D(G(z))) (ref bagganhq.py:299-312)."""
    return jax.nn.softplus(-pred_real).mean() + jax.nn.softplus(pred_fake).mean()


def nonsaturating_loss(pred_fake):
    return jax.nn.softplus(-pred_fake).mean()


# ---------------------------------------------------------------------------
# regularizers (gradients-of-gradients — no gradfix machinery needed)
# ---------------------------------------------------------------------------


def r1_penalty(disc_fn, real_images):
    """R1 = E[‖∇_x D(x)‖²] on real images (ref bagganhq.py:272-296).

    disc_fn maps images -> (B, 1) logits (augmentation, if any, must be
    applied inside disc_fn so the gradient flows through it).
    Returns (penalty, pred_real).
    """

    def scalar_out(x):
        pred = disc_fn(x)
        return pred.sum(), pred

    grad_real, pred = jax.grad(scalar_out, has_aux=True)(real_images)
    penalty = jnp.sum(grad_real.reshape(grad_real.shape[0], -1) ** 2, axis=1).mean()
    return penalty, pred


def path_length_penalty(gen_latent_fn, latents, noise_imgs, mean_path_length,
                        decay=0.01):
    """Perceptual path-length regularizer (ref bagganhq.py:225-269).

    gen_latent_fn: w⁺ latents -> image. ``noise_imgs`` is the
    N(0,1)/√(HW) image-space probe. Returns (ppl_loss, new_mean, lengths).
    """

    def probe(lat):
        img = gen_latent_fn(lat)
        return jnp.sum(img * noise_imgs)

    grad = jax.grad(probe)(latents)  # (B, n_latent, D)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad**2, axis=2), axis=1))
    path_mean = mean_path_length + decay * (path_lengths.mean() - mean_path_length)
    ppl = jnp.mean((path_lengths - path_mean) ** 2)
    return ppl, jax.lax.stop_gradient(path_mean), path_lengths


def gradient_penalty(disc_fn, real_data, fake_data, key, kind="mixed",
                     constant=1.0, lambda_gp=1.0):
    """WGAN-GP gradient penalty (ref gan_util.py:206-284)."""
    if lambda_gp <= 0.0:
        return 0.0, None
    if kind == "real":
        interp = real_data
    elif kind == "fake":
        interp = fake_data
    elif kind == "mixed":
        alpha = jax.random.uniform(key, (real_data.shape[0], 1, 1, 1))
        interp = alpha * real_data + (1 - alpha) * fake_data
    else:
        raise NotImplementedError(kind)

    def scalar_out(x):
        pred = disc_fn(x)
        if isinstance(pred, tuple):
            pred = pred[0]
        return pred.sum()

    grads = jax.grad(scalar_out)(interp)
    flat = grads.reshape(real_data.shape[0], -1)
    norm = jnp.linalg.norm(flat + 1e-16, axis=1)
    return jnp.mean((norm - constant) ** 2) * lambda_gp, grads


# ---------------------------------------------------------------------------
# auxiliary losses
# ---------------------------------------------------------------------------


def normal_nll_loss(x, mu, var):
    """Factored-Gaussian NLL for InfoGAN continuous codes (ref :395-413)."""
    logli = -0.5 * jnp.log(var * (2 * math.pi) + 1e-6) - (x - mu) ** 2 / (
        var * 2.0 + 1e-6
    )
    return -jnp.mean(jnp.sum(logli, axis=1))


def dice_loss(input_soft, target_soft, eps=1e-6):
    """Soft Dice over BxHxWxC maps (ref DiceLoss :494-534, NHWC here)."""
    dims = (1, 2, 3)
    intersection = jnp.sum(input_soft * target_soft, axis=dims)
    cardinality = jnp.sum(input_soft + target_soft, axis=dims)
    dice = 2.0 * intersection / (cardinality + eps)
    return jnp.mean(1.0 - dice)
