"""Golden parity: TPU generator vs the reference PyTorch implementation.

The strongest possible check without shipped checkpoints: instantiate the
*actual* reference Generator (imported from the read-only reference tree),
convert its randomly-initialized state_dict through ``convert.py``, and
require that mapping, synthesis image, and every feature-pyramid level agree.
Skipped gracefully when the reference tree isn't present.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from ganecdotes_tpu.models.stylegan2 import (
    Generator,
    generator_forward,
    init_generator,
    mapping_apply,
    num_feature_layers,
)
from ganecdotes_tpu.models.stylegan2.convert import convert_torch_generator_state

REF_PATH = "/root/reference"


def _load_ref_generator(size):
    torch = pytest.importorskip("torch")
    import os

    if not os.path.isdir(REF_PATH):
        pytest.skip("reference tree not available")
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    from models.stylegan2.model import Generator as TorchGenerator

    torch.manual_seed(0)
    g = TorchGenerator(size=size, style_dim=512, n_mlp=8)
    g.eval()
    return torch, g


@pytest.mark.parametrize("size", [32, 64])
def test_forward_matches_reference_torch(size):
    torch, g = _load_ref_generator(size)
    params, meta = convert_torch_generator_state(g.state_dict(), size)

    rng = np.random.RandomState(0)
    w = rng.randn(2, g.n_latent, 512).astype(np.float32)

    with torch.no_grad():
        img_t, feats_t = g([torch.from_numpy(w)], input_is_latent=True,
                           randomize_noise=False)

    img_j, feats_j = generator_forward(
        params, meta, [jnp.asarray(w)], input_is_latent=True,
        randomize_noise=False,
    )

    assert len(feats_j) == len(feats_t) == num_feature_layers(size)
    for ft, fj in zip(feats_t, feats_j):
        want = ft.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(fj), want, atol=2e-4,
                                   err_msg=f"feature {want.shape}")
    np.testing.assert_allclose(
        np.asarray(img_j), img_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )


def test_mapping_matches_reference_torch():
    torch, g = _load_ref_generator(32)
    params, meta = convert_torch_generator_state(g.state_dict(), 32)

    z = np.random.RandomState(1).randn(4, 512).astype(np.float32)
    with torch.no_grad():
        w_t = g.style(torch.from_numpy(z)).numpy()
    w_j = np.asarray(mapping_apply(params, jnp.asarray(z)))
    np.testing.assert_allclose(w_j, w_t, atol=1e-5)


def test_truncation_matches_reference_torch():
    torch, g = _load_ref_generator(32)
    params, meta = convert_torch_generator_state(g.state_dict(), 32)

    rng = np.random.RandomState(2)
    w = rng.randn(1, 512).astype(np.float32)
    mean_w = rng.randn(1, 512).astype(np.float32)

    with torch.no_grad():
        img_t, _ = g([torch.from_numpy(w)], input_is_latent=True,
                     truncation=0.7, truncation_latent=torch.from_numpy(mean_w),
                     randomize_noise=False)
    img_j, _ = generator_forward(
        params, meta, [jnp.asarray(w)], input_is_latent=True,
        truncation=0.7, truncation_latent=jnp.asarray(mean_w),
        randomize_noise=False,
    )
    np.testing.assert_allclose(
        np.asarray(img_j), img_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )


def test_generator_wrapper_shapes():
    g = Generator(size=64)
    z = jnp.zeros((2, 512))
    w = g.style(z)
    assert w.shape == (2, 512)
    img, feats = g([z], randomize_noise=False)
    assert img.shape == (2, 64, 64, 3)
    assert len(feats) == num_feature_layers(64) == 9
    # channel widths follow the channel map
    assert feats[0].shape == (2, 4, 4, 512)
    assert feats[-1].shape == (2, 64, 64, 512)


def test_style_mixing_inject_index():
    params, meta = init_generator(jnp.array([0, 1], dtype=jnp.uint32), 32)
    import jax

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    z1 = jax.random.normal(k1, (1, 512))
    z2 = jax.random.normal(k2, (1, 512))
    img, lat = generator_forward(
        params, meta, [z1, z2], inject_index=3, return_latents=True,
        randomize_noise=False,
    )
    assert lat.shape == (1, meta["n_latent"], 512)
    # first 3 rows from style 1, rest from style 2
    assert np.allclose(lat[0, 0], lat[0, 2])
    assert not np.allclose(lat[0, 2], lat[0, 3])
    assert np.allclose(lat[0, 3], lat[0, -1])


def test_randomize_noise_default_is_jitted_and_fresh():
    """The reference default randomize_noise=True must run under jit (not
    silent eager dispatch) and draw new noise per call."""
    from ganecdotes_tpu.models.stylegan2.generator import Generator
    import jax

    g = Generator(size=32, key=jax.random.PRNGKey(5))
    # noise-injection weights init to 0 (StyleGAN2); make noise visible
    g.params = jax.tree.map(lambda x: x, g.params)
    g.params["conv1"]["noise_weight"] = jnp.ones(())
    for c in g.params["convs"]:
        c["noise_weight"] = jnp.ones(())
    z = jax.random.normal(jax.random.PRNGKey(6), (2, 512))

    img1, feats = g([z])  # randomize_noise defaults to True
    img2, _ = g([z])
    assert img1.shape == (2, 32, 32, 3)
    assert len(feats) == g.num_layers
    # fresh noise => different images, same compiled program
    assert not np.allclose(np.asarray(img1), np.asarray(img2))
    jitted = [k for k in g._compiled if k != "style"]
    assert len(jitted) == 1, "both calls must reuse one jitted closure"

    # explicit noise list is also a jitted path and is honored exactly
    noise = g.make_noise(jax.random.PRNGKey(7), batch=2)
    im_a, _ = g([z], noise=noise)
    im_b, _ = g([z], noise=noise)
    assert np.allclose(np.asarray(im_a), np.asarray(im_b))


@pytest.mark.slow
def test_compiled_cache_is_lru_bounded():
    """A shape/config sweep must not grow the jitted-closure cache without
    bound (a long-lived GUI session leaks compiled programs otherwise)."""
    import jax

    g = Generator(size=32, key=jax.random.PRNGKey(9))
    cap = g._compiled_max
    for batch in range(1, cap + 8):
        z = jnp.zeros((batch, 512))
        g([z], randomize_noise=False)
    assert len(g._compiled) <= cap
    # the most recent entries survive: a repeat call hits the cache
    before = dict(g._compiled)
    g([jnp.zeros((cap + 7, 512))], randomize_noise=False)
    assert dict(g._compiled) == before


def test_noise_rng_uses_all_key_words():
    """Two keys sharing a single word must not replay the same noise
    stream (the seed mixes every word of the PRNG key)."""
    import jax

    g1 = Generator(size=32, key=jax.random.PRNGKey(5))
    g2 = Generator(
        size=32, key=jnp.asarray(
            jax.random.key_data(jax.random.PRNGKey(5)).ravel()
            * jnp.asarray([0, 1], dtype=jnp.uint32)
            + jnp.asarray([12345, 0], dtype=jnp.uint32), dtype=jnp.uint32
        )
    )
    s1 = g1._noise_rng.randint(0, 2**32, size=(4,), dtype=np.uint32)
    s2 = g2._noise_rng.randint(0, 2**32, size=(4,), dtype=np.uint32)
    assert not np.array_equal(s1, s2)
