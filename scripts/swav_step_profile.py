"""Stage-level decomposition of the production SwAV pretrain step (v5e).

The round-4 recapture measured swav_pretrain_steps_per_s = 1.63 vs
simclr's 116.5 — a 70x gap docs/PERFORMANCE.md promised to profile.
This script times each stage of make_swav_train_step's body with the
chained-fori + value-readback methodology, at the shipped ffhq-256
config (hlen 4864, 5 patches x 20k px, nproto 5000, sinkhorn niters=10
eps=0.005, LARS):

  synth     2-view perturbed synthesis + rotate/flip (sample_inputs)
  gather    project_gathered fwd, 1 patch x 1 view (20k px, 4864 -> 512)
  proto     z @ prototypes fwd, 1 patch x 1 view (20k x 512 x 5000)
  sinkhorn  one sinkhorn_knopp call (20k x 5000, 10 iters)
  loss_fwd  full loss_fn forward (5 patches x 2 views, both sinkhorns)
  step      full jitted step incl. value_and_grad + LARS

Stage times x call counts are the attribution; (step - loss-related)
isolates the backward + optimizer share.
"""

import time

import jax
import jax.numpy as jnp


def timed(fn, args, iters=6):
    """Chained fori: perturb the first arg, thread a scalar sum."""

    @jax.jit
    def prog(args):
        def body(i, s):
            out = fn(jax.tree.map(lambda a: a + i * 1e-9, args[0]), *args[1:])
            # consume EVERY output leaf — a partial sum lets XLA DCE the rest
            return s + sum(x.astype(jnp.float32).mean()
                           for x in jax.tree.leaves(out))

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(prog(args))
    t0 = time.perf_counter()
    float(prog(args))
    return (time.perf_counter() - t0) / iters


def main():
    from ganecdotes_tpu.configs import mapper as config_mapper
    from ganecdotes_tpu.selfsup import swav as S
    from ganecdotes_tpu.utils.util import load_config

    import bench

    print(f"device: {jax.devices()[0].device_kind}")
    seg = load_config(config_mapper.segmentors["hfc_with_swav"], "seg_config")
    pa = seg.hfc_prep_args["perturb_args"]
    sa = seg.hfc_prep_args["swav_args"]
    sk = seg.hfc_prep_args["sinkhorn_args"]

    key = jax.random.PRNGKey(2)
    kg, ks, kt = jax.random.split(key, 3)
    g = bench._flagship(kg)
    mc = {"truncation": 0.7, "latent_dim": 512}
    mean_w = jnp.zeros((1, 512))

    ssl = S.init_swav_params(ks, sa["hlen"], sa["nclasses"],
                             sa["nprototypes"], sa["projn_nw"])
    optimizer, step = S.make_swav_train_step(
        g.meta, mc, pa, sa, sk, mean_w, (256, 256)
    )
    opt_state = optimizer.init(ssl)

    # --- rebuild the step's internal stages at the same shapes ---
    from ganecdotes_tpu.selfsup.augmentor import (
        perturbed_features,
        random_rotate_flip_params,
        rotate_flip_features,
    )
    from ganecdotes_tpu.selfsup.embed import project_gathered

    npix = 256 * 256
    patch = sa["patch_size"]

    def synth(gen_params, k):
        (k_lat, k_layer, k_vs, k_vt, k_as, k_at, _) = jax.random.split(k, 7)
        z = jax.random.normal(k_lat, (1, 512))
        w_lat = S.mapping_apply(gen_params, z)
        w_tr = mean_w + 0.7 * (w_lat - mean_w)
        w_plus = jnp.repeat(w_tr[:, None, :], g.meta["n_latent"], axis=1)
        k_ls, k_lt = jax.random.split(k_layer)
        ls = jax.random.randint(k_ls, (), 0, pa["n_layers"])
        lt = jax.random.randint(k_lt, (), 0, pa["n_layers"])
        _, fs = perturbed_features(gen_params, g.meta, w_plus, k_vs, ls,
                                   pa["n_layers"], tuple(pa["perturb_std"]),
                                   0.7, mean_w)
        _, ft = perturbed_features(gen_params, g.meta, w_plus, k_vt, lt,
                                   pa["n_layers"], tuple(pa["perturb_std"]),
                                   0.7, mean_w)
        a_s, f_s = random_rotate_flip_params(k_as)
        a_t, f_t = random_rotate_flip_params(k_at)
        fs = rotate_flip_features(fs, a_s, f_s)
        ft = rotate_flip_features(ft, a_t, f_t)
        return fs, ft

    t = timed(synth, (g.params, kt))
    print(f"synth (2 views + rot/flip)      : {t*1e3:8.1f} ms  x1/step")

    # one view's features for the per-stage micro timings
    fs = jax.eval_shape(lambda gp, k: synth(gp, k), g.params, kt)[0]
    feats = [jnp.ones(s.shape, s.dtype) for s in jax.tree.leaves(fs)]
    picks = jax.random.randint(kt, (patch,), 0, npix)

    def gather_fn(w0, feats):
        return project_gathered(feats, picks, (256, 256), w0,
                                hlen=sa["hlen"])[0]

    w0 = ssl["projection"][0]["weight"]
    t_gather = timed(gather_fn, (w0, feats))
    print(f"gather+project (1 patch 1 view) : {t_gather*1e3:8.1f} ms x10/step"
          f" -> {10*t_gather*1e3:7.1f} ms")

    z = jnp.ones((patch, sa["nclasses"]))
    proto = ssl["prototype"]

    def proto_fn(z, proto):
        zn = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)
        return zn @ proto["weight"] + proto["bias"]

    t_proto = timed(proto_fn, (z, proto))
    print(f"normalize + @proto (1p 1v)      : {t_proto*1e3:8.1f} ms x10/step"
          f" -> {10*t_proto*1e3:7.1f} ms")

    scores = jax.random.normal(kt, (patch, sa["nprototypes"]))
    r = jnp.full((sa["nprototypes"],), 1.0 / sa["nprototypes"])
    c = jnp.full((patch,), 1.0 / patch)

    def sk_fn(s):
        return S.sinkhorn_knopp(s, sk["niters"], sk["eps"], r, c)

    t_sk = timed(sk_fn, (scores,))
    print(f"sinkhorn ({patch}x{sa['nprototypes']}, {sk['niters']} iters)"
          f" : {t_sk*1e3:8.1f} ms x10/step -> {10*t_sk*1e3:7.1f} ms")

    def swl(s):
        return S.swapped_prediction_loss(
            s / sa["temperature"], s / sa["temperature"] * 0.99,
            jax.nn.softmax(s, axis=1), jax.nn.softmax(s * 0.99, axis=1))

    t_swl = timed(swl, (scores,))
    print(f"swapped loss (1 patch pair)     : {t_swl*1e3:8.1f} ms  x5/step"
          f" -> {5*t_swl*1e3:7.1f} ms")

    t_step = timed(
        lambda sp, os, k: step(g.params, sp, os, k, 0),
        (ssl, opt_state, kt), iters=4,
    )
    print(f"FULL STEP (fwd+bwd+LARS)        : {t_step*1e3:8.1f} ms")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    main()
