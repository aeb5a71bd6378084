"""BagGAN-HQ model family (StyleGAN2 for X-ray baggage imagery).

The full BagGAN training engine (ADA augmentation, R1/PPL regularization,
GAN losses) lives in ``ganecdotes_tpu.gan``. For the one-shot pipeline the
BagGAN *generator* is architecturally a StyleGAN2 generator with the same
channel map (ref models/baggan/models.py:257-378 mirrors
models/stylegan2/model.py:457-648); it is served by the shared TPU generator
with BagGAN checkpoints converted at the IO boundary.
"""

import os


def load_baggan_generator(model_config, key=None, logger=None):
    """Generator for a BagGAN model config (ref one_shot_pipeline.py:149-154).

    Loads the trained BagGAN generator state when the checkpoint directory
    exists; otherwise falls back to random init (no checkpoints ship).
    """
    from ganecdotes_tpu.models.stylegan2.generator import Generator

    gen_args = dict(model_config.gen_args)
    gen_args.pop("lr_mlp", None)
    g = Generator(**gen_args, key=key)

    ckpt = getattr(model_config, "model_path", None)
    if ckpt and os.path.exists(ckpt):
        from ganecdotes_tpu.models.baggan.convert import load_baggan_checkpoint

        g.params, g.meta = load_baggan_checkpoint(ckpt, gen_args["size"])
        if logger:
            logger.info(f"Loaded BagGAN checkpoint: {ckpt}")
    elif logger:
        logger.warning(
            "BagGAN checkpoint not found - using randomly initialized "
            "generator weights"
        )
    return g
