"""BagGAN-HQ model family (StyleGAN2 for X-ray baggage imagery).

The BagGAN training engine (ADA, R1/PPL, GAN losses, checkpoint/scheduler
scaffolding) lives in ``ganecdotes_tpu.gan.train.BagGANHQ``. For the one-shot
pipeline the BagGAN *generator* is architecturally a StyleGAN2 generator with
the same channel map (ref models/baggan/models.py:257-378 mirrors
models/stylegan2/model.py:457-648), served by the shared TPU generator.
"""

import glob
import os

from ganecdotes_tpu.utils.util import load_config
from ganecdotes_tpu.utils.serialization import load_pytree


def load_baggan_generator(model_config, key=None, logger=None):
    """Generator for a BagGAN model config (ref one_shot_pipeline.py:149-154).

    Loads the newest '<suffix>_net_G.npz' from the BagGAN run's checkpoint
    dir when one exists (GANBaseModel layout); otherwise random init.
    """
    from ganecdotes_tpu.models.stylegan2.generator import Generator

    ga = dict(model_config.gen_args)
    # random-init widths: honor an explicit res2chlmap (gen_args or the
    # BagGAN run config) — the reference BagGAN default is leaner than
    # rosinality's (models/baggan/models.py:25-33)
    r2c = ga.get("res2chlmap")
    cfg_path = getattr(model_config, "config_path", None)
    baggan_cfg = None
    if cfg_path and os.path.exists(cfg_path):
        baggan_cfg = load_config(cfg_path, "baggan_config")
        if r2c is None:
            r2c = getattr(baggan_cfg, "res2chlmap", None)
    if r2c == "baggan":
        from ganecdotes_tpu.models.baggan.convert import (
            BAGGAN_RES_TO_CHANNEL_MAP,
        )

        r2c = BAGGAN_RES_TO_CHANNEL_MAP
    g = Generator(
        size=ga.get("size", 256),
        style_dim=ga.get("style_dim", 512),
        n_mlp=ga.get("n_mlp", 8),
        channel_multiplier=ga.get("channel_multiplier", 2),
        blur_kernel=tuple(ga.get("blur_kernel", (1, 3, 3, 1))),
        key=key,
        res2chlmap=r2c,
    )
    if baggan_cfg is not None:
        # 'latest' wins; otherwise the numerically highest epoch
        # (lexicographic sort would pick '9' over '10')
        def rank(p):
            stem = os.path.basename(p).split("_net_")[0]
            if stem == "latest":
                return (2, 0)
            try:
                return (1, int(stem))
            except ValueError:
                return (0, 0)

        ckpts = glob.glob(
            os.path.join(baggan_cfg.checkpoint_dir, "*_net_G.npz")
        )
        if ckpts:
            best = max(ckpts, key=rank)
            g.params = load_pytree(best)
            if logger:
                logger.info(f"Loaded BagGAN generator: {best}")
            return g

        # reference-format torch state_dicts (base_model.py:153-175)
        ckpts = glob.glob(
            os.path.join(baggan_cfg.checkpoint_dir, "*_net_G.pth")
        )
        if ckpts:
            from ganecdotes_tpu.models.baggan.convert import (
                load_baggan_torch_checkpoint,
            )

            best = max(ckpts, key=rank)
            g.params, g.meta = load_baggan_torch_checkpoint(
                best, ga.get("size", 256),
                style_dim=ga.get("style_dim", 512),
                res2chlmap=r2c,
            )
            if logger:
                logger.info(f"Imported reference BagGAN generator: {best}")
            return g
    if logger:
        logger.warning(
            "BagGAN checkpoint not found - using randomly initialized "
            "generator weights"
        )
    return g
