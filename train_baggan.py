"""Train a BagGAN-HQ model (StyleGAN2 + ADA) on a directory of .npy images.

The reference ships the BagGANHQ trainer class but trains it in an external
repo (README.md:133-138); this CLI makes the framework self-sufficient:
config-file driven (models/baggan/config layout), native C++ prefetching
data loader (ganecdotes_tpu/runtime), per-epoch checkpoints in the
GANBaseModel '%s_net_%s' layout that the one-shot pipeline's BagGAN model
configs load.

    python train_baggan.py --config ganecdotes_tpu/configs/models/baggan/\
config_pidray_unlabeled.py --data_dir /path/to/npy --epochs 10
"""

import argparse
import glob
import os
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True,
                    help="BagGAN config module (see configs/models/baggan/)")
    ap.add_argument("--data_dir", default=None,
                    help=".npy image directory; synthetic noise when absent")
    ap.add_argument("--out_dir", default=None, help="override config.out_dir")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--iters_per_epoch", type=int, default=None)
    ap.add_argument("--save_every", type=int, default=1,
                    help="checkpoint every N epochs")
    ap.add_argument("--chunk", type=int, default=1,
                    help="GAN iterations staged per optimizer call; >1 "
                         "fuses plain (D,G) runs into one lax.scan "
                         "dispatch. Measured NO faster on this relay "
                         "(async dispatch already pipelines; see "
                         "docs/PERFORMANCE.md) — kept for environments "
                         "with truly synchronous dispatch.")
    args = ap.parse_args()

    import jax
    import numpy as np

    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    from ganecdotes_tpu.gan.train import BagGANHQ
    from ganecdotes_tpu.utils.util import load_config

    cfg = load_config(args.config, "baggan_config")
    if args.out_dir:
        # re-derive every out_dir-relative path the config computed at import
        cfg.out_dir = args.out_dir
        cfg.checkpoint_dir = os.path.join(args.out_dir, "checkpoints")
        cfg.training_log_path = os.path.join(
            args.out_dir, time.strftime("train_%m%d%Y_%H%M%S.log")
        )
        cfg.snap_dir = os.path.join(args.out_dir, "training_snaps")
        cfg.losses_file = os.path.join(args.out_dir, "training_losses.npz")
        os.makedirs(args.out_dir, exist_ok=True)
    n_epochs = args.epochs or getattr(cfg, "n_epochs", 10)
    size = cfg.image_size
    chans = getattr(cfg, "num_channels", 3)

    # multi-chip: shard the GAN steps over the data axis when the batch
    # divides the device count (replicated params, psum'd grads over ICI)
    if (
        not hasattr(cfg, "data_parallel")
        and jax.device_count() > 1
        and cfg.batch_size % jax.device_count() == 0
    ):
        cfg.data_parallel = True

    gan = BagGANHQ(cfg)
    gan.setup_gan()
    gan.print_networks()

    if args.data_dir:
        paths = sorted(
            glob.glob(os.path.join(args.data_dir, "**", "*.npy"),
                      recursive=True)
        )
        if not paths:
            raise SystemExit(f"no .npy files under {args.data_dir}")
        from ganecdotes_tpu.runtime import make_loader

        loader = make_loader(paths, cfg.batch_size, size, size, chans)
        iters = args.iters_per_epoch or max(1, len(paths) // cfg.batch_size)
        gan.logger.info(
            f"data: {len(paths)} files, loader="
            f"{type(loader).__name__}, {iters} iters/epoch"
        )
    else:
        loader = None
        iters = args.iters_per_epoch or 10
        gan.logger.info("no --data_dir: training against noise (smoke mode)")
        rng = np.random.RandomState(0)

    def next_batch():
        if loader is not None:
            return loader.next()
        return rng.rand(cfg.batch_size, size, size, chans).astype(
            np.float32
        ) * 2 - 1

    chunk = max(1, args.chunk)
    it = 0
    for epoch in range(gan.epoch, gan.epoch + n_epochs):
        t0 = time.time()
        done = 0
        while done < iters:
            k = min(chunk, iters - done)
            if k == 1:
                gan.set_input(data_sample={"ct": next_batch()}, iter_no=it,
                              epoch_no=epoch)
                gan.optimize_parameters()
            else:
                # k full iterations under ONE jitted dispatch; a partial
                # final chunk compiles a second (persistent-cached) program
                gan.optimize_parameters_chunk(
                    [next_batch() for _ in range(k)]
                )
            it += k
            done += k
        losses = gan.get_current_losses()
        loss_str = " ".join(f"{k}={v:.4f}" for k, v in losses.items())
        gan.logger.info(
            f"epoch {epoch} | {loss_str} | ada_p={gan.ada_aug_p:.3f} "
            f"| {time.time() - t0:.1f}s"
        )
        if loader is not None and loader.decode_errors:
            total = loader.batches_produced * cfg.batch_size
            gan.logger.error(
                f"data loader: {loader.decode_errors}/{total} samples failed "
                f"to decode (wrong shape/dtype? expected "
                f"({size},{size},{chans})) — they train as zeros"
            )
            if loader.decode_errors >= total:
                raise SystemExit(
                    "every sample failed to decode; refusing to train on "
                    "all-zero batches"
                )
        if epoch % args.save_every == 0:
            gan.save_networks("latest")
            gan.save_networks(str(epoch))
        gan.update_learning_rate()

    if loader is not None:
        loader.close()
    gan.save_networks("latest")
    gan.logger.info("training complete")


if __name__ == "__main__":
    main()
