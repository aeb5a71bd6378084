"""Epoch-1 wall time of the production ffhq-256 SwAV pretrain.

Run on the real TPU, TWICE (two separate processes, same command):

    python scripts/pretrain_epoch1_timing.py /tmp/e1_run

Process 1 = cold epoch-1 (trace+lower+compile dominated; round 3 measured
~430 s smoke / ~580 s production BEFORE the weak-type double-compile fix).
Process 2 = identical rerun: the persistent compile cache should make
epoch-1 ≥2x faster (VERDICT r3 task 2's done-bar; fingerprints proven
stable cross-process on CPU in round 4).

The run is the REAL production path — OneShotPipeline setup + the SwAV
preprocessor's pretrain() with the shipped ffhq config, num_epochs cut to 1
(only the epoch count is overridden; 1 sample x 5 patches x 20k px, LARS,
Sinkhorn eps=0.005 all stay production).
"""

import sys
import time


def main(out_dir):
    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    t0 = time.perf_counter()
    pipe = OneShotPipeline(
        out_dir=out_dir, model="ffhq-256", segmentor="hfc_with_swav",
        num_test_samples=2,
    )
    # the constructor holds the jitted generator/segmentor init compiles —
    # on a cold cache this is where the relay compile time lands (measured
    # 503 s cold vs ~30 s warm, round 4), so time it explicitly
    print(f"pipeline constructor: {time.perf_counter() - t0:.1f} s",
          flush=True)
    pipe.seg_config.train_hfc = True
    pipe.seg_config.hfc_prep_args["train"] = True
    pipe.seg_config.hfc_prep_args["swav_args"]["num_epochs"] = 1
    pipe.seg_config.hfc_prep_args["swav_args"]["plot_test_images"] = False

    t0 = time.perf_counter()
    pipe.run_pipeline(blocks_to_run=("setup",))
    t_setup = time.perf_counter() - t0
    print(f"setup block: {t_setup:.1f} s", flush=True)

    pipe.preprocessor = pipe._build_ssl_preprocessor()
    t0 = time.perf_counter()
    pipe.preprocessor.pretrain(pipe.one_shot_latent)
    t_e1 = time.perf_counter() - t0
    print(f"epoch-1 (pretrain, 1 epoch, production config): {t_e1:.1f} s")


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/e1_run")
