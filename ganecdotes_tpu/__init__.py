"""ganecdotes_tpu — TPU-native one-shot GAN segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
avm-debatr/ganecdotes (one-shot semantic segmentation of StyleGAN2-generated
images via self-supervised hidden-feature clustering), designed TPU-first:

  * ``ops``       — resampling/activation primitives (Pallas + XLA paths)
  * ``models``    — feature-emitting StyleGAN2 generator/discriminator and the
                    BagGAN-HQ training stack, as pure-functional param pytrees
  * ``selfsup``   — SwAV / SimCLR / k-means hidden-feature clustering learners
  * ``pipeline``  — the one-shot setup/train/test orchestrator
  * ``parallel``  — jax.sharding mesh helpers (data-parallel SPMD)
  * ``configs``   — registry + python-module configs (reference-compatible
                    mapper semantics, cf. reference configs/mapper.py:9-67)
  * ``metrics``   — IoU / Dice / PD segmentation metric suite
"""

import os

ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG_DIR = os.path.dirname(os.path.abspath(__file__))
CONFIGS_DIR = os.path.join(PKG_DIR, "configs")
CHECKPOINT_DIR = os.path.join(ROOT_DIR, "checkpoints")
RESULTS_DIR = os.path.join(ROOT_DIR, "results")
TEST_DIR = os.path.join(ROOT_DIR, "tests")

__version__ = "0.1.0"
