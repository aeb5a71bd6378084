"""Plateau scheduler parity vs torch.optim.lr_scheduler.ReduceLROnPlateau.

The reference maps lr_policy='plateau' to
ReduceLROnPlateau(mode='min', factor=0.2, threshold=0.01, patience=5)
(models/baggan/gan_util.py:110-115) with torch defaults for the rest
(threshold_mode='rel', cooldown=0, min_lr=0, eps=1e-8).  The expected
multiplier sequences below were recorded from torch 2.x itself (lr=1.0 so
param_groups lr IS the multiplier) over a fixed pseudo-loss trace; pinning
them keeps this test torch-free and fast.
"""

from ganecdotes_tpu.pipeline.schedulers import plateau_lr

# plateaus + improvements; exercises rel-threshold edges (0.95 -> 0.949 is
# NOT a 1% improvement; 0.5 after 0.9489 is) and repeated reductions
LOSSES = [1.0, 0.95, 0.949, 0.9489, 0.9489, 0.9489, 0.9489, 0.9489, 0.9489,
          0.5, 0.499, 0.499, 0.499, 0.499, 0.499, 0.499, 0.499,
          0.49, 0.1, 0.0999, 0.0999, 0.0999, 0.0999, 0.0999, 0.0999, 0.0999]


def _trace(sched):
    return [round(sched.step(l), 10) for l in LOSSES]


def test_plateau_matches_torch_reference_config():
    # the BagGAN configuration, exactly as the reference constructs it
    sched = plateau_lr(patience=5, factor=0.2, threshold=0.01)
    assert _trace(sched) == [
        1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2,
        0.2, 0.2, 0.04, 0.04, 0.04, 0.04, 0.04, 0.04, 0.04, 0.04, 0.04,
        0.008, 0.008,
    ]


def test_plateau_matches_torch_cooldown():
    sched = plateau_lr(patience=2, factor=0.5, threshold=1e-4, cooldown=3)
    assert _trace(sched) == [
        1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5,
        0.25, 0.25, 0.25, 0.25, 0.25, 0.25, 0.25, 0.25, 0.25, 0.125,
        0.125, 0.125, 0.125,
    ]


def test_plateau_matches_torch_abs_threshold_and_min_lr():
    sched = plateau_lr(patience=1, factor=0.1, threshold=0.05,
                       threshold_mode="abs", min_lr_mult=0.005)
    assert _trace(sched) == [
        1.0, 1.0, 1.0, 1.0, 0.1, 0.1, 0.01, 0.01, 0.005, 0.005, 0.005,
        0.005, 0.005, 0.005, 0.005, 0.005, 0.005, 0.005, 0.005, 0.005,
        0.005, 0.005, 0.005, 0.005, 0.005, 0.005,
    ]


def test_plateau_call_returns_current_multiplier():
    sched = plateau_lr(patience=0, factor=0.5, threshold=0.01)
    assert sched(0) == 1.0
    sched.step(1.0)
    sched.step(1.0)  # not better -> immediate reduction at patience=0
    assert sched(1) == 0.5
