"""LR schedulers (TPU counterparts of torch.optim.lr_scheduler, mapper :65-67).

Each factory returns ``f(epoch) -> multiplier`` applied to the base lr —
functional equivalents of StepLR / ReduceLROnPlateau / CosineAnnealingLR as
used by the supervised fine-tune loop (one_shot_pipeline.py:295-305).
"""

import jax.numpy as jnp


def step_lr(step_size, gamma=0.1):
    # jnp ops so the schedule traces inside jitted optimizer steps
    def sched(epoch):
        return jnp.power(gamma, epoch // step_size)

    return sched


def cosine_lr(T_max, eta_min=0.0):
    def sched(epoch):
        frac = jnp.minimum(epoch, T_max) / T_max
        return eta_min + (1.0 - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * frac))

    return sched


def plateau_lr(patience=10, factor=0.1, **_):
    """Stateful plateau scheduler: call .step(loss) per epoch like torch's."""

    class _Plateau:
        def __init__(self):
            self.best = float("inf")
            self.bad = 0
            self.mult = 1.0

        def step(self, loss):
            if loss < self.best - 1e-8:
                self.best = loss
                self.bad = 0
            else:
                self.bad += 1
                if self.bad > patience:
                    self.mult *= factor
                    self.bad = 0
            return self.mult

        def __call__(self, _epoch):
            return self.mult

    return _Plateau()
