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


def plateau_lr(patience=10, factor=0.1, threshold=1e-4, threshold_mode="rel",
               cooldown=0, min_lr_mult=0.0, eps=1e-8, **_):
    """Stateful plateau scheduler: call .step(loss) per epoch like torch's.

    Semantics match ``torch.optim.lr_scheduler.ReduceLROnPlateau`` in
    mode='min' (the only mode the reference uses,
    models/baggan/gan_util.py:110-115): *relative* improvement threshold by
    default (``loss < best * (1 - threshold)``), a post-reduction cooldown
    during which bad epochs don't accumulate, a multiplier floor
    (``min_lr_mult`` — torch's min_lr expressed as a fraction of the base
    lr, since this scheduler returns multipliers), and torch's ``eps`` rule
    (skip a reduction smaller than eps).  The multiplier sequence is pinned
    against a recorded torch trace in tests/test_schedulers.py.
    """

    class _Plateau:
        def __init__(self):
            self.best = float("inf")
            self.bad = 0
            self.cooldown_counter = 0
            self.mult = 1.0

        def _is_better(self, loss):
            if threshold_mode == "rel":
                return loss < self.best * (1.0 - threshold)
            return loss < self.best - threshold

        def step(self, loss):
            loss = float(loss)
            if self._is_better(loss):
                self.best = loss
                self.bad = 0
            else:
                self.bad += 1
            if self.cooldown_counter > 0:
                self.cooldown_counter -= 1
                self.bad = 0
            if self.bad > patience:
                new_mult = max(self.mult * factor, min_lr_mult)
                if self.mult - new_mult > eps:
                    self.mult = new_mult
                self.cooldown_counter = cooldown
                self.bad = 0
            return self.mult

        def __call__(self, _epoch):
            return self.mult

    return _Plateau()
