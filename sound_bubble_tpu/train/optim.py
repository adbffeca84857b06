"""Optimizers and LR schedulers with torch-compatible semantics on optax.

The reference configs name torch classes (`torch.optim.Adam`,
`torch.optim.lr_scheduler.ReduceLROnPlateau`, and a `"sequential"` composite
— `/root/reference/src/hl_modules/distance_based_hl_module.py:460-481`); the
alias table in `sound_bubble_tpu.utils` routes them here.

Design: the optax transformation is built WITHOUT a learning-rate schedule;
the LR is a runtime scalar argument of the jitted train step, owned by the
host-side Optimizer object and mutated by the (epoch-level, possibly
metric-driven) schedulers — exactly the reference's control flow, with no
recompilation when the LR changes.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


class Optimizer:
    """Host-side optimizer handle: optax transform + mutable `lr`."""

    def __init__(self, params, lr: float, grad_clip: float | None = None):
        self.lr = float(lr)
        self.initial_lr = float(lr)
        self.grad_clip = grad_clip
        self.tx = self._build(grad_clip)
        self.state = self.tx.init(params)

    def _make(self):
        raise NotImplementedError

    def _build(self, grad_clip):
        chain = []
        if grad_clip is not None:
            chain.append(optax.clip_by_global_norm(grad_clip))
        chain.append(self._make())
        chain.append(optax.scale(-1.0))  # lr applied at step time
        return optax.chain(*chain)

    def state_dict(self):
        import numpy as np
        import jax
        return {"lr": self.lr,
                "state": jax.tree_util.tree_map(np.asarray, self.state)}

    def load_state_dict(self, sd):
        import jax
        self.lr = sd["lr"]
        self.state = jax.tree_util.tree_map(jnp.asarray, sd["state"])


class Adam(Optimizer):
    def __init__(self, params, lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                 weight_decay=0.0, grad_clip=None):
        self.betas, self.eps, self.weight_decay = betas, eps, weight_decay
        super().__init__(params, lr, grad_clip)

    def _make(self):
        tx = optax.scale_by_adam(b1=self.betas[0], b2=self.betas[1],
                                 eps=self.eps)
        if self.weight_decay:
            tx = optax.chain(optax.add_decayed_weights(self.weight_decay), tx)
        return tx


class AdamW(Adam):
    def __init__(self, params, lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                 weight_decay=1e-2, grad_clip=None):
        super().__init__(params, lr, betas, eps, weight_decay, grad_clip)

    def _make(self):
        return optax.chain(
            optax.scale_by_adam(b1=self.betas[0], b2=self.betas[1],
                                eps=self.eps),
            optax.add_decayed_weights(self.weight_decay))


# ------------------------------------------------------------- schedulers ---

class _Scheduler:
    """Epoch-level scheduler mutating optimizer.lr (torch-like API)."""

    def __init__(self, optimizer):
        self.optimizer = optimizer
        self.last_epoch = 0

    def step(self, metric=None):
        self.last_epoch += 1
        self._update(metric)

    def _update(self, metric):
        pass

    def state_dict(self):
        return {k: v for k, v in self.__dict__.items() if k != "optimizer"}

    def load_state_dict(self, sd):
        self.__dict__.update(sd)


class ReduceLROnPlateau(_Scheduler):
    """torch semantics: rel-threshold 1e-4, cooldown 0."""

    def __init__(self, optimizer, mode="min", factor=0.1, patience=10,
                 threshold=1e-4, min_lr=0.0, **_):
        super().__init__(optimizer)
        self.mode, self.factor, self.patience = mode, factor, patience
        self.threshold, self.min_lr = threshold, min_lr
        self.best = None
        self.num_bad_epochs = 0

    def _better(self, metric):
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1 - self.threshold)
        return metric > self.best * (1 + self.threshold)

    def _update(self, metric):
        assert metric is not None, "ReduceLROnPlateau needs the monitored metric"
        metric = float(metric)
        if self._better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.optimizer.lr = max(self.optimizer.lr * self.factor,
                                    self.min_lr)
            self.num_bad_epochs = 0


class StepLR(_Scheduler):
    def __init__(self, optimizer, step_size, gamma=0.1, **_):
        super().__init__(optimizer)
        self.step_size, self.gamma = step_size, gamma

    def _update(self, metric):
        if self.last_epoch % self.step_size == 0:
            self.optimizer.lr *= self.gamma


class ExponentialLR(_Scheduler):
    def __init__(self, optimizer, gamma, **_):
        super().__init__(optimizer)
        self.gamma = gamma

    def _update(self, metric):
        self.optimizer.lr *= self.gamma


class ConstantLR(_Scheduler):
    """torch ConstantLR: lr * factor until total_iters epochs elapse."""

    def __init__(self, optimizer, factor=1.0 / 3, total_iters=5, **_):
        super().__init__(optimizer)
        self.factor, self.total_iters = factor, total_iters
        optimizer.lr = optimizer.initial_lr * factor

    def _update(self, metric):
        if self.last_epoch == self.total_iters:
            self.optimizer.lr = self.optimizer.initial_lr


class LinearLR(_Scheduler):
    def __init__(self, optimizer, start_factor=1.0 / 3, end_factor=1.0,
                 total_iters=5, **_):
        super().__init__(optimizer)
        self.start_factor, self.end_factor = start_factor, end_factor
        self.total_iters = total_iters
        optimizer.lr = optimizer.initial_lr * start_factor

    def _update(self, metric):
        t = min(self.last_epoch, self.total_iters)
        f = self.start_factor + (self.end_factor - self.start_factor) * (
            t / self.total_iters)
        self.optimizer.lr = self.optimizer.initial_lr * f


class SequentialLR(_Scheduler):
    """Composite with per-stage epoch milestones (reference `"sequential"`
    scheduler spec, `distance_based_hl_module.py:460-481`)."""

    def __init__(self, optimizer, schedulers, milestones):
        super().__init__(optimizer)
        self.schedulers = schedulers
        self.milestones = milestones

    def step(self, metric=None):
        idx = sum(self.last_epoch >= m for m in self.milestones)
        self.schedulers[idx].step(metric)
        self.last_epoch += 1

    def state_dict(self):
        return {"last_epoch": self.last_epoch,
                "milestones": self.milestones,
                "children": [s.state_dict() for s in self.schedulers]}

    def load_state_dict(self, sd):
        self.last_epoch = sd["last_epoch"]
        self.milestones = sd["milestones"]
        for s, child in zip(self.schedulers, sd["children"]):
            s.load_state_dict(child)
