"""Optimizers and epoch-keyed learning-rate policies.

Capability parity target: the reference's factory (code/train_dual.py:162-180)
— adam/sgd/rmsprop and five scheduler policies stepped per epoch:
  lmd        lr * decay^(epoch / step0)        (the shipped default)
  step       lr * decay^(epoch // step0)
  multi_step lr * decay^(#milestones <= epoch)
  exp        lr * decay^epoch
  auto       reduce-on-plateau (factor=decay, patience=step0) keyed on the
             eval normal error

The learning rate is an injected hyperparameter (optax.inject_hyperparams):
the trainer computes lr on the host each epoch — matching the reference's
per-epoch scheduler.step() exactly — and writes it into the optimizer state,
so one compiled update function serves all policies."""

from __future__ import annotations

import dataclasses

import optax


def make_optimizer(cfg) -> optax.GradientTransformation:
    if cfg.optimizer == "adam":
        opt = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.lr, b1=cfg.beta1, b2=cfg.beta2
        )
    elif cfg.optimizer == "sgd":
        opt = optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.lr, momentum=cfg.momentum
        )
    elif cfg.optimizer == "rmsprop":
        opt = optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=cfg.lr, decay=0.9
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    if cfg.weight_decay:
        opt = optax.chain(optax.add_decayed_weights(cfg.weight_decay), opt)
    return opt


def set_lr(opt_state, lr: float):
    """Write the injected learning rate into an optimizer state."""

    import jax.numpy as jnp

    def rec(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            old = s.hyperparams["learning_rate"]
            s.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=old.dtype)
            return s
        if isinstance(s, tuple) and not hasattr(s, "hyperparams"):
            items = [rec(x) for x in s]
            # NamedTuples unpack positionally; plain tuples (optax.chain
            # states) take a single iterable
            return type(s)(*items) if hasattr(s, "_fields") else tuple(items)
        return s

    return rec(opt_state)


def lr_at_epoch(cfg, epoch: int) -> float:
    if cfg.lr_sch == "lmd":
        return cfg.lr * cfg.lr_decay ** (epoch / cfg.lr_step[0])
    if cfg.lr_sch == "step":
        return cfg.lr * cfg.lr_decay ** (epoch // cfg.lr_step[0])
    if cfg.lr_sch == "multi_step":
        return cfg.lr * cfg.lr_decay ** sum(1 for m in cfg.lr_step if m <= epoch)
    if cfg.lr_sch == "exp":
        return cfg.lr * cfg.lr_decay**epoch
    if cfg.lr_sch == "auto":
        raise ValueError("'auto' lr is driven by PlateauState, not epoch")
    raise ValueError(f"unknown lr_sch {cfg.lr_sch}")


@dataclasses.dataclass
class PlateauState:
    """Reduce-on-plateau: shrink lr by `factor` after `patience` epochs
    without improvement (torch ReduceLROnPlateau semantics, default
    rel-threshold 1e-4)."""

    lr: float
    factor: float
    patience: int
    best: float = float("inf")
    bad_epochs: int = 0
    threshold: float = 1e-4

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr
