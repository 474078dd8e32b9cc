"""Shared trainer machinery: optimizer/schedule construction, train state.

Optimizer semantics match the reference exactly:
- Adam with L2-style ``weight_decay`` folded into the gradient (torch
  ``optim.Adam(weight_decay=...)``, ``train_end_to_end.py:224``) — i.e.
  classic Adam over ``g + wd·p``, *not* AdamW.
- SGD with momentum + weight decay (``train_end_to_end.py:230``; the
  reference line references an undefined variable — latent bug — the intent
  is implemented).
- StepLR: lr × γ^⌊epoch/step_size⌋, stepped per epoch
  (``training.yaml:9-11``; ``train_end_to_end.py:497-498``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from mingraph_unet_tpu.config import TrainingConfig

__all__ = ["TrainState", "make_optimizer", "make_lr_schedule", "make_multistep"]


class TrainState(flax.struct.PyTreeNode):
    """Single pytree holding everything needed to resume training."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, variables: Dict[str, Any], tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def apply_updates(self, tx: optax.GradientTransformation, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
            step=self.step + 1,
        )


def make_multistep(train_step, window: int):
    """Device-resident multi-step window: ``lax.scan`` over ``window``
    pre-staged batches inside ONE jitted call (SURVEY §7's "double-buffered
    input pipeline" role on the relay: one host dispatch + one metrics fetch
    per window instead of per step — the host round trip costs ~0.3 s/step
    over the tunnel vs ~40 ms of compute).

    ``train_step(state, images, masks, key) -> (state, aux)`` becomes
    ``multistep(state, images (K, B, ...), masks (K, B, ...), key)
    -> (state, aux averaged over the window)``.
    """

    def multistep(state: TrainState, images, masks, key):
        keys = jax.random.split(key, window)

        def body(st, xs):
            imgs, msks, k = xs
            st, aux = train_step(st, imgs, msks, k)
            return st, aux

        state, auxs = jax.lax.scan(body, state, (images, masks, keys))
        return state, jax.tree_util.tree_map(lambda a: a.mean(0), auxs)

    return multistep


def make_lr_schedule(cfg: TrainingConfig, steps_per_epoch: int) -> optax.Schedule:
    if cfg.lr_scheduler and cfg.lr_scheduler.lower() == "steplr":
        return optax.exponential_decay(
            init_value=cfg.learning_rate,
            transition_steps=max(1, steps_per_epoch * cfg.lr_step_size),
            decay_rate=cfg.lr_gamma,
            staircase=True,
        )
    return optax.constant_schedule(cfg.learning_rate)


def make_optimizer(
    cfg: TrainingConfig, steps_per_epoch: int
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    name = cfg.optimizer.lower()
    parts = []
    if cfg.weight_decay:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    if name == "adam":
        parts.append(optax.scale_by_adam())
    elif name == "sgd":
        if cfg.sgd_momentum:
            parts.append(optax.trace(decay=cfg.sgd_momentum, nesterov=False))
    else:
        raise ValueError(f"Optimizer {cfg.optimizer!r} not supported.")
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts), schedule
