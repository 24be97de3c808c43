"""Train/eval steps: optimizer, LR schedules, DP-sharded update.

Reference parity (SURVEY.md §2.5):
  * FN-SSL: Adam lr 1e-3 with ExponentialLR γ=0.8988 stepped per epoch
    (Lightning/main.py:269-279).
  * IPDnet: Adam lr 5e-4, γ=0.975 (runIPDnetOn.py:292-301).
  * IPDnet2: AdamW lr 5e-4, γ=0.975, grad-clip 5 (run_IPDnet2.py:330-352).

TPU-native design: one jitted ``train_step`` closes over preprocessing,
model apply, and loss; donated state keeps params in place in HBM. Data
parallelism is expressed purely through shardings — batch arrays sharded on
the mesh 'data' axis, params replicated — and XLA inserts the psum gradient
all-reduce (no DDP analogue to write).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def exponential_epoch_schedule(base_lr: float, gamma: float,
                               steps_per_epoch: int) -> optax.Schedule:
    """lr = base · γ^epoch, stepped at epoch boundaries (torch
    ExponentialLR + per-epoch scheduler.step semantics)."""
    def schedule(count):
        epoch = count // steps_per_epoch
        return base_lr * jnp.power(gamma, epoch)
    return schedule


def make_optimizer(kind: str = "adam", base_lr: float = 1e-3,
                   gamma: float = 0.8988, steps_per_epoch: int = 1,
                   grad_clip: float | None = None,
                   weight_decay: float = 0.01) -> optax.GradientTransformation:
    sched = exponential_epoch_schedule(base_lr, gamma, steps_per_epoch)
    if kind == "adam":
        tx = optax.adam(sched)
    elif kind == "adamw":
        tx = optax.adamw(sched, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {kind!r}")
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    donate: bool = True):
    """Build the jitted update.

    ``loss_fn(params, batch, rng) -> scalar loss`` must contain the full
    preprocessing + forward + loss (so STFT/targets fuse into the step).

    Returns step(state, batch, rng) → (state, loss). Under a data mesh,
    call with batch sharded on 'data' and state replicated; the mean-loss
    gradient all-reduce is inserted by XLA.

    Resilience: if compiling the fused grad+update program fails at
    runtime (observed with the remote TPU compile helper on very large
    programs), the step transparently falls back to two smaller compiled
    programs (grad, then optimizer update) with identical numerics.
    """
    def update(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    fused = jax.jit(update, donate_argnums=(0,) if donate else ())
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    def apply_updates(state: TrainState, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1)

    apply_fn = jax.jit(apply_updates,
                       donate_argnums=(0, 1) if donate else ())
    mode = {"split": False}

    def step(state: TrainState, batch, rng):
        if not mode["split"]:
            try:
                return fused(state, batch, rng)
            except jax.errors.JaxRuntimeError as e:
                if "remote_compile" not in str(e):
                    raise
                mode["split"] = True
                print("train step: fused compile failed; "
                      "falling back to split grad+update programs")
        loss, grads = grad_fn(state.params, batch, rng)
        return apply_fn(state, grads), loss

    return step


def make_eval_step(loss_fn: Callable):
    @functools.partial(jax.jit)
    def evaluate(params, batch):
        return loss_fn(params, batch, None)
    return evaluate
