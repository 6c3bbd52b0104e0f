"""Training step: SGD + momentum + weight decay on MSE(value) + BCE(policy).

Replaces the reference's ``ModelWrapper.train``
(``/root/reference/oinkoink/neural/pytorch/model.py:200-240``) with a single
jitted/pjit-able step over device-resident batches. The optimiser matches
torch ``SGD(momentum, weight_decay)`` coupling (decay folded into the
gradient *before* the momentum buffer) and the MultiStep LR schedule is
applied per *generation* via ``ModelConfig.lr_at_generation``.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from connect4_tpu.config import ModelConfig
from connect4_tpu.models.net import Connect4Net


class TrainState(NamedTuple):
    """Everything the learner carries across steps (a pytree)."""

    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(config: ModelConfig) -> optax.GradientTransformation:
    # add_decayed_weights before sgd reproduces torch's coupled weight decay
    # (grad + wd * param entering the momentum buffer).
    return optax.chain(
        optax.add_decayed_weights(config.weight_decay),
        optax.inject_hyperparams(optax.sgd)(
            learning_rate=config.initial_lr, momentum=config.momentum
        ),
    )


def set_learning_rate(opt_state, lr: float):
    """Update the injected LR in-place in the optimiser state pytree."""
    hyper = opt_state[1].hyperparams
    hyper["learning_rate"] = jnp.asarray(lr, dtype=hyper["learning_rate"].dtype)
    return opt_state


def bce_loss(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary cross-entropy on probabilities, mean-reduced over
    all elements — torch ``BCELoss`` semantics including the -100 log clamp
    (matches the reference loss at
    ``/root/reference/oinkoink/neural/pytorch/model.py:166,284-292``)."""
    log_p = jnp.clip(jnp.log(probs), -100.0, None)
    log_1p = jnp.clip(jnp.log1p(-probs), -100.0, None)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_1p)


def loss_fn(
    net: Connect4Net,
    params,
    batch_stats,
    planes_nhwc: jax.Array,
    value_targets: jax.Array,
    prior_targets: jax.Array,
    train: bool,
    value_weights: jax.Array | None = None,
):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        (value, prior), mutated = net.apply(
            variables, planes_nhwc, train=True, mutable=["batch_stats"]
        )
        new_stats = mutated["batch_stats"]
    else:
        value, prior = net.apply(variables, planes_nhwc, train=False)
        new_stats = batch_stats
    sq = (value - value_targets) ** 2
    if value_weights is None:
        value_loss = jnp.mean(sq)
    else:
        # weighted mean with per-batch renormalisation so the loss scale
        # (and therefore the LR) is unchanged whatever the batch's draw mix
        value_loss = jnp.sum(value_weights * sq) / jnp.sum(value_weights)
    prior_loss = bce_loss(prior, prior_targets)
    return value_loss + prior_loss, (value_loss, prior_loss, value, prior, new_stats)


def make_train_step(
    net: Connect4Net,
    optimizer: optax.GradientTransformation,
    weighted: bool = False,
):
    """Returns a jittable ``(state, planes, values, priors) -> (state, metrics)``.

    With ``weighted=True`` the step takes an extra per-sample value-loss
    weight array ``(state, planes, values, priors, weights)`` — used by the
    ``draw_loss_weight`` extension; the default path is unchanged
    (bitwise-identical to the reference semantics)."""

    def train_step(
        state: TrainState,
        planes_nhwc: jax.Array,
        value_targets: jax.Array,
        prior_targets: jax.Array,
        value_weights: jax.Array | None = None,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if planes_nhwc.dtype == jnp.uint8:
            # storage layout: the replay window stays device-resident in
            # its on-disk uint8 NCHW form (4x smaller than f32 NHWC); the
            # conversion is fused into the step so values are identical
            planes_nhwc = jnp.transpose(planes_nhwc, (0, 2, 3, 1)).astype(
                jnp.float32
            )

        def wrapped(params):
            return loss_fn(
                net, params, state.batch_stats, planes_nhwc, value_targets,
                prior_targets, train=True,
                value_weights=value_weights if weighted else None,
            )

        (total, (v_loss, p_loss, _, _, new_stats)), grads = jax.value_and_grad(
            wrapped, has_aux=True
        )(state.params)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, "value_loss": v_loss, "prior_loss": p_loss}
        return TrainState(new_params, new_stats, new_opt_state), metrics

    return train_step


def make_batch_gather(batch_size: int):
    """Fused minibatch gather: ``(arrays, order, start) -> tuple of
    arrays[order[start:start+batch_size]]`` in ONE device call.

    The epoch loop's per-batch host work (slice the permutation, three or
    four ``jnp.take`` calls, then the step) costs 4-5 dispatch round-trips
    per batch; on a remote-transport TPU backend those round-trips — not
    the device compute — dominate training wall-clock. ``start`` is traced
    (pass a numpy scalar, not a Python int), so every full batch of an
    epoch reuses one compiled program. Gather semantics are identical to
    the unfused takes.
    """

    @jax.jit
    def gather(arrays, order, start):
        idx = jax.lax.dynamic_slice_in_dim(order, start, batch_size)
        return tuple(jnp.take(a, idx, axis=0) for a in arrays)

    return gather


def make_eval_fn(net: Connect4Net):
    """Inference forward: ``(params, batch_stats, planes_nhwc) -> (value, prior)``
    with running BN statistics (the reference's ``net.eval()`` mode)."""

    def forward(params, batch_stats, planes_nhwc):
        return net.apply(
            {"params": params, "batch_stats": batch_stats}, planes_nhwc, train=False
        )

    return forward
