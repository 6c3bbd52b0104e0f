"""Replicated, exactly-comparable summaries of sharded computations.

Multi-host processes cannot materialise each other's array shards, so
the multi-host test compares *replicated reductions*: integer counts and
integer-quantised float checksums are bitwise reproducible across
process topologies (the values themselves are identical; only a direct
float re-reduction could differ in order). Shared by the in-process
reference run (tests/test_multihost.py) and the worker processes
(tests/multihost_worker.py).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _q(x, scale=1e4):
    """Integer-quantised sum of a float array: per-element rounding is
    deterministic, integer addition is order-independent, so the sum is
    exactly comparable across process topologies."""
    return jnp.sum(jnp.round(x * scale).astype(jnp.int64))


@jax.jit
def _selfplay_reductions(out):
    return {
        "o_wins": jnp.sum(out.result == 1).astype(jnp.int64),
        "x_wins": jnp.sum(out.result == 2).astype(jnp.int64),
        "draws": jnp.sum(out.result == 3).astype(jnp.int64),
        "moves": jnp.sum(out.mask).astype(jnp.int64),
        "lengths": jnp.sum(out.length).astype(jnp.int64),
        "planes_sum": jnp.sum(out.planes.astype(jnp.int64)),
        "moves_sum": jnp.sum(jnp.where(out.mask, out.moves, 0)).astype(jnp.int64),
        "values_q": _q(jnp.where(out.mask, out.move_values, 0.0)),
        "policies_q": _q(jnp.where(out.mask[..., None], out.policies, 0.0)),
    }


def selfplay_summary(out) -> dict:
    return {k: int(v) for k, v in _selfplay_reductions(out).items()}


def train_summary(state, metrics) -> dict:
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = jax.jit(
        lambda ls: sum(_q(jnp.abs(l), 1e4) for l in ls)
    )(leaves)
    return {
        "loss_q": int(round(float(metrics["loss"]) * 1e4)),
        "params_q": int(checksum),
    }


def synthetic_batch(mesh):
    """Deterministic sharded training batch (no host data needed)."""
    from connect4_tpu.parallel.mesh import constrain_data

    @jax.jit
    def build():
        n = 32
        idx = jnp.arange(n)
        planes = (
            jnp.broadcast_to(
                idx[:, None, None, None] % 3, (n, 6, 7, 3)
            ).astype(jnp.float32)
            / 3.0
        )
        values = (idx % 5).astype(jnp.float32) / 4.0
        policies = jax.nn.softmax(
            jnp.stack([jnp.roll(jnp.arange(7.0), i) for i in idx % 7])
        )
        return constrain_data((planes, values, policies), mesh)

    return build()
