"""Flax value+policy network.

Architecturally equivalent to the reference's PyTorch ``Net``
(``/root/reference/oinkoink/neural/pytorch/model.py:20-134``): a conv+BN
tower with residual blocks over the 3x(6x7) input planes, a value head
mapping to [0, 1] via tanh, and a policy head emitting a softmax over the 7
columns. Laid out NHWC (TPU-native conv layout); the public entry points
accept the reference's NCHW planes and transpose once at the boundary.

Two deliberate parity details:

- The value head's ``fcN`` stack has *no* activation between its Dense
  layers, with a single LeakyReLU after the stack — the reference
  (perhaps unintentionally) builds ``nn.Sequential`` of bare ``Linear``s
  (``/root/reference/oinkoink/neural/pytorch/model.py:69-70,83-84``).
- Heads return probabilities (not logits) because the training loss is
  BCE on probabilities, as in the reference
  (``/root/reference/oinkoink/neural/pytorch/model.py:165-166``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from connect4_tpu.config import NetConfig
from connect4_tpu.types import AREA, WIDTH

# torch's LeakyReLU default slope, used throughout the reference.
_LEAKY_SLOPE = 0.01


def _lrelu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=_LEAKY_SLOPE)


class _ConvBlock(nn.Module):
    filters: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)(x)
        return _lrelu(x)


class _ResidualBlock(nn.Module):
    filters: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)(y)
        y = _lrelu(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)(y)
        return _lrelu(y + residual)


class _ValueHead(nn.Module):
    n_fc_layers: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)(x)
        x = _lrelu(x)
        x = x.reshape(x.shape[0], -1)  # [N, 42]
        for _ in range(self.n_fc_layers):
            x = nn.Dense(AREA, dtype=self.dtype)(x)
        x = _lrelu(x)
        x = nn.Dense(1, dtype=self.dtype)(x)
        x = jnp.tanh(x.astype(jnp.float32))
        return ((x + 1.0) * 0.5).reshape(-1)  # [N] in [0, 1]


class _PolicyHead(nn.Module):
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(2, (1, 1), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)(x)
        x = _lrelu(x)
        x = x.reshape(x.shape[0], -1)  # [N, 84]
        x = nn.Dense(WIDTH, dtype=self.dtype)(x)
        return jax.nn.softmax(x.astype(jnp.float32), axis=-1)  # [N, 7]


class Connect4Net(nn.Module):
    """Value+policy tower. Input: NHWC ``[N, 6, 7, channels]`` float planes.

    Returns ``(value [N] in [0,1], prior [N,7] summing to 1)``.
    """

    config: NetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
        x = x.astype(dtype)
        x = _ConvBlock(self.config.filters, dtype)(x, train)
        for _ in range(self.config.n_residuals):
            x = _ResidualBlock(self.config.filters, dtype)(x, train)
        value = _ValueHead(self.config.n_fc_layers, dtype)(x, train)
        prior = _PolicyHead(dtype)(x, train)
        return value, prior


def nchw_to_nhwc(planes: jax.Array) -> jax.Array:
    """Reference planes ``[N, 3, 6, 7]`` -> TPU-native NHWC."""
    return jnp.transpose(planes, (0, 2, 3, 1))


def init_net(
    config: NetConfig, rng: jax.Array, batch: int = 2
) -> Tuple[Connect4Net, Dict[str, Any]]:
    """Create the module and initial variables ({'params', 'batch_stats'})."""
    net = Connect4Net(config)
    dummy = jnp.zeros((batch, 6, 7, config.channels), dtype=jnp.float32)
    # jit the init: eager per-op dispatch is pathologically slow through
    # remote-TPU tunnels (hundreds of tiny transfers otherwise)
    variables = jax.jit(lambda r, d: net.init(r, d, train=False))(rng, dummy)
    return net, variables


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
