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


# ---------------------------------------------------------------------------
# Folded-BN inference path
#
# At inference BatchNorm is an affine map with frozen statistics, so it
# folds exactly into the preceding convolution's kernel/bias:
#     s = gamma / sqrt(var + eps);  y = s * conv(x) + (beta - s * mean)
# The folded tower therefore runs conv+bias+LeakyReLU chains entirely in
# bfloat16 with no f32 BN round-trips between layers — about half the HBM
# traffic of the training-mode apply at the self-play fan-out batch shape,
# where the network forward is ~50% of each search wave
# (scripts/selfplay_breakdown.py). Equality with the unfolded net is exact
# in real arithmetic; bf16 rounding differences are covered by
# tests/test_model.py.


class _InfConvBlock(nn.Module):
    filters: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return _lrelu(x)


class _InfResidualBlock(nn.Module):
    filters: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype)(x)
        y = _lrelu(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype)(y)
        return _lrelu(y + residual)


class _InfValueHead(nn.Module):
    n_fc_layers: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
        x = _lrelu(x)
        x = x.reshape(x.shape[0], -1)
        for _ in range(self.n_fc_layers):
            x = nn.Dense(AREA, dtype=self.dtype)(x)
        x = _lrelu(x)
        x = nn.Dense(1, dtype=self.dtype)(x)
        x = jnp.tanh(x.astype(jnp.float32))
        return ((x + 1.0) * 0.5).reshape(-1)


class _InfPolicyHead(nn.Module):
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(2, (1, 1), dtype=self.dtype)(x)
        x = _lrelu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(WIDTH, dtype=self.dtype)(x)
        return jax.nn.softmax(x.astype(jnp.float32), axis=-1)


class InferenceNet(nn.Module):
    """``Connect4Net`` with every BatchNorm folded away (inference only)."""

    config: NetConfig

    @nn.compact
    def __call__(self, x):
        dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
        x = x.astype(dtype)
        x = _InfConvBlock(self.config.filters, dtype)(x)
        for _ in range(self.config.n_residuals):
            x = _InfResidualBlock(self.config.filters, dtype)(x)
        value = _InfValueHead(self.config.n_fc_layers, dtype)(x)
        prior = _InfPolicyHead(dtype)(x)
        return value, prior


def _fold_conv_bn(conv: Dict, bn_params: Dict, bn_stats: Dict, eps: float = 1e-5):
    """Fold one (Conv, BatchNorm) pair into a biased conv, exactly."""
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    kernel = conv["kernel"] * s  # broadcast over the output-channel axis
    bias = bn_params["bias"] - bn_stats["mean"] * s
    if "bias" in conv:
        bias = bias + conv["bias"] * s
    return {"kernel": kernel, "bias": bias}


def fold_bn_params(config: NetConfig, params: Dict, batch_stats: Dict) -> Dict:
    """Folded parameter tree for ``InferenceNet`` from trained
    ``Connect4Net`` variables. Pure jnp; cheap enough to run per
    generation."""
    folded: Dict[str, Any] = {}
    folded["_InfConvBlock_0"] = {
        "Conv_0": _fold_conv_bn(
            params["_ConvBlock_0"]["Conv_0"],
            params["_ConvBlock_0"]["BatchNorm_0"],
            batch_stats["_ConvBlock_0"]["BatchNorm_0"],
        )
    }
    for i in range(config.n_residuals):
        src = params[f"_ResidualBlock_{i}"]
        sst = batch_stats[f"_ResidualBlock_{i}"]
        folded[f"_InfResidualBlock_{i}"] = {
            "Conv_0": _fold_conv_bn(src["Conv_0"], src["BatchNorm_0"], sst["BatchNorm_0"]),
            "Conv_1": _fold_conv_bn(src["Conv_1"], src["BatchNorm_1"], sst["BatchNorm_1"]),
        }
    vh = params["_ValueHead_0"]
    vhs = batch_stats["_ValueHead_0"]
    folded["_InfValueHead_0"] = {
        "Conv_0": _fold_conv_bn(vh["Conv_0"], vh["BatchNorm_0"], vhs["BatchNorm_0"]),
        **{k: v for k, v in vh.items() if k.startswith("Dense_")},
    }
    ph = params["_PolicyHead_0"]
    phs = batch_stats["_PolicyHead_0"]
    folded["_InfPolicyHead_0"] = {
        "Conv_0": _fold_conv_bn(ph["Conv_0"], ph["BatchNorm_0"], phs["BatchNorm_0"]),
        "Dense_0": ph["Dense_0"],
    }
    return folded
