"""Pallas fused inference tower for the evaluator's network forward.

The XLA path (``models.net.InferenceNet``) runs the 13-conv tower as
separate HLO convolutions: every layer round-trips its [B, 6, 7, 64]
activation through HBM, and each conv contracts only K=64 — half an MXU
tile. At the self-play fan-out batch (4096 boards) the forward is >60% of
every search wave, so this is the hottest kernel in the framework.

This kernel runs the whole conv tower — input conv plus all residual
blocks — for a tile of boards entirely in VMEM:

- one grid step processes ``TILE`` boards; activations never touch HBM
  between the 13 conv layers (one read of the input planes, one write of
  the tower output);
- each 3x3 conv is ONE im2col matmul ``[TILE*42, 9*C] @ [9*C, F]`` — a
  K=576 contraction that tiles the 128x128 MXU far better than nine K=64
  dots. The patch matrix is built with 9 masked row-shifts: with rows
  ordered (board, r, c), the (dr, dc) tap of a SAME-padded 3x3 conv is a
  constant row offset ``(dr-1)*7 + (dc-1)`` whose out-of-board taps are
  killed by a precomputed [TILE*42, 9] mask (the mask pattern repeats
  every 42 rows, so one tile-sized matrix serves every grid step);
- everything stays 2-D ``[rows, channels]`` — Mosaic-friendly layouts,
  no shape casts.

The two heads (1x1 convs + tiny Dense stacks, <1% of the FLOPs) run in
XLA on the tower output.

Numerics: matmuls accumulate in float32 and round to bfloat16 after each
layer's bias + LeakyReLU — the same layer boundaries at which the XLA
bf16 tower rounds; tanh/softmax run in float32. Outputs agree with
``InferenceNet`` to bf16 rounding (tests/test_pallas_net.py). Like the
folded-BN path itself, this is an inference-only transform and ships as
an opt-in evaluator backend.

Reference context: this replaces the reference's GPU forward inside its
inference-server process (``/root/reference/oinkoink/neural/
inference_server.py:50-63``); the kernel itself has no reference
counterpart.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from connect4_tpu.config import NetConfig
from connect4_tpu.types import AREA, HEIGHT, WIDTH

_LEAKY_SLOPE = 0.01
TILE = 128  # boards per grid step; patches [TILE*42, 576] bf16 ~6 MB VMEM

# row offsets of the nine 3x3 taps in (board, r, c) row order, and the
# (r, c) validity pattern of each tap (independent of the board index)
_TAPS = [(dr, dc) for dr in range(3) for dc in range(3)]


def _lrelu(x):
    return jnp.where(x >= 0, x, x * _LEAKY_SLOPE)


def _tap_mask() -> np.ndarray:
    """[AREA, 9] float mask: tap k valid at spatial position (r, c)."""
    mask = np.zeros((AREA, 9), np.float32)
    for k, (dr, dc) in enumerate(_TAPS):
        for r in range(HEIGHT):
            for c in range(WIDTH):
                rr, cc = r + dr - 1, c + dc - 1
                if 0 <= rr < HEIGHT and 0 <= cc < WIDTH:
                    mask[r * WIDTH + c, k] = 1.0
    return mask


def pack_weights(config: NetConfig, folded: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Flatten the folded-BN parameter tree (``models.net.fold_bn_params``)
    into kernel-shaped arrays: 3x3 kernels as im2col matrices [9*Cin, F]
    (row-major (dr, dc, cin) — exactly ``kernel.reshape(-1, F)``), the
    twelve residual convs stacked on a leading axis; head weights kept
    for the XLA epilogue."""
    bf = jnp.bfloat16

    def im2col(kernel):  # [3, 3, Cin, F] -> [9*Cin, F]
        return kernel.reshape(-1, kernel.shape[-1]).astype(bf)

    cb = folded["_InfConvBlock_0"]["Conv_0"]
    res_w, res_b = [], []
    for i in range(config.n_residuals):
        blk = folded[f"_InfResidualBlock_{i}"]
        for conv in ("Conv_0", "Conv_1"):
            res_w.append(im2col(blk[conv]["kernel"]))
            res_b.append(blk[conv]["bias"].astype(bf))
    vh = folded["_InfValueHead_0"]
    ph = folded["_InfPolicyHead_0"]
    f = config.filters
    return {
        "conv1_w": im2col(cb["kernel"]),  # [9*channels, F]
        "conv1_b": cb["bias"].astype(bf),  # [F]
        "res_w": jnp.stack(res_w),  # [2*n_res, 9F, F]
        "res_b": jnp.stack(res_b),  # [2*n_res, F]
        "mask": jnp.asarray(np.tile(_tap_mask(), (TILE, 1))).astype(bf),
        # XLA-epilogue head weights (folded, bf16 like the flax tower)
        "vh_conv_w": vh["Conv_0"]["kernel"].reshape(f, 1).astype(bf),
        "vh_conv_b": vh["Conv_0"]["bias"].astype(bf),
        "vh_fc_w": [
            vh[f"Dense_{i}"]["kernel"].astype(bf)
            for i in range(config.n_fc_layers)
        ],
        "vh_fc_b": [
            vh[f"Dense_{i}"]["bias"].astype(bf)
            for i in range(config.n_fc_layers)
        ],
        "vh_out_w": vh[f"Dense_{config.n_fc_layers}"]["kernel"].astype(bf),
        "vh_out_b": vh[f"Dense_{config.n_fc_layers}"]["bias"].astype(bf),
        "ph_conv_w": ph["Conv_0"]["kernel"].reshape(f, 2).astype(bf),
        "ph_conv_b": ph["Conv_0"]["bias"].astype(bf),
        "ph_fc_w": ph["Dense_0"]["kernel"].astype(bf),
        "ph_fc_b": ph["Dense_0"]["bias"].astype(bf),
    }


def _shift_rows(x: jax.Array, off: int) -> jax.Array:
    """x shifted so row i reads x[i + off], zero-filled at the ends.
    Static concat of slices — no gathers, Mosaic-friendly."""
    n = x.shape[0]
    if off == 0:
        return x
    zeros = jnp.zeros((abs(off), x.shape[1]), x.dtype)
    if off > 0:
        return jnp.concatenate([x[off:], zeros], axis=0)
    return jnp.concatenate([zeros, x[:off]], axis=0)


def _conv3x3_2d(x, w, b, mask):
    """One folded conv+bias layer on [T*42, Cin] rows (no activation).

    Returns float32 [T*42, F] — callers apply LeakyReLU / residual adds
    and round to bf16, matching the XLA tower's rounding points."""
    taps = [
        _shift_rows(x, (dr - 1) * WIDTH + (dc - 1)) * mask[:, k : k + 1]
        for k, (dr, dc) in enumerate(_TAPS)
    ]
    patches = jnp.concatenate(taps, axis=-1)  # [T*42, 9*Cin]
    y = jnp.dot(patches, w, preferred_element_type=jnp.float32)
    return y + b.astype(jnp.float32)


def _tower_kernel(x_ref, conv1_w, conv1_b, res_w, res_b, mask_ref, out_ref,
                  *, n_residuals: int):
    mask = mask_ref[:]
    x = x_ref[:].astype(jnp.bfloat16)  # [T*42, channels]
    x = _lrelu(_conv3x3_2d(x, conv1_w[:], conv1_b[:], mask)).astype(jnp.bfloat16)
    for i in range(n_residuals):
        y = _lrelu(_conv3x3_2d(x, res_w[2 * i], res_b[2 * i], mask))
        y = y.astype(jnp.bfloat16)
        y2 = _conv3x3_2d(y, res_w[2 * i + 1], res_b[2 * i + 1], mask)
        x = _lrelu(y2 + x.astype(jnp.float32)).astype(jnp.bfloat16)
    out_ref[:] = x


def _zero_index(ndim, i):
    """Weight blocks are whole-array and grid-invariant."""
    return (0,) * ndim


def make_pallas_forward(config: NetConfig, packed: Dict[str, jax.Array],
                        interpret: bool = None):
    """``nhwc [B, 6, 7, channels] -> (value [B] f32, prior [B, 7] f32)``.

    ``B`` is padded to a multiple of ``TILE`` internally (zero boards;
    their outputs are sliced off). ``interpret=None`` auto-selects the
    Pallas interpreter off-TPU so tests run hermetically on CPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(_tower_kernel, n_residuals=config.n_residuals)
    tower_ins = ["conv1_w", "conv1_b", "res_w", "res_b", "mask"]
    weights = [packed[n] for n in tower_ins]
    rows = TILE * AREA
    f = config.filters

    def tower(x2d: jax.Array, n_tiles: int) -> jax.Array:
        grid_spec = pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((rows, config.channels), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ]
            + [
                pl.BlockSpec(w.shape, functools.partial(_zero_index, w.ndim),
                             memory_space=pltpu.VMEM)
                for w in weights
            ],
            out_specs=pl.BlockSpec((rows, f), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_tiles * rows, f), jnp.bfloat16),
            grid_spec=grid_spec,
            # the default 16 MB scoped-VMEM cap is conservative; the tile's
            # working set (patch matrix + taps + f32 accumulators) peaks
            # around 40 MB, well within the chip's physical VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(x2d, *weights)

    def forward(nhwc: jax.Array):
        b = nhwc.shape[0]
        n_tiles = pl.cdiv(b, TILE)
        b_pad = n_tiles * TILE
        if b_pad != b:
            nhwc = jnp.pad(nhwc, ((0, b_pad - b), (0, 0), (0, 0), (0, 0)))
        x2d = nhwc.reshape(b_pad * AREA, config.channels)
        t = tower(x2d, n_tiles)  # [b_pad*42, F] bf16

        # --- heads (XLA epilogue; <1% of FLOPs) ---------------------------
        v = _lrelu(
            jnp.dot(t, packed["vh_conv_w"], preferred_element_type=jnp.float32)
            + packed["vh_conv_b"].astype(jnp.float32)
        ).astype(jnp.bfloat16)
        v = v.reshape(b_pad, AREA)
        for wi, bi in zip(packed["vh_fc_w"], packed["vh_fc_b"]):
            v = (
                jnp.dot(v, wi, preferred_element_type=jnp.float32)
                + bi.astype(jnp.float32)
            ).astype(jnp.bfloat16)
        v = _lrelu(v.astype(jnp.float32)).astype(jnp.bfloat16)
        v = (
            jnp.dot(v, packed["vh_out_w"], preferred_element_type=jnp.float32)
            + packed["vh_out_b"].astype(jnp.float32)
        )
        value = ((jnp.tanh(v) + 1.0) * 0.5).reshape(b_pad)

        p = _lrelu(
            jnp.dot(t, packed["ph_conv_w"], preferred_element_type=jnp.float32)
            + packed["ph_conv_b"].astype(jnp.float32)
        ).astype(jnp.bfloat16)
        p = p.reshape(b_pad, AREA * 2)  # flax (r, c, ch) flatten order
        p = (
            jnp.dot(p, packed["ph_fc_w"], preferred_element_type=jnp.float32)
            + packed["ph_fc_b"].astype(jnp.float32)
        )
        prior = jax.nn.softmax(p, axis=-1)
        return value[:b], prior[:b]

    return forward
