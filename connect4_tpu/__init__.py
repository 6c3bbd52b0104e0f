"""connect4_tpu — a TPU-native AlphaZero-style Connect4 framework.

A from-scratch JAX/XLA re-design with the capabilities of the reference
``oinkoink`` package (willis-richard/connect4): vectorized bitboard-style
environment, batched flat-tensor MCTS, Flax value+policy ResNet, and a
synchronous self-play -> replay -> SGD training loop, all running on-device
under jit and sharded over a TPU mesh for scale-out.
"""

__version__ = "0.1.0"
