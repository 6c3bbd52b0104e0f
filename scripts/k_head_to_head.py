"""Same-net head-to-head between two parallel_sims settings.

Measures the *search-quality* cost of deeper virtual-loss parallelism
directly: both players share one network; only K differs. A ~0.5 return
means the K-walker approximation does not change move quality at this
simulation budget (the round-3 K=1-vs-K=8 A/B used the same protocol via
full retraining; this is the cheap per-K probe).

Usage: python scripts/k_head_to_head.py --ka 8 --kb 16 [--gen 146]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--ka", type=int, default=8)
    parser.add_argument("--kb", type=int, default=16)
    parser.add_argument("--run-dir", default="/root/connect4_tpu_runs/r3_k8")
    parser.add_argument("--gen", type=int, default=146)
    parser.add_argument("--simulations", type=int, default=800)
    parser.add_argument("--plies", type=int, default=2)
    args = parser.parse_args()

    import jax

    from connect4_tpu.config import MCTSConfig, ModelConfig, NetConfig
    from connect4_tpu.eval.evaluators import make_net_evaluator
    from connect4_tpu.eval.match import MatchPlayer, play_match
    from connect4_tpu.models import init_net
    from connect4_tpu.training import checkpoint as ckpt
    from connect4_tpu.training.learner import TrainState, make_optimizer
    from connect4_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    net_config = NetConfig(filters=64, n_fc_layers=6, n_residuals=6,
                           compute_dtype="bfloat16")
    net, variables = init_net(net_config, jax.random.key(0))
    optimizer = make_optimizer(ModelConfig(net_config=net_config))
    template = TrainState(
        variables["params"], variables["batch_stats"],
        optimizer.init(variables["params"]),
    )
    state, _ = ckpt.restore_checkpoint(
        args.run_dir, args.gen, template, jax.random.key(0)
    )
    evaluator = make_net_evaluator(net, state.params, state.batch_stats)

    pa = MatchPlayer(
        f"K{args.ka}", evaluator,
        MCTSConfig(simulations=args.simulations, parallel_sims=args.ka),
    )
    pb = MatchPlayer(
        f"K{args.kb}", evaluator,
        MCTSConfig(simulations=args.simulations, parallel_sims=args.kb),
    )
    res = play_match(pa, pb, plies=args.plies, switch=True, display=True)
    print(json.dumps({"ka": args.ka, "kb": args.kb, **res}))


if __name__ == "__main__":
    main()
