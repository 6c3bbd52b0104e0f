"""A/B the fused Pallas inference tower against the XLA folded-BN path.

Round-5 verdict (v5e, gen-161 net, see ENGINEERING_LOG): XLA wins —
its native conv lowering reaches 41/67 TFLOP/s at batch 2048/4096 while
the Pallas im2col tower pays ~9 VPU shift+mask copies per layer for its
patch matrices (23/28 TFLOP/s). The kernel ships as an opt-in backend
(``make_pallas_net_evaluator``) and this script reproduces the numbers.
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from connect4_tpu.config import ModelConfig, NetConfig
from connect4_tpu.models import init_net
from connect4_tpu.models.net import InferenceNet, fold_bn_params
from connect4_tpu.models.pallas_net import make_pallas_forward, pack_weights
from connect4_tpu.training import checkpoint as ckpt
from connect4_tpu.training.learner import TrainState, make_optimizer
from connect4_tpu.utils import enable_compilation_cache

enable_compilation_cache()
packaged = "/root/repo/connect4_tpu/data/files/example_net"
with open(os.path.join(packaged, "net_config.json")) as fh:
    config = NetConfig(**json.load(fh))
net, variables = init_net(config, jax.random.key(0))
optimizer = make_optimizer(ModelConfig(net_config=config))
template = TrainState(variables["params"], variables["batch_stats"],
                      optimizer.init(variables["params"]))
state_t, _ = ckpt.restore_checkpoint(packaged, 161, template, jax.random.key(0))
params, batch_stats = state_t.params, state_t.batch_stats

folded = jax.jit(lambda p, s: fold_bn_params(config, p, s))(params, batch_stats)
packed = jax.jit(lambda f: pack_weights(config, f))(folded)
pallas_fwd = jax.jit(make_pallas_forward(config, packed))
inf = InferenceNet(config)
xla_fwd = jax.jit(lambda x: inf.apply({"params": folded}, x))

for B in (2048, 4096):
    x = (jax.random.uniform(jax.random.key(B), (B, 6, 7, 3)) < 0.25).astype(jnp.float32)
    vx, px = jax.block_until_ready(xla_fwd(x))
    t0 = time.time()
    vp, pp = jax.block_until_ready(pallas_fwd(x))
    print(f"B={B}: pallas compile+first {time.time()-t0:.1f}s", flush=True)
    # correctness on real weights
    print(f"  max |dv|={float(jnp.abs(vp-vx).max()):.4f}  max |dp|={float(jnp.abs(pp-px).max()):.4f}")
    for name, f in (("xla", xla_fwd), ("pallas", pallas_fwd)):
        def loop(x):
            def body(i, c):
                v, p = f(x)
                return c + v[0]
            return jax.lax.fori_loop(0, 30, body, 0.0)
        # note: f inside fori would be re-traced; simpler: host loop
        jax.block_until_ready(f(x))
        t0 = time.time()
        for _ in range(30):
            out = f(x)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 30 * 1e3
        flops = B * 37.3e6
        print(f"  {name:7s} {dt:6.3f} ms  ({flops/dt*1e3/1e12:.1f} TFLOP/s)", flush=True)
