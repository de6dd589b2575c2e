"""Probe: the fused conv kernels under the REAL model head (SimpleCNN
fused path: conv_stack -> fc1 -> relu -> fc2 -> CE loss) + Adam, in a
10-step scan over 512 vmapped clients — the closest standalone
reproduction of the engine superstep context. The plain-scan probe
(probe_conv_block_scan.py) measures fwd+bwd ≈ 28 ms/step (matching the
single-call probe), while the engine profile shows the SAME backward
kernel at 25 ms/step alone (fwd 13.6) — this isolates which context
piece (real cotangent producer, fc head, Adam update chain) doubles the
backward's self-time.

Env:
  PROBE_HEAD=fc|dot     fc = real Dense head + CE; dot = plain sum (as scan probe)
  PROBE_OPT=adam|sgd
  PROBE_PROFILE=1       capture xplane, print the two kernels' self-times
"""

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from _bench_util import log, timeit  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fl_tpu.ops.conv_block import conv_stack  # noqa: E402

C = int(os.environ.get("BENCH_C", "512"))
B = 32
STEPS = 10
HEAD = os.environ.get("PROBE_HEAD", "fc")
OPT = os.environ.get("PROBE_OPT", "adam")
TRACE_DIR = "/tmp/fl_tpu_trace_probe"


def main():
    log(f"devices: {jax.devices()}  C={C} B={B} bf16 head={HEAD} opt={OPT}")
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    x = jax.random.normal(ks[0], (C, B, 28, 28, 1), dt)
    y = jax.random.randint(ks[8], (C, B), 0, 10)
    params = {
        "w1": jax.random.normal(ks[1], (C, 3, 3, 1, 32), jnp.float32) * 0.5,
        "b1": jax.random.normal(ks[2], (C, 32), jnp.float32) * 0.1,
        "w2": jax.random.normal(ks[3], (C, 3, 3, 32, 64), jnp.float32) * 0.1,
        "b2": jax.random.normal(ks[4], (C, 64), jnp.float32) * 0.1,
        "wf1": jax.random.normal(ks[5], (C, 3136, 128), jnp.float32) * 0.02,
        "bf1": jnp.zeros((C, 128), jnp.float32),
        "wf2": jax.random.normal(ks[6], (C, 128, 10), jnp.float32) * 0.1,
        "bf2": jnp.zeros((C, 10), jnp.float32),
    }
    r = jax.random.normal(ks[7], (C, B, 7, 7, 64), dt)

    def client_loss(p, xx, yy, rr):
        out = conv_stack(xx, p["w1"].astype(dt), p["b1"].astype(dt),
                         p["w2"].astype(dt), p["b2"].astype(dt))
        if HEAD == "dot":
            return jnp.sum((out * rr).astype(jnp.float32))
        h = out.reshape(B, -1)
        h = jnp.maximum(h @ p["wf1"].astype(dt) + p["bf1"].astype(dt), 0)
        logits = (h @ p["wf2"].astype(dt) + p["bf2"].astype(dt)) \
            .astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        return jnp.mean(lse - jnp.take_along_axis(
            logits, yy[:, None], axis=-1)[:, 0])

    def one_step(state):
        p, m, v, t = state
        g = jax.vmap(jax.grad(client_loss))(p, x, y, r)
        t = t + 1
        if OPT == "adam":
            m = jax.tree.map(
                lambda mm, gg: (0.9 * mm.astype(jnp.float32)
                                + 0.1 * gg).astype(dt), m, g)
            v = jax.tree.map(
                lambda vv, gg: (0.999 * vv.astype(jnp.float32)
                                + 0.001 * gg * gg).astype(dt), v, g)
            bc1 = 1.0 - 0.9 ** t
            bc2 = 1.0 - 0.999 ** t
            p = jax.tree.map(
                lambda pp, mm, vv: pp - 1e-3 * (mm.astype(jnp.float32) / bc1)
                / (jnp.sqrt(vv.astype(jnp.float32) / bc2) + 1e-8),
                p, m, v)
        else:
            p = jax.tree.map(lambda pp, gg: pp - 1e-3 * gg, p, g)
        return p, m, v, t

    zeros_bf16 = jax.tree.map(lambda t: jnp.zeros(t.shape, dt), params)

    def scanned(p):
        state = (p, zeros_bf16, zeros_bf16, jnp.zeros((), jnp.int32))
        state, _ = jax.lax.scan(
            lambda c, _: (one_step(c), ()), state, None, length=STEPS)
        return jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)),
                            state[0])

    fn = jax.jit(scanned)
    ms, cs = timeit(fn, params)
    log(f"scan {STEPS} steps: {ms:8.2f} ms = {ms/STEPS:6.2f} ms/step "
        f"(compile {cs:.0f}s)")

    if os.environ.get("PROBE_PROFILE", "0") != "1":
        return
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        jax.block_until_ready(fn(params))
    xplanes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "hlo_stats", {"tqx": "out:csv;"})
    import json

    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    rows = []
    for rr in d["rows"]:
        m = dict(zip(cols, [x["v"] if isinstance(x, dict) else x
                            for x in rr["c"]]))
        rows.append(m)
    rows.sort(key=lambda m: -float(m["total_self_time"]))
    for m in rows[:12]:
        log(f"{float(m['avg_self_time'])/1e3:8.2f} ms "
            f"x{int(float(m['occurrences'])):3d} {m['hlo_op_name'][:40]:40s} "
            f"{str(m['tf_op_name'])[:60]}")


if __name__ == "__main__":
    main()
