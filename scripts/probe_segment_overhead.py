"""Quantify the stage-6 segmented-stepper dispatch overhead on this host.

Round-3 finding: stage-6 wall-clock ran ~2x its own device-step accounting
(36.7 s vs ~14-19 s device-sum at B=8); round 4 switched the fixed-budget
segment chains to JAX async dispatch (fit/joint.py:_make_phase_stepper).
This probe measures what remains: it runs the SAME total device work as
one chained sequence of K programs (each program's input is the previous
output — the stage-6 segment topology) versus 1 program with K-fold the
inner iterations, and reports the per-program overhead implied by the
difference. Methodology: synchronous end fetch, RPC floor subtracted
(bench.py).

Usage: python scripts/probe_segment_overhead.py [--segs 13] [--iters 80]
"""
import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segs", type=int, default=13,
                    help="programs per chain (smpl phase: 103 iters / 8)")
    ap.add_argument("--iters", type=int, default=80,
                    help="inner scan steps per program (8 iters x 10)")
    ap.add_argument("--dim", type=int, default=1024,
                    help="state size (B*V*3-ish scale knob)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from vistracker_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    def body(x, n):
        def step(c, _):
            # a few fused elementwise+matmul ops: enough work per step to
            # look like an Adam step body, small enough that K programs
            # compile fast
            c = c + 0.1 * jnp.tanh(c @ w)
            return c * 0.999, None
        out, _ = jax.lax.scan(step, x, None, length=n)
        return out

    w = jnp.asarray(np.random.RandomState(0)
                    .randn(args.dim, args.dim).astype(np.float32) * 0.01)
    seg = jax.jit(lambda x: body(x, args.iters))
    one = jax.jit(lambda x: body(x, args.iters * args.segs))
    x0 = jnp.ones((8, args.dim), jnp.float32)

    # warm + floor
    np.asarray(seg(x0)).sum()
    np.asarray(one(x0)).sum()
    tiny = jax.jit(lambda x: (x * 2).mean())
    float(tiny(x0))
    t0 = time.perf_counter()
    for _ in range(10):
        float(tiny(x0))
    floor = (time.perf_counter() - t0) / 10

    def run_chain():
        x = x0
        for _ in range(args.segs):
            x = seg(x)
        return np.asarray(x).sum()  # one end fetch

    def run_one():
        return np.asarray(one(x0)).sum()

    for name, fn in (("chained", run_chain), ("single ", run_one)):
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0 - floor)
        best = min(ts)
        print(f"{name}: {best * 1e3:8.1f} ms  "
              f"({best / (args.segs * args.iters) * 1e3:6.3f} ms/step)")
    print(f"rpc floor {floor * 1e3:.1f} ms; per-program overhead ~= "
          f"(chained - single)/segs")


if __name__ == "__main__":
    main()
