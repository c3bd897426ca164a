"""Persistent XLA compilation cache for the slow-compile environment.

On the axon-tunneled terminal, XLA compiles run client-side (AOT) and the
first compile of a big program takes minutes — on a degraded 1-core host,
tens of minutes (PERF_NOTES round 2). jax's persistent compilation cache
survives process boundaries, so entry points that re-run the same programs
(bench.py phases in subprocesses, the driver's round-end bench, repeated
fixture-eval phases) should share one on-disk cache.

Measured on this terminal (same program, two fresh processes, contended
1-core host): 384 s cold -> 105 s warm. The cache key includes the
compiler build, so libtpu rolls simply miss instead of returning stale
executables.
"""
from __future__ import annotations

import os
import os.path as osp


def enable_compile_cache(path: str | None = None) -> str:
    """Point jax at a persistent on-disk compilation cache.

    Call BEFORE the first jit compilation (config is process-wide).
    Default location: <repo>/.jax_compile_cache, overridable via the
    VISTRACKER_COMPILE_CACHE env var (set it to "0" to disable).
    """
    import jax

    env = os.environ.get("VISTRACKER_COMPILE_CACHE")
    if env == "0":
        return ""
    repo = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    if path is None:
        path = env or osp.join(repo, ".jax_compile_cache")
    os.makedirs(path, exist_ok=True)
    # seed from the COMMITTED warm-start cache (benchcache/): the live
    # cache dir is untracked and VM restarts wipe untracked state, which
    # made the driver's round-end bench compile everything cold (~14 min
    # for the smplt program alone on this 1-core host — BENCH_r04 died on
    # it). Entries whose compiler-build key mismatches simply miss.
    seed = osp.join(repo, "benchcache")
    if osp.isdir(seed) and osp.abspath(seed) != osp.abspath(path):
        for name in os.listdir(seed):
            dst = osp.join(path, name)
            if not osp.exists(dst):
                try:
                    os.link(osp.join(seed, name), dst)
                except OSError:
                    import shutil
                    shutil.copy(osp.join(seed, name), dst)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took a nontrivial compile; the default 1 s
    # threshold skips small programs whose recompile is cheaper than a
    # cache round-trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
