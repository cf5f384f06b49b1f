"""Weak-scaling curve over a virtual device mesh (SURVEY.md §5.8 evidence).

Runs the factors-renderer goal-finding workload (no rasterization — the
pure engine) on 1/2/4/8-device virtual CPU meshes with a fixed per-device
env count, and appends one JSON line per mesh size to SCALING.jsonl. The
engine is embarrassingly data-parallel (envs are independent; the only
collectives are metric psums), so steps/s should grow near-linearly with
devices — the recorded efficiency column makes regressions visible.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python scaling_bench.py [--envs_per_device 64] [--steps 100]

(On real hardware the same harness runs unchanged: the mesh enumerates
real chips instead of virtual CPU devices.)
"""

import argparse
import json
import os
import time

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # The TPU-tunnel sitecustomize pins jax_platforms before env vars are
    # consulted; re-pin through the config so a CPU run is really on CPU.
    jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--envs_per_device", type=int, default=64)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--out", default="SCALING.jsonl")
    args = p.parse_args(argv)

    from spriteworld_tpu.parallel import ShardedRunner, env_mesh

    import bench as bench_mod

    env = bench_mod.build_factors_env()
    devices = jax.devices()
    sizes = [s for s in (1, 2, 4, 8) if s <= len(devices)]
    base = None
    rows = []
    for n in sizes:
        mesh = env_mesh(devices[:n])
        num_envs = args.envs_per_device * n
        runner = ShardedRunner(env, num_envs=num_envs, mesh=mesh)
        state, _ = runner.reset(jax.random.key(0))
        key = jax.random.key(1)
        # Warmup/compile chunk, then best of 3 timed chunks.
        state, key, _ = runner.rollout(state, key, args.steps)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state, key, m = runner.rollout(state, key, args.steps)
            assert m.steps == num_envs * args.steps
            best = min(best, time.perf_counter() - t0)
        sps = num_envs * args.steps / best
        if base is None:
            base = sps
        row = {
            "metric": "weak_scaling_factors_env_steps_per_sec",
            "devices": n,
            "num_envs": num_envs,
            "steps_per_sec": round(sps, 1),
            "speedup_vs_1dev": round(sps / base, 3),
            "efficiency": round(sps / (base * n), 3),
            "backend": jax.default_backend(),
        }
        if jax.default_backend() == "cpu":
            # Virtual CPU devices share one physical host's cores, so
            # efficiency here measures host-core contention, not
            # interconnect scaling; the row demonstrates the sharded
            # program runs at every mesh size.
            row["note"] = "virtual devices share host cores"
        rows.append(row)
        print(json.dumps(rows[-1]), flush=True)
    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
