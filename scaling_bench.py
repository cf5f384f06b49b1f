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

A second mode documents the SINGLE-CHIP saturation curve on the real TPU
(the other axis of the scaling story): `--batch_sweep` times the image64
AA=1 workload at 256..8192 envs on one chip and appends one row per batch
size, showing where per-chip throughput saturates:

    python scaling_bench.py --batch_sweep [--steps 200]
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


def _time_rollout(runner, steps, reps=3):
    import jax

    state, _ = runner.reset(jax.random.key(0))
    key = jax.random.key(1)
    state, key, _ = runner.rollout(state, key, steps)  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, key, m = runner.rollout(state, key, steps)
        assert m.steps == runner.num_envs * steps
        best = min(best, time.perf_counter() - t0)
    return runner.num_envs * steps / best


def _rewrite_keeping_other_metrics(out_path, metric, new_rows):
    """Replace this metric's rows in the artifact, keep every other row."""
    kept = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            kept = [json.loads(l) for l in f if l.strip()]
        kept = [r for r in kept if r.get("metric") != metric]
    with open(out_path, "w") as f:
        for r in kept + new_rows:
            f.write(json.dumps(r) + "\n")


def batch_sweep(args):
    """Single-chip batch-saturation curve: image64/AA=1 at 256..8192 envs.

    Uses bench.build_bench_fn — every observation leaf feeds an on-device
    reduction, so the renderer cannot be dead-code-eliminated (a plain
    ShardedRunner.rollout without an obs consumer measures a render-free
    program: XLA drops the whole rasterizer as dead code).
    """
    import jax.numpy as jnp

    from spriteworld_tpu.parallel import env_mesh, env_sharding

    import bench as bench_mod

    metric = "batch_saturation_image64_aa1_steps_per_sec"
    mesh = env_mesh(jax.devices()[:1])
    sharding = env_sharding(mesh)
    env = bench_mod.build_env(anti_aliasing=1)
    rows = []
    for num_envs in (256, 512, 1024, 2048, 4096, 8192):
        keys = jax.device_put(
            jax.random.split(jax.random.key(0), num_envs), sharding)
        state, _ = jax.jit(env.reset_batch,
                           out_shardings=(sharding, sharding))(keys)
        fn = bench_mod.build_bench_fn(env, num_envs, sharding)
        key = jax.random.key(1)
        acc = jnp.float32(0.0)
        state, key, acc = fn(state, key, acc, args.steps)  # warmup/compile
        float(acc)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state, key, acc = fn(state, key, acc, args.steps)
            float(acc)  # host fetch = the reliable sync point (see bench.py)
            best = min(best, time.perf_counter() - t0)
        sps = num_envs * args.steps / best
        rows.append({
            "metric": metric,
            "devices": 1,
            "num_envs": num_envs,
            "steps_per_sec": round(sps, 1),
            "us_per_env_step": round(1e6 / sps, 4),
            "backend": jax.default_backend(),
        })
        print(json.dumps(rows[-1]), flush=True)
    _rewrite_keeping_other_metrics(args.out, metric, rows)
    return 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--envs_per_device", type=int, default=64)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--out", default="SCALING.jsonl")
    p.add_argument("--batch_sweep", action="store_true",
                   help="single-chip image64/AA=1 saturation curve instead "
                        "of the weak-scaling mesh curve")
    args = p.parse_args(argv)

    if args.batch_sweep:
        return batch_sweep(args)

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
        sps = _time_rollout(runner, args.steps)
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
    _rewrite_keeping_other_metrics(
        args.out, "weak_scaling_factors_env_steps_per_sec", rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
