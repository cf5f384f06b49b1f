"""Throughput benchmark: env-steps/s per chip on the BASELINE workload.

Workload (BASELINE.json: "env-steps/s per chip (64x64 render, 6 sprites)"):
goal-finding scenes with 6 sprites (1 hue-defined target + 5 distractors),
SelectMove actions, FindGoalPosition reward, and 64x64 PILRenderer-equivalent
image observations (anti_aliasing=1, the reference renderer's default —
pil_renderer.py:34 — and the bit-exact parity mode). A random agent steps B
sharded env lanes inside one jitted lax.scan; every rendered image is
consumed by an on-device reduction (a stand-in learner) so the rasterizer
cannot be dead-code-eliminated.

Prints ONE JSON line:
  {"metric": ..., "value": steps/s/chip, "unit": ..., "vs_baseline": ...}
vs_baseline is measured against the BASELINE.json north star of 1M steps/s
on a v5e-8, i.e. 125k steps/s per chip.

Usage: python bench.py [--num_envs=N] [--steps=T] [--aa=1] [--quick]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

from spriteworld_tpu.core import actions as action_lib
from spriteworld_tpu.core import distributions as distribs
from spriteworld_tpu.core import environment as env_lib
from spriteworld_tpu.core import generators as sprite_generators
from spriteworld_tpu.core import renderers
from spriteworld_tpu.core import tasks
from spriteworld_tpu.parallel import env_mesh, env_sharding

BASELINE_PER_CHIP = 1_000_000 / 8  # BASELINE.json: >1M steps/s on v5e-8


def build_env(anti_aliasing: int = 1):
    """6-sprite goal-finding env with 64x64 image obs (BASELINE workload)."""
    common = distribs.Product([
        distribs.Continuous("x", 0.1, 0.9),
        distribs.Continuous("y", 0.1, 0.9),
        distribs.Discrete("shape", ["square", "triangle", "circle",
                                    "pentagon", "star_5", "spoke_4"]),
        distribs.Continuous("angle", 0, 360),
        distribs.Continuous("scale", 0.1, 0.2),
        distribs.Continuous("c1", 0.3, 1.0),
        distribs.Continuous("c2", 0.9, 1.0),
    ])
    target_hue = distribs.Continuous("c0", 0.0, 0.15)
    distractor_hue = distribs.Continuous("c0", 0.2, 0.9)
    target = distribs.Product([common, target_hue])
    distractors = distribs.Product([common, distractor_hue])

    init_sprites = sprite_generators.chain_generators(
        sprite_generators.generate_sprites(target, num_sprites=1),
        sprite_generators.generate_sprites(distractors, num_sprites=5))

    task = tasks.FindGoalPosition(
        filter_distrib=target_hue, goal_position=(0.5, 0.5),
        terminate_distance=0.05)
    return env_lib.Environment(
        task=task,
        action_space=action_lib.SelectMove(scale=0.25),
        renderers={
            "image": renderers.ImageRenderer(
                image_size=(64, 64), anti_aliasing=anti_aliasing,
                color_to_rgb="hsv"),
            "success": renderers.Success(),
        },
        init_sprites=init_sprites,
        max_episode_length=20,
        metadata={"name": "bench_goal_finding_6sprites"})


def build_bench_fn(env, num_envs, sharding):
    """One jitted program: T lockstep steps, image consumed on-device."""

    def body(carry, _):
        state, key, acc = carry
        key, k_act = jax.random.split(key)
        acts = jax.vmap(env.sample_action)(jax.random.split(k_act, num_envs))
        state, ts = env.step_batch(state, acts)
        # Consume the observation so rendering is not DCE'd: byte-sum plus
        # reward sum feed a carried scalar (a minimal "learner").
        img = ts.observation["image"]
        acc = acc + img.astype(jnp.float32).sum() \
            + jnp.nan_to_num(ts.reward).sum()
        return (state, key, acc), None

    def chunk(state, key, acc, num_steps):
        (state, key, acc), _ = jax.lax.scan(
            body, (state, key, acc), length=num_steps)
        return state, key, acc

    return jax.jit(
        chunk, static_argnums=(3,), donate_argnums=(0,),
        in_shardings=(sharding, None, None),
        out_shardings=(sharding, None, None))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=0,
                   help="global env lanes (0 = auto: 2048/chip)")
    p.add_argument("--steps", type=int, default=200,
                   help="steps per timed chunk")
    p.add_argument("--chunks", type=int, default=3,
                   help="timed chunk repetitions (best taken)")
    p.add_argument("--aa", type=int, default=1, help="anti_aliasing factor")
    p.add_argument("--quick", action="store_true",
                   help="small sizes for smoke runs")
    args = p.parse_args(argv)

    n_chips = max(len(jax.devices()), 1)
    num_envs = args.num_envs or (256 if args.quick else 2048 * n_chips)
    steps = 20 if args.quick else args.steps
    chunks = 2 if args.quick else args.chunks

    mesh = env_mesh()
    sharding = env_sharding(mesh)
    env = build_env(anti_aliasing=args.aa)

    keys = jax.device_put(
        jax.random.split(jax.random.key(0), num_envs), sharding)
    state, _ = jax.jit(env.reset_batch,
                       out_shardings=(sharding, sharding))(keys)

    fn = build_bench_fn(env, num_envs, sharding)
    key = jax.random.key(1)
    acc = jnp.float32(0.0)

    # Warmup/compile. NOTE: fetch acc to host each chunk — materializing the
    # value is the only reliable sync point (block_until_ready returns early
    # on the axon-relay TPU backend).
    state, key, acc = fn(state, key, acc, steps)
    float(acc)

    best = float("inf")
    for _ in range(chunks):
        t0 = time.perf_counter()
        state, key, acc = fn(state, key, acc, steps)
        float(acc)
        best = min(best, time.perf_counter() - t0)

    steps_per_sec = num_envs * steps / best
    per_chip = steps_per_sec / n_chips
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip_64x64render_6sprites",
        "value": round(per_chip, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 4),
        "num_envs": num_envs,
        "chip_count": n_chips,
        "total_steps_per_sec": round(steps_per_sec, 1),
        "anti_aliasing": args.aa,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
