"""Throughput benchmark: env-steps/s per chip on the BASELINE workloads.

BASELINE.json lists five configs to report:

  * ``factors``    — goal_finding, SpriteFactors renderer (no rasterization)
  * ``image64``    — goal_finding with 64x64 image observations (the primary
    metric; anti_aliasing=1 by default, --aa=5 for the COBRA-canonical
    renderer of configs/cobra/common.py which dispatches to the Pallas
    kernel + Lanczos downsample)
  * ``clustering`` — cobra clustering task, canonical 64x64/AA=5 renderer
  * ``sorting``    — cobra sorting (MetaAggregated), canonical renderer
  * ``embodied``   — goal_finding_embodied (adhere-and-carry), its config's
    own renderer

A random agent steps B sharded env lanes inside one jitted lax.scan; every
observation leaf is consumed by an on-device reduction (a stand-in learner)
so rendering cannot be dead-code-eliminated.

Prints ONE JSON line per requested workload:
  {"metric": ..., "value": steps/s/chip, "unit": ..., "vs_baseline": ...}
vs_baseline is measured against the BASELINE.json north star of 1M steps/s
on a v5e-8, i.e. 125k steps/s per chip. The default invocation (no flags)
runs only the primary ``image64`` workload — the driver's one-line contract.

Usage: python bench.py [--workload image64|factors|clustering|sorting|
                        embodied|all] [--num_envs=N] [--steps=T] [--aa=1]
                       [--quick]
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


def _goal_finding_parts():
    """6-sprite goal-finding scene: 1 hue target + 5 distractors."""
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
    init_sprites = sprite_generators.chain_generators(
        sprite_generators.generate_sprites(
            distribs.Product([common, target_hue]), num_sprites=1),
        sprite_generators.generate_sprites(
            distribs.Product([common, distractor_hue]), num_sprites=5))
    task = tasks.FindGoalPosition(
        filter_distrib=target_hue, goal_position=(0.5, 0.5),
        terminate_distance=0.05)
    return task, init_sprites


def build_env(anti_aliasing: int = 1, image_size=(64, 64),
              pil_exact: bool = True):
    """Primary BASELINE workload: 6-sprite goal finding with image obs."""
    task, init_sprites = _goal_finding_parts()
    return env_lib.Environment(
        task=task,
        action_space=action_lib.SelectMove(scale=0.25),
        renderers={
            "image": renderers.ImageRenderer(
                image_size=tuple(image_size), anti_aliasing=anti_aliasing,
                color_to_rgb="hsv", pil_exact=pil_exact),
            "success": renderers.Success(),
        },
        init_sprites=init_sprites,
        max_episode_length=20,
        metadata={"name": "bench_goal_finding_6sprites"})


def build_factors_env():
    """BASELINE config 1: goal_finding with SpriteFactors (no raster)."""
    task, init_sprites = _goal_finding_parts()
    return env_lib.Environment(
        task=task,
        action_space=action_lib.SelectMove(scale=0.25),
        renderers={
            "factors": renderers.SpriteFactors(),
            "success": renderers.Success(),
        },
        init_sprites=init_sprites,
        max_episode_length=20,
        metadata={"name": "bench_goal_finding_factors"})


def _config_env(module_name: str):
    import importlib

    mod = importlib.import_module(
        f"spriteworld_tpu.configs.{module_name}")
    cfg = mod.get_config("train")
    cfg["renderers"]["success"] = renderers.Success()
    return env_lib.Environment(**cfg)


WORKLOADS = {
    # name: (metric suffix, builder)
    "image64": ("64x64render_6sprites", None),  # built with --aa
    "factors": ("factors_6sprites", build_factors_env),
    "clustering": ("cobra_clustering",
                   lambda: _config_env("cobra.clustering")),
    "sorting": ("cobra_sorting", lambda: _config_env("cobra.sorting")),
    "embodied": ("goal_finding_embodied",
                 lambda: _config_env("examples.goal_finding_embodied")),
}


def build_bench_fn(env, num_envs, sharding):
    """One jitted program: T lockstep steps, every obs consumed on-device."""

    def body(carry, _):
        state, key, acc = carry
        key, k_act = jax.random.split(key)
        acts = jax.vmap(env.sample_action)(jax.random.split(k_act, num_envs))
        state, ts = env.step_batch(state, acts)
        # Consume all observation leaves so no renderer is DCE'd: their
        # byte-sums plus the reward sum feed a carried scalar (a minimal
        # "learner").
        obs_sum = sum(
            leaf.astype(jnp.float32).sum()
            for leaf in jax.tree.leaves(ts.observation))
        acc = acc + obs_sum + jnp.nan_to_num(ts.reward).sum()
        return (state, key, acc), None

    def chunk(state, key, acc, num_steps):
        (state, key, acc), _ = jax.lax.scan(
            body, (state, key, acc), length=num_steps)
        return state, key, acc

    return jax.jit(
        chunk, static_argnums=(3,), donate_argnums=(0,),
        in_shardings=(sharding, None, None),
        out_shardings=(sharding, None, None))


def run_workload(name: str, env, num_envs: int, steps: int, chunks: int,
                 metric_suffix: str, extra: dict):
    n_chips = max(len(jax.devices()), 1)
    mesh = env_mesh()
    sharding = env_sharding(mesh)

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
        "metric": f"env_steps_per_sec_per_chip_{metric_suffix}",
        "value": round(per_chip, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 4),
        "workload": name,
        "num_envs": num_envs,
        "chip_count": n_chips,
        "total_steps_per_sec": round(steps_per_sec, 1),
        "backend": jax.default_backend(),
        **extra,
    }))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workload", default="image64",
                   choices=list(WORKLOADS) + ["all"],
                   help="BASELINE workload to run (default: the primary "
                        "image64 metric); 'all' runs every workload plus "
                        "image64 at AA=5")
    p.add_argument("--num_envs", type=int, default=0,
                   help="global env lanes (0 = auto: 2048/chip)")
    p.add_argument("--steps", type=int, default=200,
                   help="steps per timed chunk")
    p.add_argument("--chunks", type=int, default=3,
                   help="timed chunk repetitions (best taken)")
    p.add_argument("--aa", type=int, default=1,
                   help="anti_aliasing for the image64 workload")
    p.add_argument("--fast", action="store_true",
                   help="image64 with pil_exact=False (centroid fill + box "
                        "filter; no PIL bit-parity). 'all' records both.")
    p.add_argument("--quick", action="store_true",
                   help="small sizes for smoke runs")
    args = p.parse_args(argv)

    n_chips = max(len(jax.devices()), 1)
    num_envs = args.num_envs or (256 if args.quick else 2048 * n_chips)
    steps = 20 if args.quick else args.steps
    chunks = 2 if args.quick else args.chunks

    if args.workload == "all":
        # image64 runs at AA=1 and AA=5 (the two BASELINE renderer modes);
        # a user-requested --aa is added rather than silently ignored.
        aa_list = [1, 5] + ([args.aa] if args.aa not in (1, 5) else [])
        # Exact rows for every AA (the parity mode), plus the recorded
        # pil_exact=False row at AA=5 so the cost of bit-parity is explicit.
        todo = [("image64", aa, True) for aa in aa_list] + [
            ("image64", 5, False)] + [
            (n, None, True) for n in WORKLOADS if n != "image64"]
    else:
        todo = [(args.workload, args.aa, not args.fast)]

    for name, aa, exact in todo:
        if name == "image64":
            env = build_env(anti_aliasing=aa, pil_exact=exact)
            suffix = ("64x64render_6sprites" if aa == 1
                      else f"64x64render_aa{aa}_6sprites")
            if not exact:
                suffix += "_fast"
            extra = {"anti_aliasing": aa, "pil_exact": exact}
        else:
            suffix, builder = WORKLOADS[name]
            env = builder()
            extra = {}
        run_workload(name, env, num_envs, steps, chunks, suffix, extra)
    return 0


if __name__ == "__main__":
    sys.exit(main())
