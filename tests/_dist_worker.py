"""Worker process for the 2-process jax.distributed smoke test.

Launched by tests/test_distributed.py as `python _dist_worker.py <pid>
<nproc> <port>`. Each process contributes 4 virtual CPU devices; the two
processes form one 8-device global mesh. The worker brings up
`initialize_multihost` (the real `jax.distributed.initialize` path,
parallel/mesh.py:21-39 — not monkeypatched), builds the global 'envs' mesh,
runs a real ShardedRunner rollout across it, and prints the metrics as one
JSON line for the parent test to compare.

Importing this module has no side effects (the test imports `build_env`
and `run_rollout` to replay the identical rollout single-process); all
environment setup happens under __main__ before jax is imported.
"""

import json
import sys

NUM_ENVS = 16
NUM_STEPS = 12


def build_env():
    """The exact env both the workers and the in-test replay use."""
    from spriteworld_tpu.core import actions
    from spriteworld_tpu.core import distributions as distribs
    from spriteworld_tpu.core import environment
    from spriteworld_tpu.core import generators
    from spriteworld_tpu.core import renderers
    from spriteworld_tpu.core import tasks

    return environment.Environment(
        task=tasks.FindGoalPosition(
            goal_position=(0.5, 0.5), terminate_distance=0.1),
        action_space=actions.SelectMove(scale=0.25),
        renderers={"factors": renderers.SpriteFactors(),
                   # A real image render (the product obs path) so the
                   # cross-process rollout covers rasterization, not just
                   # factor gathers. 16x16/AA=1 XLA path: cheap on the CPU
                   # workers and bit-deterministic across mesh shapes.
                   "image": renderers.ImageRenderer((16, 16),
                                                    use_pallas=False),
                   "success": renderers.Success()},
        init_sprites=generators.generate_sprites(
            distribs.Product([
                distribs.Continuous("x", 0.2, 0.8),
                distribs.Continuous("y", 0.2, 0.8),
                distribs.Discrete("shape", ["square", "triangle"]),
                distribs.Continuous("scale", 0.1, 0.2),
            ]), num_sprites=3),
        max_episode_length=5)


def run_rollout(mesh):
    """Reset + one rollout chunk on the given mesh; returns a metrics dict."""
    import jax

    from spriteworld_tpu.parallel import runner as runner_lib

    import jax.numpy as jnp

    env = build_env()
    runner = runner_lib.ShardedRunner(env, num_envs=NUM_ENVS, mesh=mesh)
    state, _ = runner.reset(jax.random.key(0))
    state, _, metrics = runner.rollout(
        state, jax.random.key(1), num_steps=NUM_STEPS)

    # Pixel checksum of the final sharded state's rendered observation:
    # the sum is of exact small integers (u8 pixels, < 2^24 total), so it
    # is reduction-order-invariant — identical across mesh shapes and
    # process counts, and its computation is a cross-process collective.
    def checksum(s):
        succ = jax.vmap(env.success)(s)
        img = env.observation_batch(s.factors, s.num_sprites, succ)["image"]
        return img.astype(jnp.float32).sum()

    image_sum = float(jax.jit(
        checksum, in_shardings=(runner._shard,),
        out_shardings=runner._repl)(state))
    return {
        "steps": metrics.steps,
        "episodes": metrics.episodes,
        "successes": metrics.successes,
        "return_sum": round(float(metrics.return_sum), 3),
        "reward_sum": round(float(metrics.reward_sum), 3),
        "image_sum": image_sum,
    }


CKPT_STEPS_BEFORE = 7   # rollout length before the checkpoint is taken
CKPT_STEPS_AFTER = 9    # continuation length after save/restore


def _metrics_dict(metrics):
    return {
        "steps": metrics.steps,
        "episodes": metrics.episodes,
        "successes": metrics.successes,
        "return_sum": round(float(metrics.return_sum), 3),
        "reward_sum": round(float(metrics.reward_sum), 3),
    }


def run_ckpt_roundtrip(mesh, mode: str, path: str):
    """Cross-topology checkpoint leg (SURVEY §5.4): the same deterministic
    rollout stream, cut at step CKPT_STEPS_BEFORE.

    mode='save': reset + N1 steps, save the sharded
    {env_state, episode_returns, key} under THIS mesh/process topology,
    then continue N2 steps and return the continuation metrics.
    mode='restore': restore that checkpoint under THIS topology (however it
    was saved), continue N2 steps, return the continuation metrics.
    A pod-resize is exactly save-under-one-shape + restore-under-another;
    the continuation metrics must match an uninterrupted run bit-for-bit
    (ints) / to float tolerance.
    """
    import jax

    from spriteworld_tpu.parallel import checkpoint
    from spriteworld_tpu.parallel import runner as runner_lib

    env = build_env()
    runner = runner_lib.ShardedRunner(env, num_envs=NUM_ENVS, mesh=mesh)
    state, _ = runner.reset(jax.random.key(0))
    if mode == "save":
        state, key, _ = runner.rollout(
            state, jax.random.key(1), CKPT_STEPS_BEFORE)
        checkpoint.save_state(path, {
            "env_state": state,
            "episode_returns": runner.episode_returns,
            "key": key,
        })
    else:
        like = {"env_state": state,
                "episode_returns": runner.episode_returns,
                "key": jax.random.key(1)}
        restored = checkpoint.restore_state(path, like)
        runner.episode_returns = restored["episode_returns"]
        state, key = restored["env_state"], restored["key"]
    _, _, m2 = runner.rollout(state, key, CKPT_STEPS_AFTER)
    return _metrics_dict(m2)


def main(pid: int, nproc: int, port: str, task: str = ""):
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from spriteworld_tpu.parallel import mesh as mesh_lib

    mesh_lib.initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    if task.startswith(("save=", "restore=")):
        mode, path = task.split("=", 1)
        out = run_ckpt_roundtrip(mesh_lib.env_mesh(), mode, path)
    else:
        out = run_rollout(mesh_lib.env_mesh())
    out.update(pid=pid, process_count=jax.process_count(),
               global_devices=len(jax.devices()),
               local_devices=len(jax.local_devices()))
    print(json.dumps(out), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
         sys.argv[4] if len(sys.argv) > 4 else "")
