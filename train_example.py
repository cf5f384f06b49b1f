"""End-to-end TPU training example: sharded envs feeding a sharded learner.

The reference ships only a random-agent loop (example_run_loop.py); this
script shows the pipeline the engine was built for: B environment lanes
sharded over the 'envs' mesh axis step in lockstep inside one jitted
program that also computes policy gradients — rollout, REINFORCE loss,
and the optimizer update are a single XLA computation per iteration, with
parameters replicated and gradient reductions riding ICI as XLA-inserted
psums (SURVEY.md §5.8).

The task is the BASELINE goal-finding env with SpriteFactors observations:
the policy reads the padded factor slab, emits a sigmoid-squashed Gaussian
over the 4-d SelectMove action, and learns to click the target sprite and
drag it toward the goal. Dense FindGoalPosition rewards make a per-step
advantage baseline sufficient.

Usage:
  python train_example.py [--num_envs=1024] [--iters=200] [--steps=20]
                          [--obs=factors|image]

--obs=image swaps in the rendered-RGB observation and a bf16 conv policy
(ConvPolicy): the rasterizer feeds the MXU inside the same fused program
— the full pixel-based production pipeline.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from spriteworld_tpu.core import actions as action_lib
from spriteworld_tpu.core import distributions as distribs
from spriteworld_tpu.core import environment as env_lib
from spriteworld_tpu.core import generators as sprite_generators
from spriteworld_tpu.core import renderers, tasks
from spriteworld_tpu.parallel import env_mesh, env_sharding, \
    replicated_sharding


def build_train_env(obs: str = "factors", image_size=(64, 64)):
    """Single-sprite goal finding with factor or image observations.

    A deliberately learnable variant of the BASELINE scene: one large
    sprite, an unfiltered dense FindGoalPosition reward, and a full-range
    SelectMove — so REINFORCE shows visible progress within a few hundred
    updates while exercising exactly the same engine pipeline.
    obs="image" swaps in the rasterizer (64x64 RGB by default) so the
    full production path — render on-device, MXU conv policy, fused
    update — runs as one program.
    """
    dist = distribs.Product([
        distribs.Continuous("x", 0.2, 0.8),
        distribs.Continuous("y", 0.2, 0.8),
        distribs.Discrete("shape", ["circle", "square"]),
        distribs.Discrete("scale", [0.3]),
        distribs.Continuous("c0", 0.0, 1.0),
    ])
    task = tasks.FindGoalPosition(
        goal_position=(0.5, 0.5), terminate_distance=0.08)
    if obs == "image":
        obs_renderers = {
            "image": renderers.ImageRenderer(image_size, color_to_rgb="hsv"),
            "success": renderers.Success()}
    else:
        obs_renderers = {"factors": renderers.SpriteFactors(),
                         "success": renderers.Success()}
    return env_lib.Environment(
        task=task,
        action_space=action_lib.SelectMove(scale=0.5),
        renderers=obs_renderers,
        init_sprites=sprite_generators.generate_sprites(dist, 1),
        max_episode_length=20,
        metadata={"name": f"train_example_goal_finding_{obs}"})


class Policy(nn.Module):
    """MLP over the flattened factor slab -> squashed-Gaussian action."""

    hidden: int = 128
    action_dim: int = 4

    @nn.compact
    def __call__(self, factors, mask):
        # factors [B, K, F]; dead slots are zeroed by the mask so padding
        # cannot leak into the policy.
        x = (factors * mask[..., None]).reshape(factors.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        mu = nn.Dense(self.action_dim)(x)
        log_std = self.param(
            "log_std", nn.initializers.constant(-1.0), (self.action_dim,))
        return mu, jnp.broadcast_to(log_std, mu.shape)


class ConvPolicy(nn.Module):
    """CNN over rendered RGB observations -> squashed-Gaussian action.

    Strided convs in bf16 keep the pixel path on the MXU; the head and
    the distribution parameters stay f32.
    """

    hidden: int = 128
    action_dim: int = 4

    @nn.compact
    def __call__(self, image):
        x = image.astype(jnp.bfloat16) / 255.0  # u8[B, H, W, 3]
        for feat in (16, 32, 64):
            x = nn.relu(nn.Conv(feat, (4, 4), strides=(2, 2),
                                dtype=jnp.bfloat16)(x))
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.relu(nn.Dense(self.hidden)(x))
        mu = nn.Dense(self.action_dim)(x)
        log_std = self.param(
            "log_std", nn.initializers.constant(-1.0), (self.action_dim,))
        return mu, jnp.broadcast_to(log_std, mu.shape)


def flatten_obs(obs):
    """Flatten multi-dim observation leaves to [B, -1] before they enter
    a scan carry or stack: TPU tiled layouts pad the two minor dims to
    (8, 128), so raw NHWC u8 frames inflate ~43x in HBM when stacked —
    a 20-step 64x64 trace at 1024 lanes is a 53 GB allocation (measured:
    OOM) — and a [B, K, F] factor slab pads the same way. The policy
    adapters reshape back right before consuming (a one-off relayout,
    which is cheap). Same rule as ShardedRunner's stacked-trace
    flattening (parallel/runner.py)."""
    return jax.tree.map(
        lambda l: l.reshape(l.shape[0], -1) if l.ndim > 2 else l, obs)


def sample_action_z(mu, log_std, key):
    """a = sigmoid(z), z ~ N(mu, std); returns (action, z).

    The pre-squash z is kept so the update can recompute log-probs for
    the stored transitions in one batch (see make_train_step)."""
    std = jnp.exp(log_std)
    z = mu + std * jax.random.normal(key, mu.shape)
    return jax.nn.sigmoid(z), z


def log_prob_z(mu, log_std, z):
    """log-density of a = sigmoid(z) under the squashed Gaussian."""
    std = jnp.exp(log_std)
    # Gaussian log-density + sigmoid change-of-variables.
    logp = -0.5 * (((z - mu) / std) ** 2 + 2 * log_std
                   + jnp.log(2 * jnp.pi))
    log_det = jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z)
    return (logp - log_det).sum(-1)


def make_train_step(env, apply_obs, optimizer, num_envs, rollout_steps,
                    shard, repl):
    """One jitted iteration: T-step rollout, then one batched update.

    `apply_obs(params, obs) -> (mu, log_std)` adapts the policy to the
    env's observation dict (factor slab or rendered image).

    Rollout and update are DECOUPLED inside the one program: the scan is
    pure inference (no AD through its length), stacking observations,
    the sampled pre-squash actions, and reward-delta advantages; the
    REINFORCE gradient then comes from a single policy re-application
    over all [T*B] transitions. Params are constant during the rollout,
    so the estimator is identical to differentiating inside the scan —
    and the backward pass is one large MXU-friendly batch instead of T
    sequential per-step backward passes threaded through the scan's
    reverse sweep.
    """

    def rollout(params, state, obs, key):
        def body(carry, _):
            state, obs, key, prev_r, prev_ok = carry
            key, k_act = jax.random.split(key)
            mu, log_std = apply_obs(params, obs)
            actions, z = sample_action_z(mu, log_std, k_act)
            state, ts = env.step_batch(state, actions)
            ts = ts.replace(observation=flatten_obs(ts.observation))
            reward = jnp.nan_to_num(ts.reward)
            # FindGoalPosition rewards track goal distance, so the reward
            # DELTA within an episode isolates this step's action from the
            # scene's standing distance — a far lower-variance advantage
            # than reward-minus-batch-mean. Steps without a same-episode
            # predecessor (FIRST, or right after one) are masked out.
            valid = prev_ok & ~ts.first()
            adv = jnp.where(valid, reward - prev_r, 0.0)
            out = (obs, z, adv, valid.astype(jnp.float32), reward,
                   ts.observation["success"])
            return (state, ts.observation, key, reward, ~ts.first()), out

        prev_r = jnp.zeros((num_envs,), jnp.float32)
        prev_ok = jnp.zeros((num_envs,), bool)
        (state, obs, key, _, _), outs = jax.lax.scan(
            body, (state, obs, key, prev_r, prev_ok),
            length=rollout_steps)
        return state, obs, key, outs

    def loss_fn(params, obs_t, z_t, advs, ws):
        # One batched re-application over all T*B transitions. Flatten
        # with the SHARDED env axis outermost ([T, B] -> [B*T]): merging
        # a replicated T inside the sharded B keeps every shard's rows
        # contiguous, so GSPMD lowers the reshape locally; the other
        # order interleaves shards and forces an all-gather of the whole
        # observation stack.
        flat = lambda x: jnp.swapaxes(x, 0, 1).reshape(  # noqa: E731
            (-1,) + x.shape[2:])
        mu, log_std = apply_obs(params, jax.tree.map(flat, obs_t))
        logp = log_prob_z(mu, log_std, flat(z_t))
        advs = flat(advs) - advs.mean()
        ws = flat(ws)
        return -(logp * advs * ws).sum() / jnp.maximum(ws.sum(), 1.0)

    def train_step(params, opt_state, state, obs, key):
        state, obs, key, (obs_t, z_t, advs, ws, rewards, succ) = rollout(
            params, state, obs, key)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, obs_t, z_t, jax.lax.stop_gradient(advs), ws)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "reward_mean": rewards.mean(),
                   "success_rate": succ.mean()}
        return params, opt_state, state, obs, key, metrics

    obs_shard = jax.tree.map(lambda _: shard, env.observation_spec())
    return jax.jit(
        train_step,
        donate_argnums=(1, 2, 3),
        in_shardings=(repl, repl, shard, obs_shard, repl),
        out_shardings=(repl, repl, shard, obs_shard, repl, repl))


def train(num_envs=1024, iters=200, rollout_steps=20, seed=0,
          log_every=20, mesh=None, obs_mode="factors", image_size=(64, 64)):
    env = build_train_env(obs_mode, image_size)
    mesh = mesh if mesh is not None else env_mesh()
    shard = env_sharding(mesh)
    repl = replicated_sharding(mesh)

    optimizer = optax.adam(2e-3)

    key = jax.random.key(seed)
    key, k_init, k_reset = jax.random.split(key, 3)
    keys = jax.device_put(jax.random.split(k_reset, num_envs), shard)
    state, ts = jax.jit(env.reset_batch,
                        out_shardings=(shard, shard))(keys)
    obs = flatten_obs(ts.observation)
    if obs_mode == "image":
        h, w = image_size
        policy = ConvPolicy()
        unflat = lambda im: im.reshape(-1, h, w, 3)  # noqa: E731
        apply_obs = lambda p, o: policy.apply(  # noqa: E731
            p, unflat(o["image"]))
        params = policy.init(k_init, unflat(obs["image"]))
    else:
        kf = env.observation_spec()["factors"]["factors"].shape  # (K, F)
        policy = Policy()
        apply_obs = lambda p, o: policy.apply(  # noqa: E731
            p, o["factors"]["factors"].reshape(-1, *kf),
            o["factors"]["mask"])
        params = policy.init(
            k_init, obs["factors"]["factors"].reshape(-1, *kf),
            obs["factors"]["mask"])
    opt_state = optimizer.init(params)

    step_fn = make_train_step(
        env, apply_obs, optimizer, num_envs, rollout_steps, shard, repl)

    history = []
    if iters <= 0:
        return params, history
    t1 = None
    m = None
    for it in range(iters):
        params, opt_state, state, obs, key, m = step_fn(
            params, opt_state, state, obs, key)
        if it == 0:
            jax.device_get(m)  # sync: everything after this is steady state
            t1 = time.time()
        if it % log_every == 0 or it == iters - 1:
            m = jax.device_get(m)
            history.append(m)
            print(f"iter {it:4d}  loss {float(m['loss']):+8.4f}  "
                  f"reward {float(m['reward_mean']):+8.5f}  "
                  f"success {float(m['success_rate']):.3f}", flush=True)
    jax.device_get(m)
    if iters > 1:
        sps = num_envs * rollout_steps * (iters - 1) / (time.time() - t1)
        print(f"steady-state training throughput: {sps / 1e6:.2f}M "
              "env-steps/s (rollout + REINFORCE update, post-compile)",
              flush=True)
    return params, history


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--obs", default="factors", choices=["factors", "image"],
                   help="observation/policy pair: factor-slab MLP or "
                        "rendered-RGB CNN (the full render->MXU pipeline)")
    args = p.parse_args(argv)
    train(num_envs=args.num_envs, iters=args.iters,
          rollout_steps=args.steps, seed=args.seed, obs_mode=args.obs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
