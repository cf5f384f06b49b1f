"""Real multi-process jax.distributed bring-up (SURVEY.md §5.8).

Spawns TWO actual processes, each with 4 virtual CPU devices, connects them
through `initialize_multihost` (the real `jax.distributed.initialize`,
parallel/mesh.py:21-39), builds the 8-device global 'envs' mesh across the
process boundary, and runs a ShardedRunner rollout whose metric reductions
are cross-process (gloo) collectives. This is the evidence the
monkeypatch-only test could not provide: the multi-host path compiles AND
executes.

The identical rollout (same env, same seeds) is then replayed in-process on
the local 8-device virtual mesh and the metrics must agree exactly — the
rollout is seed-determined and mesh-shape-invariant.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

import _dist_worker

_WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(task: str = "", timeout: int = 240):
    """Launch the 2-process x 4-device worker pair; return their JSON outs."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Strip any TPU-tunnel site dir (it imports jax at interpreter startup,
    # pinning the backend before the worker can select CPU).
    inherited = [p for p in (env.get("PYTHONPATH") or "").split(os.pathsep)
                 if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo_root] + inherited)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)]
            + ([task] if task else []),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True, cwd=os.path.dirname(_WORKER))
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))
    return outs


def test_two_process_distributed_rollout():
    outs = _run_workers()

    for o in outs:
        assert o["process_count"] == 2
        assert o["global_devices"] == 8
        assert o["local_devices"] == 4
        assert o["steps"] == _dist_worker.NUM_ENVS * _dist_worker.NUM_STEPS

    # Replicated metrics must agree across processes.
    a, b = outs
    for key in ("steps", "episodes", "successes", "return_sum", "reward_sum",
                "image_sum"):
        assert a[key] == b[key], f"metric {key} diverged across processes"

    # And match the identical rollout on the in-process 8-device mesh.
    from spriteworld_tpu.parallel import mesh as mesh_lib

    local = _dist_worker.run_rollout(mesh_lib.env_mesh())
    assert local["steps"] == a["steps"]
    assert local["episodes"] == a["episodes"]
    assert local["successes"] == a["successes"]
    assert local["return_sum"] == pytest.approx(a["return_sum"], abs=1e-2)
    assert local["reward_sum"] == pytest.approx(a["reward_sum"], abs=1e-2)
    # Rendered pixels are u8 ints, so the checksum is exact: the image
    # observation path must be bit-identical across mesh/process shapes.
    assert local["image_sum"] == a["image_sum"]


def _assert_metrics_equal(got, want):
    for key in ("steps", "episodes", "successes"):
        assert got[key] == want[key], f"metric {key}: {got} vs {want}"
    for key in ("return_sum", "reward_sum"):
        assert got[key] == pytest.approx(want[key], abs=1e-2), key


def test_cross_topology_checkpoint_resume(tmp_path):
    """A pod resize is save-under-one-mesh + restore-under-another
    (SURVEY §5.4's 'free by construction' claim, made evidence): the
    continued rollout's metrics must equal an uninterrupted run in BOTH
    directions — 2-process x 4-device save -> in-process 8-device restore,
    and in-process save -> 2-process restore."""
    from spriteworld_tpu.parallel import mesh as mesh_lib

    # Uninterrupted baseline: the in-process 'save' leg runs reset + N1
    # steps (saving its own checkpoint mid-way) and then the N2-step
    # continuation without any restore in between.
    ckpt_local = str(tmp_path / "ckpt_inprocess")
    want = _dist_worker.run_ckpt_roundtrip(
        mesh_lib.env_mesh(), "save", ckpt_local)

    # Leg 1: save under the 2-process global mesh; the workers also report
    # their own (uninterrupted) continuation, which must match the local
    # baseline stream.
    ckpt_2proc = str(tmp_path / "ckpt_2proc")
    outs = _run_workers(f"save={ckpt_2proc}")
    _assert_metrics_equal(outs[0], outs[1])
    _assert_metrics_equal(outs[0], want)
    # ... then restore that 2-process checkpoint in-process on the local
    # 8-device mesh and continue.
    got = _dist_worker.run_ckpt_roundtrip(
        mesh_lib.env_mesh(), "restore", ckpt_2proc)
    _assert_metrics_equal(got, want)

    # Leg 2 (vice versa): restore the in-process checkpoint under the
    # 2-process topology and continue there.
    outs2 = _run_workers(f"restore={ckpt_local}")
    _assert_metrics_equal(outs2[0], outs2[1])
    _assert_metrics_equal(outs2[0], want)
