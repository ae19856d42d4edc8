"""TRUE multi-process training tests (VERDICT.md round-1 item 1).

Each test launches real OS processes that form one logical training run via
``jax.distributed.initialize`` over localhost — the execution model of a
TPU pod (one controller process per host) — with virtual CPU devices and
gloo cross-process collectives standing in for ICI/DCN. The GLOBAL device
count is held fixed (1 proc x 4 devices vs 2 procs x 2 devices), so the
compiled SPMD program is identical and only the process topology varies.

Covered:
  * a full multi-iteration train_mnk run over 2 processes (rollout, update,
    pool, validation, promotion, export) completing on both processes;
  * process-0-only I/O: exactly one metrics stream and one export tree;
  * 2-process result equals the single-process result at the same global
    mesh (collective-implementation numerics are the only difference —
    asserted to float tolerance, and bit-exactness is asserted for the
    integer-valued training telemetry);
  * cooperative orbax checkpoint + resume across 2 processes, bit-identical
    to the uninterrupted 2-process run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "tests", "mp_train_runner.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(workdir, run_name, num_processes, devices_per_proc, iters,
            checkpoint_interval=0, resume=False, timeout=600, fused=False,
            checkpoint_dir=None, preset=None):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={devices_per_proc}",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    procs = []
    for pid in range(num_processes):
        cmd = [
            sys.executable, RUNNER,
            "--process-id", str(pid),
            "--num-processes", str(num_processes),
            "--port", str(port),
            "--iters", str(iters),
            "--checkpoint-interval", str(checkpoint_interval),
            "--run-name", run_name,
            "--workdir", str(workdir),
        ]
        if resume:
            cmd.append("--resume")
        if fused:
            cmd.append("--fused")
        if checkpoint_dir:
            cmd.extend(["--checkpoint-dir", str(checkpoint_dir)])
        if preset:
            cmd.extend(["--preset", preset])
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=str(workdir),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    return outs


def _load_params(workdir, run_name, iteration):
    from flax import serialization

    path = os.path.join(
        str(workdir), "models", run_name, f"model_{iteration:05d}.msgpack"
    )
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _metric_lines(workdir, run_name):
    path = os.path.join(str(workdir), "runs", f"{run_name}.jsonl")
    return [json.loads(ln) for ln in open(path)]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    iters = 4
    _launch(tmp_path, "single", num_processes=1, devices_per_proc=4,
            iters=iters)
    outs = _launch(tmp_path, "double", num_processes=2, devices_per_proc=2,
                   iters=iters)

    # process-0-only I/O: one metric stream, one export tree, and the
    # non-coordinator process wrote nothing anywhere
    runs = os.listdir(tmp_path / "runs")
    assert sorted(runs) == ["double.jsonl", "single.jsonl"]
    exports = os.listdir(tmp_path / "models" / "double")
    assert f"model_{iters:05d}.msgpack" in exports

    # stdout belongs to the coordinator: the non-coordinator must not echo
    # per-iteration training lines or validation banners
    assert "Iter " in outs[0]
    assert "Iter " not in outs[1]
    assert "Running validation" not in outs[1]

    # training telemetry: env dynamics are integer-valued and must agree
    # exactly; learned scalars agree to collective-numerics tolerance
    m1 = [r for r in _metric_lines(tmp_path, "single") if "training/mean_reward" in r]
    m2 = [r for r in _metric_lines(tmp_path, "double") if "training/mean_reward" in r]
    assert len(m1) == len(m2) == iters
    for a, b in zip(m1, m2):
        assert a["_step"] == b["_step"]
        np.testing.assert_allclose(
            a["training/mean_reward"], b["training/mean_reward"], atol=1e-6
        )
        np.testing.assert_allclose(
            a["training/actor_loss"], b["training/actor_loss"],
            rtol=2e-4, atol=2e-5,
        )

    # final learned parameters agree across process topologies
    p1 = _load_params(tmp_path, "single", iters)
    p2 = _load_params(tmp_path, "double", iters)
    import jax

    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_leaves_with_path(p1),
        jax.tree_util.tree_leaves_with_path(p2),
    ):
        assert k1 == k2
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-5,
            err_msg=f"leaf {k1} diverged between 1-proc and 2-proc runs",
        )


@pytest.mark.slow
def test_two_process_fused_driver_process0_io(tmp_path):
    """The fused driver honors the same process-0-only I/O contract as the
    host loop: one metric stream, one export tree, coordinator-only stdout
    (train_fused.py coordinator gating)."""
    iters = 4
    outs = _launch(tmp_path, "fused2", num_processes=2, devices_per_proc=2,
                   iters=iters, fused=True)
    assert sorted(os.listdir(tmp_path / "runs")) == ["fused2.jsonl"]
    exports = os.listdir(tmp_path / "models" / "fused2")
    assert f"model_{iters:05d}.msgpack" in exports
    assert all(not f.endswith(".tmp") for f in exports)
    m = [r for r in _metric_lines(tmp_path, "fused2")
         if "training/mean_reward" in r]
    assert len(m) == iters
    assert "Iter " in outs[0]
    assert "Iter " not in outs[1]
    assert "Running validation" not in outs[1]


@pytest.mark.slow
def test_two_process_checkpoint_resume_bit_exact(tmp_path):
    """2-proc run checkpointing at iter 2 then resuming to 4 must equal the
    straight 2-proc 4-iter run bit-exactly (same collective implementation
    on both sides, so no numeric excuse). The save run is 3 iterations so
    the i=2 checkpoint actually lands (the cadence is ``i > 0 and
    i % interval == 0``: a 2-iteration run never checkpoints — this test
    was vacuous before round 3) and the resume is asserted, not assumed."""
    _launch(tmp_path, "straight", num_processes=2, devices_per_proc=2,
            iters=4)
    _launch(tmp_path, "resumed", num_processes=2, devices_per_proc=2,
            iters=3, checkpoint_interval=2)
    outs = _launch(tmp_path, "resumed", num_processes=2, devices_per_proc=2,
                   iters=4, checkpoint_interval=2, resume=True)
    assert "Resumed from checkpoint at iteration 3" in outs[0]

    pa = _load_params(tmp_path, "straight", 4)
    pb = _load_params(tmp_path, "resumed", 4)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_four_process_training_matches_single_process(tmp_path):
    """4 real processes x 1 device each form the same 4-device global mesh
    as the single-process run — the pod execution model at a deeper process
    fan-out than the 2-process tests (round-2 VERDICT item 2)."""
    import jax

    iters = 3
    _launch(tmp_path, "single4", num_processes=1, devices_per_proc=4,
            iters=iters)
    outs = _launch(tmp_path, "quad", num_processes=4, devices_per_proc=1,
                   iters=iters)

    # process-0-only I/O across all four processes
    assert sorted(os.listdir(tmp_path / "runs")) == [
        "quad.jsonl", "single4.jsonl"
    ]
    for out in outs[1:]:
        assert "Iter " not in out
        assert "Running validation" not in out
    assert "Iter " in outs[0]

    p1 = _load_params(tmp_path, "single4", iters)
    p4 = _load_params(tmp_path, "quad", iters)
    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_leaves_with_path(p1),
        jax.tree_util.tree_leaves_with_path(p4),
    ):
        assert k1 == k2
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-5,
            err_msg=f"leaf {k1} diverged between 1-proc and 4-proc runs",
        )


@pytest.mark.slow
def test_topology_change_resume(tmp_path):
    """Resizing a pod slice: a checkpoint saved under 2 processes resumes
    under 1 process AND under 4 processes (same 4-device global mesh —
    orbax reshards on restore to whatever layout the resuming template
    carries). Training continues from the saved iteration and the final
    parameters stay within collective-numerics tolerance of the
    fixed-topology run (round-2 VERDICT item 2)."""
    import jax

    ckpt = tmp_path / "ckpt" / "tcbase"
    # fixed-topology reference: 2 procs straight to 4 iterations
    _launch(tmp_path, "tcstraight", num_processes=2, devices_per_proc=2,
            iters=4)
    # save under 2 procs at iteration 2 (3 iterations so the i=2
    # checkpoint lands; iteration 2's post-checkpoint work is discarded
    # on resume, same as a real preemption)
    _launch(tmp_path, "tcbase", num_processes=2, devices_per_proc=2,
            iters=3, checkpoint_interval=2)
    # resume under 1 process (4 local devices) and under 4 processes
    # (1 local device each); checkpoint_interval stays 0 so both resumes
    # read the same shared checkpoint without writing back
    outs1 = _launch(tmp_path, "tc1", num_processes=1, devices_per_proc=4,
                    iters=4, resume=True, checkpoint_dir=ckpt)
    outs4 = _launch(tmp_path, "tc4", num_processes=4, devices_per_proc=1,
                    iters=4, resume=True, checkpoint_dir=ckpt)

    # both actually resumed (not restarted)
    assert "Resumed from checkpoint at iteration 3" in outs1[0]
    assert "Resumed from checkpoint at iteration 3" in outs4[0]
    for run in ("tc1", "tc4"):
        steps = [r["_step"] for r in _metric_lines(tmp_path, run)
                 if "training/mean_reward" in r]
        assert steps and min(steps) >= 16 * 8 * 4  # no pre-resume iterations

    ps = _load_params(tmp_path, "tcstraight", 4)
    for run in ("tc1", "tc4"):
        pr = _load_params(tmp_path, run, 4)
        for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(ps),
            jax.tree_util.tree_leaves_with_path(pr),
        ):
            assert k1 == k2
            np.testing.assert_allclose(
                a, b, rtol=2e-4, atol=2e-5,
                err_msg=f"leaf {k1} diverged resuming {run} from the "
                        "2-process checkpoint",
            )


@pytest.mark.slow
def test_config5_shape_two_processes(tmp_path):
    """BASELINE configs[4] SHAPE, executed for real (VERDICT r3 item 1c):
    13x13x5 at 32k envs over 2 real processes x 4 devices (gloo), recipe
    minibatch 4096 with the grouped shuffle, and the ZeRO sharded learner
    (reduce-scatter/all-gather collectives) engaged — two full iterations
    plus a validation/promotion pass. A 2-core-budget conv body stands in
    for the recipe network: the production shape surface under test is the
    env axis, board, minibatch and group math, not the FLOPs."""
    iters = 2
    outs = _launch(tmp_path, "cfg5", num_processes=2, devices_per_proc=4,
                   iters=iters, preset="config5", timeout=1500)
    # the sharded learner actually engaged (machine-checkable marker —
    # train.py logs learner/zero_sharded=1 only on the full ZeRO epoch
    # path: devices>1 + grouped + batch-stat-free)
    zs = [r for r in _metric_lines(tmp_path, "cfg5")
          if "learner/zero_sharded" in r]
    assert zs and zs[0]["learner/zero_sharded"] == 1
    assert "Iter " in outs[0] and "Iter " not in outs[1]

    rewards = [r for r in _metric_lines(tmp_path, "cfg5")
               if "training/mean_reward" in r]
    assert len(rewards) == iters
    for r in rewards:
        assert np.isfinite(r["training/actor_loss"])
        assert np.isfinite(r["training/mean_reward"])
    # per-iteration env-step accounting at the 32k shape
    assert rewards[0]["_step"] == 32768 * 4
    assert rewards[-1]["_step"] == 32768 * 4 * iters
