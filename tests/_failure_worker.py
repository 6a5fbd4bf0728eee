"""Failure-injection worker for tests/test_multihost.py.

Mechanical elastic-recovery scenario (SURVEY.md §5 failure detection —
the reference's only story is a cooperative cancel flag,
core/icpengine.cpp:62-66,160-164; a distributed framework must also
survive a peer dying WITHOUT cooperation):

mode "run" (2 processes):
  1. Both processes first run an UNINTERRUPTED segmented registration;
     process 0 prints the full-precision trajectory (the reference the
     resumed run must reproduce).
  2. The same registration runs again with a rolling segment checkpoint
     on process 0; process 1 SIGKILLs itself between segments (iteration
     6 of 12) — no cleanup, no cooperative flag, exactly a preempted or
     crashed host. Process 0 blocks in the next segment's collective
     until the JAX coordination service's heartbeat detector
     (``heartbeat_timeout_seconds``) notices the dead peer and
     terminates it with a "task died" diagnostic — surfaced failure,
     not a hang.

mode "resume" (1 process over 4 local devices) / mode "resume2" (two
fresh processes — the failed host REPLACED, identical topology):
  Reform the mesh, load the rolling checkpoint and continue. The
  convergence carry restores the exact loop state; the continuation is
  bit-identical to the uninterrupted run when the reformed mesh has the
  SAME topology (the real pod-recovery shape — psum partial order is
  preserved), and agrees to ~ULP (1e-12) when the process layout
  changes (same shard count, different reduction tree — measured
  ~5e-15 between 2proc×2dev Gloo and 1proc×4dev local collectives).
"""

import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES_GLOBAL = 4
KILL_AT_ITERATION = 6
MAX_ITERATIONS = 12
SEGMENT_ITERATIONS = 3


def _traj_payload(res) -> str:
    import numpy as np

    return json.dumps({
        "rmse": [float(r).hex() for r in np.asarray(res.history_rmse)],
        "transform": [float(v).hex()
                      for v in np.asarray(res.transform).ravel()],
        "iterations": int(res.iterations),
        "message": res.message,
    })


def main() -> int:
    mode = sys.argv[1]
    ckpt_path = sys.argv[2]

    import numpy as np

    if mode in ("run", "resume2"):
        pid = int(sys.argv[3])
        nproc = int(sys.argv[4])
        port = sys.argv[5]
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count="
            f"{N_DEVICES_GLOBAL // nproc}"
        )
    else:
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={N_DEVICES_GLOBAL}"
        )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from iterativeclosestpoint_tpu.parallel.mesh import init_multihost
    from iterativeclosestpoint_tpu.parallel.sharded import (
        icp_register_sharded,
    )
    from iterativeclosestpoint_tpu.runtime.checkpoint import (
        load_checkpoint,
        resume_arguments,
        save_checkpoint,
    )
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    src, tgt, _ = make_registration_pair(n=1001, seed=50, noise_sigma=0.02)
    kwargs = dict(
        dtype=jnp.float64, nn_backend="bruteforce",
        max_iterations=MAX_ITERATIONS,
        segment_iterations=SEGMENT_ITERATIONS, return_registered=False,
    )

    if mode in ("resume", "resume2"):
        if mode == "resume":
            # Reformed mesh: one process, same global shard count.
            mesh = init_multihost(num_processes=1)
            pid = 0
        else:
            # Reformed mesh: the dead process REPLACED by a fresh one —
            # identical topology, identical psum partial order.
            mesh = init_multihost(
                coordinator_address=f"127.0.0.1:{port}",
                num_processes=nproc, process_id=pid,
                heartbeat_timeout_seconds=10,
            )
        assert mesh.devices.size == N_DEVICES_GLOBAL, mesh.devices.shape
        ckpt = load_checkpoint(ckpt_path)
        assert ckpt["iteration"] == KILL_AT_ITERATION, ckpt["iteration"]
        patch = resume_arguments(ckpt, MAX_ITERATIONS)
        assert "resume_carry" in patch, patch  # full carry, not pose-only
        res = icp_register_sharded(src, tgt, mesh=mesh,
                                   **{**kwargs, **patch})
        if pid == 0:
            print("RESUMED " + _traj_payload(res), flush=True)
        return 0

    # mode == "run"
    mesh = init_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
        heartbeat_timeout_seconds=10,  # fast failed-host detection bound
    )
    assert mesh.devices.size == N_DEVICES_GLOBAL, mesh.devices.shape

    # 1. Uninterrupted reference on the SAME mesh.
    res_u = icp_register_sharded(src, tgt, mesh=mesh, **kwargs)
    if pid == 0:
        print("UNINTERRUPTED " + _traj_payload(res_u), flush=True)

    # 2. Failure run: rolling checkpoint on process 0, SIGKILL on
    #    process 1 between segments.
    def segment_cb(state):
        if pid == 0:
            save_checkpoint(
                ckpt_path,
                iteration=state["iteration"],
                transform=state["transform"],
                rmse_history=[],
                prev_error=state["prev_error"],
                no_improve=state["no_improve"],
                transform_local=state["transform_local"],
                center_offset=state["offset"],
            )
            print(f"CHECKPOINT {state['iteration']}", flush=True)
        elif state["iteration"] >= KILL_AT_ITERATION:
            print("SELF_SIGKILL", flush=True)
            os.kill(os.getpid(), signal.SIGKILL)

    icp_register_sharded(src, tgt, mesh=mesh, segment_callback=segment_cb,
                         **kwargs)
    # Only the killed process's peer should ever get here — and it must
    # NOT: the coordination service aborts it first. Reaching this line
    # on process 0 means detection failed.
    print("UNEXPECTED_COMPLETION", flush=True)
    return 3


if __name__ == "__main__":
    sys.exit(main())
