"""Worker process for the 2-process CPU-cluster multi-host smoke test.

Each worker owns 2 virtual CPU devices, joins the cluster via
``initialize_multi_host`` (the same call a real multi-host TPU slice makes,
reference has no analogue — SURVEY.md §2 DP plan), then runs the full
sharded training step over the process-spanning 4-device mesh via
``__graft_entry__.dryrun_multichip``.
"""

import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    # Must precede backend init AND distributed init (same ordering rule the
    # driver contract hit in round 1 — see __graft_entry__.dryrun_multichip).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from flownet4d_tpu.parallel.mesh import initialize_multi_host

    initialize_multi_host(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    import __graft_entry__

    __graft_entry__.dryrun_multichip(2 * nproc)

    # Preemption consensus: SIGTERM lands on worker 0 only; the collective
    # stop check must still make EVERY process take the stop branch (a
    # host-local break would desync the mesh program and deadlock).
    from flownet4d_tpu.training.trainer import TrainerController

    tc = object.__new__(TrainerController)  # only the flag + the method
    tc._stop_requested = pid == 0
    # Off-cadence batch: no collective, never breaks on the local flag.
    assert TrainerController._sync_stop_requested(tc, 3) is False
    # Consensus batch (i % 16 == 0): allgather -> both processes stop.
    assert TrainerController._sync_stop_requested(tc, 16) is True
    print(f"SYNC_STOP_OK pid={pid}")

    # Loop-exit consensus (_stop_consensus): a SIGTERM landing in the tail
    # batches (i % 16 != 0) or during validation must still reach every
    # host unconditionally before the epoch-boundary branch (ADVICE r3).
    tc2 = object.__new__(TrainerController)
    tc2._stop_requested = pid == 1  # the OTHER host this time
    assert TrainerController._stop_consensus(tc2) is True
    assert tc2._stop_requested is True
    tc3 = object.__new__(TrainerController)
    tc3._stop_requested = False  # nobody signaled: consensus must be False
    assert TrainerController._stop_consensus(tc3) is False
    print(f"STOP_CONSENSUS_OK pid={pid}")
    print(f"MULTIHOST_OK pid={pid}")


if __name__ == "__main__":
    main()
