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
    print(f"MULTIHOST_OK pid={pid}")


if __name__ == "__main__":
    main()
