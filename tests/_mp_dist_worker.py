"""Worker process for the real 2-process jax.distributed test.

Run as:  python _mp_dist_worker.py <coordinator> <num_procs> <proc_id> <out.npz>

Each process owns 4 virtual CPU devices; together they form one global
8-device mesh.  The worker executes the REAL multi-process init path
(``multihost.initialize`` -> ``jax.distributed.initialize`` over DCN/grpc),
builds a global observation-sharded batch, runs one distributed BA call,
and saves the replicated result plus a locally computed single-process
reference for the parent test to compare.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    coordinator, nproc, pid, out = (sys.argv[1], int(sys.argv[2]),
                                    int(sys.argv[3]), sys.argv[4])
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from object_oriented_slam_tpu.parallel.multihost import (
        initialize, observation_mesh)

    assert initialize(coordinator=coordinator, num_processes=nproc,
                      process_id=pid), "initialize() must report active"
    assert jax.process_count() == nproc
    assert jax.process_index() == pid
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc      # global device view

    from test_dist_lm import make_workload
    from object_oriented_slam_tpu.backend import LMConfig, optimize_objects
    from object_oriented_slam_tpu.parallel import optimize_objects_sharded

    gt, obs = make_workload()
    cfg = LMConfig(gravity_on=True, gravity_scale=10.0)
    from test_backend_lm import K
    normal = np.array([0, 0, 1], np.float32)

    # local single-process reference (pure local arrays, no mesh)
    est_s, chi2_s = optimize_objects(obs, jnp.asarray(K),
                                     jnp.asarray(normal), True, cfg)

    # build GLOBAL arrays for the multi-process mesh: data is replicated
    # on every host, the callback hands each device its shard
    mesh = observation_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    def gshard(x, spec):
        x = np.asarray(x)
        s = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    obs_g = obs._replace(
        est0=gshard(obs.est0, P()),
        obj_mask=gshard(obs.obj_mask, P()),
        pose2d_cw=gshard(obs.pose2d_cw, P(None, "obs", None)),
        bbox2d=gshard(obs.bbox2d, P(None, "obs", None)),
        prob2d=gshard(obs.prob2d, P(None, "obs")),
        mask2d=gshard(obs.mask2d, P(None, "obs")),
        pose3d_wc=gshard(obs.pose3d_wc, P(None, "obs", None)),
        meas3d=gshard(obs.meas3d, P(None, "obs", None)),
        prob3d=gshard(obs.prob3d, P(None, "obs")),
        mask3d=gshard(obs.mask3d, P(None, "obs")),
    )
    est_d, chi2_d = optimize_objects_sharded(
        obs_g, gshard(K, P()), gshard(normal, P()), True, mesh, cfg)

    # outputs are replicated -> fully addressable on every process
    np.savez(out, est_d=np.asarray(est_d), chi2_d=np.asarray(chi2_d),
             est_s=np.asarray(est_s), chi2_s=np.asarray(chi2_s), gt=gt)
    jax.distributed.shutdown()
    print("WORKER_OK", pid)


if __name__ == "__main__":
    main()
