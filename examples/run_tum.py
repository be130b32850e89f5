#!/usr/bin/env python
"""TUM RGB-D demo driver.

Mirrors ``/root/reference/Example/interface/rgbd.cpp``:

    python examples/run_tum.py <settings.yaml> <dataset_dir> [options]

Loads the sequence + bbox detections, runs the full pipeline per frame
(ground-plane estimation, single-frame ellipsoid extraction with symmetry,
data association, SVD/3D initialization, global object-graph LM), and saves
``objects.txt`` / ``object_history.txt`` plus optional visualizations.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("dataset")
    ap.add_argument("--out", default=".", help="output directory")
    ap.add_argument("--no-depth", action="store_true",
                    help="2D-only pipeline (no ellipsoid extraction)")
    ap.add_argument("--no-symmetry", action="store_true")
    ap.add_argument("--auto-assoc", action="store_true",
                    help="automatic data association instead of column 7")
    ap.add_argument("--odometry", default=None,
                    help="odometry txt (ts x y z qx qy qz qw)")
    ap.add_argument("--map-format", default="ply", choices=["ply", "pcd"],
                    help="dense-map export format (pcd = the reference's "
                         "pcl::io::savePCDFile, builder.cpp:121-125)")
    ap.add_argument("--build-dense", action="store_true",
                    help="accumulate a dense colored map (PLY)")
    ap.add_argument("--viz", action="store_true",
                    help="save per-frame renders + final map image")
    ap.add_argument("--viz-live", type=int, default=0, metavar="N",
                    help="every N frames atomically rewrite "
                         "<out>/live.html (a self-reloading WebGL map "
                         "view; open it in a browser during the run)")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--extractor", default="auto",
                    choices=["auto", "mono", "split", "fused"],
                    help="extraction architecture: auto = probe the "
                         "device link RTT at startup and pick (default; "
                         "high-latency tunnel -> mono, local device -> "
                         "fused + LM fusion); mono = one device "
                         "program incl. on-device clustering; "
                         "split/fused = host-side native grid-hash "
                         "clustering between two device phases (fused "
                         "keeps one program per frame)")
    ap.add_argument("--checkpoint", default=None,
                    help="save state checkpoint at the end")
    ap.add_argument("--resume", default=None,
                    help="resume from a state checkpoint (skips the "
                         "frames it already processed)")
    ap.add_argument("--slam-mode", action="store_true",
                    help="after the run, jointly refine trajectory + "
                         "objects (the reference's bSLAM_mode, "
                         "Optimizer.cpp:126-158) and save "
                         "trajectory_refined.txt / objects_slam.txt")
    ap.add_argument("--slam-max-frames", type=int, default=None,
                    metavar="F",
                    help="--slam-mode frame window; default unbounded "
                         "(grow-only capacity tiers sized from the run, "
                         "like the reference's unbounded graph loops, "
                         "Optimizer.cpp:126-158)")
    ap.add_argument("--slam-max-objects", type=int, default=None,
                    metavar="K",
                    help="--slam-mode object cap; default unbounded")
    ap.add_argument("--odo-weight", type=float, default=1.0,
                    help="odometry sqrt-information for --slam-mode; the "
                         "reference uses identity information "
                         "(Optimizer.cpp:153-156), which lets pixel-scale "
                         "projection residuals dominate -- raise this "
                         "when the input trajectory is accurate")
    ap.add_argument("--pipeline-depth", type=int, default=0, metavar="N",
                    help="pin the extraction-deferral window (1=eager; "
                         "default: adaptive, 4 deepening to 8 on blocked "
                         "fetches). Pinning disables adaptation.")
    ap.add_argument("--distributed", action="store_true",
                    help="shard the backend BA over all devices "
                         "(multi-host via JAX_COORDINATOR_ADDRESS/"
                         "JAX_NUM_PROCESSES/JAX_PROCESS_ID)")
    ap.add_argument("--offline", action="store_true",
                    help="throughput mode: batch frames' extraction into "
                         "one device program each (system/offline.py); "
                         "same results as the sequential loop, much "
                         "higher frames/s on recorded sequences. "
                         "Requires depth (not --no-depth).")
    ap.add_argument("--batch", type=int, default=8, metavar="B",
                    help="frames per batched extraction program in "
                         "--offline mode (default 8)")
    ap.add_argument("--offline-shard", action="store_true",
                    help="shard the --offline detection batches over "
                         "all devices (data parallelism)")
    ap.add_argument("--offline-split", action="store_true",
                    help="--offline with the device-A/host-cluster/"
                         "device-B split protocol (best on low-latency "
                         "links; the default monolithic program wins on "
                         "tunneled devices)")
    ap.add_argument("--offline-per-frame-ba", action="store_true",
                    help="--offline with the reference's per-frame "
                         "global BA schedule instead of one BA per "
                         "batch (slower, per-frame history granularity)")
    args = ap.parse_args()

    if args.distributed:
        # must run before any other jax use on a multi-host slice
        from object_oriented_slam_tpu.parallel.multihost import initialize
        if initialize():
            print("jax.distributed initialized")

    import numpy as np
    from object_oriented_slam_tpu.core.camera import Camera
    from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                                   make_extractor,
                                                   make_plane_estimator)
    from object_oriented_slam_tpu.io import Config, TUMDataset
    from object_oriented_slam_tpu.system import System
    from object_oriented_slam_tpu.system.metrics import timing_summary

    cfg = Config(args.settings)
    cam = Camera(fx=cfg.get_float("Camera.fx"), fy=cfg.get_float("Camera.fy"),
                 cx=cfg.get_float("Camera.cx"), cy=cfg.get_float("Camera.cy"),
                 scale=cfg.get_float("Camera.scale"),
                 width=cfg.get_int("Camera.width", 640),
                 height=cfg.get_int("Camera.height", 480))

    ds = TUMDataset(args.dataset)
    if args.odometry:
        ds.set_odometry(args.odometry)

    extractor = None
    plane_est = None
    if not args.no_depth:
        open_sym = (not args.no_symmetry
                    and cfg.get_int("EllipsoidExtraction.Symmetry.Open") == 1)
        ext_cfg = ExtractorConfig(
            depth_range=cfg.read_value("EllipsoidExtractor_DEPTH_RANGE", 6.0),
            cluster_tolerance=cfg.get_float(
                "EllipsoidExtraction.Euclidean.ClusterTolerance", 0.02),
            cluster_min_size=cfg.get_int(
                "EllipsoidExtraction.Euclidean.MinClusterSize", 100),
            cluster_center_dis=cfg.get_float(
                "EllipsoidExtraction.Euclidean.CenterDis", 0.5),
            sym_grid=cfg.get_float("EllipsoidExtraction.Symmetry.GridSize",
                                   0.1),
            open_symmetry=open_sym)
        fuse_lm = False
        choice = args.extractor
        if choice == "auto":
            # probe-driven selection (BENCH_DETAILS round-2 A/B turned
            # into shipped behavior): measured link RTT picks mono
            # (tunnel) vs fused-split + LM fusion (local device)
            from object_oriented_slam_tpu.system.probe import (
                choose_architecture, probe_device_rtt_ms)
            rtt = probe_device_rtt_ms()
            choice, fuse_lm = choose_architecture(rtt)
            print(f"probed device RTT {rtt:.2f} ms -> extractor="
                  f"{choice}, fuse_lm={fuse_lm}")
        if choice == "mono":
            extractor = make_extractor(cam, ext_cfg)
        elif choice == "split":
            from object_oriented_slam_tpu.frontend import \
                make_split_extractor
            extractor = make_split_extractor(cam, ext_cfg)
        else:
            from object_oriented_slam_tpu.frontend import \
                make_fused_extractor
            extractor = make_fused_extractor(cam, ext_cfg)
        plane_est = make_plane_estimator(cam)

    slam = System(args.settings, extractor=extractor,
                  plane_estimator=plane_est)
    if args.pipeline_depth > 0:
        slam.tracker.pipeline_depth = args.pipeline_depth
        slam.tracker.adaptive_depth = False
    if not args.no_depth:
        slam.open_ground_plane_estimation()
        if fuse_lm:
            slam.tracker.fuse_lm = True
    if args.distributed:
        slam.open_distributed_backend()
        print("backend sharded over", end=" ")
        import jax
        print(f"{len(jax.devices())} device(s)")

    # dense builder: the Visualization.Builder.Open config key drives it
    # inside Tracking (Tracking.cpp:234-250); --build-dense forces it on
    builder = slam.tracker.dense_builder
    external_builder = False
    if args.build_dense and builder is None:
        from object_oriented_slam_tpu.system.dense_builder import DenseBuilder
        builder = DenseBuilder(cam)
        external_builder = True

    skip = 0
    if args.resume:
        from object_oriented_slam_tpu.system.checkpoint import load_state
        st = load_state(args.resume)
        slam.tracker.restore_state(st)
        skip = len(st.frames_ts)
        print(f"Resumed from {args.resume}: {skip} frames, "
              f"{len(st.objects)} instances")

    os.makedirs(args.out, exist_ok=True)

    if args.offline:
        if args.no_depth or extractor is None:
            ap.error("--offline requires the depth pipeline")
        from object_oriented_slam_tpu.system.offline import OfflineMapper
        mesh = None
        if args.offline_shard:
            import jax
            from jax.sharding import Mesh
            devs = np.array(jax.devices())
            mesh = Mesh(devs, ("frames",))
            print(f"offline frame batches sharded over {len(devs)} device(s)")
        mapper = OfflineMapper(slam, cam, ext_cfg, batch_size=args.batch,
                               with_association=not args.auto_assoc,
                               mesh=mesh, split=args.offline_split,
                               backend_per_batch=not
                               args.offline_per_frame_ba)

        def frames_limited():
            for k, rec in enumerate(ds.frames()):
                if args.max_frames and k >= args.max_frames:
                    return
                yield rec

        stats = mapper.run(frames_limited())
        print(f"Offline: {stats['frames']} frames in "
              f"{stats['seconds']:.1f}s ({stats['fps']:.2f} fps, "
              f"{stats['batches']} batched programs of {args.batch})")
    else:
        _online_loop(args, slam, ds, cam, builder, external_builder, skip)
    _save_outputs(args, slam, builder, cam)


def _online_loop(args, slam, ds, cam, builder, external_builder, skip):
    import time

    import numpy as np
    from object_oriented_slam_tpu.system.metrics import timing_summary

    t0 = time.time()
    n = 0
    n_seen = 0
    last_panels = None
    for i, ts, pose, depth, rgb, det in ds.frames():
        n_seen += 1
        if n_seen <= skip:
            continue
        slam.track_with_objects(ts, pose, det, depth=depth, rgb=rgb,
                                with_association=not args.auto_assoc)
        if external_builder:
            builder.process_frame(rgb, depth, pose)
        if args.viz and rgb is not None:
            from object_oriented_slam_tpu.viz.export import draw_frame
            import cv2
            img = draw_frame(rgb, det, slam.map_objects, pose, cam.K)
            cv2.imwrite(os.path.join(args.out, f"frame_{i:04d}.png"), img)
        n += 1
        if args.viz_live and n % args.viz_live == 0:
            from object_oriented_slam_tpu.viz.web_viewer import (
                export_live_snapshot, frame_panels)
            last_panels = frame_panels(
                rgb=rgb, depth=depth, det_mat=det,
                map_objects=slam.map_objects, pose_wc=pose, K=cam.K,
                depth_scale=cam.scale)
            export_live_snapshot(args.out, slam.tracker.state, n,
                                 image_panels=last_panels)
        if n % 10 == 0:
            print(f"frame {n} ({time.time() - t0:.1f}s)", flush=True)
        if args.max_frames and n >= args.max_frames:
            break
    dt = time.time() - t0
    if args.viz_live:
        from object_oriented_slam_tpu.viz.web_viewer import \
            export_live_snapshot
        slam.tracker.sync()
        export_live_snapshot(args.out, slam.tracker.state, n,
                             image_panels=last_panels)
    print(f"Processed {n} frames in {dt:.1f}s ({n / dt:.2f} fps)")
    print("Timing:", timing_summary(slam.tracker.metrics))
    trace = slam.tracker.depth_trace
    if trace and max(trace) != min(trace):
        print(f"Pipeline depth (adaptive): start {trace[0]} "
              f"final {trace[-1]} max {max(trace)}")
    return n


def _save_outputs(args, slam, builder, cam):
    import numpy as np

    slam.save_objects_to_file(os.path.join(args.out, "objects.txt"))
    slam.save_object_history(os.path.join(args.out, "object_history.txt"))
    print("Objects:")
    for inst, v in slam.map_objects.items():
        print(f"  #{inst}: {np.round(v, 4)}")

    if builder is not None:
        ext = "pcd" if args.map_format == "pcd" else "ply"
        builder.save_map(os.path.join(args.out, f"map.{ext}"))
        print(f"Saved dense map.{ext}")
    if args.viz:
        from object_oriented_slam_tpu.viz.export import render_map
        traj = np.stack(slam.tracker.state.frames_pose_wc)[:, :3]
        cloud = builder.get_map()[0] if builder is not None else None
        render_map(slam.map_objects, traj,
                   slam.tracker.state.ground_plane, cloud,
                   os.path.join(args.out, "map.png"))
        print("Saved map.png")
    if args.checkpoint:
        from object_oriented_slam_tpu.system.checkpoint import save_state
        save_state(slam.tracker.state, args.checkpoint)
        print(f"Saved checkpoint to {args.checkpoint}")

    if args.slam_mode:
        from object_oriented_slam_tpu.backend.lm import LMConfig
        from object_oriented_slam_tpu.io.writers import save_objects
        from object_oriented_slam_tpu.system.slam_mode import run_slam_mode
        st = slam.tracker.state
        poses_ref, obj_ref, chi2 = run_slam_mode(
            st, slam.tracker.K, LMConfig(iters=10),
            max_frames=args.slam_max_frames,
            max_objects=args.slam_max_objects,
            odo_weight=args.odo_weight)
        with open(os.path.join(args.out, "trajectory_refined.txt"),
                  "w") as f:
            for ts, p in zip(st.frames_ts, poses_ref):
                f.write(" ".join([f"{ts:.6f}"] + [f"{v:.9f}" for v in p])
                        + "\n")
        insts = sorted(obj_ref)
        save_objects(os.path.join(args.out, "objects_slam.txt"), insts,
                     np.stack([obj_ref[i] for i in insts]).reshape(-1, 10))
        print(f"SLAM mode: refined {len(poses_ref)} poses, "
              f"{len(obj_ref)} objects (chi2 {chi2:.4g})")


if __name__ == "__main__":
    main()
