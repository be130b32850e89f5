"""Kernel tests: backprojection, voxel downsample, clustering, PCA."""
import jax.numpy as jnp
import numpy as np

from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.ops import backproject as bp
from object_oriented_slam_tpu.ops import cluster as cl
from object_oriented_slam_tpu.ops import pca as pca_mod
from object_oriented_slam_tpu.ops import voxel as vx

RNG = np.random.default_rng(7)
CAM = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0)


def test_bbox_point_cloud_matches_loop():
    depth = RNG.integers(0, 20000, (480, 640)).astype(np.uint16)
    bbox = np.array([100.0, 120.0, 220.0, 260.0], np.float32)
    pts, mask = bp.bbox_point_cloud(jnp.asarray(depth.astype(np.int32)),
                                    jnp.asarray(bbox), CAM, 6.0)
    pts, mask = np.asarray(pts), np.asarray(mask)

    # reference loop semantics (PointCloudFilter.cpp:21-56)
    ref = []
    for y in range(120, 260, 3):
        for x in range(100, 220, 3):
            z = depth[y, x] / CAM.scale
            if z <= 0.1 or z > 6.0:
                continue
            ref.append([(x - CAM.cx) * z / CAM.fx,
                        (y - CAM.cy) * z / CAM.fy, z])
    ref = np.array(ref)
    got = pts[mask]
    assert got.shape == ref.shape
    assert np.allclose(np.sort(got, axis=0), np.sort(ref, axis=0), atol=1e-4)


def test_center_estimate():
    # flat plane at 2m depth
    depth = np.full((480, 640), int(2.0 * CAM.scale), np.uint16)
    bbox = np.array([200.0, 200, 400, 300], np.float32)
    c, ok = bp.center_estimate(jnp.asarray(depth.astype(np.int32)),
                               jnp.asarray(bbox), CAM, 6.0)
    assert bool(ok)
    c = np.asarray(c)
    assert abs(c[2] - 2.0) < 1e-3
    # center of bbox is (300, 250) -> near optical axis
    assert abs(c[0] - (300 - CAM.cx) * 2 / CAM.fx) < 0.02
    assert abs(c[1] - (250 - CAM.cy) * 2 / CAM.fy) < 0.02


def test_proj_depth_map():
    depth = np.full((480, 640), 1000, np.uint16)
    pd = np.asarray(bp.proj_depth_map(jnp.asarray(depth.astype(np.int32)), CAM))
    # at the principal point the correction is ~1
    assert abs(pd[248, 320] - 1000) < 2
    # at corners it is larger
    assert pd[0, 0] > 1100


def test_voxel_downsample():
    # two tight clumps far apart -> exactly 2 output cells at coarse leaf
    a = RNG.uniform(-0.004, 0.004, (50, 3)) + np.array([0.55, 0.55, 0.55])
    b = RNG.uniform(-0.004, 0.004, (30, 3)) + np.array([2.55, 0.55, 0.55])
    pts = np.concatenate([a, b]).astype(np.float32)
    mask = np.ones(80, bool)
    out, omask = vx.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask),
                                     leaf=0.1, capacity=16)
    out, omask = np.asarray(out), np.asarray(omask)
    assert omask.sum() == 2
    cells = out[omask]
    got = cells[np.argsort(cells[:, 0])]
    assert np.allclose(got[0], a.mean(0), atol=1e-3)
    assert np.allclose(got[1], b.mean(0), atol=1e-3)


def test_voxel_mask_respected():
    pts = RNG.normal(0, 1, (100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[:10] = True
    out, omask = vx.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask),
                                     leaf=0.01, capacity=64)
    assert np.asarray(omask).sum() <= 10


def _ref_components(pts, mask, tol):
    """Union-find reference for connected components."""
    n = len(pts)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not mask[i]:
            continue
        for j in range(i + 1, n):
            if not mask[j]:
                continue
            if np.linalg.norm(pts[i] - pts[j]) <= tol:
                pi, pj = find(i), find(j)
                if pi != pj:
                    parent[max(pi, pj)] = min(pi, pj)
    return [find(i) if mask[i] else n for i in range(n)]


def test_connected_components_vs_union_find():
    # three chains/clumps with gaps
    c1 = np.stack([np.linspace(0, 0.5, 30), np.zeros(30), np.zeros(30)], 1)
    c2 = np.stack([np.linspace(2, 2.3, 20), np.zeros(20), np.zeros(20)], 1)
    c3 = RNG.normal(0, 0.005, (25, 3)) + np.array([5, 5, 5])
    pts = np.concatenate([c1, c2, c3]).astype(np.float32)
    n = len(pts)
    mask = np.ones(n, bool)
    mask[5] = False  # hole in chain 1 splits it? gap 0.017 * 2 < tol, still connected

    labels = np.asarray(cl.connected_components(jnp.asarray(pts),
                                                jnp.asarray(mask), 0.05))
    ref = np.asarray(_ref_components(pts, mask, 0.05))
    # same partition (labels are representative indices; compare partitions)
    for lab in [labels, ref]:
        pass
    import collections
    part_a = collections.defaultdict(set)
    part_b = collections.defaultdict(set)
    for i in range(n):
        if mask[i]:
            part_a[labels[i]].add(i)
            part_b[ref[i]].add(i)
    assert sorted(map(frozenset, part_a.values())) == \
        sorted(map(frozenset, part_b.values()))


def test_select_cluster_semantics():
    # big cluster far from center, small cluster near center
    big = RNG.normal(0, 0.01, (200, 3)) + np.array([3.0, 0, 0])
    small = RNG.normal(0, 0.01, (120, 3))
    pts = np.concatenate([big, small]).astype(np.float32)
    mask = np.ones(len(pts), bool)
    labels = cl.connected_components(jnp.asarray(pts), jnp.asarray(mask), 0.1)
    center = jnp.asarray(np.zeros(3, np.float32))
    sel, ok = cl.select_cluster(jnp.asarray(pts), jnp.asarray(mask), labels,
                                center, min_size=100, center_dis=0.5)
    sel, ok = np.asarray(sel), bool(ok)
    assert ok
    # selected = the near (small) cluster
    assert sel[200:].all() and not sel[:200].any()

    # min_size filters the small one out -> no near cluster, but big remains
    # as the single cluster -> fallback accepts it
    sel2, ok2 = cl.select_cluster(jnp.asarray(pts), jnp.asarray(mask), labels,
                                  center, min_size=150, center_dis=0.5)
    sel2, ok2 = np.asarray(sel2), bool(ok2)
    assert ok2 and sel2[:200].all() and not sel2[200:].any()


def test_masked_pca_matches_numpy():
    pts = RNG.normal(0, 1, (300, 3)).astype(np.float32) @ \
        np.diag([2.0, 0.5, 0.1]).astype(np.float32)
    pts = pts + np.array([1.0, -2.0, 3.0], np.float32)
    mask = np.ones(300, bool)
    mask[250:] = False
    res = pca_mod.masked_pca(jnp.asarray(pts), jnp.asarray(mask))
    sub = pts[:250].astype(np.float64)
    c_ref = sub.mean(0)
    cov_ref = (sub - c_ref).T @ (sub - c_ref) / 250
    vals_ref = np.sort(np.linalg.eigvalsh(cov_ref))
    assert np.allclose(np.asarray(res.center), c_ref, atol=1e-4)
    assert np.allclose(np.asarray(res.eigvals), vals_ref, rtol=1e-3, atol=1e-5)


def test_align_z_to_gravity():
    rot = np.asarray(pca_mod.adjust_chirality(jnp.eye(3)))
    vals = jnp.asarray(np.array([0.1, 0.2, 0.3], np.float32))
    # gravity along -y: column 1 (y) should become z with flipped sign
    z = jnp.asarray(np.array([0.0, -1.0, 0.0], np.float32))
    new_rot, new_vals = pca_mod.align_z_to_gravity(jnp.asarray(rot), vals, z)
    new_rot = np.asarray(new_rot)
    assert np.allclose(new_rot[:, 2], [0, -1, 0], atol=1e-6)
    assert abs(np.linalg.det(new_rot) - 1) < 1e-5
    assert abs(float(new_vals[2]) - 0.2) < 1e-6


def test_calibrate_to_normal():
    rot = np.eye(3, dtype=np.float32)
    normal = np.array([0.1, 0.0, 1.0], np.float32)
    normal /= np.linalg.norm(normal)
    out = np.asarray(pca_mod.calibrate_to_normal(jnp.asarray(rot),
                                                 jnp.asarray(normal)))
    assert np.allclose(out[:, 2], normal, atol=1e-5)
    assert abs(np.linalg.det(out) - 1) < 1e-5


def test_chain_seed_converges_dense_blob():
    """Dense-blob topology where plain min-label propagation exceeds any
    practical round bound: the sorted-chain seeding must still reach the
    exact components within the extractor's 16-round budget."""
    from object_oriented_slam_tpu.ops import cluster as cl
    rng = np.random.default_rng(0)
    N = 2048
    pts = np.concatenate([
        rng.uniform(0, 1.0, (1500, 3)) * [1.0, 0.5, 0.7],
        rng.normal([2, 0, 0], 0.05, (400, 3)),
        rng.uniform(-5, 5, (148, 3))]).astype(np.float32)
    mask = np.ones(N, bool)
    mask[-40:] = False
    lab = np.asarray(cl.connected_components(
        jnp.asarray(pts), jnp.asarray(mask), 0.05, outer_iters=16))

    # exact union-find over the identical centered-expansion adjacency
    c = pts[mask].mean(0)
    pc = np.where(mask[:, None], pts - c, 0)
    nrm = (pc * pc).sum(1)
    parent = np.arange(N)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    tol2 = np.float32(0.05) * np.float32(0.05)
    for i in range(N):
        if not mask[i]:
            continue
        d2 = (nrm[i] + nrm - 2 * (pc @ pc[i])).astype(np.float32)
        for j in np.where((d2 <= tol2) & mask)[0]:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    gt = np.array([find(i) if mask[i] else N for i in range(N)])
    assert (lab == gt).all()


def test_connected_components_compact_identical():
    """The compacted clustering path (cluster only the unmasked points
    when they fit in compact_cap lanes; lax.cond fallback otherwise)
    must produce labels identical to the full-width pass in BOTH
    regimes."""
    from object_oriented_slam_tpu.ops import cluster as cl
    rng = np.random.default_rng(5)
    N = 2048
    for frac in (0.3, 0.7):       # below / above the 50% compact cap
        pts = rng.normal(0, 1.0, (N, 3)).astype(np.float32)
        for k in range(4):        # dense blobs -> nontrivial components
            c = rng.normal(0, 2, 3)
            pts[k * 300:k * 300 + 300] = c + rng.normal(
                0, 0.015, (300, 3))
        mask = rng.random(N) < frac
        a = np.asarray(cl.connected_components(
            jnp.asarray(pts), jnp.asarray(mask), 0.05, outer_iters=48))
        b = np.asarray(cl.connected_components_compact(
            jnp.asarray(pts), jnp.asarray(mask), 0.05, outer_iters=48,
            compact_cap=N // 2))
        assert np.array_equal(a, b), frac
        # the 3/4-N middle tier (frontend._cluster_select_batch) maps
        # labels identically too; 0.7N survivors land in (N/2, 3N/4]
        # where the tier engages.  (Measured dormant on cabinet: device
        # survivors are 5-6.6k at the 16384 tier, always under N/2 —
        # BENCH_DETAILS round 5.)
        # every ladder rung of frontend._cluster_select_batch maps
        # labels identically (rungs are chosen with sum(mask) <= cap;
        # 0.3N survivors fit all of these, 0.7N only the 3/4 rung) —
        # including the finer 1024-aligned rungs added round 5, which
        # tile the distance pass at 1024 rows instead of _BLOCK
        # (labels are tiling-invariant).  (The ladder was measured to
        # move cabinet's 5-6.6k-survivor frames off the 8192 rung —
        # BENCH_DETAILS round 5.)
        for cap in (N // 4, (5 * N) // 16, (3 * N) // 8, (7 * N) // 16,
                    N // 2, (3 * N) // 4):
            if int(mask.sum()) > cap:
                continue
            blk = None if cap % 2048 == 0 else 1024
            c = np.asarray(cl.components_compacted(
                jnp.asarray(pts), jnp.asarray(mask), 0.05, 48, 12, cap,
                block=blk))
            assert np.array_equal(a, c), (frac, cap)


def test_connected_components_chain_variants_identical():
    """All ``chains`` settings (0 = none, -1 = pre-round-5 single seed,
    1/3 = seeded + interleaved chain passes) are pure accelerators of
    the same min-label fixpoint: labels must be bit-identical once
    converged (ops/cluster._chain_apply links are subsets of the true
    radius graph)."""
    from object_oriented_slam_tpu.ops import cluster as cl
    rng = np.random.default_rng(11)
    N = 1024
    # zigzag chains (the diffusion worst case) + blobs + noise + masked
    t = np.linspace(0, 6, N // 4)
    chain = np.stack([t, 0.4 * np.sin(7 * t), 0.2 * np.cos(11 * t)], 1)
    pts = np.concatenate([
        chain, rng.normal(0, 0.05, (N // 4, 3)) + 4,
        rng.normal(0, 0.04, (N // 4, 3)) - 3,
        rng.uniform(-5, 5, (N // 4, 3))]).astype(np.float32)
    mask = rng.random(N) > 0.15
    ref = None
    for chains in (0, -1, 1, 3):
        lab, conv = cl.connected_components(
            jnp.asarray(pts), jnp.asarray(mask), 0.12, outer_iters=96,
            with_converged=True, chains=chains)
        assert bool(conv), chains
        lab = np.asarray(lab)
        if ref is None:
            ref = lab
        assert np.array_equal(lab, ref), chains


def test_eigh3_closed_form():
    """ops/linalg.eigh3 must match f64 numpy eigh at f32 roundoff on
    random, covariance-shaped, repeated-eigenvalue, rank-1, isotropic
    and zero matrices (it replaces jnp.linalg.eigh in the per-frame
    PCA and the ground-plane fit, where lax's factorization serializes
    on TPU)."""
    from object_oriented_slam_tpu.ops.linalg import eigh3
    rng = np.random.default_rng(7)
    M = rng.normal(0, 1, (500, 3, 3))
    cases = [("random", (M + M.transpose(0, 2, 1)) / 2)]
    pts = rng.normal(0, 1e-3, (200, 40, 3))
    c = pts - pts.mean(1, keepdims=True)
    cases.append(("cov-small", np.einsum("bni,bnj->bij", c, c) / 40))
    Q, _ = np.linalg.qr(rng.normal(0, 1, (200, 3, 3)))
    for name, d in (("rep-low", [1.0, 1.0, 3.0]), ("rep-high",
                                                   [0.5, 3.0, 3.0])):
        D = np.broadcast_to(np.asarray(d), (200, 3))
        cases.append((name, np.einsum("bij,bj,bkj->bik", Q, D, Q)))
    v = rng.normal(0, 1, (200, 3))
    cases.append(("rank1", np.einsum("bi,bj->bij", v, v)))
    cases.append(("iso", np.concatenate([np.eye(3)[None] * 7,
                                         np.zeros((1, 3, 3)),
                                         np.eye(3)[None] * 1e-8])))
    for name, A in cases:
        import jax
        vals, vecs = jax.jit(eigh3)(jnp.asarray(A.astype(np.float32)))
        vals = np.asarray(vals, np.float64)
        vecs = np.asarray(vecs, np.float64)
        wv, _ = np.linalg.eigh(A)
        nA = np.maximum(np.abs(wv).max(-1), 1e-9)
        assert (np.abs(vals - wv).max(-1) / nA).max() < 5e-6, name
        ortho = np.einsum("...ij,...ik->...jk", vecs, vecs) - np.eye(3)
        assert np.abs(ortho).max() < 1e-5, name
        res = np.einsum("...ij,...jk->...ik", A, vecs) \
            - vals[..., None, :] * vecs
        assert (np.abs(res).max((-1, -2)) / nA).max() < 5e-6, name
        assert (np.diff(vals, axis=-1) >= -1e-5 * nA[..., None]).all(), name
        # right-handed basis (v1 = v2 x v0 by construction)
        det = np.linalg.det(vecs)
        assert np.all(det > 0.99), name


def test_ladder_caps_rung_selection():
    """frontend._ladder_caps: rungs in sixteenths of N, pad-free tiling
    only (2048-aligned caps at the default pass block, 1024-aligned at
    1024 rows, finer dropped), ascending; compact_tiers=False = the
    pre-r5 half-N-only policy."""
    import dataclasses
    from object_oriented_slam_tpu.frontend.extractor import (
        ExtractorConfig, _ladder_caps)

    cfg = ExtractorConfig()
    assert _ladder_caps(16384, cfg) == [
        (4096, None), (5120, 1024), (6144, None), (7168, 1024),
        (8192, None), (12288, None)]
    # N/16 = 512: the 5/16 and 7/16 rungs are not 1024-aligned -> dropped
    assert _ladder_caps(8192, cfg) == [
        (2048, None), (3072, 1024), (4096, None), (6144, None)]
    coarse = dataclasses.replace(cfg, compact_rungs=(4, 6, 8, 12))
    assert _ladder_caps(16384, coarse) == [
        (4096, None), (6144, None), (8192, None), (12288, None)]
    half = dataclasses.replace(cfg, compact_tiers=False)
    assert _ladder_caps(16384, half) == [(8192, None)]
    caps = _ladder_caps(16384, cfg)
    assert caps == sorted(caps), "ladder must ascend"
