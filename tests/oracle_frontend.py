"""Float64 numpy oracle of the reference single-frame extraction pipeline.

A slow, faithful re-implementation of
``EllipsoidExtractor::EstimateLocalEllipsoid``
(/root/reference/src/pca/EllipsoidExtractor.cpp:292-493) and the symmetry
estimation it drives (src/symmetry/Symmetry.cpp:88-128,
src/symmetry/SymmetrySolver.cpp:49-333), written from the C++ sources —
NOT from the TPU package — so tests can assert the TPU pipeline against
an executable specification of the reference's behavior (the reference's
PCL/Pangolin stack cannot be built in this image).

Every stage cites the reference file:line it replicates, including its
quirks: int() pixel truncation, the u16-truncated ray-length depth map,
PCL's size-descending cluster ordering, g2o's Levenberg schedule
(tau=1e-5, 10 trials, the ORB-SLAM2 "nBad" stop), and the 1e-9 central
difference used for the plane jacobians.
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np
from scipy.spatial import cKDTree

# --------------------------------------------------------------------------
# SE3 / quaternion helpers (f64; quat [x, y, z, w] like g2o::SE3Quat)
# --------------------------------------------------------------------------


def quat_to_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def mat_to_quat(m):
    t = np.trace(m)
    if t > 0:
        s = math.sqrt(t + 1.0) * 2
        return np.array([(m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
                         (m[1, 0] - m[0, 1]) / s, 0.25 * s])
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = math.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 0.0)) * 2
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[j] = (m[j, i] + m[i, j]) / s
    q[k] = (m[k, i] + m[i, k]) / s
    q[3] = (m[k, j] - m[j, k]) / s
    if q[3] < 0:
        q = -q
    return q / np.linalg.norm(q)


def se3_mat(pose7):
    T = np.eye(4)
    T[:3, :3] = quat_to_mat(pose7[3:7])
    T[:3, 3] = pose7[:3]
    return T


def mat_to_pose7(T):
    return np.concatenate([T[:3, 3], mat_to_quat(T[:3, :3])])


# --------------------------------------------------------------------------
# Stage (a): bbox depth -> cloud, voxel downsample, to world
# --------------------------------------------------------------------------


def point_cloud_in_rect(depth, bbox, cam, depth_range):
    """getPointCloudInRect (src/symmetry/PointCloudFilter.cpp:21-56):
    stride-3 scan of [x1, x2) x [y1, y2), z gated to (0.1, range]."""
    x1, y1, x2, y2 = (int(bbox[0]), int(bbox[1]), int(bbox[2]), int(bbox[3]))
    pts = []
    for y in range(y1, y2, 3):
        for x in range(x1, x2, 3):
            z = depth[y, x] / cam.scale
            if z <= 0.1 or z > depth_range:
                continue
            pts.append([(x - cam.cx) * z / cam.fx,
                        (y - cam.cy) * z / cam.fy, z])
    return np.array(pts, np.float64).reshape(-1, 3)


def voxel_downsample_pcl(pts, leaf):
    """PCL VoxelGrid replica (DownSamplePointCloudOnly,
    src/symmetry/PointCloudFilter.cpp:250-262): centroid per occupied
    cell, output ordered by PCL's z-major cell index."""
    if len(pts) == 0:
        return pts
    ijk = np.floor(pts / leaf).astype(np.int64)
    mn = ijk.min(axis=0)
    rel = ijk - mn
    div = rel.max(axis=0) + 1
    idx = rel[:, 0] + rel[:, 1] * div[0] + rel[:, 2] * div[0] * div[1]
    order = np.argsort(idx, kind="stable")
    idx_s = idx[order]
    pts_s = pts[order]
    starts = np.flatnonzero(np.r_[True, idx_s[1:] != idx_s[:-1]])
    ends = np.r_[starts[1:], len(idx_s)]
    return np.stack([pts_s[a:b].mean(axis=0) for a, b in zip(starts, ends)])


def supporting_plane_filter(pts_w, plane_w, clearance=0.05):
    """ApplySupportingPlaneFilter (EllipsoidExtractor.cpp:562-578)."""
    n = plane_w[:3]
    dis = (pts_w @ n + plane_w[3]) / np.linalg.norm(n)
    return pts_w[dis > clearance]


def get_center(depth, bbox, pose_wc, cam, depth_range):
    """GetCenter (EllipsoidExtractor.cpp:583-643): 10x10 samples around
    the bbox center, centroid, to world.  Returns None if < 2 valid."""
    x = int((bbox[0] + bbox[2]) / 2.0)
    y = int((bbox[1] + bbox[3]) / 2.0)
    n = 10
    x_delta = int(abs(bbox[0] - bbox[2]) / 4.0 / n)
    y_delta = int(abs(bbox[1] - bbox[3]) / 4.0 / n)
    pts = []
    for x_id in range(-n // 2, n // 2):
        for y_id in range(-n // 2, n // 2):
            x_, y_ = x + x_id * x_delta, y + y_id * y_delta
            z = depth[y_, x_] / cam.scale
            if z <= 0.1 or z > depth_range:
                continue
            pts.append([(x_ - cam.cx) * z / cam.fx,
                        (y_ - cam.cy) * z / cam.fy, z])
    if len(pts) < 2:
        return None
    c = np.mean(np.array(pts), axis=0)
    T = se3_mat(pose_wc)
    return T[:3, :3] @ c + T[:3, 3]


# --------------------------------------------------------------------------
# Stage (d): Euclidean cluster extraction + selection
# --------------------------------------------------------------------------


def euclidean_clusters(pts, tol, min_size):
    """PCL EuclideanClusterExtraction replica: connected components of
    the radius graph (squared distance <= tol^2), clusters with
    >= min_size points, sorted by size DESCENDING (PCL sorts its output,
    segmentation/extract_clusters).  Reference call:
    EllipsoidExtractor.cpp:657-673."""
    n = len(pts)
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    tree = cKDTree(pts)
    for i, j in tree.query_pairs(r=tol):
        pi, pj = find(i), find(j)
        if pi != pj:
            parent[max(pi, pj)] = min(pi, pj)
    roots = np.array([find(i) for i in range(n)])
    clusters = [np.flatnonzero(roots == r) for r in np.unique(roots)]
    clusters = [c for c in clusters if len(c) >= min_size]
    clusters.sort(key=len, reverse=True)
    return clusters


def select_cluster(pts, clusters, center, center_dis):
    """ApplyEuclideanFilter selection loop (EllipsoidExtractor.cpp:696-714):
    first (largest) cluster whose min distance to the center estimate is
    below center_dis; a single cluster is kept unconditionally."""
    chosen = None
    for ci, c in enumerate(clusters):
        if len(clusters) == 1:
            chosen = c
        d = np.min(np.linalg.norm(pts[c] - center, axis=1))
        if d < center_dis:
            chosen = c
            break
    return None if chosen is None else pts[chosen]


# --------------------------------------------------------------------------
# Stage (e): PCA + rotation post-processing
# --------------------------------------------------------------------------


def process_pca(pts):
    """ProcessPCA (EllipsoidExtractor.cpp:170-196): centroid + normalized
    covariance eigendecomposition (ascending eigenvalues)."""
    c = pts.mean(axis=0)
    d = pts - c
    cov = d.T @ d / len(pts)
    vals, vecs = np.linalg.eigh(cov)
    return c, vecs, vals


def adjust_chirality(rot):
    """AdjustChirality (EllipsoidExtractor.cpp:760-764)."""
    rot = rot.copy()
    rot[:, 2] = np.cross(rot[:, 0], rot[:, 1])
    return rot


def align_z_to_gravity(rot, cov, z_axis):
    """AlignZAxisToGravity (EllipsoidExtractor.cpp:207-267)."""
    z_axis = z_axis / np.linalg.norm(z_axis)
    cos = rot.T @ z_axis
    max_id = int(np.argmax(np.abs(cos)))
    z_vec = rot[:, max_id] if cos[max_id] > 0 else -rot[:, max_id]
    out = np.zeros((3, 3))
    cov_out = np.zeros(3)
    out[:, 2] = z_vec
    cov_out[2] = cov[max_id]
    x_id = (max_id + 1) % 3
    out[:, 0] = rot[:, x_id]
    cov_out[0] = cov[x_id]
    out[:, 1] = np.cross(out[:, 2], out[:, 0])
    cov_out[1] = cov[(max_id + 2) % 3]
    return out, cov_out


def calib_rot_to_normal(rot, normal):
    """calibRotMatAccordingToGroundPlane (EllipsoidExtractor.cpp:766-788)."""
    z = rot[:, 2]
    axis = np.cross(z, normal)
    axis = axis / np.linalg.norm(axis)
    cos_t = (normal @ z) / (np.linalg.norm(normal) * np.linalg.norm(z))
    theta = math.acos(np.clip(cos_t, -1.0, 1.0))
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R = np.eye(3) + math.sin(theta) * K + (1 - math.cos(theta)) * (K @ K)
    return R @ rot


# --------------------------------------------------------------------------
# Symmetry (Symmetry.cpp + SymmetrySolver.cpp)
# --------------------------------------------------------------------------


@dataclasses.dataclass
class PlaneState:
    """g2o::plane: 4-vec + the dual distance (include/core/Plane.h)."""
    param: np.ndarray
    dual_dis: float = 0.0

    def copy(self):
        return PlaneState(self.param.copy(), self.dual_dis)


def plane_from_dis_angle(dis, angle, trans=0.0):
    """fromDisAngleTrans (src/core/Plane.cpp:96-104)."""
    return PlaneState(np.array([math.sin(angle), -math.cos(angle), 0.0,
                                -dis]), trans)


def _plane_rotation(v):
    """plane::rotation (Plane.h:90-94): Rz(azimuth) * Ry(-elevation)."""
    az = math.atan2(v[1], v[0])
    el = math.atan2(v[2], np.linalg.norm(v[:2]))
    ca, sa = math.cos(az), math.sin(az)
    ce, se = math.cos(-el), math.sin(-el)
    Rz = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1.0]])
    Ry = np.array([[ce, 0, se], [0, 1, 0], [-se, 0, ce]])
    return Rz @ Ry


def plane_oplus(p: PlaneState, v3):
    """plane::oplus (Plane.h:46-59)."""
    az, el = v3[0], v3[1]
    s, c = math.sin(el), math.cos(el)
    n = np.array([c * math.cos(az), c * math.sin(az), s])
    R = _plane_rotation(p.param[:3])
    d = (-p.param[3]) + v3[2]
    head = R @ n
    param = np.r_[head, -d]
    param = param / np.linalg.norm(param[:3])
    return PlaneState(param, p.dual_dis)


def plane_oplus_dual(p: PlaneState, v3):
    """plane::oplus_dual (Plane.h:62-77)."""
    out = plane_oplus(p, np.array([v3[0], 0.0, v3[1]]))
    out.dual_dis = p.dual_dis + v3[2]
    return out


def plane_another_vec(p: PlaneState):
    """GenerateAnotherPlaneVec (src/core/Plane.cpp:137-144)."""
    az = math.atan2(p.param[1], p.param[0])
    return np.array([math.sin(az), -math.cos(az), 0.0, -p.dual_dis])


def mirror_points(pts, plane_param):
    """GetSymmetryPointCloud / GetSymmetryPointOfPlane
    (SymmetrySolver.cpp:168-214)."""
    normal = plane_param[:3] / np.linalg.norm(plane_param[:3])
    homo = np.c_[pts, np.ones(len(pts))]
    val = homo @ plane_param
    dis = np.abs(val) / np.linalg.norm(plane_param[:3])
    symbol = np.where(val > 0, -1.0, 1.0)
    return pts + (2 * symbol * dis)[:, None] * normal


def get_point_cloud_prob(bbox, pts_sym, tree, proj_depth, pose_oc, calib,
                         scale, sigma, rows, cols):
    """GetPointCloudProb (SymmetrySolver.cpp:49-138): occlusion-aware
    1-NN Gaussian cost over the mirrored cloud; pose_oc is the camera
    pose in the normalized object frame (campose_wc of that frame)."""
    T_co = np.linalg.inv(se3_mat(pose_oc))
    proj = calib @ T_co[:3, :]
    cam_c = pose_oc[:3]
    ln_total = 0.0
    for p in pts_sym:
        uvh = proj @ np.r_[p, 1.0]
        u, v = uvh[0] / uvh[2], uvh[1] / uvh[2]
        x, y = int(u), int(v)
        dis_diff = 0.0
        if bbox[0] < x < bbox[2] and bbox[1] < y < bbox[3]:
            d = proj_depth[y, x] if (0 <= y < rows and 0 <= x < cols) else 0
            if d == 0:
                dis_diff = 0.0
            else:
                depth_m = d / scale
                if np.linalg.norm(cam_c - p) > depth_m:
                    dis_diff = 0.0
                else:
                    dis_diff = tree.query(p)[0]
        else:
            dis_diff = tree.query(p)[0]
        ln_total += -0.5 * (dis_diff / sigma) ** 2
    return ln_total / len(pts_sym) if len(pts_sym) else -np.inf


def _edge_error(plane, dual, cloud, tree, bbox, proj_depth, pose_oc, calib,
                scale, sigma, rows, cols):
    """EdgeSymmetryPlane/EdgeSymmetryDualPlane::computeError
    (SymmetrySolver.cpp:375-396, 458-481): error = -cost."""
    if not dual:
        sym = mirror_points(cloud, plane.param)
    else:
        p1 = plane.param
        p2 = plane_another_vec(plane)
        sym = np.concatenate([mirror_points(cloud, p1),
                              mirror_points(cloud, p2)])
    cost = get_point_cloud_prob(bbox, sym, tree, proj_depth, pose_oc, calib,
                                scale, sigma, rows, cols)
    return -cost


def g2o_lm_plane(err_fn, plane0, dual, iters=5):
    """g2o OptimizationAlgorithmLevenberg replica for the 1-edge plane
    graph (Thirdparty/g2o/g2o/core/optimization_algorithm_levenberg.cpp:
    61-189): numeric central-difference jacobian (delta=1e-9,
    base_unary_edge.hpp:94), lambda_init = 1e-5 * max|H_ii|, up to 10
    trials per iteration, rho-scaled lambda, the ORB-SLAM2 "nBad >= 3"
    stop.  Returns (plane, final_error) with final_error = the edge's
    _error after the last computeError call (stale-on-reject included,
    matching OptimizeSymmetryPlane's read at SymmetrySolver.cpp:265)."""
    dims = 3 if dual else 2
    oplus = (plane_oplus_dual if dual
             else lambda p, u: plane_oplus(p, np.array([u[0], 0.0, u[1]])))
    est = plane0.copy()
    last_err = err_fn(est)
    chi2 = last_err * last_err
    lam, ni, n_bad = None, 2.0, 0
    delta = 1e-9
    for it in range(iters):
        # buildSystem: computeActiveErrors + numeric linearizeOplus
        # (restores _error afterwards, base_unary_edge.hpp:121)
        e0 = err_fn(est)
        last_err = e0
        chi2 = e0 * e0
        ini_chi = chi2
        J = np.zeros(dims)
        for d in range(dims):
            u = np.zeros(dims)
            u[d] = delta
            ep = err_fn(oplus(est, u))
            u[d] = -delta
            em = err_fn(oplus(est, u))
            J[d] = (ep - em) / (2 * delta)
        H = np.outer(J, J)
        b = -J * e0
        if lam is None:
            lam = 1e-5 * np.max(np.abs(np.diag(H)))
        rho, q = 0.0, 0
        while True:
            try:
                dx = np.linalg.solve(H + lam * np.eye(dims), b)
                ok2 = np.all(np.isfinite(dx))
            except np.linalg.LinAlgError:
                dx, ok2 = np.zeros(dims), False
            cand = oplus(est, dx)
            e_new = err_fn(cand)
            last_err = e_new
            chi_new = e_new * e_new if ok2 else np.finfo(np.float64).max
            scale_ = float(dx @ (lam * dx + b)) + 1e-3
            rho = (chi2 - chi_new) / scale_
            if rho > 0 and np.isfinite(chi_new):
                alpha = 1.0 - (2 * rho - 1) ** 3
                alpha = min(alpha, 2.0 / 3.0)
                lam *= max(1.0 / 3.0, alpha)
                ni = 2.0
                est, chi2 = cand, chi_new
                break
            lam *= ni
            ni *= 2.0
            q += 1
            if not (rho < 0 and q < 10):
                break
        if q >= 10 or rho == 0:
            break
        if (ini_chi - chi2) * 1e3 < ini_chi:
            n_bad += 1
        else:
            n_bad = 0
        if n_bad >= 3:
            break
    return est, last_err


def estimate_symmetry(bbox, cloud, pose_oc, proj_depth, calib, scale, sigma,
                      sym_type, rows, cols):
    """Symmetry::estimateSymmetry (Symmetry.cpp:88-128): 9 init planes
    (3 distances x 3 angles), optimize each, keep max probability."""
    tree = cKDTree(cloud)
    dual = sym_type == 2
    best = None
    for i in range(3):
        for m in range(3):
            dis = -0.2 + 0.2 * i
            angle = (-5.0 + 5.0 * m) * math.pi / 180.0
            p0 = plane_from_dis_angle(dis, angle, 0.0)
            err = lambda p: _edge_error(p, dual, cloud, tree, bbox,
                                        proj_depth, pose_oc, calib, scale,
                                        sigma, rows, cols)
            plane, final_err = g2o_lm_plane(err, p0, dual)
            prob = math.exp(-final_err)
            if best is None or prob > best[0]:
                best = (prob, plane)
    return best  # (prob, PlaneState)


def proj_depth_mat(depth, cam):
    """getProjDepthMat (Symmetry.cpp:141-161): ray-length depth,
    TRUNCATED back to u16 like the reference's CV_16UC1 store."""
    H, W = depth.shape
    xs = np.arange(W) - cam.cx
    ys = np.arange(H) - cam.cy
    f = cam.fx
    scale = np.sqrt(xs[None, :] ** 2 + f * f + ys[:, None] ** 2) / f
    return (depth.astype(np.float64) * scale).astype(np.uint16)


# --------------------------------------------------------------------------
# Full pipeline
# --------------------------------------------------------------------------

SYMMETRY_PRIOR = {58: 0, 59: 1, 62: 1, 57: 1, 66: 1, 64: 1, 63: 1, 41: 1,
                  28: 2}  # LoadSymmetryPrior (EllipsoidExtractor.cpp:52-79)


# --------------------------------------------------------------------------
# Ground-plane oracle (PlaneExtractor::extractGroundPlane,
# src/plane/PlaneExtractor.cpp:22-107,126-183)
# --------------------------------------------------------------------------


def organized_normals(depth, cam, smoothing=10, max_depth_change=0.05):
    """PCL IntegralImageNormalEstimation AVERAGE_3D_GRADIENT replica
    (PlaneExtractor.cpp:64-71): horizontal/vertical 3D gradient vectors
    box-averaged over the smoothing window (PCL does this with integral
    images), normal = normalize(cross(grad_x, grad_y)); pixels whose
    local depth step exceeds max_depth_change * z get no normal."""
    H, W = depth.shape
    z = depth.astype(np.float64) / cam.scale
    xs = (np.arange(W) - cam.cx) / cam.fx
    ys = (np.arange(H) - cam.cy) / cam.fy
    pts = np.stack([xs[None, :] * z, ys[:, None] * z, z], axis=-1)
    valid = z > 0

    gx = np.zeros_like(pts)
    gx[:, 1:-1] = (pts[:, 2:] - pts[:, :-2]) * 0.5
    gy = np.zeros_like(pts)
    gy[1:-1, :] = (pts[2:, :] - pts[:-2, :]) * 0.5
    # depth-discontinuity gate
    dz = np.zeros_like(z)
    dz[:, 1:-1] = np.maximum(np.abs(z[:, 2:] - z[:, 1:-1]),
                             np.abs(z[:, :-2] - z[:, 1:-1]))
    dz[1:-1, :] = np.maximum(dz[1:-1, :],
                             np.maximum(np.abs(z[2:, :] - z[1:-1, :]),
                                        np.abs(z[:-2, :] - z[1:-1, :])))
    ok = valid & (dz < max_depth_change * np.maximum(z, 1e-6))
    gx[~ok] = 0.0
    gy[~ok] = 0.0

    # box average via cumulative sums (integral images)
    r = smoothing // 2

    def box(a):
        c = np.cumsum(np.cumsum(
            np.pad(a, ((r + 1, r), (r + 1, r), (0, 0))), axis=0), axis=1)
        return (c[2 * r + 1:, 2 * r + 1:] - c[:-2 * r - 1, 2 * r + 1:]
                - c[2 * r + 1:, :-2 * r - 1] + c[:-2 * r - 1, :-2 * r - 1])

    n = np.cross(box(gx), box(gy))
    nn = np.linalg.norm(n, axis=-1)
    has_n = ok & (nn > 1e-12)
    n = np.where(has_n[..., None], n / np.maximum(nn, 1e-12)[..., None], 0.0)
    # PCL orients normals toward the viewpoint (origin): n . p < 0
    flip = np.sum(n * pts, axis=-1) > 0
    n[flip] = -n[flip]
    return pts, n, has_n


def organized_multiplane(pts, normals, has_n, ang_th_rad, dis_th,
                         min_inliers=100):
    """pcl::OrganizedMultiPlaneSegmentation replica
    (PlaneExtractor.cpp:83-93): connected components of the pixel grid
    under the plane-coefficient comparator (neighbor normals within the
    angular threshold AND plane offsets d = -n.p within the distance
    threshold), least-squares plane per component, >= min_inliers.
    Returns [(coeffs4 with d >= 0 like :106-107, inlier_count), ...]."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    H, W = has_n.shape
    d = -np.sum(normals * pts, axis=-1)
    cos_th = math.cos(ang_th_rad)

    idx = np.arange(H * W).reshape(H, W)
    rows, cols, datas = [], [], []
    for axis in (0, 1):
        a = (slice(None, -1), slice(None)) if axis == 0 \
            else (slice(None), slice(None, -1))
        b = (slice(1, None), slice(None)) if axis == 0 \
            else (slice(None), slice(1, None))
        both = has_n[a] & has_n[b]
        cosang = np.sum(normals[a] * normals[b], axis=-1)
        close = both & (cosang > cos_th) & (np.abs(d[a] - d[b]) < dis_th)
        rows.append(idx[a][close])
        cols.append(idx[b][close])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    adj = coo_matrix((np.ones(len(rows), bool), (rows, cols)),
                     shape=(H * W, H * W))
    n_comp, labels = connected_components(adj, directed=False)
    labels = labels.reshape(H, W)
    labels[~has_n] = -1

    planes = []
    lab_flat = labels.ravel()
    order = np.argsort(lab_flat, kind="stable")
    sorted_labs = lab_flat[order]
    starts = np.flatnonzero(np.r_[True, sorted_labs[1:] != sorted_labs[:-1]])
    ends = np.r_[starts[1:], len(sorted_labs)]
    pts_flat = pts.reshape(-1, 3)
    for a, b in zip(starts, ends):
        if sorted_labs[a] < 0 or (b - a) < min_inliers:
            continue
        p = pts_flat[order[a:b]]
        c = p.mean(axis=0)
        q = p - c
        cov = q.T @ q
        vals, vecs = np.linalg.eigh(cov)
        nvec = vecs[:, 0]
        coeffs = np.r_[nvec, -nvec @ c]
        if coeffs[3] < 0:
            coeffs = -coeffs
        planes.append((coeffs, int(b - a)))
    return planes


def extract_ground_plane_oracle(depth, cam, min_size=200, ang_deg=5.0,
                                dis_th=0.1):
    """extractGroundPlane (PlaneExtractor.cpp:126-183), f64: all planes
    from the organized segmentation, keep >= Plane.MinSize, reject
    normals outside +-45 deg of camera Y (the gravity assumption), pick
    the largest, flip the sign so the camera center is on the positive
    side.  Returns camera-frame vec4 or None."""
    pts, normals, has_n = organized_normals(depth, cam)
    planes = organized_multiplane(pts, normals, has_n,
                                  math.radians(ang_deg), dis_th)
    candidates = []
    for coeffs, size in planes:
        if size < min_size:
            continue
        cos_t = coeffs[1] / np.linalg.norm(coeffs[:3])   # axisY = (0,1,0)
        theta = math.acos(np.clip(cos_t, -1.0, 1.0))
        if math.pi / 4 < theta < 3 * math.pi / 4:
            continue          # wall filter (:148-157)
        candidates.append((coeffs, size))
    if not candidates:
        return None
    coeffs = max(candidates, key=lambda cs: cs[1])[0]
    # camera on the positive side (:175-178): distance of the origin
    if coeffs[3] / np.linalg.norm(coeffs[:3]) < 0:
        coeffs = -coeffs
    return coeffs


@dataclasses.dataclass
class OracleResult:
    ok: bool
    state: int = 0                   # miSystemState analogue
    e_local: np.ndarray = None       # vec10, camera frame
    e_world: np.ndarray = None       # vec10, world frame
    prob: float = 1.0
    center: np.ndarray = None        # PCA center (world)
    cluster_size: int = 0
    cloud_sym_size: int = 0
    Two: np.ndarray = None           # final normalized->world pose7


def estimate_local_ellipsoid(depth, bbox, label, pose_wc, cam,
                             ground_plane_w, open_symmetry=True,
                             depth_range=6.0, voxel_leaf=0.01,
                             cluster_tol=0.02, cluster_min_size=100,
                             center_dis=0.5, sym_grid=0.1, sigma=0.1):
    """EstimateLocalEllipsoid (EllipsoidExtractor.cpp:292-493), f64."""
    bbox = np.asarray(bbox, np.float64)
    pose_wc = np.asarray(pose_wc, np.float64)
    rows, cols = depth.shape

    # (a) ExtractPointCloud (:86-168)
    pts_cam = point_cloud_in_rect(depth, bbox, cam, depth_range)
    if len(pts_cam) == 0:
        return OracleResult(False, state=4)
    pts_ds = voxel_downsample_pcl(pts_cam, voxel_leaf)
    Twc = se3_mat(pose_wc)
    pts_w = pts_ds @ Twc[:3, :3].T + Twc[:3, 3]
    pts_w = supporting_plane_filter(pts_w, ground_plane_w)
    if len(pts_w) < 1:
        return OracleResult(False, state=4)
    center = get_center(depth, bbox, pose_wc, cam, depth_range)
    if center is None:
        return OracleResult(False, state=1)
    clusters = euclidean_clusters(pts_w, cluster_tol, cluster_min_size)
    obj = select_cluster(pts_w, clusters, center, center_dis)
    if obj is None:
        return OracleResult(False, state=2)

    # (e) PCA + chirality + z alignment + normal calibration (:308-315)
    c, rot, cov = process_pca(obj)
    rot = adjust_chirality(rot)
    normal = ground_plane_w[:3] / np.linalg.norm(ground_plane_w[:3])
    rot, cov = align_z_to_gravity(rot, cov, normal)
    rot = calib_rot_to_normal(rot, normal)

    # (f) normalized object frame (:327-347)
    rz = normal
    rx = rot[:, 0] / np.linalg.norm(rot[:, 0])
    ry = np.cross(rz, rx)
    R_wo = np.stack([rx, ry, rz], axis=1)
    Two = np.eye(4)
    Two[:3, :3] = R_wo
    Two[:3, 3] = c

    cloud_sym = voxel_downsample_pcl(obj, sym_grid)     # :322-324
    Tow = np.linalg.inv(Two)
    cloud_n = cloud_sym @ Tow[:3, :3].T + Tow[:3, 3]

    # (g) symmetry completion (:352-456)
    prob = 1.0
    sym_type = SYMMETRY_PRIOR.get(int(label), -1)
    run_symmetry = open_symmetry and sym_type > 0
    if run_symmetry:
        proj_depth = proj_depth_mat(depth, cam)
        pose_oc = mat_to_pose7(Tow @ Twc)          # campose_oc (:373-375)
        calib = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy],
                          [0, 0, 1.0]])
        prob, plane = estimate_symmetry(
            bbox, cloud_n, pose_oc, proj_depth, calib, cam.scale, sigma,
            sym_type, rows, cols)
        # complete the cloud (:399-446)
        sym_pts = mirror_points(cloud_n, plane.param)
        if sym_type == 2:
            p2 = plane_another_vec(plane)
            sym_pts = np.concatenate([sym_pts, mirror_points(cloud_n, p2),
                                      mirror_points(sym_pts, p2)])
        cloud_n = np.concatenate([cloud_n, sym_pts])
        center_combined = cloud_n.mean(axis=0)
        x_om = plane.param[:3] / np.linalg.norm(plane.param[:3])
        z_om = np.array([0.0, 0.0, 1.0])
        y_om = np.cross(z_om, x_om)
        Tom = np.eye(4)
        Tom[:3, :3] = np.stack([x_om, y_om, z_om], axis=1)
        Tom[:3, 3] = center_combined
        cloud_n = cloud_n @ np.linalg.inv(Tom)[:3, :3].T \
            + np.linalg.inv(Tom)[:3, 3]
        Two = Two @ Tom

    # (h) ProcessPCANormalized + ConstructEllipsoid (:459-492, :495-531)
    scale_vec = np.max(np.abs(cloud_n), axis=0)
    pose7_two = mat_to_pose7(Two)
    e_world = np.r_[pose7_two, scale_vec]
    Tcw = np.linalg.inv(Twc)
    e_local = np.r_[mat_to_pose7(Tcw @ Two), scale_vec]
    return OracleResult(True, 0, e_local, e_world, prob, c, len(obj),
                        len(cloud_n), pose7_two)
