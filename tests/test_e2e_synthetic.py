"""End-to-end synthetic fixture: known strands -> rendered observation maps ->
PMVO optimize/refine/voxelize -> strand tracing. Checks direction cosine error
and occupancy precision/recall (the OccMetric-style acceptance of SURVEY §4)."""

import math

import jax.numpy as jnp
import numpy as np

from monohair_tpu.camera import Cameras, ndc_to_pixel, project
from monohair_tpu.coords import voxel_indices, world_dir_to_voxel
from monohair_tpu.pmvo.driver import filter_raw_points, optimize_points, refine_and_voxelize
from monohair_tpu.pmvo.solver import PMVOMaps
from monohair_tpu.strands.trace import generate_segments, strands_to_list


def ring_cameras(num_views=24, radius=1.1, fx=1.7, fy=1.7):
    cam_list = []
    for v in range(num_views):
        a = 2 * math.pi * v / num_views
        eye = np.array([math.cos(a), 0.08, math.sin(a)]) * radius
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, np.cross(right, fwd), -fwd], 1)
        c2w[:3, 3] = eye
        cam_list.append({"file": f"{v:03d}", "ndc_prj": [fx, fy, 0.0, 0.0],
                         "pose": c2w.tolist()})
    return Cameras.from_json_list(cam_list)


def make_wig(num_strands=24, num_pts=64, rng=None):
    # num_pts chosen so consecutive points are < 1 voxel (2.5 mm) apart —
    # the GT occupancy must be a connected tube, not a sparse comb
    """Vertical strands on a small circle, direction (0, -1, 0)."""
    rng = rng or np.random.default_rng(0)
    strands = []
    for k in range(num_strands):
        a = 2 * math.pi * k / num_strands
        x = 0.05 * math.cos(a) + rng.normal() * 0.003
        z = 0.05 * math.sin(a) + rng.normal() * 0.003
        y = np.linspace(0.07, -0.07, num_pts)
        strands.append(np.stack([np.full(num_pts, x), y, np.full(num_pts, z)],
                                -1).astype(np.float32))
    return strands


def render_observation_maps(cams, strands, H=128, W=128):
    """PMVO-convention per-view maps from the synthetic strands: splat each
    strand sample's projected 2D direction (d_row, d_col) and mask; depth far."""
    V = cams.num_views
    pts = np.concatenate([s[:-1] for s in strands])
    nxt = np.concatenate([s[1:] for s in strands])
    uv_p, _ = project(cams, jnp.asarray(pts))
    uv_n, _ = project(cams, jnp.asarray(nxt))
    rc_p = np.asarray(ndc_to_pixel(uv_p, (H, W)))
    rc_n = np.asarray(ndc_to_pixel(uv_n, (H, W)))
    d2 = rc_n - rc_p
    d2 /= np.maximum(np.linalg.norm(d2, axis=-1, keepdims=True), 1e-9)

    ori = np.zeros((V, H, W, 2), np.float32)
    conf = np.zeros((V, H, W), np.float32)
    mask = np.zeros((V, H, W), np.float32)
    for v in range(V):
        rc = np.round(rc_p[v]).astype(int)
        ok = (rc[:, 0] >= 1) & (rc[:, 0] < H - 1) & (rc[:, 1] >= 1) & (rc[:, 1] < W - 1)
        r, c = rc[ok, 0], rc[ok, 1]
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                ori[v, r + dr, c + dc] = d2[v][ok]
                conf[v, r + dr, c + dc] = 0.9
                mask[v, r + dr, c + dc] = 1.0
    depth = np.full((V, H, W), 230.0, np.float32)
    return PMVOMaps(cams, jnp.asarray(depth), jnp.asarray(ori),
                    jnp.asarray(conf), jnp.asarray(mask))


def test_synthetic_wig_pipeline():
    rng = np.random.default_rng(0)
    cams = ring_cameras()
    strands = make_wig(rng=rng)
    maps = render_observation_maps(cams, strands)

    # query points: several jittered copies per strand point (the reference
    # samples 4 points per fine voxel around the coarse mesh, PMVO.py:843-845,
    # producing a 2-3 voxel thick occupancy tube) + distractors far away
    gt_pts = np.concatenate(strands)
    copies = [gt_pts + rng.normal(size=gt_pts.shape).astype(np.float32) * 0.001
              for _ in range(4)]
    queries = np.concatenate(copies + [
        (rng.random((300, 3)).astype(np.float32) - 0.5) * 0.6,
    ])

    n_strand_q = 4 * len(gt_pts)
    surface, filt = filter_raw_points(maps, queries, 3, 0.4, 1.0, chunk=2048)
    # most strand-adjacent queries survive; most random distractors are masked out
    assert surface[:n_strand_q].mean() > 0.8
    assert surface[n_strand_q:].mean() < 0.3

    pts, ori, loss, high = optimize_points(maps, queries[surface], 3, 0.4, chunk=2048)
    cos = np.abs(ori @ np.array([0.0, -1.0, 0.0]))
    assert np.median(cos) > 0.9

    occ, ori_grid = refine_and_voxelize(
        maps, pts, ori, loss, np.zeros((0, 3), np.float32), 3, 0.4, 1.0,
        threshold=0.1, chunk=2048)

    # occupancy precision/recall vs the GT strand voxels (precision against the
    # one-ring dilated GT: the 2 mm query jitter legitimately spreads 1 voxel)
    from monohair_tpu.ops.pool3d import max_pool3d
    gt_idx = np.asarray(voxel_indices(jnp.asarray(gt_pts)))
    gt_occ = np.zeros_like(occ)
    gt_occ[gt_idx[:, 0], gt_idx[:, 1], gt_idx[:, 2]] = 1
    gt_dilated = np.asarray(max_pool3d(jnp.asarray(gt_occ), 3))
    pred = occ > 0
    pred_dilated = np.asarray(max_pool3d(jnp.asarray(pred.astype(np.float32)), 3)) > 0
    # every GT voxel must have a predicted voxel within one ring, and vice versa
    recall = float((pred_dilated & (gt_occ > 0)).sum()) / max(gt_occ.sum(), 1)
    precision = float((pred & (gt_dilated > 0)).sum()) / max(pred.sum(), 1)
    assert recall > 0.8, f"recall={recall}"
    assert precision > 0.8, f"precision={precision}"

    # grid directions agree with the true strand direction
    xs, ys, zs = np.nonzero(gt_occ * occ)
    d = ori_grid[xs, ys, zs]
    cos_g = np.abs(d @ np.array([0.0, -1.0, 0.0]))
    assert np.median(cos_g) > 0.9

    # trace strands back out of the field
    ori_voxel = np.asarray(world_dir_to_voxel(jnp.asarray(ori_grid)))
    traced = generate_segments(occ, ori_voxel, thr_dot=0.7, sweeps=1, chunk=4096)
    assert len(traced) > 0
    lengths = [len(s) for s in traced]
    assert max(lengths) > 15  # strands span tens of voxels


def test_coarse_fuse_marks_only_unvisible_interior():
    """The infer_inner fuse (refine_and_voxelize coarse_raw branch, reference
    PMVO.py:733-751): coarse MVS points visible in >2 views must NOT be
    stamped into the grid; occluded ("unvisible") ones must be, carrying
    their (canonicalized) directions."""
    rng = np.random.default_rng(1)
    cams = ring_cameras()
    strands = make_wig(rng=rng)
    maps = render_observation_maps(cams, strands)

    pts = np.concatenate(strands)[::16]
    ori = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (len(pts), 1))
    loss = np.zeros(len(pts), np.float32)

    # coarse interior candidates in a region the select points never touch
    coarse_pts = (np.concatenate(strands)[1::16]
                  + np.array([0.2, 0.0, 0.0], np.float32))
    coarse_ori = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32),
                         (len(coarse_pts), 1))
    coarse_raw = np.concatenate([coarse_pts, coarse_ori], 1)
    c_idx = np.asarray(voxel_indices(jnp.asarray(coarse_pts)))

    # far depth (the fixture's 230): every coarse point is visible in >2
    # views -> the fuse must add nothing
    occ_vis, _ = refine_and_voxelize(
        maps, pts, ori, loss, np.zeros((0, 3), np.float32), 3, 0.4, 1.0,
        threshold=0.1, coarse_raw=coarse_raw, chunk=2048)
    assert occ_vis[c_idx[:, 0], c_idx[:, 1], c_idx[:, 2]].max() == 0

    # near depth (0): the rendered surface occludes everything -> every
    # coarse point is unvisible -> fused with canonicalized (down) direction
    near = PMVOMaps(cams, jnp.zeros_like(maps.depth), maps.ori2d, maps.conf,
                    maps.mask)
    occ_unvis, ori_unvis = refine_and_voxelize(
        near, pts, ori, loss, np.zeros((0, 3), np.float32), 3, 0.4, 1.0,
        threshold=0.1, coarse_raw=coarse_raw, chunk=2048)
    stamped = occ_unvis[c_idx[:, 0], c_idx[:, 1], c_idx[:, 2]]
    assert stamped.min() == 1
    d = ori_unvis[c_idx[:, 0], c_idx[:, 1], c_idx[:, 2]]
    # canonicalize_down flips the authored +y to -y
    assert np.allclose(d, np.array([0.0, -1.0, 0.0]), atol=1e-5)
