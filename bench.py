#!/usr/bin/env python
"""Benchmark: end-to-end capture-scale pipeline wall-clock on real hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "stages"}.

Every stage of BASELINE.md's "full reconstruction" runs ON THE CHIP at
big_wavy1-scale workloads (north star: < 10 min on one TPU v5e):

  stage0a coarse NeRF — dense-grid field (nerf/dense_grid.py) trained for the
          pipeline budget (4000 steps at 4096 rays x 64 samples, the validated
          axon-safe step shape, 16 capture views at 1280x720); per-step cost
          measured as the difference of two training
          runs so compile/cache load cancels; plus the 16 fixed-view renders
          and the 256^3 density-grid export (run.py:181,272-305 equivalents)
  stage0b segmentation — MODNet matte + BiSeNet 3-scale/flip hair parse at
          512^2 for 16 frames (calc_masks.py:128-233) + FAN landmarks for 4
          bust-fit views (dataprocess.py:327-373); random weights (timing is
          content-independent), real image plumbing
  stage0c bust fit — full-objective fit_bust_full at real SMPL-X scale
          (10475 verts / 55 joints / 10 betas+expr, 4 views, silhouette +
          image + albedo losses) for the pipeline's 2000-iter budget
          (multiview_optimization.py:626-778; reference runs 10k iters at
          batch 1 — ours steps all views fused, so fewer iters see the same
          number of frames)
  stage1  Gabor orientation/confidence maps — 16 frames at 1920x1080 through
          the fused 180-filter bank (GaborFilter.py:16-145 equivalent)
  stage2  PMVO optimize — 2.1M shell samples in 32k-point chunks through
          pmvo_forward + the refine pass (PMVO.py:39-78,602-651). Maps are
          STRUCTURED: analytic head-sphere depth/silhouette and a projected
          swirl hair field per view, so visibility (back hemisphere occluded
          per view) and the line-search argmin landscape behave like capture
          data, not noise
  stage3  MVS eval at production scale: 16-view 1280x720 feature pyramids
          once, then 32k-point batches through both heads
          (mvs_eval.py:124-196); 2.0M colmap-guided queries
  stage4  strand growth on the FULL 256x256x192 output grid (PMVO.py:695-700)
          seeded with curved swirl-field strands; 100k curved strands (1/5
          rooted) straight through the native connect.cpp kernel

vs_baseline = 600 s (north star) / measured e2e seconds — > 1 beats it.
"""

import json
import math
import time

import numpy as np

NORTH_STAR_SECONDS = 600.0

HEAD_RADIUS = 0.09
NERF_BUDGET_STEPS = 4000     # nerf/pipeline.py:54 default
BUSTFIT_BUDGET_ITERS = 2000  # bustfit/pipeline.py:181 default


def ring_cameras(V, H, W):
    from monohair_tpu.camera import Cameras
    cam_list = []
    for v in range(V):
        a = 2 * math.pi * v / V
        eye = np.array([math.cos(a), 0.1, math.sin(a)]) * 1.1
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, np.cross(right, fwd), -fwd], 1)
        c2w[:3, 3] = eye
        cam_list.append({"file": f"{v:03d}", "ndc_prj": [2.06, 1.16, 0.0, 0.0],
                         "pose": c2w.tolist()})
    return Cameras.from_json_list(cam_list)


def timed_device(fn, *args, iters=3):
    """Device timing over the axon tunnel: reduce outputs on device and read
    one scalar back (block_until_ready does not synchronize the tunnel)."""
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    red = jax.jit(reduced)
    acc = float(red(*args))  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        acc += float(red(*args))
    assert np.isfinite(acc)
    return (time.perf_counter() - t0) / iters


def swirl_direction(p: np.ndarray) -> np.ndarray:
    """Hair-direction field around the head: tangential swirl + downward pull,
    strength varying with height — spatially varying like combed hair."""
    u = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-9)
    sw = np.stack([-u[..., 2], np.zeros_like(u[..., 0]), u[..., 0]], -1)
    sw /= np.maximum(np.linalg.norm(sw, axis=-1, keepdims=True), 1e-9)
    d = sw * (0.4 + 0.6 * u[..., 1:2]) + np.array([0.0, -0.8, 0.0])
    return d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)


def analytic_head_maps(cams, V, H, W):
    """Structured PMVO maps (VERDICT r2 weak #3): per view, ray-trace the head
    sphere for depth/mask, and set each silhouette pixel's 2D orientation to
    the projected swirl-field direction at its surface point. Occlusion and
    the argmin landscape then behave like capture data."""
    import jax.numpy as jnp
    from monohair_tpu.pmvo.solver import PMVOMaps

    w2c = np.asarray(cams.w2c)
    ndc = np.asarray(cams.ndc)
    rows, cols = np.meshgrid(np.arange(H, dtype=np.float32) + 0.5,
                             np.arange(W, dtype=np.float32) + 0.5,
                             indexing="ij")
    # pixel_to_ndc (camera.py:127-134)
    u = -(cols / W * 2.0 - 1.0)
    v = rows / H * 2.0 - 1.0

    depth = np.full((V, H, W), 220.0, np.float32)
    ori2d = np.zeros((V, H, W, 2), np.float32)
    conf = np.full((V, H, W), 0.03, np.float32)
    mask = np.zeros((V, H, W), np.float32)
    for vi in range(V):
        fx, fy, cx, cy = ndc[vi]
        R = w2c[vi, :3, :3]          # world->cam rotation
        eye = -R.T @ w2c[vi, :3, 3]
        # cam-frame ray through each pixel at z=-1 (project inverse)
        dc = np.stack([-(u - cx) / fx, -(v - cy) / fy, -np.ones_like(u)], -1)
        dw = dc @ R                   # (H, W, 3) world rays (R.T @ dc)
        dw /= np.linalg.norm(dw, axis=-1, keepdims=True)
        b = dw @ eye
        disc = b * b - (eye @ eye - HEAD_RADIUS ** 2)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        p = eye[None, None] + dw * t[..., None]               # surface point
        z_cam = (p - eye) @ R[2]                              # camera z (<0)
        depth[vi][hit] = (-z_cam[hit]) / 2.0 * 255.0          # solver z255
        # project p + eps*dir to get the image-space orientation
        d3 = swirl_direction(p)
        p2 = p + 1e-3 * d3
        cam2 = (p2 - eye) @ R.T
        u2 = fx * cam2[..., 0] / cam2[..., 2] + cx
        v2 = fy * cam2[..., 1] / cam2[..., 2] + cy
        drow = (v2 - v) * 0.5 * H
        dcol = -(u2 - u) * 0.5 * W
        n = np.maximum(np.hypot(drow, dcol), 1e-9)
        sgn = np.where(drow < 0, -1.0, 1.0)                   # angle in [0,pi)
        ori2d[vi, ..., 0] = np.where(hit, sgn * drow / n, 0.0)
        ori2d[vi, ..., 1] = np.where(hit, sgn * dcol / n, 0.0)
        conf[vi][hit] = 0.75 + 0.2 * np.cos(40.0 * np.arctan2(p[hit][:, 2],
                                                              p[hit][:, 0]))
        mask[vi][hit] = 1.0
    return PMVOMaps(cams, jnp.asarray(depth), jnp.asarray(ori2d),
                    jnp.asarray(conf), jnp.asarray(mask))


def shell_points(rng, n):
    """Candidate samples on a jittered head-sphere shell — each view sees the
    near hemisphere, the far one is occluded (realistic visibility)."""
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r = HEAD_RADIUS + rng.normal(size=(n, 1)) * 0.004
    return (d * r).astype(np.float32)


def bench_stage0a_nerf(rng):
    import jax.numpy as jnp
    from monohair_tpu.nerf.dense_grid import DenseGridField
    from monohair_tpu.nerf.train import NerfDataset, train_nerf

    F, H, W = 16, 720, 1280
    imgs = rng.random((F, H, W, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * F)
    for i in range(F):
        a = 2 * math.pi * i / F
        poses[i, :3, 3] = [1.6 * math.cos(a), 0.2, 1.6 * math.sin(a)]
    ds = NerfDataset(imgs, poses, 640.0, 640.0, W / 2, H / 2)

    def run(steps):
        t0 = time.perf_counter()
        # The validated end-to-end configuration (configs/reconstruct/
        # bigsynth.yaml): 4096x64 = 262k differentiated samples/step — half
        # of every documented axon fault boundary; uniform sampling avoids
        # the 1.05M-sample hierarchical step at 8192 rays, and scan_block=4
        # is the stable dispatch shape (1-step donated blocks wedge the
        # worker, >= 8-step scans kernel-fault).
        train_nerf(ds, steps=steps, rays_per_batch=4096,
                   field=DenseGridField(), tv_weight=1e-4,
                   use_occupancy=False, scan_block=4,
                   log_every=steps)
        return time.perf_counter() - t0
    t_small, n_small = run(64), 64
    t_big, n_big = run(320), 320
    t_step = max(t_big - t_small, 1e-3) / (n_big - n_small)
    t_train = t_step * NERF_BUDGET_STEPS

    # 16 fixed-view renders + the 256^3 density export, measured directly
    from monohair_tpu.nerf.ngp import density_grid, init_occupancy_grid
    from monohair_tpu.nerf.train import render_image
    field = DenseGridField()
    variables = field.init(__import__("jax").random.PRNGKey(0),
                           jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    occ = init_occupancy_grid(128)
    t0 = time.perf_counter()
    render_image(field, variables, poses[0], 1280, 720, 640.0, 640.0,
                 640.0, 360.0, occ_grid=occ)
    t_render = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(density_grid(field, variables, 256))
    t_grid = time.perf_counter() - t0
    return t_train + 16 * t_render + t_grid, 1.0 / t_step


def bench_stage0b_segment(rng):
    import jax
    import jax.numpy as jnp
    from monohair_tpu.segment.bisenet import BiSeNet
    from monohair_tpu.segment.fan import FAN
    from monohair_tpu.segment.modnet import MODNet

    frames = 16
    mod = MODNet()
    mv = jax.jit(mod.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1, 512, 512, 3)))
    x1 = jnp.asarray(rng.random((1, 512, 512, 3)).astype(np.float32))
    t_matte = timed_device(lambda v, x: mod.apply(v, x)[2], mv, x1)

    bis = BiSeNet(n_classes=19)
    bv = jax.jit(bis.init)(jax.random.PRNGKey(1), jnp.zeros((1, 512, 512, 3)))
    # 3 scales x flip ensemble = 6 forwards per frame (calc_masks.py:67-124)
    t_parse = 0.0
    for s in (338, 410, 512):
        xs = jnp.asarray(rng.random((1, s, s, 3)).astype(np.float32))
        t_parse += 2 * timed_device(lambda v, x: bis.apply(v, x)[0], bv, xs)

    fan = FAN()
    fv = jax.jit(fan.init)(jax.random.PRNGKey(2), jnp.zeros((1, 256, 256, 3)))
    xf = jnp.asarray(rng.random((1, 256, 256, 3)).astype(np.float32))
    t_fan = timed_device(lambda v, x: fan.apply(v, x), fv, xf)
    return frames * (t_matte + t_parse) + 4 * (t_matte + t_fan)


def bench_stage0c_bustfit(rng):
    import jax.numpy as jnp
    from monohair_tpu.bustfit.optimize import (FitTargets, fit_bust_full,
                                               project_to_pixels)
    from monohair_tpu.bustfit.smplx import random_test_model
    from monohair_tpu.bustfit.texture import FlameTex

    model = random_test_model(rng, num_verts=10475, num_joints=55,
                              num_betas=10, num_expr=10)
    Vn = 10475
    cams = ring_cameras(4, 720, 1280)
    image_size = (720, 1280)
    lmk_ids = np.linspace(0, Vn - 1, 68).astype(np.int64)
    iris_ids = np.array([3, Vn - 4], np.int64)
    gt_lmk = project_to_pixels(cams, image_size, model.v_template[lmk_ids])
    gt_iris = project_to_pixels(cams, image_size, model.v_template[iris_ids])
    h, w = 720 // 8, 1280 // 8
    targets = FitTargets(
        lmk_px=gt_lmk, iris_px=gt_iris,
        mask=jnp.asarray(rng.random((4, h, w)).astype(np.float32)),
        hair_mask=jnp.zeros((4, h, w)),
        face_mask=jnp.asarray(rng.random((4, h, w)).astype(np.float32)),
        image=jnp.asarray(rng.random((4, h, w, 3)).astype(np.float32)))
    tex = FlameTex(jnp.full((Vn, 3), 0.5),
                   jnp.asarray(rng.normal(size=(Vn, 3, 50))
                               .astype(np.float32) * 0.05))

    def run(iters):
        t0 = time.perf_counter()
        fit_bust_full(model, cams, image_size, targets, lmk_ids,
                      iris_vertex_ids=iris_ids, tex_model=tex, iters=iters)
        return time.perf_counter() - t0
    t_small, t_big = run(10), run(110)
    t_iter = max(t_big - t_small, 1e-4) / 100
    return t_iter * BUSTFIT_BUDGET_ITERS, 1.0 / t_iter


def bench_stage1_gabor(rng):
    import jax.numpy as jnp
    from monohair_tpu.ops.gabor import orientation_maps
    frames = jnp.asarray(rng.random((1, 1920, 1080)).astype(np.float32))
    t_one = timed_device(lambda f: orientation_maps(f[0]), frames)
    return 16 * t_one


def bench_stage2_pmvo(rng, total_points=2_100_000, chunk=32768):
    import jax.numpy as jnp
    from monohair_tpu.pmvo.solver import pmvo_forward, pmvo_refine_loss
    V, H, W = 16, 1920, 1080
    cams = ring_cameras(V, H, W)
    maps = analytic_head_maps(cams, V, H, W)
    points = jnp.asarray(shell_points(rng, chunk))
    t_fwd = timed_device(
        lambda m, p: pmvo_forward(m, p, patch_size=7, conf_threshold=0.15),
        maps, points)
    ori = jnp.asarray(swirl_direction(np.asarray(points))
                      + rng.normal(size=(chunk, 3)) * 0.05)
    ori = ori / jnp.linalg.norm(ori, axis=-1, keepdims=True)
    t_ref = timed_device(
        lambda m, p, o: pmvo_refine_loss(m, p, o, 7, 0.15), maps, points, ori)
    n_chunks = math.ceil(total_points / chunk)
    pts_per_sec = chunk / t_fwd
    return n_chunks * t_fwd + n_chunks * t_ref, pts_per_sec


def bench_stage3_mvs(rng, total_queries=2_000_000, batch=32768):
    """Production-scale stage 3 on chip: 16 views x 1280x720 pyramids + both
    heads. The reference batches 8192 queries (vit_standard.txt:40, a GPU
    VRAM choice); on TPU 32768 measures ~24% higher throughput
    (tools/tune_mvs_batch.py; 65536 OOMs in the ViT attention)."""
    import jax
    import jax.numpy as jnp
    from monohair_tpu.models.pifu import OccAttn, OriAttn
    from monohair_tpu.mvs.eval import eval_points
    V, H, W = 16, 720, 1280
    imgs = jnp.asarray(rng.normal(size=(V, H, W, 4)).astype(np.float32))
    w2c = jnp.asarray(np.stack([np.eye(4)] * V).astype(np.float32))
    ndc = jnp.asarray(np.tile([2.06, 1.16, 0.0, 0.0], (V, 1)).astype(np.float32))
    occ_model = OccAttn(num_views=V)
    ori_model = OriAttn(num_views=V)
    dummy = (jnp.zeros((V, 8, 8, 4)), jnp.zeros((8, 3)), jnp.zeros((V, 8, 3)),
             jnp.zeros((V, 8, 2)))
    occ_vars = jax.jit(occ_model.init)(jax.random.PRNGKey(0), *dummy)
    ori_vars = jax.jit(ori_model.init)(jax.random.PRNGKey(1), *dummy)

    # Everything array-like rides as jit args (captured device arrays bake
    # into the HLO as constants and blow the axon remote-compile limit).
    feat_fn = jax.jit(lambda m, v, x: m.apply(v, x, method=m.get_feat),
                      static_argnums=0)
    t_feat = timed_device(lambda v, x: feat_fn(occ_model, v, x), occ_vars,
                          imgs, iters=2)
    t_feat += timed_device(lambda v, x: feat_fn(ori_model, v, x), ori_vars,
                           imgs, iters=2)
    occ_feats = feat_fn(occ_model, occ_vars, imgs)
    ori_feats = feat_fn(ori_model, ori_vars, imgs)

    pts = jnp.asarray((rng.random((batch, 3)).astype(np.float32) - 0.5) * 0.4)
    t_batch = timed_device(
        lambda ov, orv, of, orf, w, nd, p: eval_points(
            occ_model, ov, ori_model, orv, of, orf, w, nd, p),
        occ_vars, ori_vars, occ_feats, ori_feats, w2c, ndc, pts)
    n_batches = math.ceil(total_queries / batch)
    return t_feat + n_batches * t_batch, batch / t_batch


def curved_strand_batch(rng, count, length, grid_shape, step=1.1):
    """(count, length, 3) voxel-space polylines integrating the swirl field
    around a head centered in the grid — curved, varied, non-axis-aligned."""
    center = np.array([grid_shape[0] / 2, grid_shape[1] * 0.55,
                       grid_shape[2] / 2])
    scale = grid_shape[0] * 0.28
    d = rng.normal(size=(count, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p = center + d * (scale * (1.0 + rng.random((count, 1)) * 0.25))
    out = np.empty((count, length, 3))
    for i in range(length):
        out[:, i] = p
        w = swirl_direction((p - center) / scale)
        w += rng.normal(size=w.shape) * 0.08       # per-step waviness
        w /= np.linalg.norm(w, axis=-1, keepdims=True)
        p = p + w * step
    lo = np.array([1.0, 1.0, 1.0])
    hi = np.array(grid_shape, np.float64) - 2.0
    return np.clip(out, lo, hi)


def bench_stage4_grow(rng, target_strands=100_000):
    import time as _t
    from monohair_tpu.strands.connect import connect_to_scalp
    from monohair_tpu.strands.trace import generate_segments

    # full output-grid size (PMVO.py:695-700): 256 x 256 x 192
    shape = (256, 256, 192)
    occ = np.zeros(shape, np.float32)
    ori = np.zeros(shape + (3,), np.float32)
    field_strands = curved_strand_batch(rng, 8000, 60, shape)
    idx = np.round(field_strands[:, :-1]).astype(np.int64)
    seg_dir = field_strands[:, 1:] - field_strands[:, :-1]
    seg_dir /= np.linalg.norm(seg_dir, axis=-1, keepdims=True)
    ix, iy, iz = idx[..., 0].ravel(), idx[..., 1].ravel(), idx[..., 2].ravel()
    occ[ix, iy, iz] = 1.0
    ori[ix, iy, iz] = seg_dir.reshape(-1, 3)
    t0 = _t.perf_counter()
    segs = generate_segments(occ, ori, thr_dot=0.8, sweeps=2)
    t_trace = _t.perf_counter() - t0

    # 100k curved strands straight through the native C++ kernel; 1/5 rooted
    arcs = curved_strand_batch(rng, target_strands, 25, shape)
    strands = [arcs[i] for i in range(target_strands)]
    t0 = _t.perf_counter()
    connect_to_scalp(strands, target_strands // 5, occ, ori)
    t_connect = _t.perf_counter() - t0
    return t_trace + t_connect, len(segs)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)

    t0a, nerf_steps_s = bench_stage0a_nerf(rng)
    print(f"# stage0a nerf: {t0a:.1f}s ({nerf_steps_s:.1f} steps/s)", flush=True)
    t0b = bench_stage0b_segment(rng)
    print(f"# stage0b segment: {t0b:.1f}s", flush=True)
    t0c, fit_iters_s = bench_stage0c_bustfit(rng)
    print(f"# stage0c bustfit: {t0c:.1f}s ({fit_iters_s:.1f} iters/s)", flush=True)
    t1 = bench_stage1_gabor(rng)
    print(f"# stage1 gabor: {t1:.1f}s", flush=True)
    t2, pmvo_pts_s = bench_stage2_pmvo(rng)
    print(f"# stage2 pmvo: {t2:.1f}s ({pmvo_pts_s:,.0f} pts/s)", flush=True)
    t3, mvs_pts_s = bench_stage3_mvs(rng)
    print(f"# stage3 mvs: {t3:.1f}s ({mvs_pts_s:,.0f} queries/s)", flush=True)
    t4, n_traced = bench_stage4_grow(rng)
    print(f"# stage4 grow: {t4:.1f}s ({n_traced} traced segments)", flush=True)
    e2e = t0a + t0b + t0c + t1 + t2 + t3 + t4

    print(json.dumps({
        "metric": "e2e_capture_scale_seconds",
        "value": round(e2e, 1),
        "unit": "s",
        "vs_baseline": round(NORTH_STAR_SECONDS / e2e, 2),
        "stages": {"nerf": round(t0a, 1), "segment": round(t0b, 1),
                   "bustfit": round(t0c, 1), "gabor": round(t1, 1),
                   "pmvo": round(t2, 1), "mvs": round(t3, 1),
                   "grow": round(t4, 1),
                   "nerf_steps_per_sec": round(nerf_steps_s, 1),
                   "bustfit_iters_per_sec": round(fit_iters_s, 1),
                   "pmvo_points_per_sec": round(pmvo_pts_s, 1),
                   "mvs_queries_per_sec": round(mvs_pts_s, 1)},
    }))


if __name__ == "__main__":
    main()
