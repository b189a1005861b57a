#!/usr/bin/env python
"""Benchmark: end-to-end capture-scale pipeline wall-clock on real hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "stages"}.

CRASH ISOLATION (VERDICT r3 weak #1): each stage runs in its OWN subprocess
(`bench.py --stage <name>`) — an axon worker crash poisons the crashing
process's client, so in-process retry is useless. The parent probes the
tunnel with a fresh-process matmul before each stage and, on a stage
failure, waits across the documented ~5 min recovery window
(platform_limits.wait_for_device) and retries the stage once. The JSON line
is ALWAYS emitted, with per-stage {"seconds": ...} or {"error": ...} — one
crash costs one stage, not the round.

ROOFLINE ACCOUNTING (VERDICT r3 next #8): stages report achieved FLOP/s
against the v5e bf16 peak (PEAK_FLOPS) where the work is MXU-bound, and
achieved gather rows/s against the measured ~120M rows/s XLA gather ceiling
where it is gather-bound (nerf encode, mvs grid-sample) — "is it fast?"
becomes arithmetic.

Every stage of BASELINE.md's "full reconstruction" runs ON THE CHIP at
big_wavy1-scale workloads (north star: < 10 min on one TPU v5e):

  stage0a coarse NeRF — the shipped default field (nerf/pipeline.py
          DEFAULT_FIELD, via the same make_field registry the pipeline uses)
          trained for the pipeline budget (nerf/pipeline.py DEFAULT_* shape,
          16 capture views at 1280x720); per-step cost
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
BUSTFIT_BUDGET_ITERS = 2000  # bustfit/pipeline.py:181 default

# v5e peak: 197 TFLOP/s bf16 (the default matmul class on this stack) and the
# measured ~120M rows/s XLA gather/scatter ceiling (CLAUDE.md).
PEAK_FLOPS = 197e12
GATHER_ROWS_PER_SEC_CEILING = 120e6


def _nerf_workload():
    """The canonical stage-0a workload — read from the pipeline module so the
    bench and the shipped defaults cannot drift (ADVICE r3 medium)."""
    from monohair_tpu.nerf import pipeline as npipe
    return (npipe.DEFAULT_TRAIN_STEPS, npipe.DEFAULT_RAYS_PER_BATCH,
            npipe.DEFAULT_USE_OCCUPANCY, npipe.DEFAULT_FIELD)


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


def timed_device(fn, *args, iters=3, want_flops=False):
    """Device timing over the axon tunnel: reduce outputs on device and read
    one scalar back (block_until_ready does not synchronize the tunnel).
    With want_flops=True also returns XLA's compiled-module FLOP estimate
    (cost_analysis) for roofline accounting."""
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    red = jax.jit(reduced)
    flops = None
    if want_flops:
        try:
            ca = red.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            flops = None
    acc = float(red(*args))  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        acc += float(red(*args))
    assert np.isfinite(acc)
    t = (time.perf_counter() - t0) / iters
    return (t, flops) if want_flops else t


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
    from monohair_tpu.nerf.pipeline import make_field
    from monohair_tpu.nerf.train import NerfDataset, train_nerf

    budget_steps, rays, use_occ, field_kind = _nerf_workload()
    F, H, W = 16, 720, 1280
    imgs = rng.random((F, H, W, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * F)
    for i in range(F):
        a = 2 * math.pi * i / F
        poses[i, :3, 3] = [1.6 * math.cos(a), 0.2, 1.6 * math.sin(a)]
    ds = NerfDataset(imgs, poses, 640.0, 640.0, W / 2, H / 2)

    def run(steps):
        t0 = time.perf_counter()
        # The shipped pipeline default shape AND field (nerf/pipeline.py
        # DEFAULT_*), guarded by platform_limits.assert_train_step_shape.
        field, tv, lr = make_field(field_kind)
        train_nerf(ds, steps=steps, rays_per_batch=rays,
                   field=field, tv_weight=tv, lr=lr,
                   use_occupancy=use_occ, log_every=steps)
        return time.perf_counter() - t0
    t_small, n_small = run(64), 64
    t_big, n_big = run(320), 320
    t_step = max(t_big - t_small, 1e-3) / (n_big - n_small)
    t_train = t_step * budget_steps

    samples = rays * 64 * (2 if use_occ else 1)

    # 16 fixed-view renders + the 256^3 density export, measured directly
    from monohair_tpu.nerf.ngp import density_grid, init_occupancy_grid
    from monohair_tpu.nerf.train import render_image
    field, _, _ = make_field(field_kind)
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
    out = {"seconds": t_train + 16 * t_render + t_grid,
           "nerf_steps_per_sec": 1.0 / t_step,
           "nerf_budget_steps": budget_steps,
           "nerf_rays_per_batch": rays,
           "nerf_use_occupancy": use_occ,
           "nerf_field": field_kind,
           "nerf_render_seconds": 16 * t_render,
           "nerf_grid_export_seconds": t_grid}
    if field_kind == "dense":
        # the dense-grid encode is gather-bound — rows/step = samples x
        # levels x 4 xy-corner rows, doubled for the backward scatter;
        # the fourier field has no gathers (MXU-bound), so MFU instead
        rows_per_sec = samples * 3 * 4 * 2 / t_step
        out["nerf_gather_rows_per_sec"] = rows_per_sec
        out["nerf_gather_ceiling_frac"] = (rows_per_sec
                                           / GATHER_ROWS_PER_SEC_CEILING)
    elif hasattr(field, "flops_per_sample"):
        # fwd + backward ~= 3x forward model FLOPs
        flops_step = 3.0 * field.flops_per_sample() * samples
        out["nerf_mfu"] = flops_step / t_step / PEAK_FLOPS
    return out


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
    t_matte, f_matte = timed_device(lambda v, x: mod.apply(v, x)[2], mv, x1,
                                    want_flops=True)

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
    t_fan, f_fan = timed_device(lambda v, x: fan.apply(v, x), fv, xf,
                                want_flops=True)
    out = {"seconds": frames * (t_matte + t_parse) + 4 * (t_matte + t_fan)}
    if f_fan:
        out["fan_mfu"] = f_fan / t_fan / PEAK_FLOPS
    if f_matte:
        out["modnet_mfu"] = f_matte / t_matte / PEAK_FLOPS
    return out


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
    return {"seconds": t_iter * BUSTFIT_BUDGET_ITERS,
            "bustfit_iters_per_sec": 1.0 / t_iter,
            "bustfit_budget_iters": BUSTFIT_BUDGET_ITERS}


def bench_stage1_gabor(rng):
    import jax.numpy as jnp
    from monohair_tpu.ops.gabor import orientation_maps
    frames = jnp.asarray(rng.random((1, 1920, 1080)).astype(np.float32))
    t_one, f_one = timed_device(lambda f: orientation_maps(f[0]), frames,
                                want_flops=True)
    out = {"seconds": 16 * t_one}
    if f_one:
        out["gabor_mfu"] = f_one / t_one / PEAK_FLOPS
    return out


def bench_stage2_pmvo(rng, total_points=2_100_000, chunk=32768):
    import jax.numpy as jnp
    from monohair_tpu.pmvo.solver import pmvo_forward, pmvo_refine_loss
    V, H, W = 16, 1920, 1080
    cams = ring_cameras(V, H, W)
    maps = analytic_head_maps(cams, V, H, W)
    points = jnp.asarray(shell_points(rng, chunk))
    t_fwd, f_fwd = timed_device(
        lambda m, p: pmvo_forward(m, p, patch_size=7, conf_threshold=0.15),
        maps, points, want_flops=True)
    ori = jnp.asarray(swirl_direction(np.asarray(points))
                      + rng.normal(size=(chunk, 3)) * 0.05)
    ori = ori / jnp.linalg.norm(ori, axis=-1, keepdims=True)
    t_ref = timed_device(
        lambda m, p, o: pmvo_refine_loss(m, p, o, 7, 0.15), maps, points, ori)
    n_chunks = math.ceil(total_points / chunk)
    pts_per_sec = chunk / t_fwd
    out = {"seconds": n_chunks * t_fwd + n_chunks * t_ref,
           "pmvo_points_per_sec": pts_per_sec,
           "pmvo_total_points": total_points, "pmvo_chunk": chunk}
    if f_fwd:
        out["pmvo_mfu"] = f_fwd / t_fwd / PEAK_FLOPS
    # the Pallas DMA patch gather moves one (P x P x C) window per
    # (view, point); windows/s is its throughput unit (pallas_kernels.py)
    out["pmvo_patch_windows_per_sec"] = chunk * V / t_fwd
    return out


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
    t_batch, f_batch = timed_device(
        lambda ov, orv, of, orf, w, nd, p: eval_points(
            occ_model, ov, ori_model, orv, of, orf, w, nd, p),
        occ_vars, ori_vars, occ_feats, ori_feats, w2c, ndc, pts,
        want_flops=True)
    n_batches = math.ceil(total_queries / batch)
    out = {"seconds": t_feat + n_batches * t_batch,
           "mvs_queries_per_sec": batch / t_batch,
           "mvs_total_queries": total_queries, "mvs_batch": batch}
    if f_batch:
        out["mvs_mfu"] = f_batch / t_batch / PEAK_FLOPS
    # pixel-aligned feature sampling is gather-bound: 2 heads x 4 pyramid
    # scales x V views x batch bilinear lookups (4 corner rows each)
    rows = 2 * 4 * V * batch * 4
    out["mvs_gather_rows_per_sec"] = rows / t_batch
    out["mvs_gather_ceiling_frac"] = (rows / t_batch
                                      / GATHER_ROWS_PER_SEC_CEILING)
    return out


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
    return {"seconds": t_trace + t_connect, "grow_traced_segments": len(segs),
            "grow_trace_seconds": t_trace, "grow_connect_seconds": t_connect,
            "grow_strands": target_strands}


STAGES = {
    "nerf": bench_stage0a_nerf,
    "segment": bench_stage0b_segment,
    "bustfit": bench_stage0c_bustfit,
    "gabor": bench_stage1_gabor,
    "pmvo": bench_stage2_pmvo,
    "mvs": bench_stage3_mvs,
    "grow": bench_stage4_grow,
}

#: generous per-stage wall cap; a wedged tunnel otherwise hangs the round
STAGE_TIMEOUT = 2400

_RESULT_TAG = "BENCH_STAGE_RESULT "


def run_stage(name: str) -> None:
    """Child-process entry: run one stage, print a tagged JSON result line."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    res = STAGES[name](rng)
    print(_RESULT_TAG + json.dumps(res), flush=True)


def _run_stage_subprocess(name: str, timeout: float = STAGE_TIMEOUT) -> dict:
    """Run one stage in a fresh process (a worker crash poisons the crashing
    process's TPU client — isolation is the only way a later stage survives
    an earlier crash). Returns the stage dict or {"error": ...}."""
    import subprocess
    import sys
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--stage", name],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout:.0f}s (wedged tunnel?)"}
    for line in proc.stdout.splitlines():
        if line.startswith(_RESULT_TAG):
            return json.loads(line[len(_RESULT_TAG):])
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-6:]
    return {"error": f"rc={proc.returncode}: " + " | ".join(tail)[-500:]}


def _final_record(results: dict, order: list, budget: float) -> dict:
    measured = {n: r for n, r in results.items() if "seconds" in r}
    e2e = sum(r["seconds"] for r in measured.values())
    stages = {}
    for n, r in results.items():
        for k, v in r.items():
            key = n if k == "seconds" else k
            stages[key] = round(v, 4) if isinstance(v, float) else v
    stages["stages_failed"] = [n for n in order if n not in measured]
    return {
        "metric": "e2e_capture_scale_seconds",
        "value": round(e2e, 1),
        "unit": "s",
        "vs_baseline": (round(NORTH_STAR_SECONDS / e2e, 2)
                        if e2e > 0 and len(measured) == len(order) else 0.0),
        "complete": len(measured) == len(order),
        "budget_seconds": budget,
        "stages": stages,
    }


def main():
    """Per-stage crash isolation under a GLOBAL wall-clock budget (VERDICT r4
    weak #2: unbounded per-stage recovery waits outlived the round-4 driver
    window, rc=124 and no artifact). Every stage result is streamed to
    --partial-out as it completes, and the final JSON line is emitted no
    matter what — on budget exhaustion and on SIGTERM — with explicit
    per-stage errors instead of a dead silence."""
    import argparse
    import os
    import signal

    from monohair_tpu.platform_limits import wait_for_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-seconds", type=float, default=float(
        os.environ.get("MONOHAIR_BENCH_BUDGET", 1320.0)))
    ap.add_argument("--partial-out", default="BENCH_partial.json")
    a = ap.parse_args()
    deadline = time.monotonic() + a.budget_seconds

    results, order = {}, list(STAGES)
    emitted = []

    def write_partial():
        try:
            with open(a.partial_out, "w") as f:
                json.dump(_final_record(results, order, a.budget_seconds), f,
                          indent=1)
        except OSError:
            pass

    def emit_final():
        if emitted:
            return
        emitted.append(True)
        for n in order:
            results.setdefault(n, {"error": "skipped: bench budget exhausted"})
        write_partial()
        print(json.dumps(_final_record(results, order, a.budget_seconds)),
              flush=True)

    def on_term(signum, frame):  # the driver's `timeout` sends SIGTERM first
        for n in order:
            results.setdefault(n, {"error": "skipped: SIGTERM (driver budget)"})
        emit_final()
        raise SystemExit(1)

    signal.signal(signal.SIGTERM, on_term)

    for name in order:
        remaining = deadline - time.monotonic()
        if remaining < 90:
            results[name] = {"error": "skipped: bench budget exhausted"}
            print(f"# {name}: SKIPPED (budget exhausted)", flush=True)
            continue
        # probe the tunnel with a fresh-process matmul first; after a crash
        # it stays dead ~5 min (CLAUDE.md) — wait, but never past the budget
        if not wait_for_device(max_wait=min(600.0, remaining - 60.0),
                               poll=60.0):
            results[name] = {"error": "skipped: tunnel_dead"}
            print(f"# {name}: SKIPPED (tunnel dead)", flush=True)
            write_partial()
            continue
        stage_cap = min(STAGE_TIMEOUT,
                        max(60.0, deadline - time.monotonic() - 30.0))
        res = _run_stage_subprocess(name, timeout=stage_cap)
        if "error" in res:
            remaining = deadline - time.monotonic()
            print(f"# {name}: FAILED ({res['error'][:120]}); "
                  f"{remaining:.0f}s budget left", flush=True)
            if remaining > 300 and wait_for_device(
                    max_wait=min(600.0, remaining - 120.0), poll=60.0):
                res = _run_stage_subprocess(name, timeout=min(
                    STAGE_TIMEOUT,
                    max(60.0, deadline - time.monotonic() - 30.0)))
        results[name] = res
        write_partial()
        if "seconds" in res:
            print(f"# {name}: {res['seconds']:.1f}s", flush=True)
        else:
            print(f"# {name}: ERROR {res.get('error', '?')[:200]}", flush=True)

    emit_final()


if __name__ == "__main__":
    import sys
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        run_stage(sys.argv[2])
    else:
        main()
