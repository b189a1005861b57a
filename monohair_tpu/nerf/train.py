"""NeRF training loop: random-ray Adam steps over the capture images.

Replaces the instant-ngp training drive (run.py:184-206; default budget 35 000
steps on CUDA — the hash-grid + tiny MLPs converge on TPU in far fewer because
we batch 16k rays/step at bf16 matmul throughput).
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import platform_limits
from .ngp import (NGPField, camera_rays, init_occupancy_grid, render_rays,
                  render_rays_occ, update_occupancy_grid)


class NerfDataset(NamedTuple):
    images: np.ndarray     # (F, H, W, 3) float32 in [0, 1]
    c2w: np.ndarray        # (F, 4, 4) NeRF convention
    fx: float
    fy: float
    cx: float
    cy: float


def load_nerf_dataset(transforms_path: str, image_root: str,
                      max_images: Optional[int] = None) -> NerfDataset:
    import cv2
    from .poses import load_transforms_json
    xforms, fov, intr = load_transforms_json(transforms_path,
                                             return_intrinsics=True)
    names = list(xforms)
    if max_images:
        names = names[:: max(1, len(names) // max_images)][:max_images]
    imgs, poses = [], []
    for n in names:
        for ext in (".png", ".jpg", ".JPG"):
            p = os.path.join(image_root, n + ext)
            if os.path.exists(p):
                img = cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
                imgs.append(img)
                poses.append(xforms[n])
                break
    images = np.stack(imgs)
    H, W = images.shape[1:3]
    import math
    fy = H / 2.0 / math.tan(math.radians(fov) / 2.0)
    # prefer explicit colmap2nerf intrinsics over the fov-derived square pixel
    fx = float(intr["fl_x"]) if intr.get("fl_x") else fy
    fy = float(intr["fl_y"]) if intr.get("fl_y") else fy
    cx = float(intr["cx"]) if intr.get("cx") else W / 2.0
    cy = float(intr["cy"]) if intr.get("cy") else H / 2.0
    return NerfDataset(images, np.stack(poses).astype(np.float32),
                       fx=fx, fy=fy, cx=cx, cy=cy)


def train_nerf(ds: NerfDataset, steps: int = 4000, rays_per_batch: int = 4096,
               lr: float = 1e-2, seed: int = 0, log_every: int = 500,
               field: Optional[NGPField] = None, use_occupancy: bool = True,
               occ_resolution: int = 128, occ_update_every: int = 16,
               occ_warmup: int = 256, num_samples: int = 64,
               num_fine: int = 64,
               scan_block: int = platform_limits.MAX_TRAIN_SCAN,
               verbose: bool = False,
               tv_weight: float = 0.0, use_remat: Optional[bool] = None,
               sync_every: int = platform_limits.SYNC_EVERY_BLOCKS,
               mesh=None, param_dtype=None, init_state=None,
               total_steps: Optional[int] = None, return_state: bool = False,
               background=None):
    """Returns (field, variables, losses, occ_grid). After `occ_warmup`
    uniform-sampling steps, maintains an EMA occupancy grid (updated every
    `occ_update_every` steps) and trains through occupancy-guided sampling —
    the instant-ngp density-bitfield acceleration, TPU-shaped (ngp.py).

    The whole loop is device-resident: images sit in HBM as uint8, ray
    sampling uses jax.random inside jit, and lax.scan runs `scan_block`
    optimizer steps per device call. Dispatch is async (the host only syncs
    at log points), so blocks pipeline over the axon tunnel. Shapes are
    guarded against the axon fault boundaries centralized in
    monohair_tpu/platform_limits.py (scan length, differentiated-sample
    count, runahead sync depth, remat).

    With `mesh` (a 1-D jax.sharding.Mesh over axis "data"), the ray batch is
    sharded over devices and parameters stay replicated — XLA psums the
    gradients over ICI; semantics are identical to single-device (pinned by
    __graft_entry__.dryrun_multichip section 'nerf-train')."""
    field = field or NGPField()
    # occupancy-guided steps only differentiate the num_fine MLP samples
    # (coarse placement reads the precomputed occ grid, ngp.py:302-322) — but
    # the first `occ_warmup` steps run the UNIFORM block, differentiating
    # num_samples. Both phases must stay inside the fault boundary (ADVICE
    # r4: rays=8192, num_samples=128, num_fine=64 passed the old fine-only
    # guard and then crashed during warmup at 1.05M samples).
    if use_occupancy:
        worst = max(num_samples if occ_warmup > 0 else 0, num_fine)
    else:
        worst = num_samples
    platform_limits.assert_train_step_shape(
        rays_per_batch, worst, 0, scan_block, what="train_nerf")
    platform_limits.assert_dense_field_safe(
        field, rays_per_batch, worst, what="train_nerf")
    sparsity_w = float(getattr(field, "sparsity_weight", 0.0))
    if use_remat is None:
        # remat trades the hash encode's multi-GB residuals for recompute;
        # for the dense grid it is BOTH unnecessary (row-gather residuals are
        # small) and fatal — the axon worker kernel-faults executing the
        # rematerialized backward even at 8192x64 samples where the plain
        # backward runs fine (tools/debug_dense_step3.py bisect).
        use_remat = not hasattr(field, "tv")
    rng = jax.random.PRNGKey(seed)
    # the decay horizon is total_steps so warm-started segments (init_state,
    # used by validate_nerf --curve for a PSNR-vs-steps curve from ONE run)
    # continue the same schedule: adam's count rides in opt_state.
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adam(optax.exponential_decay(
                         lr, total_steps or steps, 0.1)))
    # warm-start state is (variables, opt_state, occ_grid, steps_done): the
    # occupancy grid and the warmup counter ride along so a segmented run
    # (validate_nerf --curve) is exactly one continuous run, not a sequence
    # of re-warmed ones (ADVICE r4). A legacy 2-tuple still works.
    steps_done = 0
    occ_grid = None
    if init_state is not None:
        if len(init_state) == 4:
            variables, opt_state, occ_grid, steps_done = init_state
        else:
            variables, opt_state = init_state
    else:
        variables = field.init(rng, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
        opt_state = tx.init(variables)
    if occ_grid is None:
        occ_grid = init_occupancy_grid(occ_resolution if use_occupancy else 1)

    F, H, W = ds.images.shape[:3]
    # channel-FIRST on device: a (F, H*W, 3) u8 buffer tile-pads its minor
    # dim 3 -> 128 (42x HBM blowup); (3, F, H*W) keeps the pixel axis minor
    imgs_u8 = jnp.asarray(np.ascontiguousarray(
        np.clip(np.rint(ds.images.reshape(F, H * W, 3) * 255.0), 0, 255)
        .astype(np.uint8).transpose(2, 0, 1)))
    c2w_all = jnp.asarray(ds.c2w)
    fx, fy, cx, cy = ds.fx, ds.fy, ds.cx, ds.cy
    # scene backdrop composited behind the volume (ngp.render_rays docstring:
    # bright backdrops with no in-bound geometry otherwise floor the loss and
    # starve the surface density). (3,) constant — fine to close over.
    bg = (None if background is None
          else jnp.broadcast_to(jnp.asarray(background, jnp.float32), (3,)))

    def one_step(use_occ):
        # remat the whole render: backward re-runs it instead of holding the
        # per-level hash-encode residuals (~GBs at 8192 rays x 128 samples)
        def rendered(variables, grid, o, d, sub):
            if use_occ:
                return render_rays_occ(field, variables, grid, o, d,
                                       num_coarse=num_samples,
                                       num_fine=num_fine, rng=sub,
                                       background=bg)[0]
            return render_rays(field, variables, o, d, num_samples, sub,
                               background=bg)[0]
        if use_remat:
            rendered = jax.checkpoint(rendered)

        def loss_fn(variables, grid, o, d, target, sub):
            rgb = rendered(variables, grid, o, d, sub)
            loss = jnp.mean(optax.huber_loss(rgb, target, delta=0.1))
            if tv_weight > 0.0 and hasattr(field, "tv"):
                # dense-grid smoothness prior (dense_grid.grid_tv_loss)
                loss = loss + tv_weight * field.apply(variables,
                                                      method=field.tv)
            if sparsity_w > 0.0:
                # density sparsity at uniform points (Plenoxels-style): the
                # ONLY gradient in never-observed space. Fourier features are
                # a global basis, so photometric training leaks density into
                # regions no ray traverses (measured: surface precision fell
                # 0.27 -> 0.02 between 1k and 8k steps while PSNR rose);
                # grid fields don't need this (updates are local).
                k_s = jax.random.fold_in(sub, 17)
                pts01 = jax.random.uniform(k_s, (4096, 3))
                sigma = field.apply(variables, pts01, method=field.density)[0]
                loss = loss + sparsity_w * jnp.mean(1.0 - jnp.exp(-0.05 * sigma))
            return loss

        def body(carry, xs):
            variables, opt_state, grid = carry
            o, d, target, k_r = xs
            loss, grads = jax.value_and_grad(loss_fn)(variables, grid, o, d,
                                                      target, k_r)
            updates, opt_state = tx.update(grads, opt_state, variables)
            variables = optax.apply_updates(variables, updates)
            return (variables, opt_state, grid), loss

        # images/c2w ride as jit args (closure-captured device arrays bake
        # into the HLO as constants — GBs at capture scale over axon). Ray
        # batches for the whole block are gathered BEFORE the scan: the
        # remote compiler hangs on capture-sized image gathers inside a scan
        # body (the same gather at top level compiles in seconds), and the
        # scan carry stays small.
        @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(7, 8))
        def block(variables, opt_state, grid, imgs, c2ws, rng, rng_grid,
                  n_sub, do_update):
            if do_update:
                grid = update_occupancy_grid(field, variables, grid, rng_grid)
            k_f, k_p, k_r = jax.random.split(rng, 3)
            fi = jax.random.randint(k_f, (n_sub, rays_per_batch), 0, F)
            pi = jax.random.randint(k_p, (n_sub, rays_per_batch), 0, H * W)
            target = jnp.moveaxis(imgs[:, fi, pi], 0, -1).astype(jnp.float32) / 255.0
            rows = (pi // W).astype(jnp.float32)
            cols = (pi % W).astype(jnp.float32)
            c2w = c2ws[fi]                                  # (n_sub, B, 4, 4)
            x = (cols + 0.5 - cx) / fx
            y = -(rows + 0.5 - cy) / fy
            dirs = jnp.stack([x, y, -jnp.ones_like(x)], -1)
            d = jnp.einsum("snij,snj->sni", c2w[..., :3, :3], dirs)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            o = c2w[..., :3, 3]
            if mesh is not None:
                # data-parallel: rays sharded over the mesh, params/grids
                # replicated; XLA inserts the grad psum over ICI.
                from jax.sharding import NamedSharding, PartitionSpec as P
                ray_s = NamedSharding(mesh, P(None, "data"))
                rep = NamedSharding(mesh, P())
                shard = lambda t, s: jax.tree_util.tree_map(
                    lambda a: jax.lax.with_sharding_constraint(a, s), t)
                o, d, target = (shard(o, ray_s), shard(d, ray_s),
                                shard(target, ray_s))
                variables, opt_state, grid = (shard(variables, rep),
                                              shard(opt_state, rep),
                                              shard(grid, rep))
            (variables, opt_state, grid), losses = jax.lax.scan(
                body, (variables, opt_state, grid),
                (o, d, target, jax.random.split(k_r, n_sub)))
            return variables, opt_state, grid, losses

        return block

    block_uniform = one_step(False)
    block_occ = one_step(True)

    losses, done, next_log, last_update = [], 0, 0, None
    while done < steps:
        # warmup accounting is GLOBAL (steps_done carries across warm-started
        # segments) so a --curve run never re-enters warmup mid-training
        g = steps_done + done
        in_occ = use_occupancy and g >= occ_warmup
        n_sub = min(scan_block, steps - done)
        if use_occupancy and not in_occ:
            # stop the warmup block exactly at the occ-phase boundary
            n_sub = min(n_sub, occ_warmup - g)
        do_update = in_occ and (last_update is None
                                or done - last_update >= occ_update_every)
        if do_update:
            last_update = done
        rng, r_blk, r_grid = jax.random.split(rng, 3)
        blk = block_occ if in_occ else block_uniform
        variables, opt_state, occ_grid, blk_losses = blk(
            variables, opt_state, occ_grid, imgs_u8, c2w_all, r_blk, r_grid,
            n_sub, do_update)
        if done + n_sub > next_log:
            losses.append(float(blk_losses[-1]))
            next_log += log_every
            if verbose:
                print(f"[nerf] step {done + n_sub}/{steps} "
                      f"loss {losses[-1]:.5f}", flush=True)
        elif (done // n_sub) % sync_every == 0:
            # bound async runahead: in-flight dense-grid blocks (donated
            # ~350MB param trees) wedge the axon worker when allowed to queue
            # 16 deep — the tunnel then hangs even for trivial probes. Sync
            # every `sync_every` blocks (4 is stable; async dispatch still
            # pipelines within the window).
            jax.block_until_ready(blk_losses)
        done += n_sub
    ret = (field, variables, losses, occ_grid if use_occupancy else None)
    if return_state:
        ret = ret + ((variables, opt_state, occ_grid, steps_done + steps),)
    return ret


def render_image(field: NGPField, variables, c2w: np.ndarray, H: int, W: int,
                 fx: float, fy: float, cx: float, cy: float,
                 chunk: int = 16384, occ_grid=None, num_fine: int = 96,
                 background=None) -> Tuple[np.ndarray, np.ndarray]:
    """Full-frame render (rgb, depth) — the screenshot path (run.py:278-305).
    With occ_grid, MLP work drops from 192 uniform to `num_fine` guided
    samples per ray. `background` composites a backdrop color behind the
    volume (must match training for faithful screenshots)."""
    bg = (None if background is None
          else jnp.broadcast_to(jnp.asarray(background, jnp.float32), (3,)))
    rows, cols = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([rows, cols], -1).reshape(-1, 2).astype(np.float32)
    n_chunks = -(-len(pix) // chunk)
    pad_total = n_chunks * chunk - len(pix)
    if pad_total:
        pix = np.concatenate([pix, np.zeros((pad_total, 2), np.float32)])
    pix = pix.reshape(n_chunks, chunk, 2)

    # ONE dispatch per frame: lax.map over pixel chunks on-device. A host
    # chunk loop pays one tunnel round trip per chunk (~100 ms x 57 chunks
    # at 1280x720 = the measured 6.5 s/frame — latency, not compute). The
    # map body has no capture-sized gathers (the scan-body compile hazard,
    # CLAUDE.md): the only lookup is the 128^3 occupancy grid when enabled.
    # variables/occ_grid ride as jit args, not closure captures (captured
    # device arrays bake into the HLO as constants — axon payload cap).
    def one_chunk(v, g, c2w_j, sub):
        o, d = camera_rays(c2w_j, fx, fy, cx, cy, sub)
        if occ_grid is not None:
            return render_rays_occ(field, v, g, o, d, num_coarse=192,
                                   num_fine=num_fine, background=bg)[:2]
        return render_rays(field, v, o, d, 192, background=bg)[:2]

    @jax.jit
    def render_frame(v, g, c2w_j, pix_chunks):
        return jax.lax.map(lambda sub: one_chunk(v, g, c2w_j, sub),
                           pix_chunks)

    r, z = render_frame(variables, occ_grid, jnp.asarray(c2w.astype(np.float32)),
                        jnp.asarray(pix))
    rgb = np.asarray(r).reshape(-1, 3)[:H * W]
    dep = np.asarray(z).reshape(-1)[:H * W]
    return rgb.reshape(H, W, 3), dep.reshape(H, W)


def psnr(img: np.ndarray, ref: np.ndarray) -> float:
    """PSNR metric (run.py:212-270 eval path)."""
    mse = float(np.mean((img - ref) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))
