"""Central registry of axon-TPU runtime fault boundaries (bisect-measured).

Every constant here was discovered by bisecting a worker crash ("TPU worker
process crashed or restarted" / kernel fault) or a wedged tunnel on this
stack (tools/debug_dense_step*.py, r2/r3 working notes). They are
*platform* limits, not algorithm choices: any new train/eval step must stay
inside them or it will re-learn them by crashing. Modules consume these
instead of inlining magic numbers; tests/test_platform_limits.py pins the
values so silent drift is caught.

Measured boundaries (each with the bisect evidence):
  - A single scatter-add over ~4M rows faults; 2M rows executes fine
    (tools/debug_dense_step2.py). The dense-grid encode issues 4 gather rows
    per point, so its backward scatter caps the encode chunk at 262144
    points (4*262144*2-row pairs stays near 2M).
  - Any train step differentiating >= 1.05M samples faults even with chunked
    encode scatters; 524288 (8192 rays x 64 samples) is the measured-good
    boundary (tools/debug_dense_step3.py).
  - lax.scan of train-step bodies with length >= 8 at ~1M-point bodies
    faults; length 4 is stable; single steps at the same size are fine.
  - Unbounded async runahead of donated train blocks WEDGES the worker
    (hang, not crash); syncing every 4 blocks is stable.
  - jax.checkpoint/remat around a dense-grid render faults at sizes where
    the plain backward runs — remat must stay off for dense-grid fields.
  - After a worker crash the tunnel stays dead ~5 minutes; probes must use a
    FRESH process (the crashed process's client is poisoned).
"""

from __future__ import annotations

import math

# -- hard fault boundaries (crossing these crashes the axon worker) ---------

#: Max rows in one scatter-add (backward of a gather). Bisect: 4M faults,
#: 2M fine. Keep every single scatter at or under this.
MAX_SCATTER_ROWS = 2 * 1024 * 1024

#: Max differentiated sample count in one train step (rays * samples for
#: NeRF; points for MVS/PMVO grads). Bisect: 1.05M faults, 524288 fine.
MAX_DIFF_SAMPLES = 524288

#: Max length of a lax.scan whose body is a capture-scale train step.
#: Bisect: 8 faults, 4 stable.
MAX_TRAIN_SCAN = 4

#: Sync (block_until_ready) at least every N dispatched donated train blocks
#: to bound async runahead. Unbounded runahead wedges the worker.
SYNC_EVERY_BLOCKS = 4

#: Point-chunk for the dense-grid encode: 4 gather rows/point, backward is a
#: scatter-add of the same row count; 262144 pts * 8 corner-rows < 2M+slack.
ENCODE_CHUNK = 262144

#: Seconds the tunnel typically stays dead after a worker crash (observed
#: up to ~15 min in r4). Recovery probes should wait and retry across this
#: window, from a FRESH process.
TUNNEL_RECOVERY_SECONDS = 900

#: Remat around dense-grid renders faults where the plain backward runs.
DENSE_GRID_REMAT_SAFE = False

#: Dense-grid TRAINING at capture scale is flaky on the axon worker even
#: inside every boundary above: the 4096x64 (262144-sample) step that
#: completed a full 1500-step e2e in r3 kernel-faulted twice in the r4
#: bisect (tools/bisect_stage0a.py) — the backward scatter-add family again.
#: Refuse dense-grid train steps at/above this size on the TPU backend
#: unless the user opts in; the fourier field (gather-free) is the
#: deployable default at capture scale (nerf/pipeline.py DEFAULT_FIELD).
DENSE_TPU_FLAKY_SAMPLES = 262144
ALLOW_DENSE_AT_SCALE_ENV = "MONOHAIR_ALLOW_DENSE_AT_SCALE"


# -- guard helpers ----------------------------------------------------------

def assert_train_step_shape(rays_per_batch: int, num_samples: int,
                            num_fine: int = 0, scan_block: int = 1,
                            what: str = "train step") -> None:
    """Fail fast (host-side, pre-trace) instead of kernel-faulting mid-run.

    A hierarchical (occupancy) step differentiates coarse AND fine samples in
    one backward, so the budget is rays * (num_samples + num_fine) — the
    r3 bench fault was exactly 8192 * (64 + 64) = 1.05M."""
    per_ray = num_samples + num_fine
    total = rays_per_batch * per_ray
    if total > MAX_DIFF_SAMPLES:
        raise ValueError(
            f"{what}: {rays_per_batch} x {per_ray} = "
            f"{total} differentiated samples exceeds the axon fault boundary "
            f"({MAX_DIFF_SAMPLES}); shrink rays_per_batch or samples "
            f"(platform_limits.MAX_DIFF_SAMPLES)")
    if scan_block > MAX_TRAIN_SCAN:
        raise ValueError(
            f"{what}: scan_block={scan_block} exceeds the axon scan fault "
            f"boundary ({MAX_TRAIN_SCAN}); platform_limits.MAX_TRAIN_SCAN")


def assert_dense_field_safe(field, rays_per_batch: int, num_samples: int,
                            what: str = "train step") -> None:
    """Refuse dense-grid training at the known-flaky capture-scale shape on
    the TPU backend (VERDICT r4 weak #7): a user selecting `ngp.field=dense`
    at capture scale otherwise re-discovers the worker fault by crashing.
    Opt back in with MONOHAIR_ALLOW_DENSE_AT_SCALE=1 (the shape IS
    intermittently runnable — r3's e2e completed on it; r4's bisect crashed
    it twice). CPU runs and small shapes are unaffected."""
    import os
    if not hasattr(field, "tv"):        # dense grid is the only field with tv
        return
    total = rays_per_batch * num_samples
    if total < DENSE_TPU_FLAKY_SAMPLES:
        return
    if os.environ.get(ALLOW_DENSE_AT_SCALE_ENV):
        return
    import jax
    if jax.default_backend() == "cpu":
        return
    raise ValueError(
        f"{what}: dense-grid field at {rays_per_batch} x {num_samples} = "
        f"{total} differentiated samples is a known-flaky axon shape (it "
        f"kernel-faulted the worker in the r4 bisect at exactly "
        f"{DENSE_TPU_FLAKY_SAMPLES}). Use ngp.field=fourier (the gather-free "
        f"default), shrink the step below {DENSE_TPU_FLAKY_SAMPLES} samples, "
        f"or set {ALLOW_DENSE_AT_SCALE_ENV}=1 to accept the crash risk "
        f"(platform_limits.DENSE_TPU_FLAKY_SAMPLES)")


def chunk_count(n: int, chunk: int = ENCODE_CHUNK) -> int:
    return max(1, math.ceil(n / chunk))


def probe_device(timeout: float = 60.0, platform: str | None = None) -> bool:
    """True iff a FRESH subprocess completes a small matmul on the default
    backend within `timeout`. Used by recovery wrappers after a suspected
    worker crash — the current process's client may be poisoned, so this
    must not run in-process. `platform` pins the backend via the config API
    (the axon plugin ignores the JAX_PLATFORMS env var on this stack)."""
    import subprocess
    import sys
    pin = (f"import jax; jax.config.update('jax_platforms', '{platform}');"
           if platform else "import jax;")
    code = (pin + "import jax.numpy as jnp;"
            "x = jnp.ones((128, 128));"
            "assert float((x @ x).sum()) == 128.0 * 128 * 128")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_device(max_wait: float = 420.0, poll: float = 30.0,
                    log=print, platform: str | None = None) -> bool:
    """Probe-and-wait across the documented ~5 min tunnel recovery window.
    Returns True once a fresh-process probe succeeds, False on timeout."""
    import time
    t0 = time.monotonic()
    while True:
        if probe_device(platform=platform):
            return True
        waited = time.monotonic() - t0
        if waited >= max_wait:
            return False
        log(f"# device probe failed ({waited:.0f}s elapsed); "
            f"retrying in {poll:.0f}s", flush=True)
        time.sleep(poll)
