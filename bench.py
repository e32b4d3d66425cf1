"""Benchmark: binocular 3DGS training throughput on the current backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Workload: a synthetic LLFF-scale scene (100k gaussians, 1008x756 render — the
reference's LLFF half-res protocol order of magnitude) running the FULL
binocular train step (two renders, L1+D-SSIM+disparity losses, backward,
Adam). Metric: train iterations/s; extras report pixels/s/chip (the
BASELINE.md north-star metric, counting rendered pixels = H*W*2 per
iteration) and a useful-FLOP MFU estimate for the blend stage.

Timing methodology: K steps run chained inside one jit'd lax.fori_loop and a
scalar is fetched at the end; per-step cost is (t_K - t_1)/(K - 1). This
measures device throughput — a naive host loop measures the dispatch path
instead (and on the remote-TPU tunnel used for CI, `block_until_ready` does
not reliably block at all). 3 warmup invocations cover compile + caches.

vs_baseline: the reference publishes no numbers (BASELINE.md); we normalize
against a nominal 20 it/s for the reference CUDA pipeline on a modern GPU
(30k iters in ~25 min with two renders/iter), so vs_baseline = value / 20.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

NOMINAL_REFERENCE_ITERS_PER_S = 20.0


def make_workload(n=100_000, width=1008, height=756, seed=0):
    import jax.numpy as jnp

    from binocular3dgs_tpu.core.camera import make_camera
    from binocular3dgs_tpu.models.gaussians import GaussianModel, GaussianParams

    rng = np.random.default_rng(seed)
    cap = n
    xyz = np.stack(
        [rng.uniform(-2, 2, cap), rng.uniform(-1.5, 1.5, cap), rng.uniform(3, 9, cap)], 1
    ).astype(np.float32)
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        f_dc=jnp.asarray(rng.normal(size=(cap, 1, 3)).astype(np.float32) * 0.3),
        f_rest=jnp.zeros((cap, 3, 3), jnp.float32),
        opacity=jnp.asarray(rng.uniform(-2, 1, (cap, 1)).astype(np.float32)),
        scaling=jnp.asarray(np.log(rng.uniform(0.005, 0.02, (cap, 3))).astype(np.float32)),
        rotation=jnp.asarray(
            np.concatenate([np.ones((cap, 1)), np.zeros((cap, 3))], 1).astype(np.float32)
        ),
    )
    model = GaussianModel(
        params=params,
        active=jnp.ones(cap, dtype=bool),
        max_sh_degree=1,
        active_sh_degree=1,
    )
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, width, height)
    gt = jnp.asarray(rng.random((3, height, width)).astype(np.float32))  # planar
    return model, cam, gt


def _enable_compile_cache():
    """Persistent XLA-executable cache: repeat bench runs (and the driver's)
    skip the multi-minute TPU compiles of the fused train-step loop."""
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: flag names differ; cache is an optimization only


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from binocular3dgs_tpu.config import Config
    from binocular3dgs_tpu.ops.rasterize import render_tiled
    from binocular3dgs_tpu.train.state import init_train_state
    from binocular3dgs_tpu.train.step import make_train_step

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        n, width, height = 100_000, 1008, 756
        iters = 20
    else:  # CPU smoke-test configuration
        n, width, height = 2_000, 128, 96
        iters = 5

    model, cam, gt = make_workload(n, width, height)
    cfg = Config()
    # 6 pairs/gaussian = 600k capacity vs the ~431k wanted on this workload
    # (comfortably under the 0.8 growth trigger): the pair-axis sorts,
    # cumsums, gathers, and blend DMA windows all scale with the STATIC
    # capacity, so slack is pure overhead. Real training relies on the
    # Trainer's self-healing growth, exactly like this would.
    cfg.raster.pairs_per_gaussian = 6
    if not on_tpu:
        cfg.raster.backend = "xla"
        cfg.raster.max_pairs_per_tile = 256
        cfg.raster.chunk = 16

    step = make_train_step(
        lambda *a, **k: render_tiled(*a, raster=cfg.raster, **k),
        cfg,
        spatial_lr_scale=1.0,
        binocular=True,
        use_alpha_weight=False,
    )
    state0 = init_train_state(model)
    aw = jnp.zeros((height, width), jnp.float32)
    bg = jnp.zeros(3)

    @jax.jit
    def run_steps(state, k):
        def body(i, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            st, _ = step(st, cam, gt, aw, jnp.int32(2) + i, sub, bg)
            return (st, key)

        st, _ = jax.lax.fori_loop(0, k, body, (state, jax.random.PRNGKey(0)))
        return jnp.sum(st.model.params.xyz[0])

    # warmup: compile + caches (>= 3 invocations)
    for _ in range(3):
        float(run_steps(state0, 1))
    t0 = time.perf_counter()
    float(run_steps(state0, 1))
    t_1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_steps(state0, 1 + iters))
    t_k = time.perf_counter() - t0
    sec_per_iter = max((t_k - t_1) / iters, 1e-9)
    iters_per_s = 1.0 / sec_per_iter

    # forward-render-only throughput (the rasterizer alone)
    @jax.jit
    def run_renders(k):
        def body(i, acc):
            p = model.params.replace(xyz=model.params.xyz + acc * 1e-12)
            out = render_tiled(cam, model.replace(params=p), bg, raster=cfg.raster)
            return jnp.sum(out.image) * 1e-12

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    for _ in range(3):
        float(run_renders(1))
    t0 = time.perf_counter(); float(run_renders(1)); r_1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run_renders(1 + iters)); r_k = time.perf_counter() - t0
    render_s = max((r_k - r_1) / iters, 1e-9)

    pixels = width * height
    # full train step renders 2 views/iter (forward+backward)
    train_pixels_per_s = pixels * 2 * iters_per_s
    render_pixels_per_s = pixels / render_s

    # MFU estimate: useful blend FLOPs only (the algorithmic core). The
    # 60-FLOP/pair-pixel model counts the per-(pair, pixel) blend math a
    # CUDA-style rasterizer performs — EWA exponent evaluation (~10), exp
    # (~1 counted), alpha/transmittance chain (~9), and the rgb+depth
    # accumulation multiply-adds (~10) ≈ 30 FLOPs forward, doubled for the
    # reverse-order backward replay, NOT the extra work this
    # implementation's tri-matmul scans do — i.e. algorithmic FLOPs over a
    # nominal 197 TFLOP/s v5e ceiling, deliberately conservative (excludes
    # projection/sort/losses). `num_pairs` is read from the benched
    # workload's own RenderOutput, not hardcoded.
    out_probe = jax.jit(
        lambda: render_tiled(cam, model, bg, raster=cfg.raster).num_pairs
    )()
    avg_pairs = int(out_probe)
    ts = cfg.raster.tile_size
    useful_flops = avg_pairs * ts * ts * 60 * 2 * 3
    mfu = useful_flops * iters_per_s / 197e12 if on_tpu else 0.0

    # stage-level device-time attribution of one chained step (xplane trace,
    # same methodology as scripts/probe_chain_trace.py)
    breakdown = {}
    value_parity = {}
    if on_tpu:
        try:
            breakdown = _stage_breakdown(run_steps, state0)
        except Exception as e:
            breakdown = {"error": str(e)[:200]}
        try:
            value_parity = _chip_value_parity()
        except Exception as e:
            value_parity = {"ok": False, "error": str(e)[:200]}

    # device-count scaling (BASELINE.md: pixels/s at 1 chip / 1 host / >=2
    # hosts). This container exposes ONE real TPU chip; n>1 points come from
    # the sharded train step on a virtual CPU mesh run in a subprocess (a
    # correctness/compile smoke + relative-scaling signal, not TPU perf).
    scaling = {"n1_chip_train_pixels_per_s": round(train_pixels_per_s)}
    if "--no-smoke" in sys.argv:
        scaling["cpu_mesh_smoke"] = {"status": "skipped"}
    else:
        try:
            import os
            import subprocess

            # strip the TPU-tunnel hook: the smoke subprocess is CPU-only and
            # must not block on the chip grant the parent bench holds
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            r = subprocess.run(
                [sys.executable, __file__, "--cpu-mesh-smoke"],
                capture_output=True, text=True, timeout=900, env=env,
            )
            scaling["cpu_mesh_smoke"] = (
                json.loads(r.stdout.strip().splitlines()[-1])
                if r.returncode == 0
                else {"ok": False, "rc": r.returncode}
            )
        except Exception as e:  # the headline metric must survive a smoke failure
            scaling["cpu_mesh_smoke"] = {"ok": False, "error": str(e)[:200]}

    print(
        json.dumps(
            {
                "metric": "binocular_train_iters_per_s",
                "value": round(iters_per_s, 3),
                "unit": f"it/s ({n} gaussians, {width}x{height}, 2 renders/it, {jax.default_backend()})",
                "vs_baseline": round(iters_per_s / NOMINAL_REFERENCE_ITERS_PER_S, 3),
                "train_pixels_per_s_per_chip": round(train_pixels_per_s),
                "render_pixels_per_s_per_chip": round(render_pixels_per_s),
                "render_fwd_ms": round(render_s * 1000, 2),
                "step_ms": round(sec_per_iter * 1000, 2),
                "blend_mfu_estimate": round(mfu, 5),
                "stage_breakdown_ms": breakdown,
                "chip_value_parity": value_parity,
                "scaling": scaling,
            }
        )
    )


def _chip_value_parity():
    """Render + grad a small golden cloud on the CURRENT backend with the
    pallas kernels vs the plain-XLA blend and compare values. This is the
    guard for compiled-Mosaic-vs-interpret divergence: round 5 found every
    chip matmul silently truncating f32 inputs to bf16 (default TPU matmul
    precision), making gradients ~10x wrong on hardware while all
    interpret-mode parity tests passed."""
    import jax
    import jax.numpy as jnp

    from binocular3dgs_tpu.config import RasterConfig
    from binocular3dgs_tpu.ops.rasterize import render_tiled

    model, cam, _ = make_workload(1_500, 256, 256, seed=3)
    bg = jnp.zeros(3)
    outs = {}
    for backend in ("pallas", "xla"):
        raster = RasterConfig(backend=backend)
        if backend == "xla":
            raster.max_pairs_per_tile = 512
            raster.chunk = 32

        def loss(p, raster=raster):
            o = render_tiled(cam, model.replace(params=p), bg, raster=raster)
            return jnp.sum(o.image**2) + jnp.sum(o.depth) + jnp.sum(o.alpha)

        img = jax.jit(
            lambda p, raster=raster: render_tiled(
                cam, model.replace(params=p), bg, raster=raster
            ).image
        )(model.params)
        g = jax.jit(jax.grad(loss))(model.params)
        outs[backend] = (np.asarray(img), np.asarray(g.xyz), np.asarray(g.opacity))

    di = float(np.abs(outs["pallas"][0] - outs["xla"][0]).max())
    gx_scale = float(np.abs(outs["xla"][1]).max()) + 1e-9
    dgx = float(np.abs(outs["pallas"][1] - outs["xla"][1]).max()) / gx_scale
    go_scale = float(np.abs(outs["xla"][2]).max()) + 1e-9
    dgo = float(np.abs(outs["pallas"][2] - outs["xla"][2]).max()) / go_scale
    return {
        "img_max_diff": round(di, 5),
        "gxyz_rel_max_diff": round(dgx, 5),
        "gop_rel_max_diff": round(dgo, 5),
        "ok": bool(di < 5e-3 and dgx < 5e-3 and dgo < 5e-3),
    }


def _stage_breakdown(run_steps, state0, steps=8):
    """Per-stage device-time attribution (ms/step) of the chained train step
    from an xplane trace. Stages are classified by the HLO op's source file
    + fwd/bwd direction (the `transpose(jvp(...))` marker in tf_op)."""
    import collections
    import glob
    import gzip
    import tempfile

    import jax

    float(run_steps(state0, 1))  # warm
    d = tempfile.mkdtemp(prefix="benchtrace_")
    jax.profiler.start_trace(d)
    float(run_steps(state0, steps))
    jax.profiler.stop_trace()
    (path,) = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg = collections.Counter()
    envelope = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name, args = e["name"], e.get("args") or {}
        dur = e.get("dur", 0)
        if name.startswith("jit_"):
            continue
        src = str(args.get("source", ""))
        tf_op = str(args.get("tf_op", ""))
        if name.isdigit():  # per-step counter pseudo-events, not ops
            continue
        if name.startswith("while.") and "bench.py" in src:
            envelope = max(envelope, dur / steps)  # the fori_loop wrapper
            continue
        bwd = "transpose(jvp" in tf_op
        if "blend_pallas" in src or "blend_forward" in name or "blend_backward" in name:
            key = "blend_bwd" if ("blend_backward" in name or bwd) else "blend_fwd"
        elif "warp" in src or "warp" in name:
            key = "warp_bwd" if bwd else "warp_fwd"
        elif "rasterize.py" in src and "sort" in name:
            key = "grad_pair_sort"
        elif "rasterize.py" in src and bwd:
            key = "grad_segment_sum"
        elif "rasterize.py" in src:
            key = "record_gather"
        elif "binning.py" in src:
            key = "binning"
        elif "losses.py" in src or "reduce-window" in name:
            key = "losses"
        elif "project.py" in src:
            key = "vertex"
        elif "state.py" in src or "step.py" in src:
            key = "adam_losses_misc"
        else:
            key = "other"
        agg[key] += dur
    out = {k: round(v / steps / 1000, 3) for k, v in agg.most_common()}
    out["total_attributed"] = round(sum(agg.values()) / steps / 1000, 3)
    if envelope:
        out["step_envelope"] = round(envelope / 1000, 3)
    return out


def cpu_mesh_smoke():
    """Sharded binocular train step on virtual CPU meshes: prints one JSON
    line with the full n=1/2/4/8 step-time curve, a parity check, and a
    shard_gaussians+shard_adam on/off comparison at n=8. Run in a
    subprocess: it must pin JAX to the CPU platform before first device use.

    HONESTY NOTE (recorded in the JSON as host_cores): this container has
    2 physical cores, so 8 virtual devices are 4x oversubscribed — the
    curve can never show >2x speedup and is a correctness + sharding-
    overhead signal, NOT a scaling measurement. A one-off compute-bound
    curve (256x256, 8k gaussians) measured 2026-08-21 gave flat
    12.2/12.8/12.6/12.7 s/step at n=1/2/4/8 (speedup 0.96x — cores, not
    devices, are the limit) and is recorded in README "Parallelism notes";
    the live smoke uses a small shape so the driver bench finishes. Real
    scaling numbers require real multi-chip hardware, which this container
    does not have (BASELINE.md scaling row; see tests/test_multihost.py
    for the multi-process/DCN-analog parity check)."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from binocular3dgs_tpu.config import Config
    from binocular3dgs_tpu.parallel.sharding import make_mesh, make_sharded_train_step
    from binocular3dgs_tpu.train.state import init_train_state

    n, width, height = 2_000, 128, 128
    model, cam, gt = make_workload(n, width, height)
    cfg = Config()
    cfg.raster.backend = "xla"
    cfg.raster.pairs_per_gaussian = 8
    cfg.raster.max_pairs_per_tile = 1024
    cfg.raster.chunk = 32
    state0 = init_train_state(model)
    aw = jnp.zeros((height, width), jnp.float32)
    bg = jnp.zeros(3)

    import os as _os

    result = {
        "ok": True, "pixels": width * height, "gaussians": n,
        "host_cores": _os.cpu_count(),
    }
    losses = {}

    def timed_step(ndev, shard_gaussians=False, shard_adam=False):
        mesh = make_mesh(ndev)
        step = make_sharded_train_step(
            cfg, mesh, width, height, spatial_lr_scale=1.0, binocular=True,
            shard_gaussians=shard_gaussians, shard_adam=shard_adam,
        )

        @jax.jit
        def run_steps(state, k, step=step):
            def body(i, carry):
                st, key = carry
                key, sub = jax.random.split(key)
                st, m = step(st, cam, gt, aw, jnp.int32(2) + i, sub, bg)
                return (st, key)

            st, _ = jax.lax.fori_loop(0, k, body, (state, jax.random.PRNGKey(0)))
            _, m = step(st, cam, gt, aw, jnp.int32(99), jax.random.PRNGKey(1), bg)
            return m.loss

        loss = float(run_steps(state0, 2))
        t0 = time.perf_counter(); float(run_steps(state0, 1)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run_steps(state0, 4)); t4 = time.perf_counter() - t0
        return loss, round((t4 - t1) / 3 * 1000, 1)

    for ndev in (1, 2, 4, 8):
        losses[ndev], result[f"n{ndev}_step_ms"] = timed_step(ndev)
    # same data, same seeds -> every sharded result must match 1-device
    result["loss_parity"] = all(
        abs(losses[k] - losses[1]) < 1e-3 for k in losses
    )
    result["speedup_n8"] = round(result["n1_step_ms"] / result["n8_step_ms"], 2)
    # gaussian-axis vertex sharding + sharded Adam state at n=8: the
    # measured on/off comparison the README crossover note cites
    _, result["n8_shardg_step_ms"] = timed_step(8, shard_gaussians=True, shard_adam=True)
    result["ok"] = bool(result["loss_parity"])
    print(json.dumps(result))


if __name__ == "__main__":
    if "--cpu-mesh-smoke" in sys.argv:
        cpu_mesh_smoke()
    else:
        main()
