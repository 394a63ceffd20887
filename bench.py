"""Headline benchmark: poses refined per second, batch-256, obj_06 workload.

Runs the full production pipeline on the default (TPU) backend:
  render 256 pose hypotheses of the benchmark mesh (Pallas kernel at the
  reference's down_sample=2 raster - pose_renderer.cpp:28-29 - from a 4 mm
  vertex-clustered render mesh) -> scatter-free window lift + lossless
  top_k to 2048-point clouds -> projective point-to-plane ICP against the
  full-res observed scene, all in ONE jitted program; scene built once per
  frame (its cost is amortized and reported separately). Every knob is a
  measured, quality-gated choice - see PERF_NOTES.md.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "poses/sec", "vs_baseline": N}
Secondary metrics (render-only throughput incl. the reference's ROI case,
NN-scene pipeline, full-res pipeline, warm scene re-init, quality gates) go
to stderr as additional JSON lines prefixed with '# '.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the BASELINE.json north-star target of refining 256 hypotheses
at lower wall-clock than the CUDA reference on an RTX-class GPU, estimated
at 1 s for the batch (about 4 ms per render+ICP on such hardware) =>
baseline = 256 poses/sec, vs_baseline = value / 256.
"""

import json
import sys
import time

import numpy as np


def _emit(obj):
    print("# " + json.dumps(obj), file=sys.stderr)


def _time_median(fn, sync, iters=3):
    """Compile/warm once, then median wall-clock of `iters` fenced runs."""
    out = fn()
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], out


def _stream_median(enqueue_fn, fence_fn, k, iters=3):
    """Median per-batch wall of `iters` streaming rounds (k batches in
    flight, ONE fence per round). Round 3 timed streaming ONCE and recorded
    a phantom regression when the sample hit a tunnel stall (VERDICT r3
    weak #2) - every streaming metric is a median now."""
    fence_fn([enqueue_fn() for _ in range(k)])  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence_fn([enqueue_fn() for _ in range(k)])
        times.append((time.perf_counter() - t0) / k)
    return sorted(times)[len(times) // 2]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    import pose_refine_tpu as prt
    from pose_refine_tpu import geometry, mesh
    from pose_refine_tpu.utils.metrics import rotation_angle_deg
    from pose_refine_tpu.utils.sync import sync

    WIDTH, HEIGHT = 640, 480
    N_POSES = 256
    # production config, chosen by measurement (PERF_NOTES.md round 2):
    # half-res hypothesis renders (reference's down_sample), window lift
    # 128/stride 2 (4096 candidates), top_k-compacted to 2048 points. The
    # on-object valid count never exceeds ~1960 in this geometry
    # (budget2k_sweep), so the 2048 budget keeps EVERY valid point - verdicts
    # and ADD are bit-identical to the 4096 buffer while ICP's per-iteration
    # gather touches half the rows; the (256,4096)-key top_k costs ~12 ms vs
    # the ~75 ms gather saving. decimate_mm=4: hypothesis render mesh
    # vertex-clustered at 4 mm (31k -> 5.2k tris, following the reference's
    # own >10k-face simplification guidance, renderer.cpp:50-57). Strictly
    # dominant by measurement (decimation_speed_study + flip-index check):
    # recovery 228/256 vs the full mesh's 225 - every verdict flip is a
    # RECOVERY - and ADD(recovered) improves 0.587 -> 0.574 mm; 2 mm is the
    # bit-identical-verdicts option (1313/s), 6 mm degrades ADD. The
    # full-mesh number is a secondary metric below.
    # chunk_iters is left at its "auto" default: on TPU it resolves to the
    # fused max_iteration+1 program (measured equal to the old manual 64)
    CFG = dict(render_scale=2, max_points=2048, window=128, stride=2,
               decimate_mm=4.0)
    # production criteria: max_iteration=24 (API default stays the
    # reference's 30). The fused loop pays every iteration whether poses
    # converged or not; 24 is the measured floor that keeps 100% per-case
    # verdict agreement AND ADD identical to the 30-iter run (max per-pose
    # drift 8 um; at 20 iters one case flips to FAIL) - +9% throughput
    # for free (scripts/iter_budget_study.py).
    from pose_refine_tpu.icp import ICPConvergenceCriteria

    CRIT = ICPConvergenceCriteria(max_iteration=24)

    model = mesh.load_benchmark_model()
    tris = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
    K = geometry.LINEMOD_K
    proj = geometry.compute_proj(K, WIDTH, HEIGHT)

    # ground-truth pose (reference demo viewpoint) + 256 perturbed hypotheses
    R_ren = np.array(
        [
            [0.34768538, 0.93761126, 0.0],
            [0.70540612, -0.26157897, -0.65877056],
            [-0.61767070, 0.22904489, -0.75234390],
        ],
        np.float32,
    )
    truth = np.asarray(geometry.pose_from_Rt(R_ren, np.array([0, 0, 300], np.float32)))
    rng = np.random.default_rng(0)
    d_ang = rng.uniform(-0.17, 0.17, (N_POSES, 3)).astype(np.float32)  # ~10 deg
    d_rot = np.asarray(geometry.euler_to_rotation(d_ang))
    d_t = rng.uniform(-20, 20, (N_POSES, 3)).astype(np.float32)
    poses = np.asarray(
        geometry.pose_from_Rt(
            jnp.einsum("nij,jk->nik", d_rot, truth[:3, :3]), truth[:3, 3] + d_t
        )
    )

    use_pallas = jax.default_backend() != "cpu"

    def render_fn(poses_arr, roi=(0, 0, 0, 0)):
        # the library's own dispatch (explicit backend= keeps its loud
        # failure semantics) - no hand-rolled twin to drift from it
        import pose_refine_tpu.ops.rasterize as rz

        return rz.render(tris, poses_arr, WIDTH, HEIGHT, proj, roi=roi,
                         backend="pallas" if use_pallas else "scatter")

    # observed scene: the model at the ground-truth pose
    t0 = time.perf_counter()
    scene_depth = np.asarray(sync(render_fn(jnp.asarray(truth)[None])))[0]
    refiner = prt.PoseRefiner(
        model, K=K, width=WIDTH, height=HEIGHT, use_pallas=use_pallas, **CFG
    )
    refiner.set_scene_depth(scene_depth)
    scene_init_s = time.perf_counter() - t0

    # PoseRefiner auto-shards the pose batch over all attached chips (pure
    # DP over ICI, devices=None default) - no separate multi-chip path
    n_dev = len(jax.devices())
    poses_dev = jax.device_put(jnp.asarray(poses))

    def run():
        return refiner.refine(poses_dev, criteria=CRIT)

    # compile + warm
    t0 = time.perf_counter()
    refined, results = run()
    sync((refined, results.fitness))
    compile_s = time.perf_counter() - t0

    dt, (refined, results) = _time_median(
        run, lambda o: sync((o[0], o[1].fitness)), iters=5
    )

    fit = np.asarray(results.fitness)
    rot_err = rotation_angle_deg(np.asarray(refined), truth)
    tpu_ok = rot_err < 3.0
    ok = float(tpu_ok.mean())

    # ---- secondary metric: render-only throughput (reference workload:
    # cuda_renderer/test.cpp:63-91 batch 100 full frame; :116-157 the
    # ROI {160,80,320,240} repeat) ----
    def time_render(n, roi=(0, 0, 0, 0)):
        batch = jax.device_put(jnp.asarray(np.tile(truth, (n, 1, 1))))
        t, _ = _time_median(lambda: render_fn(batch, roi=roi), sync)
        return t

    for n, roi, tag in (
        (100, (0, 0, 0, 0), "renders_per_sec_batch100_640x480"),
        (256, (0, 0, 0, 0), "renders_per_sec_batch256_640x480"),
        (100, (160, 80, 320, 240), "renders_per_sec_batch100_roi320x240"),
    ):
        t = time_render(n, roi)
        _emit({"metric": tag, "value": round(n / t, 1), "unit": "renders/sec",
               "wall_ms": round(t * 1000, 1)})

    # ---- secondary metric: warm scene re-init (the reference rebuilds the
    # scene EVERY frame, SURVEY 3.3 - steady-state cost matters) ----
    depth2 = np.asarray(sync(render_fn(jnp.asarray(poses[0])[None])))[0]
    t0 = time.perf_counter()
    refiner.set_scene_depth(depth2)
    sync(refiner.scene.table)  # unfenced timings are garbage on axon
    warm_init_s = time.perf_counter() - t0
    refiner.set_scene_depth(scene_depth)  # restore
    _emit({"metric": "scene_reinit_warm_ms", "value": round(warm_init_s * 1000, 1),
           "unit": "ms"})

    # ---- secondary metric: full-res pipeline (render_scale=1, full mesh -
    # the conservative config). stride=3 keeps 100% verdict agreement and
    # identical ADD vs stride=2 while the top_k compaction sees 7396 keys
    # instead of 16384 (the 120 ms key-count floor) - measured in
    # scripts/fullres_lift_study.py: 521 -> 580 poses/s. ----
    refiner_fr = prt.PoseRefiner(
        model, K=K, width=WIDTH, height=HEIGHT, use_pallas=use_pallas,
        max_points=4096, window=256, stride=3,
    )
    refiner_fr.set_scene_depth(scene_depth)
    poses_dev2 = jax.device_put(jnp.asarray(poses))
    # same 24-iter budget as every other pipeline metric (runs before
    # 2026-08-20 used the API-default 30 iters here, deflating this
    # metric ~20% relative to the rest - resolution cost only now)
    t_fr, _ = _time_median(
        lambda: refiner_fr.refine(poses_dev2, criteria=CRIT),
        lambda o: sync((o[0],))
    )
    _emit({"metric": "poses_per_sec_batch256_fullres_render", "value": round(N_POSES / t_fr, 1),
           "unit": "poses/sec", "wall_ms": round(t_fr * 1000, 1)})

    # ---- secondary metric: batch-512 scaling (fixed per-dispatch and
    # setup costs amortize over a larger hypothesis batch) ----
    poses512 = jax.device_put(jnp.asarray(np.concatenate([poses, poses])))
    try:
        t512, _ = _time_median(
            lambda: refiner.refine(poses512, criteria=CRIT), lambda o: sync((o[0], o[1].fitness))
        )
        _emit({"metric": "poses_per_sec_batch512", "value": round(512 / t512, 1),
               "unit": "poses/sec", "wall_ms": round(t512 * 1000, 1)})
    except Exception as e:
        _emit({"metric": "poses_per_sec_batch512", "error": str(e)[:200]})

    # ---- secondary metric: streaming throughput (serving mode) via the
    # public API - refine_async enqueues K batches back-to-back, fence()
    # synchronizes once; the runtime pipelines the dispatches, amortizing
    # the ~28 ms tunnel round trip per batch. Batch 256 (headline config)
    # and plain batch 512 (the README serving number) - both medians ----
    K_STREAM = 4
    try:
        t_stream = _stream_median(
            lambda: refiner.refine_async(poses_dev, criteria=CRIT),
            lambda p: prt.fence(*p), K_STREAM)
        _emit({"metric": "poses_per_sec_batch256_streaming", "value": round(N_POSES / t_stream, 1),
               "unit": "poses/sec", "wall_ms_per_batch": round(t_stream * 1000, 1),
               "batches_in_flight": K_STREAM})
    except Exception as e:
        _emit({"metric": "poses_per_sec_batch256_streaming", "error": str(e)[:200]})
    try:
        t_s512 = _stream_median(
            lambda: refiner.refine_async(poses512, criteria=CRIT),
            lambda p: prt.fence(*p), K_STREAM)
        _emit({"metric": "poses_per_sec_batch512_streaming", "value": round(512 / t_s512, 1),
               "unit": "poses/sec", "wall_ms_per_batch": round(t_s512 * 1000, 1),
               "batches_in_flight": K_STREAM, "batch": 512})
    except Exception as e:
        _emit({"metric": "poses_per_sec_batch512_streaming", "error": str(e)[:200]})

    # ---- secondary metric: fused filter tracking through the production
    # TrackingSession API, PIPELINED (step_async): frame k's fused program
    # (scene rebuild + refine + measurement covariance) executes while
    # frame k-1's readback/fusion and frame k+1's host prep run - the
    # fence-per-frame loop paid dispatch + execute + D2H serially
    # (169.7 ms/frame in BENCH_r03; VERDICT r3 #3). Sensor frames are
    # pre-rendered (not part of the tracked cost). ----
    try:
        N_TRACK, N_HYP = 12, 16
        tr_truth = truth.copy()
        trng = np.random.default_rng(9)
        tr_frames, tr_truths = [], []
        for _ in range(N_TRACK):
            drift = np.asarray(geometry.euler_to_rotation(
                trng.uniform(-0.035, 0.035, 3).astype(np.float32)))
            tr_truth = np.asarray(geometry.pose_from_Rt(
                drift @ tr_truth[:3, :3],
                tr_truth[:3, 3] + trng.uniform(-5, 5, 3).astype(np.float32)))
            tr_truths.append(tr_truth.copy())
            tr_frames.append(
                np.asarray(sync(render_fn(jnp.asarray(tr_truth[None]))))[0])
        def _track_loop():
            """One full session over all frames; per-frame wall averaged
            over EVERY dispatch and fence (timing only the steady tail
            under-counted: frame 0's fence+fuse landed inside the loop
            while its dispatch sat outside, ~9% bias)."""
            session = prt.TrackingSession(
                refiner, truth, n_hypotheses=N_HYP,
                process_noise=(np.radians(2.0), 0.005), seed=9)
            t0 = time.perf_counter()
            for f in tr_frames:
                session.step_async(f)
            last = session.flush()
            return (time.perf_counter() - t0) / N_TRACK, session, last

        _track_loop()  # pays the compile
        runs = sorted((_track_loop() for _ in range(3)),
                      key=lambda r: r[0])
        t_frame, session, last = runs[len(runs) // 2]
        err_deg = float(rotation_angle_deg(last.pose, tr_truths[-1]))
        _emit({"metric": "tracking_fps_fused_filter", "value": round(1.0 / t_frame, 1),
               "unit": "frames/sec", "wall_ms_per_frame": round(t_frame * 1000, 1),
               "n_hypotheses": N_HYP, "pipelined": True,
               "n_rejected": int(session.n_rejected),
               "final_rot_err_deg": round(err_deg, 3)})
    except Exception as e:
        _emit({"metric": "tracking_fps_fused_filter", "error": str(e)[:200]})

    # ---- secondary metric: the OPT-IN serving ceiling - streaming batch
    # 512 x 4 in flight with the coarse-to-fine ICP point schedule
    # (coarse_iters=16/coarse_stride=4). Not the headline config: ~4-5% of
    # borderline verdicts flip under the schedule (balanced, recovered-pose
    # ADD identical - scripts/coarse_points_study.py), so it stays opt-in ----
    try:
        refiner_c = prt.PoseRefiner(
            model, K=K, width=WIDTH, height=HEIGHT, use_pallas=use_pallas,
            coarse_iters=16, coarse_stride=4, **CFG
        )
        refiner_c.set_scene_depth(scene_depth)
        t_ceil = _stream_median(
            lambda: refiner_c.refine_async(poses512, criteria=CRIT),
            lambda p: prt.fence(*p), 4)
        _emit({"metric": "poses_per_sec_serving_ceiling_coarse_optin",
               "value": round(512 / t_ceil, 1), "unit": "poses/sec",
               "wall_ms_per_batch": round(t_ceil * 1000, 1),
               "batches_in_flight": 4, "batch": 512,
               "config": {"coarse_iters": 16, "coarse_stride": 4}})
    except Exception as e:
        _emit({"metric": "poses_per_sec_serving_ceiling_coarse_optin",
               "error": str(e)[:200]})

    # ---- secondary metric: production config WITHOUT render-mesh
    # decimation (the full 31k-tri obj_06, for apples-to-apples against
    # renderers that do not simplify) ----
    cfg_full = {**CFG, "decimate_mm": 0.0}
    refiner_full = prt.PoseRefiner(
        model, K=K, width=WIDTH, height=HEIGHT, use_pallas=use_pallas, **cfg_full
    )
    refiner_full.set_scene_depth(scene_depth)
    t_full, (r_full, _) = _time_median(
        lambda: refiner_full.refine(poses_dev2, criteria=CRIT), lambda o: sync((o[0],)), iters=5
    )
    rot_full = rotation_angle_deg(np.asarray(r_full), truth)
    _emit({"metric": "poses_per_sec_batch256_full_mesh", "value": round(N_POSES / t_full, 1),
           "unit": "poses/sec", "wall_ms": round(t_full * 1000, 1),
           "verdict_agreement_vs_decimated": round(float(((rot_full < 3.0) == tpu_ok).mean()), 3)})

    # ---- secondary metric: NN-association pipeline (reference headline
    # feature #2, README.md:9-15) - exact flash-NN against a 2 mm
    # voxel-downsampled scene cloud (standard ICP practice; measured
    # lossless on this workload - 100% recovery, ADD slightly BETTER than
    # the raw cloud since voxel centroids denoise the 1 mm depth
    # quantization, scripts/nn_voxel_study.py). The raw-cloud number is
    # emitted alongside, plus the scene-cascade raw-cloud config (16
    # coarse iters vs a 2 mm twin + 4 full-res iters = 2.27x raw-24 with
    # 100%% verdict agreement, scripts/nn_cascade_study.py). ----
    for vox, cascade, crit_nn, tag in (
            (2.0, None, CRIT, "poses_per_sec_batch256_nn_scene"),
            (0.0, None, CRIT, "poses_per_sec_batch256_nn_scene_raw_cloud"),
            (0.0, (2.0, 16), ICPConvergenceCriteria(max_iteration=4),
             "poses_per_sec_batch256_nn_raw_cloud_cascade")):
        try:
            refiner_nn = prt.PoseRefiner(
                model, K=K, width=WIDTH, height=HEIGHT, use_pallas=use_pallas,
                scene="nn_bruteforce", scene_voxel_mm=vox,
                scene_cascade=cascade, **CFG,
            )
            refiner_nn.set_scene_depth(scene_depth)
            n_nn = N_POSES
            poses_nn = jax.device_put(jnp.asarray(poses[:n_nn]))
            t_nn, (r_nn, res_nn) = _time_median(
                lambda: refiner_nn.refine(poses_nn, criteria=crit_nn), lambda o: sync((o[0],))
            )
            rot_nn = rotation_angle_deg(np.asarray(r_nn), truth)
            _emit({"metric": tag, "value": round(n_nn / t_nn, 1),
                   "unit": "poses/sec", "wall_ms": round(t_nn * 1000, 1),
                   "scene_pts": int(refiner_nn.scene.points.shape[0]),
                   "recovered_lt3deg": round(float((rot_nn < 3.0).mean()), 3)})
        except Exception as e:
            _emit({"metric": tag, "error": str(e)[:200]})

    # ---- measured same-host CPU baseline + fixed-seed verdict agreement:
    # the reference algorithm in C++ (native/cpu_baseline.cpp) on a pose
    # subset; its per-case recover/fail verdicts are the quality gate (the
    # raw recovery %% moves +-10%% run to run, verdict agreement does not) ----
    cpu_line = "cpu baseline unavailable"
    agreement = None
    try:
        from pose_refine_tpu import native

        if native.native_available():
            n_sub = 16
            t0 = time.perf_counter()
            dep_cc = native.cpu_render_baseline(
                np.asarray(tris), poses[:n_sub], np.asarray(proj), WIDTH, HEIGHT
            )
            cpu_render_s = time.perf_counter() - t0
            clouds_v, valids_v = [], []
            K_np = np.asarray(K, np.float32)
            for i in range(n_sub):
                # full compacted cloud - the reference algorithm's own lift
                # (scan-order compaction of a smaller budget would keep only
                # the top image rows and bias its convergence). Host numpy:
                # the jitted compact_points is a 307k-row scatter, which on
                # the (occupied) TPU costs seconds of dispatch + D2H for
                # inputs a CPU-only baseline needs host-side anyway
                d = dep_cc[i]
                vs, us = np.nonzero(d > 0)  # row-major == scan order
                z = d[vs, us].astype(np.float32) / 1000.0
                pts = np.stack([
                    (us.astype(np.float32) - K_np[0, 2]) / K_np[0, 0] * z,
                    (vs.astype(np.float32) - K_np[1, 2]) / K_np[1, 1] * z,
                    z,
                ], axis=-1)[:32768]
                c = np.zeros((32768, 3), np.float32)
                c[: len(pts)] = pts
                v = np.zeros((32768,), bool)
                v[: len(pts)] = True
                clouds_v.append(c)
                valids_v.append(v)
            scene_p = refiner.scene
            # best-of-2: single-shot timing on this 1-core host swings up
            # to 8x when background work (XLA compile threads) steals the
            # core mid-run; the verdicts are deterministic either way
            cpu_icp_s = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                T_cc, _, _ = native.cpu_icp_baseline(
                    np.stack(clouds_v), np.stack(valids_v),
                    np.asarray(scene_p.pcd), np.asarray(scene_p.normal), K,
                )
                cpu_icp_s = min(cpu_icp_s, time.perf_counter() - t0)
            T_mm = T_cc.copy()
            T_mm[:, :3, 3] *= 1000.0
            cpu_final = np.einsum("nij,njk->nik", T_mm, poses[:n_sub])
            cpu_ok = rotation_angle_deg(cpu_final, truth) < 3.0
            agreement = float((tpu_ok[:n_sub] == cpu_ok).mean())
            cpu_per_pose = (cpu_render_s + cpu_icp_s) / n_sub
            cpu_line = (
                f"same-host CPU baseline ({native.cpu_threads()} threads = all "
                f"cores on this 1-core host): {1.0/cpu_per_pose:.1f} poses/sec "
                f"({cpu_render_s/n_sub*1000:.0f} ms render + {cpu_icp_s/n_sub*1000:.0f} ms icp per pose)"
            )
            _emit({"metric": "verdict_agreement_vs_reference_alg",
                   "value": agreement, "unit": "fraction", "n_cases": n_sub})
    except Exception as e:  # baseline must never break the bench
        cpu_line = f"cpu baseline failed: {e}"

    value = N_POSES / dt
    result = {
        "metric": "poses_refined_per_sec_batch256_640x480_full_pipeline",
        "value": round(value, 2),
        "unit": "poses/sec",
        "vs_baseline": round(value / 256.0, 4),
    }
    print(json.dumps(result))
    print(
        f"# details: batch {N_POSES}, wall {dt*1000:.1f} ms, compile {compile_s:.1f} s, "
        f"scene init {scene_init_s*1000:.1f} ms (warm re-init {warm_init_s*1000:.1f} ms), "
        f"mean fitness {fit.mean():.3f}, recovered<3deg {ok*100:.0f}%, "
        f"verdict agreement vs reference alg {('%.0f%%' % (agreement*100)) if agreement is not None else 'n/a'}, "
        f"config {CFG}, backend {jax.default_backend()} x{n_dev}; {cpu_line}",
        file=sys.stderr,
    )


def _probe_backend(timeout_s: float = 150.0) -> bool:
    """Fail FAST if the TPU tunnel is wedged (observed: backend init can
    hang for hours - CLAUDE.md). Runs a 1-element compute + D2H readback
    in a SUBPROCESS (in-process jax init cannot be timed out) and kills it
    on timeout. Returns True when the backend is usable."""
    import subprocess

    code = (
        "import jax.numpy as jnp\n"
        "from pose_refine_tpu.utils.sync import sync\n"
        "sync((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, cwd="/root/repo",
        )
        if r.returncode == 0:
            return True
        sys.stderr.write(
            f"# bench: backend probe FAILED (exit {r.returncode}):\n"
            f"{r.stderr.decode()[-500:]}\n"
        )
    except subprocess.TimeoutExpired:
        sys.stderr.write(
            f"# bench: backend probe TIMED OUT after {timeout_s:.0f}s - the "
            "TPU tunnel is wedged (known failure mode, CLAUDE.md). Refusing "
            "to hang; re-run when the tunnel recovers.\n"
        )
    return False


def _probe_backend_with_retry(
    probe_timeout_s: float = 90.0,
    retry_interval_s: float = 300.0,
    budget_s: float = 2700.0,
) -> bool:
    """Bounded probe-retry: the tunnel wedge is usually transient, and a
    single failed probe at snapshot time cost round 4 its entire bench
    artifact (BENCH_r04 rc=3). Probe every ~5 min for up to ~45 min before
    giving up with the same rc=3 diagnostic. Tunable via env:
    PRT_BENCH_PROBE_BUDGET_S=0 restores single-probe behavior."""
    import os

    budget_s = float(os.environ.get("PRT_BENCH_PROBE_BUDGET_S", budget_s))
    t0 = time.perf_counter()
    attempt = 0
    while True:
        attempt += 1
        if _probe_backend(probe_timeout_s):
            if attempt > 1:
                sys.stderr.write(
                    f"# bench: backend recovered on probe {attempt} after "
                    f"{time.perf_counter() - t0:.0f}s\n"
                )
            return True
        elapsed = time.perf_counter() - t0
        remaining = budget_s - elapsed
        if remaining <= retry_interval_s:
            sys.stderr.write(
                f"# bench: giving up after {attempt} probes / {elapsed:.0f}s "
                "- TPU tunnel stayed wedged for the whole retry budget.\n"
            )
            return False
        sys.stderr.write(
            f"# bench: probe {attempt} failed; retrying in "
            f"{retry_interval_s:.0f}s ({remaining:.0f}s of budget left)\n"
        )
        time.sleep(retry_interval_s)


if __name__ == "__main__":
    if not _probe_backend_with_retry():
        sys.exit(3)
    main()
