"""True flash-NN kernel rates at production scale (dispatch amortized).

The kernel A/B in nn_tile_bound_study.py times one ~40 ms call - mostly the
~30 ms axon dispatch floor - so arm differences vanish. This tiles the same
real query distribution to ~500k queries (= one ICP iteration of the raw-cloud
bench: 256 poses x 2048-pt clouds) so the kernel body dominates, giving the
honest Mq/s per variant and the real wall saved by chunk pruning.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/nn_kernel_rate.py [smoke]
"""
import sys
import time

import numpy as np

SMOKE = "smoke" in sys.argv[1:]
if SMOKE:
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu.ops.depth_to_cloud import window_cloud
from pose_refine_tpu.scene.nn import SceneNN
from pose_refine_tpu.scene.nn_pallas import (
    chunk_boxes, nn_flash_gated, nn_flash_packed, pack_scene)
from pose_refine_tpu.utils.sync import sync

W, H = (320, 240) if SMOKE else (640, 480)
INTERP = jax.default_backend() == "cpu"
N_Q = 4096 if SMOKE else 524288


def main():
    model = mesh.load_benchmark_model()
    K = geometry.LINEMOD_K.copy()
    if SMOKE:
        K[:2] *= 0.5
    R_ren = np.array([[0.34768538, 0.93761126, 0.0],
                      [0.70540612, -0.26157897, -0.65877056],
                      [-0.61767070, 0.22904489, -0.75234390]], np.float32)
    truth = np.asarray(geometry.pose_from_Rt(
        R_ren, np.array([0, 0, 300], np.float32)))
    use_pallas = not INTERP
    r = prt.PoseRenderer(model, K=K, width=W, height=H,
                         backend="pallas" if use_pallas else "dense")
    scene_depth = np.asarray(r.render_depth(truth[None]))[0].astype(np.int32)
    scene_host = SceneNN.from_depth(scene_depth, K, backend="bruteforce")
    sc = np.asarray(scene_host.points)
    table = pack_scene(jnp.asarray(sc))
    boxes = chunk_boxes(table)

    qc, qv, _ = window_cloud(jnp.asarray(scene_depth), K,
                             window=256 if not SMOKE else 96, stride=2)
    q = np.asarray(qc)[np.asarray(qv)]
    # near-converged distribution (scene's own lift + 2 mm jitter), Morton
    # like production; ALSO an offset copy (init-stage distribution)
    rng = np.random.default_rng(0)
    reps = max(1, N_Q // len(q))
    qbase = np.tile(q, (reps, 1)) + rng.normal(0, 0.002, (reps * len(q), 3)).astype(np.float32)

    def _morton(p, bits=10):
        g = ((p - p.min(0)) / max(np.ptp(p, 0).max(), 1e-9)
             * ((1 << bits) - 1)).astype(np.uint64)
        code = np.zeros(len(p), np.uint64)
        for b in range(bits):
            for a in range(3):
                code |= ((g[:, a] >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b + a)
        return code

    for tag_q, qq in (("converged", qbase),
                      ("init(+15mm)", qbase + np.float32([0.01, 0.01, 0.008]))):
        qq = qq[np.argsort(_morton(qq))]
        Q = jax.device_put(jnp.asarray(qq))
        print(f"[{tag_q}] {Q.shape[0]} queries vs {len(sc)} pts "
              f"({boxes.shape[0]} chunks)", flush=True)

        def run(tag, fn):
            out = fn(); sync(out)
            t0 = time.perf_counter()
            out = fn(); sync(out)
            w1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = fn(); sync(out)
            w2 = time.perf_counter() - t0
            wall = min(w1, w2)
            print(f"  {tag:>16}: {wall*1000:8.2f} ms ({Q.shape[0]/wall/1e6:6.1f} Mq/s)",
                  flush=True)

        run("plain", lambda: nn_flash_packed(Q, table, interpret=INTERP))
        run("gate-only", lambda: nn_flash_gated(
            Q, table, boxes, 0.1, interpret=INTERP, use_tile_bound=False))
        sweep = ((512, 128), (256, 32)) if SMOKE else (
            (512, 128), (512, 32), (256, 32), (128, 32))
        for qt, ub in sweep:
            run(f"bound T{qt}/b{ub}", lambda qt=qt, ub=ub: nn_flash_gated(
                Q, table, boxes, 0.1, interpret=INTERP,
                use_tile_bound=True, q_tile=qt, ub_ball=ub))


if __name__ == "__main__":
    main()
