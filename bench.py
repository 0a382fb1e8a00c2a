"""skoots-tpu headline benchmark.

End-to-end skeleton-guided instance segmentation of a synthetic EM volume,
fully on device (skoots_tpu.infer.device_pipeline): tiled UNeXT sweep +
threshold/dilate + whole-volume connected components + N=10 embedding walk +
instance gather, as ONE compiled program. Prints one JSON line:

    {"metric": "e2e_seg_throughput_512", "value": <vox/s>, "unit": "vox/s",
     "vs_baseline": <value / 3.0e6>}

Baseline derivation (BASELINE.md: reference publishes no numbers, so the
yardstick is estimated from its measured mechanism): the reference sweeps
512^3 with crop 300x300x20 / overlap 50x50x5 (6.1x voxel redundancy,
eval.py:126-178), runs scipy flood fill on host (tens of seconds at 512^3),
and a second sweep for assignment. With torch.compile fp16 on A100 at
~20 ms/crop and ~450 crops, phase 1 alone is ~9 s; phases 2+3 add host CC +
embedding sweeps — a ~45 s end-to-end wall-clock for 134 Mvox, i.e.
~3.0 Mvox/s. vs_baseline = ours / 3.0e6.

Process architecture (round-5 hardening): the accelerator pool on this rig
FLAPS — backend init can block indefinitely, and a pool that grants a probe
can die mid-measurement (both modes observed; BASELINE.md Aug 17/20 notes).
So the parent process never imports jax at all. It (a) probes device health
in bounded subprocesses, (b) runs the ENTIRE measurement in a watchdogged
child with a hard deadline budgeted against the driver window, and (c) on
ANY overrun, crash, or unreachable pool emits a structured outage record
embedding the newest committed on-chip measurement (clearly labeled stale).
There is no code path that hangs past BENCH_WALL_BUDGET.

The measured volume is a seeded straight-tube phantom rendered ON DEVICE
(utils.synthetic.tube_segments + render_tubes — only ~n*6 floats cross the
wire), segmented with the committed trained checkpoint when present
(BENCH_CKPT, default runs/bench_ckpt.skoots); the recovered instance count
is recorded as a built-in sanity check. BENCH_VOLUME=noise restores the
percolating-speckle CC worst case.

Environment knobs: BENCH_SHAPE="512,512,512", BENCH_REPEATS=4,
BENCH_WALL_BUDGET (s, default 1290), BENCH_PROBE_BUDGET/_TIMEOUT,
BENCH_VOLUME=phantom|noise, BENCH_CKPT=path|"", BENCH_EXACT_WALK=1.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

BASELINE_VOX_PER_S = 3.0e6
REPO = os.path.dirname(os.path.abspath(__file__))


def _probe_chip(timeout_s: float) -> bool:
    """Probe device health in a SUBPROCESS with a hard timeout.

    A dead accelerator pool makes backend init *block* (PJRT client creation
    waits for a pool grant indefinitely) rather than raise, so an in-process
    try/except never fires — round 3's bench hung 25 minutes to rc=124 this
    way. A subprocess is the only reliable bound.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.ones((8, 8)).sum()))"],
            capture_output=True, text=True, timeout=max(timeout_s, 1.0),
        )
        return r.returncode == 0 and "64.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _latest_run_record(runs_dir: str | None = None):
    """Newest committed REAL measurement under runs/bench_*.json, for
    embedding (clearly labeled stale) in outage records. 'Real' means a
    positive e2e throughput — outage records and non-e2e benches are
    skipped. Newest = max (embedded recorded_unix, filename): records from
    round 5 on carry a timestamp; older round-4 files tie at 0 and resolve
    by name (r04j > r04e > r04c > r04_local, matching their actual order).
    """
    runs_dir = runs_dir or os.path.join(REPO, "runs")
    best_key, best = None, None
    for p in sorted(_glob.glob(os.path.join(runs_dir, "bench_*.json"))):
        try:
            with open(p) as f:
                rec = json.load(f)
        except Exception:
            continue
        if not isinstance(rec, dict):
            continue
        if not str(rec.get("metric", "")).startswith("e2e_seg_throughput"):
            continue
        if rec.get("chip_unavailable") or rec.get("measurement_incomplete"):
            continue
        if not (isinstance(rec.get("value"), (int, float)) and rec["value"] > 0):
            continue
        ts = rec.get("detail", {}).get("recorded_unix", 0)
        key = (ts, os.path.basename(p))
        if best_key is None or key > best_key:
            best_key, best = key, {"path": os.path.relpath(p, REPO), "record": rec}
    return best


def _outage_record(reason: str, value_zero_kind: str, detail: dict) -> dict:
    detail = dict(detail)
    detail["note"] = reason
    detail["last_measured_stale"] = _latest_run_record()
    rec = {
        "metric": "e2e_seg_throughput", "value": 0, "unit": "vox/s",
        "vs_baseline": 0, value_zero_kind: True, "detail": detail,
    }
    return rec


def _read_json(path: str):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


# --------------------------------------------------------------------------
# Child: the actual measurement. Runs in a watchdogged subprocess; never
# trusted to finish — the parent owns the deadline.
# --------------------------------------------------------------------------

def _heartbeat(path: str, stage: str, **kw):
    try:
        with open(path, "w") as f:
            json.dump({"stage": stage, "unix": time.time(), **kw}, f)
    except Exception:
        pass


def _load_bench_checkpoint():
    """(cfg, params_host, mean, std, vec_scale) from the committed bench
    checkpoint, or None when absent/disabled (BENCH_CKPT="")."""
    path = os.environ.get("BENCH_CKPT", os.path.join(REPO, "runs", "bench_ckpt.skoots"))
    if not path or not os.path.exists(path):
        return None
    import jax
    import jax.numpy as jnp

    from skoots_tpu.models import cfg_to_model
    from skoots_tpu.train.checkpoint import load_checkpoint, restore_params

    ckpt = load_checkpoint(path)
    cfg = ckpt["cfg"]
    model = cfg_to_model(cfg)
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 16, 16, 16, 1), jnp.float32), deterministic=True,
        )
    )
    params = restore_params(template, ckpt["params"])
    mean = float(ckpt.get("dataset_mean") or 128.0)
    std = float(ckpt.get("dataset_std") or 64.0)
    return cfg, model, params, mean, std, tuple(cfg.SKOOTS.VECTOR_SCALING)


def _run(shape, crop, overlap, repeats, deadline=None, hb=lambda *a, **k: None) -> dict:
    import jax
    import jax.numpy as jnp

    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    setup_s = {}
    t0 = time.time()
    enable_compilation_cache()
    hb("backend_init")
    # touch the backend once so init cost lands in setup, not phase timings
    jax.block_until_ready(jnp.ones((8, 8)).sum())
    setup_s["backend_init"] = round(time.time() - t0, 1)

    from skoots_tpu.config import get_cfg_defaults
    from skoots_tpu.infer.device_pipeline import make_chunked_pipeline
    from skoots_tpu.models import cfg_to_model

    t0 = time.time()
    hb("checkpoint")
    loaded = _load_bench_checkpoint()
    if loaded is not None:
        cfg, model, params_host, mean_f, std_f, vec_scale = loaded
        params = jax.device_put(params_host)  # one bulk H2D, ~4 MB
        trained = True
    else:
        cfg = get_cfg_defaults()
        model = cfg_to_model(cfg)
        vec_scale = tuple(cfg.SKOOTS.VECTOR_SCALING)
        # init params in ONE jitted program (per-leaf host init is
        # pathologically slow through the axon relay)
        dummy = jnp.zeros((1, 64, 64, 16, 1), jnp.float32)
        params = jax.jit(
            lambda k: model.init({"params": k}, dummy, deterministic=True)
        )(jax.random.PRNGKey(0))
        mean_f, std_f = 128.0, 64.0
        trained = False
    jax.block_until_ready(params)
    setup_s["params"] = round(time.time() - t0, 1)

    # synthesize the volume ON DEVICE: no bulk host->device transfer
    t0 = time.time()
    hb("volume_synth")
    vol_kind = os.environ.get("BENCH_VOLUME", "phantom")
    n_placed = None
    if vol_kind == "noise":
        volume = jax.jit(
            lambda k: jax.random.uniform(k, shape, jnp.float32, 0.0, 255.0)
        )(jax.random.PRNGKey(1))
        mean, std = jnp.float32(128.0), jnp.float32(64.0)
    else:
        from skoots_tpu.utils.synthetic import render_tubes, tube_segments

        n_target = max(6, int(48 * (shape[0] * shape[1] * shape[2]) / 512**3))
        p0, p1, n_placed = tube_segments(shape, n_target, radius=5.0, seed=7)
        volume = jax.jit(
            lambda a, b: render_tubes(shape, a, b, radius=5.0)
        )(p0, p1)
        if trained:
            mean, std = jnp.float32(mean_f), jnp.float32(std_f)
        else:
            mean = jnp.mean(volume)
            std = jnp.maximum(jnp.std(volume), 1e-3)
    volume.block_until_ready()
    setup_s["volume_synth"] = round(time.time() - t0, 1)

    # chunked orchestration keeps every dispatch short (some execution
    # environments bound single-program wall time) with all buffers
    # resident in HBM between dispatches. The embedding-walk early exit is
    # a BENCHMARK knob (library default runs all N steps — reference
    # semantics; the exit truncates the walk on <=0.1% of voxels, bound
    # measured in tests/test_ops.py); BENCH_EXACT_WALK=1 disables it.
    run = make_chunked_pipeline(
        model, shape, crop=crop, overlap=overlap,
        assign_crop=(256, 256, 64),
        vector_scale=vec_scale,
        embed_iterations=10, cc_rounds=24,
        embed_exit_fraction=(
            None if os.environ.get("BENCH_EXACT_WALK") else 1e-3
        ),
        embed_exit_cycle=bool(int(os.environ.get("BENCH_EXIT_CYCLE", "0"))),
        # exact-N fg-compacted walk (ops/vec2embed._vec2embed_compact):
        # bitwise-identical, walks only nonzero-vector voxels after the
        # dense first step. Measured 2.1x on the assign tile (154 vs
        # 327 ms at div=16, agreement 1.0, runs/bench_assign.json); the
        # in-graph dense fallback covers fg > 1/16. 0 disables.
        embed_compact_div=(
            int(os.environ.get("BENCH_COMPACT_DIV", "16")) or None
        ),
        # CC schedule: jump-free propagate-only, 192 hops/round — the
        # measured 512^3 phantom optimum (runs/bench_cc_sweep_phantom.json:
        # 1.38 s vs 8.33 s for the old 128-props+1-jump rounds; a pointer
        # jump is a ~2 s whole-volume gather, the fused Pallas propagate is
        # 4 hops per ~20 ms traversal). Speckle-like percolating masks
        # prefer scans (BENCH_CC_SCANS=1 P=16 J=0: 2.3 s,
        # runs/bench_cc_scan_speckle.json).
        cc_propagates_per_round=int(os.environ.get("BENCH_CC_PROPAGATES", "192")),
        cc_jumps_per_round=int(os.environ.get("BENCH_CC_JUMPS", "0")),
        cc_scans_per_round=int(os.environ.get("BENCH_CC_SCANS", "0")),
        tiles_per_dispatch=int(os.environ.get("BENCH_TILES_PER_DISPATCH", "16")),
    )

    def once():
        out = run(params, volume, mean, std)
        # scalar fetch forces completion of the full on-device chain
        return int(jnp.max(out)), out

    t0 = time.time()
    hb("compile")
    chk, out = once()
    compile_s = time.time() - t0
    # first-call phase split attributes the warm-start cost (trace+lower+
    # cache-load+execute) to pipeline stages
    first_phases = dict(getattr(run, "last_phase_s", {}))

    times = []
    phases = {}
    for i in range(repeats):
        # deadline-aware: never start a repeat that cannot finish. One timed
        # repeat is required; later ones are skipped when the projected end
        # crosses the child budget.
        projected = max(times) if times else compile_s
        if times and deadline is not None and time.time() + projected > deadline:
            break
        hb("measure", repeat=i, done=times)
        t0 = time.time()
        chk, out = once()
        dt = time.time() - t0
        if not times or dt < min(times):
            phases = dict(getattr(run, "last_phase_s", {}))
        times.append(dt)
    best = min(times)
    times_sorted = sorted(times)
    median = times_sorted[len(times) // 2]
    vox = shape[0] * shape[1] * shape[2]

    # instance-count sanity on the final output (outside the timed region):
    # a correct pipeline on the phantom recovers ~n_placed separated tubes.
    hb("instance_count")
    uniq = jnp.unique(out.ravel(), size=4096, fill_value=0)
    n_instances = int((uniq > 0).sum())

    # absolute figure of merit: model FLOPs per swept voxel -> achieved
    # FLOP/s and MFU against the chip's bf16 peak (VERDICT r2 item 3). The
    # forward sweep covers `redundancy` x the volume's voxels.
    from skoots_tpu.ops.cropper import crop_origins

    tile_vox = crop[0] * crop[1] * crop[2]
    ov = tuple(min(o, c // 4) for o, c in zip(overlap, crop))
    pads = [(o, max(o, c - (d + o))) for d, c, o in zip(shape, crop, ov)]
    padded = tuple(d + p[0] + p[1] for d, p in zip(shape, pads))
    n_tiles = len(crop_origins(padded, crop, ov))
    try:
        # analytic count, NOT XLA cost analysis: the Pallas dwconv/MLP
        # kernels are opaque custom calls that report zero FLOPs, so cost
        # analysis undercounts the production model >10x (19.5 kFLOP/vox
        # reported vs ~267 k actual; round-4 bench finding).
        from skoots_tpu.validate.stats import analytic_unext_flops

        model_flops_tile = analytic_unext_flops(
            cfg.MODEL.DIMS, cfg.MODEL.DEPTHS, cfg.MODEL.KERNEL_SIZE,
            cfg.MODEL.OUT_CHANNELS, tile_vox,
        )
    except Exception:
        model_flops_tile = -1.0
    peak_flops = float(os.environ.get("BENCH_PEAK_FLOPS", "197e12"))  # v5e bf16
    if model_flops_tile > 0:
        total_fwd_flops = model_flops_tile * n_tiles
        achieved = total_fwd_flops / best
        fwd_s = phases.get("1-forward")
        mfu_fwd = (total_fwd_flops / fwd_s / peak_flops) if fwd_s else None
    else:
        total_fwd_flops = achieved = mfu_fwd = None
    return {
        "vox_per_s": vox / best,
        "seconds": best,
        "seconds_all": [round(t, 3) for t in times],
        "seconds_median": round(median, 3),
        "seconds_spread": round((max(times) - min(times)) / max(median, 1e-9), 3),
        "compile_s": compile_s,
        "checksum": chk,
        "shape": list(shape),
        "volume": vol_kind,
        "trained_ckpt": trained,
        "n_instances": n_instances,
        "n_instances_expected": n_placed,
        "phase_s": phases,
        "phase_s_first": first_phases,
        "cc_impl": getattr(run, "last_cc_impl", None),
        "cc_rounds": getattr(run, "last_cc_rounds", None),
        "cc_converged": getattr(run, "last_cc_converged", None),
        "setup_s": setup_s,
        "model_flops_per_vox": (
            round(model_flops_tile / tile_vox, 1) if model_flops_tile > 0 else None
        ),
        "e2e_tflops": round(achieved / 1e12, 2) if achieved else None,
        "mfu_e2e": round(achieved / peak_flops, 4) if achieved else None,
        "mfu_forward": round(mfu_fwd, 4) if mfu_fwd else None,
    }


def _child_main(out_path: str, hb_path: str) -> int:
    budget = float(os.environ.get("BENCH_CHILD_BUDGET_S", "1e9"))
    deadline = time.time() + budget

    def hb(stage, **kw):
        _heartbeat(hb_path, stage, **kw)

    shape = tuple(
        int(v) for v in os.environ.get("BENCH_SHAPE", "512,512,512").split(",")
    )
    repeats = int(os.environ.get("BENCH_REPEATS", "4"))
    # Sweep geometry: 256^2x96 tiles, zero overlap — an exact 2x2x6 grid at
    # 512^3, 1.125x voxel redundancy (vs 1.43x at 192^2x96/(8,8,4), 3.1x at
    # the old 128^2x64/(16,16,8), 6.1x in the reference, eval.py:126).
    # Per-tile throughput is the measured v5e optimum (70.0 ms/Mvox; flat vs
    # 192^2x96 at 71.8, VMEM cliff >=264^2 at 209+). Zero overlap is
    # measured, not assumed (runs/seam_probe.json, tools/seam_probe.py):
    # touching-tubes re-scored with seams cutting through instances keeps
    # F1 1.0 / mean IoU 0.9976 when tiles are at or above the training crop
    # scale; sub-scale tiles (64^3-class) fail from missing context, not
    # from overlap trim (identical F1 0.44 at overlap 0/4/8).
    crop = tuple(int(v) for v in os.environ.get("BENCH_CROP", "256,256,96").split(","))
    ov = tuple(int(v) for v in os.environ.get("BENCH_OVERLAP", "0,0,0").split(","))
    attempts = [
        (shape, crop, ov),
        ((384, 384, 384), (128, 128, 64), (16, 16, 8)),
        ((256, 256, 256), (128, 128, 64), (16, 16, 8)),
    ]
    err = None
    for shp, crop, ov in attempts:
        if time.time() + 120 > deadline and err is not None:
            break  # no room for another attempt; parent reports the error
        try:
            res = _run(shp, crop, ov, repeats, deadline=deadline, hb=hb)
            rec = {
                "metric": f"e2e_seg_throughput_{shp[0]}",
                "value": round(res["vox_per_s"], 1),
                "unit": "vox/s",
                "vs_baseline": round(res["vox_per_s"] / BASELINE_VOX_PER_S, 3),
                "detail": {
                    "seconds": round(res["seconds"], 3),
                    "seconds_all": res["seconds_all"],
                    "seconds_median": res["seconds_median"],
                    "seconds_spread": res["seconds_spread"],
                    "compile_s": round(res["compile_s"], 1),
                    "shape": res["shape"],
                    "volume": res["volume"],
                    "trained_ckpt": res["trained_ckpt"],
                    "n_instances": res["n_instances"],
                    "n_instances_expected": res["n_instances_expected"],
                    "phase_s": res.get("phase_s"),
                    "phase_s_first": res.get("phase_s_first"),
                    "cc_impl": res.get("cc_impl"),
                    "cc_rounds": res.get("cc_rounds"),
                    "cc_converged": res.get("cc_converged"),
                    "setup_s": res.get("setup_s"),
                    "model_flops_per_vox": res.get("model_flops_per_vox"),
                    "e2e_tflops": res.get("e2e_tflops"),
                    "mfu_e2e": res.get("mfu_e2e"),
                    "mfu_forward": res.get("mfu_forward"),
                    "recorded_unix": round(time.time(), 1),
                    "baseline_note": "est. reference A100 e2e ~3.0 Mvox/s (see module docstring)",
                },
            }
            with open(out_path, "w") as f:
                json.dump(rec, f)
            return 0
        except Exception as e:  # try a smaller envelope before giving up
            err = e
            print(f"# bench attempt {shp} failed: {e!r}", file=sys.stderr)
            if "crashed or restarted" in str(e) and time.time() + 420 < deadline:
                print("# waiting for TPU worker restart...", file=sys.stderr)
                time.sleep(300)
    with open(out_path, "w") as f:
        json.dump({"error": repr(err)}, f)
    return 1


# --------------------------------------------------------------------------
# Parent: probe, watchdog, report. Never imports jax.
# --------------------------------------------------------------------------

def _spawn_child(budget_s: float):
    """Launch the measurement child in its own session (killable as a
    group) writing to temp result/heartbeat files."""
    fd, out_path = tempfile.mkstemp(suffix=".json", prefix="bench_out_")
    os.close(fd)
    fd, hb_path = tempfile.mkstemp(suffix=".json", prefix="bench_hb_")
    os.close(fd)
    env = dict(os.environ)
    env["BENCH_CHILD_BUDGET_S"] = str(budget_s)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", out_path, hb_path],
        env=env, start_new_session=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    return proc, out_path, hb_path


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "--child":
        return _child_main(argv[1], argv[2])

    t_start = time.time()
    wall_budget = float(os.environ.get("BENCH_WALL_BUDGET", "1290"))
    wall_deadline = t_start + wall_budget

    # Fail-fast-but-patient on a flaky chip pool BEFORE any jax import.
    # Pool grants flap on multi-minute timescales (a probe can hang >300 s,
    # then an identical probe 4 min later completes in 2 s), so a fixed
    # two-probe check misdiagnoses a busy pool as dead. Keep probing with
    # bounded subprocesses inside a budget that leaves the measurement most
    # of the wall window.
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "90"))
    probe_budget = min(
        float(os.environ.get("BENCH_PROBE_BUDGET", "600")), wall_budget * 0.45
    )
    probe_deadline = t_start + probe_budget
    probes = 0
    healthy = False
    while time.time() < probe_deadline:
        probes += 1
        # cap each probe at the remaining probe budget so the loop cannot
        # overshoot it by a full probe_timeout (round-4 advisor finding)
        this_timeout = min(probe_timeout, max(1.0, probe_deadline - time.time()))
        if _probe_chip(this_timeout):
            healthy = True
            break
        time.sleep(min(15.0, max(0.0, probe_deadline - time.time())))
    probe_detail = {
        "probe_timeout_s": probe_timeout, "probes": probes,
        "probe_budget_s": probe_budget,
    }
    if not healthy:
        print(json.dumps(_outage_record(
            "device backend init did not complete; accelerator pool "
            "unreachable", "chip_unavailable", probe_detail)))
        return 1

    # hand the rest of the wall budget (minus parent margin) to the child
    margin = float(os.environ.get("BENCH_PARENT_MARGIN", "45"))
    child_budget = wall_deadline - time.time() - margin
    if child_budget < min(60.0, wall_budget * 0.2):
        print(json.dumps(_outage_record(
            "pool became reachable too late in the wall budget to measure",
            "measurement_incomplete", probe_detail)))
        return 1
    proc, out_path, hb_path = _spawn_child(child_budget)
    try:
        # small slack past the child's own deadline so a child finishing a
        # final repeat right at budget still gets to write its result file
        _, err_text = proc.communicate(
            timeout=child_budget + min(30.0, 0.2 * child_budget)
        )
        overrun = False
    except subprocess.TimeoutExpired:
        overrun = True
        err_text = ""
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except Exception:
            proc.kill()
        try:
            proc.wait(timeout=10)
        except Exception:
            pass

    result = _read_json(out_path)
    hb = _read_json(hb_path)
    for p in (out_path, hb_path):
        try:
            os.unlink(p)
        except OSError:
            pass

    # a completed result wins even if the timeout fired while it was being
    # written — the measurement is what matters, not the race
    if result and "metric" in result:
        print(json.dumps(result))
        # best-effort local copy so future outage records can embed it
        try:
            with open(os.path.join(REPO, "runs", "bench_last.json"), "w") as f:
                json.dump(result, f, indent=1)
        except Exception:
            pass
        return 0

    detail = dict(probe_detail)
    detail["child_heartbeat"] = hb
    if overrun:
        reason = (
            f"measurement overran its {round(child_budget)}s watchdog budget "
            "(pool flap mid-run or cold-compile overrun); child killed"
        )
    else:
        reason = "measurement child failed"
        detail["child_error"] = (result or {}).get("error")
        detail["child_stderr_tail"] = (err_text or "")[-800:]
    print(json.dumps(_outage_record(reason, "measurement_incomplete", detail)))
    return 1


if __name__ == "__main__":
    sys.exit(main())
