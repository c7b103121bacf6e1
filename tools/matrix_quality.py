"""Quality-scale any<->any distill matrix (up to all 16 pairs).

Round-3 VERDICT item 6 ran 4 representative pairs; round-5 (VERDICT r4
item 5) covers the full 4x4 matrix at the quality-A/B recipe scale
(CLAUDE.md: synthetic scene n_train=100 H=96, teachers 3000 iters @
grid 64, students 2000 iters, stages 300/800) and records per-pair
teacher/student PSNR deltas.  Reference scope:
main_distill_mutual.py:43-236 (any teacher_type -> any model_type).

Tuned variants (--tuned): dense no-MLP plenoxel students underfit their
teacher at the reference-default lr 1e-2 (round-4 finding, STATUS.md);
the documented cure (lr 2e-2, 4000 iters) runs as extra `<pair>_tuned`
entries so the recipe is reproducible from this tool (round-4 ADVICE).

Teacher reuse stamps/checks a meta.json (argv + psnr) in the teacher
workspace so a reused checkpoint's config mismatch or missing PSNR is
loud instead of silent (round-4 ADVICE).

Run: python tools/matrix_quality.py [--pairs hash2vm,vm2hash] [--tuned]
     [--out MATRIX_QUALITY_r05.json]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PVD_DISABLE_TB", "1")

ARCHS = ["hash", "mlp", "vm", "tensors"]
ALL_PAIRS = [(t, s) for t in ARCHS for s in ARCHS]
# documented cure for dense no-MLP plenoxel students (STATUS.md round 4):
# double lr + double iters lifts the teacher-fit from ~31 dB to 38-40 dB
TUNED = {("hash", "tensors"): {"lr": "2e-2", "iters": 4000},
         ("vm", "tensors"): {"lr": "2e-2", "iters": 4000},
         ("mlp", "tensors"): {"lr": "2e-2", "iters": 4000},
         ("tensors", "tensors"): {"lr": "2e-2", "iters": 4000}}
# round-5 coarse-to-fine experiment (VERDICT r4 item 6): the plenoxel
# volume starts at 64^3 and trilinear-upsamples through the VM log
# schedule (Trainer._maybe_vm_resize tensors branch) so it fits the
# teacher's low frequencies before committing per-voxel detail
C2F = {("hash", "tensors"): {
    "lr": "2e-2", "iters": 4000, "suffix": "_c2f",
    "extra": ["--resolution0", "64", "--resolution1", "128",
              "--upsample_model_steps", "800",
              "--upsample_model_steps", "1600"]}}


def find_best(ws_prefix):
    cands = sorted(glob.glob(ws_prefix + "*/checkpoints/*best*.ckpt")) \
        + sorted(glob.glob(ws_prefix + "/checkpoints/*best*.ckpt"))
    return cands[0] if cands else None


def teacher_argv(root, ws, tea, iters):
    argv = [root, "--model_type", tea, "--iters", str(iters),
            "--grid_size", "64", "--num_rays", "4096",
            "--workspace", ws, "--eval_interval", "1000",
            # device-resident images + scan-fused steps: amortizes the
            # ~1.5 ms/step host+tunnel overhead (quality A/B'd within
            # ~0.1 dB of single steps, STATUS.md)
            "--preload", "--scan_steps", "8"]
    if tea == "hash":
        argv += ["--hash_cell_levels", "9"]
    return argv


def meta_path_for(ck):
    return os.path.join(os.path.dirname(os.path.dirname(ck)), "meta.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/matrix_scene")
    ap.add_argument("--ws", default="/tmp/matrix_ws")
    ap.add_argument("--teacher_iters", type=int, default=3000)
    ap.add_argument("--distill_iters", type=int, default=2000)
    ap.add_argument("--pairs", default="",
                    help="comma-separated subset, e.g. hash2vm,tensors2mlp "
                         "(default: all 16)")
    ap.add_argument("--tuned", action="store_true",
                    help="also run tuned variants for pairs in TUNED")
    ap.add_argument("--out", default="/tmp/matrix_quality.json")
    args = ap.parse_args()

    pairs = ALL_PAIRS
    if args.pairs:
        want = set(args.pairs.split(","))
        pairs = [(t, s) for t, s in ALL_PAIRS if f"{t}2{s}" in want]

    from pvd_tpu.utils.misc import setup_jax_cache_and_platform

    setup_jax_cache_and_platform()

    from pvd_tpu.data.synth import make_synthetic_scene

    if not os.path.exists(os.path.join(args.root, "transforms_train.json")):
        make_synthetic_scene(args.root, n_train=100, n_val=3, n_test=10,
                             H=96, W=96)
        print(f"[matrix] scene at {args.root}")

    from pvd_tpu.cli import distill, train_teacher

    results = {"pairs": {}, "teachers": {},
               "recipe": {"teacher_iters": args.teacher_iters,
                          "distill_iters": args.distill_iters,
                          "scene": "synthetic H=96 n_train=100",
                          "cmd": "python tools/matrix_quality.py"
                                 + (" --tuned" if args.tuned else "")}}
    teacher_ckpt = {}
    for tea in sorted({t for t, _ in pairs}):
        ws = os.path.join(args.ws, f"tea_{tea}")
        argv = teacher_argv(args.root, ws, tea, args.teacher_iters)
        ck = find_best(ws)
        if ck:
            print(f"[matrix] reusing {tea} teacher {ck}")
            meta = {}
            try:
                with open(meta_path_for(ck)) as f:
                    meta = json.load(f)
            except OSError:
                print(f"[matrix] WARNING: reused {tea} teacher has no "
                      f"meta.json; its PSNR may be unrecoverable")
            if meta.get("argv") and meta["argv"] != argv:
                print(f"[matrix] WARNING: reused {tea} teacher was trained "
                      f"with different args:\n  was: {meta['argv']}\n"
                      f"  now: {argv}")
            psnr = meta.get("psnr")
            if psnr is None:  # legacy fallback: workspace -psnr suffix
                ws_dir = os.path.dirname(os.path.dirname(ck))
                if "-psnr" in ws_dir:
                    try:
                        psnr = float(ws_dir.rsplit("-psnr", 1)[1])
                    except ValueError:
                        pass
                if psnr is None:
                    print(f"[matrix] WARNING: {tea} teacher PSNR "
                          f"unrecoverable; delta_vs_teacher_db will be "
                          f"omitted for its pairs")
            results["teachers"][tea] = {"psnr": psnr, "reused": True}
        else:
            t0 = time.time()
            stats = train_teacher.main(argv)
            results["teachers"][tea] = {
                "psnr": stats.get("psnr"),
                "wall_s": round(time.time() - t0, 1),
            }
            print(f"[matrix] teacher {tea}: PSNR {stats.get('psnr')}")
            ck = find_best(ws)
            assert ck, f"no {tea} teacher checkpoint under {ws}*"
            with open(meta_path_for(ck), "w") as f:
                json.dump({"argv": argv, "psnr": stats.get("psnr")}, f)
                f.write("\n")
        teacher_ckpt[tea] = ck

    runs = [(t, s, None) for t, s in pairs]
    if args.tuned:
        runs += [(t, s, TUNED[(t, s)]) for t, s in pairs if (t, s) in TUNED]
        runs += [(t, s, C2F[(t, s)]) for t, s in pairs if (t, s) in C2F]

    for tea, stu, tune in runs:
        name = f"{tea}2{stu}" + (tune.get("suffix", "_tuned") if tune
                                 else "")
        ws = os.path.join(args.ws, name)
        iters = tune["iters"] if tune else args.distill_iters
        t0 = time.time()
        argv = [args.root, "--teacher_type", tea, "--model_type", stu,
                "--grid_size", "64",  # must match the teacher's grid
                "--ckpt_teacher", teacher_ckpt[tea], "--workspace", ws,
                "--iters", str(iters),
                "--stage_iters", "stage1=300,stage2=800",
                "--num_rays", "4096", "--max_samples", "64",
                "--samples_per_ray", "6", "--no_autotune_budget",
                "--eval_interval", "1000", "--ckpt", "scratch",
                "--preload", "--scan_steps", "8"]
        if tune:
            argv += ["--lr", tune["lr"]] + list(tune.get("extra", []))
        if tea == "hash":
            argv += ["--hash_cell_levels", "9"]
        try:
            stats = distill.main(argv)
        except Exception as e:  # keep the sweep alive: record the failure
            print(f"[matrix] {name} FAILED: {type(e).__name__}: {e}")
            results["pairs"][name] = {"error": f"{type(e).__name__}: {e}"}
            continue
        results["pairs"][name] = {
            "psnr": stats.get("psnr"),
            "wall_s": round(time.time() - t0, 1),
        }
        if tune:
            results["pairs"][name]["tuned"] = dict(tune)
            results["pairs"][name]["cmd"] = " ".join(argv)
        print(f"[matrix] {name}: PSNR {stats.get('psnr')}")
        # checkpoint the sweep after every pair (resume-friendly artifact)
        _write(args.out, results)

    for name, row in results["pairs"].items():
        tea = name.split("2")[0]
        tp = (results["teachers"].get(tea) or {}).get("psnr")
        if tp and row.get("psnr"):
            row["delta_vs_teacher_db"] = round(row["psnr"] - tp, 3)

    _write(args.out, results)
    print("[matrix] " + json.dumps(results))


def _write(path, results):
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
