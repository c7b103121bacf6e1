"""Time a full 800x800 eval render on a TRAINED checkpoint (VERDICT #4).

Round-1 baseline: 26 s/image. Target: <= 8 s at unchanged PSNR.
Usage: python tools/eval_speed.py <ckpt> [--H 800] [--chunk 16384]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--H", type=int, default=800)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--grid_size", type=int, default=64)
    ap.add_argument("--model_type", default="hash")
    args = ap.parse_args()

    import jax

    from pvd_tpu.config import PVDConfig
    from pvd_tpu.data.poses import pose_spherical
    from pvd_tpu.engine.checkpoint import load_checkpoint
    from pvd_tpu.engine.train_steps import make_eval_renderer
    from pvd_tpu.ops.rays import nerf_matrix_to_ngp

    cfg = PVDConfig(grid_size=args.grid_size, model_type=args.model_type,
                    max_ray_batch=args.chunk)
    rspec = cfg.render_spec()
    spec = cfg.model_spec()
    payload = load_checkpoint(args.ckpt)
    params, occ = payload["params"], payload["occ"]

    render = make_eval_renderer(spec, rspec, chunk=args.chunk)
    H = W = args.H
    fl = 1111.0 * H / 800.0
    intr = (fl, fl, W / 2, H / 2)
    pose = nerf_matrix_to_ngp(pose_spherical(30.0, -30.0, 4.0), scale=0.8)

    # warmup (compiles all ladder rungs that fire)
    img, dep = render(params, occ, pose, intr, H, W)
    print(f"warmup done; img mean={float(img.mean()):.4f} "
          f"finite={bool(np.isfinite(img).all())}")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        img, dep = render(params, occ, pose, intr, H, W)
        times.append(time.perf_counter() - t0)
    print(f"[eval_speed] {H}x{W} chunk={args.chunk} "
          f"backend={jax.default_backend()}: "
          f"{min(times):.2f} s/image (3 runs: "
          f"{', '.join(f'{t:.2f}' for t in times)})")


if __name__ == "__main__":
    main()
