#!/usr/bin/env python3
"""Camera-orbit demo: renders an animated flyaround of the demo scene and
writes an animated GIF + a contact sheet — the headless showcase of
interactive-rate path tracing (the GUI's camera loop without the GUI).

    python tools/demo_orbit.py --frames 36 --width 320 --height 240 --spp 16
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--radius", type=float, default=6.0)
    ap.add_argument("--out", default="orbit.gif")
    args = ap.parse_args()

    import tpu_rt
    from tpu_rt.ops.pallas_megakernel import render_pallas
    from tpu_rt.render.frame import _pallas_eligible

    scene = tpu_rt.demo_scene()
    use_pallas = _pallas_eligible(scene, "v2", False, True, None)

    frames = []
    t_render = 0.0
    for i in range(args.frames):
        ang = 2 * math.pi * i / args.frames
        pos = (args.radius * math.sin(ang), 2.5,
               -1.5 + args.radius * math.cos(ang))
        cam = tpu_rt.make_camera(position=pos, target=(0, 0.5, -2.0),
                                 aspect=args.width / args.height)
        t0 = time.perf_counter()
        if use_pallas:
            img = render_pallas(scene, cam, i, width=args.width,
                                height=args.height, spp=args.spp,
                                max_depth=args.depth, n_active=9)
        else:
            import jax

            img = tpu_rt.render(scene, cam, jax.random.key(i),
                                width=args.width, height=args.height,
                                spp=args.spp, max_depth=args.depth)
        arr = np.asarray(img)
        t_render += time.perf_counter() - t0
        frames.append((arr * 255).astype(np.uint8))
        print(f"\rframe {i + 1}/{args.frames}", end="", flush=True)

    print(f"\n{args.frames} frames in {t_render:.2f}s "
          f"({t_render / args.frames * 1e3:.0f} ms/frame incl. readback, "
          f"engine={'pallas' if use_pallas else 'lax'})")

    from PIL import Image

    pil = [Image.fromarray(f) for f in frames]
    pil[0].save(args.out, save_all=True, append_images=pil[1:], duration=80,
                loop=0)
    print(f"wrote {args.out}")

    # contact sheet of 6 frames
    step = max(1, len(frames) // 6)
    sheet = np.concatenate(frames[::step][:6], axis=1)
    sheet_path = os.path.splitext(args.out)[0] + "_sheet.png"
    Image.fromarray(sheet).save(sheet_path)
    print(f"wrote {sheet_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
