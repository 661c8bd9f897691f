"""Pretrain + cache the 5-pt face landmark network.

The environment-native replacement for downloading insightface weights
(appv3.py:67-90; zero-egress here): trains models/face_landmark.py on the
procedural generator (data/synth_faces.py) and caches the weights where
serve/face.get_landmark_params finds them. Deterministic for a seed.

Usage:
  python -m tpudf.cli.face_pretrain [--steps 3000] [--out PATH]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="pretrain face landmark net")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="output .npz (default: the serve-time cache path)")
    args = p.parse_args(argv)

    from tpudf.models.face_landmark import (save_landmark_net,
                                            train_landmark_net)
    from tpudf.serve.face import _DEFAULT_CACHE

    params = train_landmark_net(steps=args.steps, batch=args.batch,
                                size=args.size, seed=args.seed,
                                log_every=max(1, args.steps // 10))
    out = args.out or _DEFAULT_CACHE
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_landmark_net(params, out)
    print(f"[face_pretrain] saved → {out}")


if __name__ == "__main__":
    main()
