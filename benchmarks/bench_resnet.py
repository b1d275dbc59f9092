"""ResNet CLIP tower throughput on one TPU chip (RN50 family).

Baseline context: the reference's published numbers are ViT-only, so these
rows have no direct GPU counterpart; openai's CLIP paper orders RN50 ~
ViT-B/32 in cost.  MFU here uses XLA's own compiled FLOP count
(cost_analysis), not a hand model — conv FLOPs are easy to get wrong.

Run:  python benchmarks/bench_resnet.py [--models RN50,RN101] [--batch 256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/clip_retrieval_tpu/xla_cache"),
)

PEAK_BF16 = 197e12  # v5e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="RN50,RN101")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clip_retrieval_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from clip_retrieval_tpu.models import clip as jclip
    from clip_retrieval_tpu.models.configs import get_config
    from clip_retrieval_tpu.models.clip import init_clip

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    results = []
    for name in args.models.split(","):
        cfg = get_config(name)
        params = init_clip(cfg, 0)

        @jax.jit
        def embed(p, x):
            return jclip.encode_image(
                p, cfg, x, compute_dtype=jnp.bfloat16
            ).astype(jnp.float16)

        xs = [
            jax.device_put(
                rng.integers(
                    0, 255,
                    (args.batch, cfg.image_size, cfg.image_size, 3),
                    dtype=np.uint8,
                )
            )
            for _ in range(4)
        ]
        lowered = embed.lower(params, xs[0])
        compiled = lowered.compile()
        try:
            flops = float(compiled.cost_analysis()["flops"])
        except Exception:
            flops = 0.0
        for x in xs:
            np.asarray(embed(params, x))  # compile + materialize inputs
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            out = embed(params, xs[i % 4])
        np.asarray(out)
        ips = args.batch * args.iters / (time.perf_counter() - t0)
        row = {
            "model": name,
            "images_per_sec": round(ips, 1),
            "mfu": round(ips * flops / args.batch / PEAK_BF16, 3)
            if flops
            else None,
            "xla_flops_per_image": round(flops / args.batch / 1e9, 2),
            "batch": args.batch,
            "platform": platform,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        del params, xs

    out_path = os.path.join(
        os.path.dirname(__file__), f"resnet_{platform}.json"
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
