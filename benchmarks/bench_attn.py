"""Attention implementation decision data (VERDICT r1 weak #3).

Measures full-model image-embed throughput per attention impl on the real
chip and the output cosine of each impl vs the exact-f32 XLA path, then
writes benchmarks/attn_<platform>.json.  This is the measurement behind
`ops/attention.py::sdpa`'s 'auto' rule.

Run:  python benchmarks/bench_attn.py [--models B32,B16,L14]
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


def flops_per_img(cfg):
    s, w, nl = cfg.vision_seq_len, cfg.vision_width, cfg.vision_layers
    mlp = int(w * cfg.vision_mlp_ratio)
    return (
        2 * s * (cfg.patch_size**2 * 3) * w
        + nl * (2 * s * 4 * w * w + 2 * s * 2 * w * mlp + 4 * s * s * w)
        + 2 * s * w * cfg.embed_dim
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="B32,B16,L14")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clip_retrieval_tpu.models import clip as jclip
    from clip_retrieval_tpu.models import configs
    from clip_retrieval_tpu.models.clip import init_clip

    platform = jax.devices()[0].platform
    name_map = {
        "B32": configs.VIT_B32,
        "B16": configs.VIT_B16,
        "L14": configs.VIT_L14,
        "L14_336": configs.VIT_L14_336,
        "H14": configs.VIT_H14,
        "G14": configs.VIT_G14,
    }
    rng = np.random.default_rng(0)
    results = []
    for model_name in args.models.split(","):
        cfg = name_map[model_name]
        params = init_clip(cfg, 0)
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
        ref_out = None
        impls = ["xla", "xla_bf16", "flash"]
        if cfg.vision_head_dim % 64:
            # ragged-dh towers (H/14): A/B both packed kernel bodies —
            # unaligned lane slices vs in-VMEM batched relayout
            impls.append("flash_batched")
        for impl in impls:
            variant = "batched" if impl == "flash_batched" else "slice"
            os.environ["CRT_PACKED_VARIANT"] = variant
            attn_impl = "flash" if impl.startswith("flash") else impl

            @jax.jit
            def embed(p, x, impl=attn_impl):
                return jclip.encode_image(
                    p, cfg, x, compute_dtype=jnp.bfloat16, attn_impl=impl
                ).astype(jnp.float16)

            try:
                out0 = np.asarray(embed(params, xs[0]))
            except Exception as e:
                results.append(
                    {"model": model_name, "impl": impl,
                     "error": str(e)[:200]}
                )
                continue
            if impl == "xla":
                ref_out = out0.astype(np.float64)
                cos = 1.0
            else:
                o = out0.astype(np.float64)
                cos = float(
                    np.min(
                        np.sum(o * ref_out, axis=1)
                        / (np.linalg.norm(o, axis=1)
                           * np.linalg.norm(ref_out, axis=1))
                    )
                )
            for x in xs[1:]:  # materialize ALL inputs: device_put is lazy
                np.asarray(embed(params, x))  # through the relay
            t0 = time.perf_counter()
            out = None
            for i in range(args.iters):
                out = embed(params, xs[i % 4])
            np.asarray(out)  # true sync: in-order device queue drained
            ips = args.batch * args.iters / (time.perf_counter() - t0)
            row = {
                "model": model_name,
                "impl": impl,
                "images_per_sec": round(ips, 1),
                "mfu": round(ips * flops_per_img(cfg) / PEAK_BF16, 3),
                "min_cos_vs_xla_f32": round(cos, 6),
                "batch": args.batch,
                "platform": platform,
            }
            results.append(row)
            print(json.dumps(row))
        del params, xs

    out_path = os.path.join(
        os.path.dirname(__file__), f"attn_{platform}.json"
    )
    # merge with prior rows so partial runs (--models H14) don't drop data
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        fresh = {(r["model"], r["impl"]) for r in results}
        results = [
            r for r in prior if (r["model"], r["impl"]) not in fresh
        ] + results
        order = {
            m: i
            for i, m in enumerate(
                ["B32", "B16", "L14", "L14_336", "H14", "G14"]
            )
        }
        results.sort(key=lambda r: order.get(r["model"], 9))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
