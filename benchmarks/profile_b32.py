"""Where do ViT-B/32's missing MFU points go? (VERDICT r3 weak #5)

B/32 measures ~45% MFU vs L/14's 61.6% (attn_tpu.json) — the
highest-throughput zoo config has the worst utilization.  This script
decomposes the full encode into separately-jitted components on the real
chip and reports each one's time share and its own MFU, so the gap is
attributed instead of guessed:

  - normalize+patchify+posembed+ln_pre  (im2col + one matmul; HBM-heavy)
  - transformer blocks                  (the MXU work: 12 layers at S=50)
  - head (ln_post + projection + l2)    (tiny)

Each component is timed with device-resident inputs, iters amortized, and
np.asarray readback as the only sync.  The sum of parts vs the fused
whole also bounds XLA's cross-component fusion benefit.

Writes benchmarks/b32_profile_<platform>.json and prints rows.

Run:  python benchmarks/profile_b32.py [--batch 256] [--iters 32]
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


def timed(fn, args, iters, warmup=3):
    """Per-iteration device time via a two-point slope.

    Through this harness's relay, block_until_ready returns before the
    device work drains (it measured a 24 ms full B/32 encode at 0.04 ms) —
    only a host readback truly syncs.  A readback costs a ~65 ms round
    trip, which at the ~1 ms granularity profiled here would swamp the
    signal, so: time iters and 2·iters windows, each ending in one
    readback, and take the slope — the in-order device queue makes the
    window cost n·t_iter + const, and the slope cancels the const
    (readback + dispatch tail) exactly."""
    import jax

    def run(n):
        out = fn(*args)
        for _ in range(warmup):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    t_n = run(iters)
    t_2n = run(2 * iters)
    return max((t_2n - t_n) / iters, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clip_retrieval_tpu.models import clip as jclip
    from clip_retrieval_tpu.models import configs
    from clip_retrieval_tpu.models.clip import (
        _layer_norm,
        _run_blocks,
        init_clip,
        l2_normalize,
        normalize_images,
    )

    cfg = configs.VIT_B32
    params = init_clip(cfg, 0)
    dt = jnp.bfloat16
    b = args.batch
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.integers(0, 255, (b, cfg.image_size, cfg.image_size, 3),
                     dtype=np.uint8)
    )
    vp = params["visual"]
    g, p_sz, w = cfg.grid_size, cfg.patch_size, cfg.vision_width
    s = cfg.vision_seq_len

    @jax.jit
    def full(p, x):
        return jclip.encode_image(p, cfg, x, compute_dtype=dt)

    @jax.jit
    def stem(p, x):
        vp = p["visual"]
        x = normalize_images(x, dt)
        x = x.reshape(b, g, p_sz, g, p_sz, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p_sz * p_sz * 3)
        kernel = vp["patch_embed"]["kernel"].reshape(-1, w)
        x = jnp.dot(x, kernel.astype(dt),
                    preferred_element_type=jnp.float32).astype(dt)
        cls = jnp.broadcast_to(vp["class_emb"].astype(dt), (b, 1, w))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + vp["pos_emb"].astype(dt)
        return _layer_norm(x, vp["ln_pre"], cfg.layernorm_eps)

    @jax.jit
    def blocks(p, h):
        return _run_blocks(
            h, p["visual"]["blocks"], heads=cfg.vision_heads, act=cfg.act,
            eps=cfg.layernorm_eps, causal=False, attn_impl="auto",
        )

    @jax.jit
    def head(p, h):
        vp = p["visual"]
        x = _layer_norm(h[:, 0], vp["ln_post"], cfg.layernorm_eps)
        return l2_normalize(
            jnp.dot(x, vp["proj"].astype(dt),
                    preferred_element_type=jnp.float32)
        )

    h = blocks(params, stem(params, imgs))  # realistic activations

    mlp = int(w * cfg.vision_mlp_ratio)
    flops = {
        "stem": 2 * s * (p_sz**2 * 3) * w * b,
        "blocks": cfg.vision_layers
        * (2 * s * 4 * w * w + 2 * s * 2 * w * mlp + 4 * s * s * w) * b,
        "head": 2 * w * cfg.embed_dim * b,
    }
    times = {
        "full": timed(full, (params, imgs), args.iters),
        "stem": timed(stem, (params, imgs), args.iters),
        "blocks": timed(blocks, (params, h), args.iters),
        "head": timed(head, (params, h), args.iters),
    }
    total_flops = sum(flops.values())
    rows = {"batch": b, "platform": jax.devices()[0].platform,
            "images_per_sec_full": round(b / times["full"], 1),
            "mfu_full": round(total_flops / times["full"] / PEAK_BF16, 3),
            "components": {}}
    for name in ("stem", "blocks", "head"):
        rows["components"][name] = {
            "ms": round(times[name] * 1e3, 3),
            "share_of_full": round(times[name] / times["full"], 3),
            "own_mfu": round(flops[name] / times[name] / PEAK_BF16, 3),
            "flops_share": round(flops[name] / total_flops, 3),
        }
    # dispatch/fusion gap: full vs sum of parts (negative sum-gap means the
    # split itself costs HBM round-trips XLA otherwise fuses away)
    rows["sum_parts_ms"] = round(
        (times["stem"] + times["blocks"] + times["head"]) * 1e3, 3
    )
    rows["full_ms"] = round(times["full"] * 1e3, 3)
    print(json.dumps(rows, indent=1))
    out = os.path.join(
        os.path.dirname(__file__),
        f"b32_profile_{rows['platform']}.json",
    )
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
