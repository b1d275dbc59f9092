"""Benchmark: ViT-L/14 image embedding throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's solo-GPU ViT-L/14 number — 312 images/s on one
A100 (/root/reference/docs/distributed_clip_inference.md:205).

Measures the full mapper-style jitted program (uint8 → normalize → ViT →
L2-norm → fp16) in steady state: several batches are dispatched ahead
(JAX async dispatch pipelines host→device transfer under compute) and the
wall clock covers dispatch→completion of all of them.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from clip_retrieval_tpu.models import clip as jclip
    from clip_retrieval_tpu.models.clip import init_clip
    from clip_retrieval_tpu.models.configs import VIT_L14

    cfg = VIT_L14
    params = init_clip(cfg, 0)

    batch = 256
    n_iters = 12

    @jax.jit
    def embed(params, images):
        feats = jclip.encode_image(
            params, cfg, images, compute_dtype=jnp.bfloat16, attn_impl="xla"
        )
        return feats.astype(jnp.float16)

    rng = np.random.default_rng(0)
    host_batches = [
        rng.integers(
            0, 255, (batch, cfg.image_size, cfg.image_size, 3), dtype=np.uint8
        )
        for _ in range(4)
    ]

    # warmup / compile
    np.asarray(embed(params, jnp.asarray(host_batches[0])))

    t0 = time.perf_counter()
    outs = []
    for i in range(n_iters):
        outs.append(embed(params, jnp.asarray(host_batches[i % 4])))
        if len(outs) > 3:  # bounded in-flight queue
            outs.pop(0).block_until_ready()
    for o in outs:
        o.block_until_ready()
    elapsed = time.perf_counter() - t0

    images_per_sec = batch * n_iters / elapsed
    baseline = 312.0  # A100 solo ViT-L/14, docs/distributed_clip_inference.md:205
    print(
        json.dumps(
            {
                "metric": "vit_l14_images_per_sec_per_chip",
                "value": round(images_per_sec, 1),
                "unit": "images/s",
                "vs_baseline": round(images_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
