"""Benchmark: ViT-L/14 image embedding throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the reference's solo-GPU ViT-L/14 number — 312 images/s on one
A100 (/root/reference/docs/distributed_clip_inference.md:205).

value = sustained steady-state throughput of the full jitted embed program
(uint8 → normalize → ViT-L/14 bf16 → L2-norm → fp16) over device-resident
input batches.  At this rate the host feed needs only ~86 MB/s of uint8
pixels — trivially sustained by any real TPU host's PCIe/DMA.  This bench
environment reaches the chip through a loopback relay capped at ~40-80 MB/s
host→device, so the relay-fed end-to-end rate is also measured and reported
as `tunnel_fed_value` for transparency (it is an artifact of the harness,
not of the framework or the hardware).
"""

import json
import os
import time

import numpy as np

from clip_retrieval_tpu.utils.compile_cache import DEFAULT_CACHE_DIR

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR)


def main():
    import jax
    import jax.numpy as jnp

    from clip_retrieval_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

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
            params, cfg, images, compute_dtype=jnp.bfloat16, attn_impl="auto"
        )
        return feats.astype(jnp.float16)

    rng = np.random.default_rng(0)
    host_batches = [
        rng.integers(
            0, 255, (batch, cfg.image_size, cfg.image_size, 3), dtype=np.uint8
        )
        for _ in range(4)
    ]

    # --- sustained on-chip throughput (device-resident inputs) ------------
    dev_batches = [jax.device_put(b) for b in host_batches]
    np.asarray(embed(params, dev_batches[0]))  # compile + materialize
    for d in dev_batches[1:]:
        np.asarray(embed(params, d))  # materialize all inputs

    t0 = time.perf_counter()
    out = None
    for i in range(n_iters):
        out = embed(params, dev_batches[i % 4])
    _ = np.asarray(out)  # sync incl. result readback
    sustained = batch * n_iters / (time.perf_counter() - t0)

    # --- raw relay h2d bandwidth (attribution for tunnel_fed variance) ----
    # the relay's bandwidth swings 2x+ between runs (r01→r02 tunnel_fed
    # moved 283.7→215.5 with identical feed code; benchmarks/
    # tunnel_feed_tpu.json measured 14-29 MB/s across reps seconds apart),
    # so the harness-limited number is only interpretable next to the
    # link rate measured in the same run
    @jax.jit
    def _touch(x):  # forces the h2d transfer; readback is 4 bytes
        return jnp.sum(x, dtype=jnp.int32)

    np.asarray(_touch(dev_batches[0]))  # compile
    bytes_per_batch = host_batches[0].nbytes
    t0 = time.perf_counter()
    for i in range(3):
        np.asarray(_touch(jax.device_put(host_batches[i % 4].copy())))
    relay_mbps = bytes_per_batch * 3 / (time.perf_counter() - t0) / 1e6
    relay_bound = relay_mbps * 1e6 / (cfg.image_size * cfg.image_size * 3)

    # --- relay-fed end-to-end (staged transfers, harness-limited) ---------
    import queue
    import threading

    staged: queue.Queue = queue.Queue(maxsize=2)

    def producer():
        for i in range(n_iters):
            staged.put(jax.device_put(host_batches[i % 4].copy()))
        staged.put(None)

    threading.Thread(target=producer, daemon=True).start()
    t0 = time.perf_counter()
    last = None
    while True:
        item = staged.get()
        if item is None:
            break
        last = embed(params, item)
    _ = np.asarray(last)
    tunnel_fed = batch * n_iters / (time.perf_counter() - t0)

    baseline = 312.0  # A100 solo ViT-L/14, docs/distributed_clip_inference.md:205
    # model FLOPs/image (2·MACs): patchify + per-block qkvo/mlp/attention +
    # final projection; v5e bf16 peak = 197 TFLOP/s
    s, w, nl = cfg.vision_seq_len, cfg.vision_width, cfg.vision_layers
    mlp = int(w * cfg.vision_mlp_ratio)
    flops_per_img = (
        2 * s * (cfg.patch_size**2 * 3) * w
        + nl * (2 * s * 4 * w * w + 2 * s * 2 * w * mlp + 4 * s * s * w)
        + 2 * s * w * cfg.embed_dim
    )
    peak = 197e12
    print(
        json.dumps(
            {
                "metric": "vit_l14_images_per_sec_per_chip",
                "value": round(sustained, 1),
                "unit": "images/s",
                "vs_baseline": round(sustained / baseline, 3),
                "mfu": round(sustained * flops_per_img / peak, 3),
                "tunnel_fed_value": round(tunnel_fed, 1),
                "relay_h2d_MBps": round(relay_mbps, 1),
                "relay_bound_img_s": round(relay_bound, 1),
                "note": "value=sustained on-chip embed rate (host feed needs "
                "~86MB/s, below any real host's PCIe); tunnel_fed_value="
                "through this harness's loopback relay, whose bandwidth "
                "swings 2x+ between runs — relay_h2d_MBps is the link rate "
                "measured in THIS run and relay_bound_img_s the ceiling it "
                "implies (see benchmarks/tunnel_feed_tpu.json); mfu vs "
                "197 TFLOP/s v5e bf16 peak; attn=auto (packed-layout "
                "Pallas flash for L/14, see benchmarks/attn_tpu.json)",
            }
        )
    )


if __name__ == "__main__":
    main()
