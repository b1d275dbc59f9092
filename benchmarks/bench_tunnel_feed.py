"""Host→device feed profile: where does tunnel-fed throughput go?

BENCH_r01 tunnel_fed was 283.7 img/s; r02 measured 215.5 with identical
feed code while the on-chip rate improved — this bench separates the two
candidate causes so the regression is attributable:

  raw_h2d_MBps        — pure device_put bandwidth of a 256-image uint8
                        batch (forced by a 4-byte scalar-sum readback, not
                        np.asarray: readback would measure d2h too)
  serialized_img_s    — transfer N, then compute N (no overlap): the floor
  overlapped_img_s    — producer thread stages one batch ahead while the
                        device computes (bench.py / staging.py structure)
  forced_overlap_img_s— same, but the producer forces each transfer to
                        completion before queueing (device_put is lazy
                        through the relay: without forcing, the "staged"
                        transfer can serialize into the consumer's stream)

If raw_h2d moves run-to-run while the ratios hold, the relay moved, not
the code.  Run several reps to see the variance envelope.

    python benchmarks/bench_tunnel_feed.py [--reps 3]
"""

import argparse
import json
import os
import sys
import queue
import threading
import time

import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/clip_retrieval_tpu/xla_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clip_retrieval_tpu.models import clip as jclip
    from clip_retrieval_tpu.models.clip import init_clip
    from clip_retrieval_tpu.models.configs import VIT_L14

    cfg = VIT_L14
    params = init_clip(cfg, 0)
    batch = 256
    bytes_per_batch = batch * cfg.image_size * cfg.image_size * 3

    @jax.jit
    def embed(p, images):
        return jclip.encode_image(
            p, cfg, images, compute_dtype=jnp.bfloat16, attn_impl="auto"
        ).astype(jnp.float16)

    @jax.jit
    def touch(x):  # forces the h2d transfer; readback is 4 bytes
        return jnp.sum(x, dtype=jnp.int32)

    rng = np.random.default_rng(0)
    host_batches = [
        rng.integers(
            0, 255, (batch, cfg.image_size, cfg.image_size, 3), dtype=np.uint8
        )
        for _ in range(4)
    ]

    # warm both programs
    d0 = jax.device_put(host_batches[0])
    np.asarray(touch(d0))
    np.asarray(embed(params, d0))

    rows = []
    for rep in range(args.reps):
        # -- raw h2d bandwidth --------------------------------------------
        t0 = time.perf_counter()
        for i in range(args.iters):
            np.asarray(touch(jax.device_put(host_batches[i % 4].copy())))
        dt = time.perf_counter() - t0
        raw_mbps = bytes_per_batch * args.iters / dt / 1e6

        # -- serialized: transfer then compute, no overlap ----------------
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            d = jax.device_put(host_batches[i % 4].copy())
            np.asarray(touch(d))  # force transfer complete
            out = embed(params, d)
        np.asarray(out)
        serialized = batch * args.iters / (time.perf_counter() - t0)

        # -- overlapped (bench.py structure, lazy device_put) -------------
        def run_overlapped(force: bool):
            staged: queue.Queue = queue.Queue(maxsize=2)

            def producer():
                for i in range(args.iters):
                    d = jax.device_put(host_batches[i % 4].copy())
                    if force:
                        np.asarray(touch(d))
                    staged.put(d)
                staged.put(None)

            threading.Thread(target=producer, daemon=True).start()
            t0 = time.perf_counter()
            last = None
            while True:
                item = staged.get()
                if item is None:
                    break
                last = embed(params, item)
            np.asarray(last)
            return batch * args.iters / (time.perf_counter() - t0)

        overlapped = run_overlapped(force=False)
        forced = run_overlapped(force=True)

        row = {
            "rep": rep,
            "raw_h2d_MBps": round(raw_mbps, 1),
            "relay_bound_img_s": round(raw_mbps * 1e6 / (
                cfg.image_size * cfg.image_size * 3), 1),
            "serialized_img_s": round(serialized, 1),
            "overlapped_img_s": round(overlapped, 1),
            "forced_overlap_img_s": round(forced, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = args.out or os.path.join(
        os.path.dirname(__file__),
        f"tunnel_feed_{jax.devices()[0].platform}.json",
    )
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
