"""clip_retrieval_tpu — a TPU-native rebuild of rom1504/clip-retrieval.

Batch CLIP embedding (JAX/Flax-style functional models, Pallas kernels, pjit
data-parallelism), TPU-resident approximate-kNN index building (k-means / OPQ /
PQ as XLA matmul programs), and a drop-in `/knn-service` semantic-search
backend.

Layer map mirrors the reference (see SURVEY.md):
  models/    — L0: CLIP encoders, tokenizer, preprocessing, safety heads
  ops/       — device kernels: attention, top-k, k-means, PQ/ADC
  parallel/  — meshes, shardings, multi-host task math
  inference/ — L1-L3: reader → mapper → writer pipeline + distributors
  index/     — L4: flat + IVF-PQ index build, combine, metadata ordering
  back/      — L5: kNN REST service, metadata providers
  client, filter, front, end2end — L6
"""

__version__ = "0.1.0"
