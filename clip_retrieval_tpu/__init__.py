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


def __getattr__(name):
    """Top-level API matching the reference package's exports
    (`from clip_retrieval import clip_inference, clip_index, clip_back, ...`),
    resolved lazily so importing the package stays fast."""
    if name == "clip_inference":
        from .inference.main import main as clip_inference

        return clip_inference
    if name == "clip_index":
        from .index.build import clip_index

        return clip_index
    if name == "clip_back":
        from .back.app import clip_back

        return clip_back
    if name == "clip_filter":
        from .filter import clip_filter

        return clip_filter
    if name == "clip_end2end":
        from .end2end import clip_end2end

        return clip_end2end
    if name == "ClipClient":
        from .client import ClipClient

        return ClipClient
    if name == "Modality":
        from .client import Modality

        return Modality
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
