"""Prometheus instrumentation for the serving path.

Same ten histograms + /metrics-summary ranked cost table as the reference
(`/root/reference/clip_retrieval/clip_back.py:50-144`)."""

from __future__ import annotations

from prometheus_client import REGISTRY, Histogram

# restartable module (tests re-import): drop stale collectors
for coll in list(REGISTRY._collector_to_names.keys()):  # noqa: SLF001
    names = REGISTRY._collector_to_names.get(coll, [])
    if any("knn" in n or "clip" in n or "_time" in n for n in names):
        try:
            REGISTRY.unregister(coll)
        except KeyError:
            pass

FULL_KNN_REQUEST_TIME = Histogram(
    "full_knn_request_time", "Time spent processing knn request"
)
DOWNLOAD_TIME = Histogram("download_time", "Time spent downloading an url")
TEXT_CLIP_INFERENCE_TIME = Histogram(
    "text_clip_inference_time", "Time spent doing a text clip inference"
)
IMAGE_CLIP_INFERENCE_TIME = Histogram(
    "image_clip_inference_time", "Time spent doing a image clip inference"
)
METADATA_GET_TIME = Histogram(
    "metadata_get_time", "Time spent retrieving metadata"
)
KNN_INDEX_TIME = Histogram(
    "knn_index_time", "Time spent doing a knn on the index"
)
DEDUP_TIME = Histogram("dedup_time", "Time spent deduping")
SAFETY_TIME = Histogram("safety_time", "Time spent doing a safety inference")
IMAGE_PREPRO_TIME = Histogram(
    "image_prepro_time", "Time spent doing the image preprocessing"
)
TEXT_PREPRO_TIME = Histogram(
    "text_prepro_time", "Time spent doing the text preprocessing"
)

_SUB_METRICS = [
    DOWNLOAD_TIME,
    TEXT_CLIP_INFERENCE_TIME,
    IMAGE_CLIP_INFERENCE_TIME,
    METADATA_GET_TIME,
    KNN_INDEX_TIME,
    DEDUP_TIME,
    SAFETY_TIME,
    IMAGE_PREPRO_TIME,
    TEXT_PREPRO_TIME,
]


def metric_to_average(metric: Histogram):
    data = metric.collect()[0]
    name, desc = data.name, data.documentation
    total = count = 0.0
    for sample in data.samples:
        if sample.name == name + "_sum":
            total = sample.value
        elif sample.name == name + "_count":
            count = sample.value
    if count == 0:
        return name, desc, 0, 0.0
    return name, desc, count, total / count


def metrics_summary_text() -> str:
    """Human-readable ranked per-stage cost table."""
    import pandas as pd

    _, _, knn_count, knn_avg = metric_to_average(FULL_KNN_REQUEST_TIME)
    if knn_count == 0:
        return "No request yet, go do some"
    rows = sorted(
        [metric_to_average(m) for m in _SUB_METRICS], key=lambda e: -e[3]
    )
    table = [
        (
            name,
            desc,
            int(count),
            f"{avg:0.4f}s",
            f"{avg / knn_avg * 100:0.1f}%",
        )
        for name, desc, count, avg in rows
    ]
    df = pd.DataFrame(
        table, columns=("name", "description", "calls", "average", "proportion")
    )
    return (
        f"Among {int(knn_count)} calls to the knn end point with an average "
        f"latency of {knn_avg:0.4f}s per request, the step costs are "
        "(in order): \n\n" + df.to_string()
    )
