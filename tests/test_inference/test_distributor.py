"""Distributor tests, parametrized sequential + pyspark like the
reference's test_clip_inference/test_distributor.py (which runs the real
PysparkDistributor on a `local[2]` session).

The pyspark case runs the genuine code path — `SparkSession` creation is
left to the distributor itself, matching how a bare cluster submission
reaches it — and is SKIPPED when pyspark is not importable (this offline
image cannot install it; the shim is labeled experimental in README until
it has been executed by this test in an environment that ships pyspark).
"""

import glob
import os

import numpy as np
import pytest

from clip_retrieval_tpu.inference.distributor import make_distributor

from .fixtures import make_files_corpus


def _has_pyspark() -> bool:
    try:
        import pyspark  # noqa: F401
    except ImportError:
        return False
    return True


@pytest.mark.parametrize(
    "kind",
    [
        "sequential",
        pytest.param(
            "pyspark",
            marks=pytest.mark.skipif(
                not _has_pyspark(),
                reason="pyspark not installed in this image (no egress); "
                "the PysparkDistributor shim is experimental until this "
                "test has run where pyspark exists",
            ),
        ),
    ],
)
def test_distributor(tmp_path, kind):
    dataset = make_files_corpus(str(tmp_path / "c"), n=7, with_text=False)
    out = str(tmp_path / "out")
    worker_args = {
        "input_dataset": dataset,
        "output_folder": out,
        "output_partition_count": 2,
        "num_prepro_workers": 2,
        "batch_size": 2,
        "enable_text": False,
        "enable_image": True,
        "enable_metadata": False,
        "clip_model": "test-tiny",
    }
    distributor = make_distributor(kind, tasks=[0, 1], worker_args=worker_args)
    distributor()

    # modulo sampler contract: partition 0 gets items 0,2,4,6 (4 rows),
    # partition 1 gets 1,3,5 (3 rows) — same assertion as the reference test
    assert np.load(os.path.join(out, "img_emb/img_emb_0.npy")).shape[0] == 4
    assert np.load(os.path.join(out, "img_emb/img_emb_1.npy")).shape[0] == 3
    assert len(glob.glob(out + "/img_emb/*.npy")) == 2
