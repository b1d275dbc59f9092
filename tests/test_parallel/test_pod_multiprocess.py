"""Multi-host pod path without a pod: two real processes under
jax.distributed (CPU backend) run the PodDistributor against a shared
filesystem — the coordination model of a TPU pod slice (SURVEY §4 calls out
exactly this test as missing from the reference)."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from tests.test_inference.fixtures import make_files_corpus

WORKER_SCRIPT = textwrap.dedent(
    """
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("PYTHONWARNINGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    cfg = json.loads(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address=cfg["coord"],
        num_processes=cfg["world"],
        process_id=cfg["rank"],
    )
    assert jax.process_count() == cfg["world"]
    from clip_retrieval_tpu.parallel.dist import get_task_list
    from clip_retrieval_tpu.inference.worker import worker
    tasks = list(range(cfg["partitions"]))
    mine = get_task_list(len(tasks), jax.process_count(), jax.process_index())
    worker(
        tasks=[tasks[i] for i in mine],
        input_dataset=cfg["corpus"],
        output_folder=cfg["out"],
        output_partition_count=cfg["partitions"],
        clip_model="test-tiny",
        batch_size=4,
        num_prepro_workers=2,
        enable_metadata=False,
    )
    print(f"rank {cfg['rank']} done: {mine}")
    """
)


def test_two_process_pod(tmp_path):
    corpus = make_files_corpus(str(tmp_path / "corpus"), n=11, with_text=True)
    out = str(tmp_path / "out")
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    env["CRT_DISABLE_FLASH"] = "1"
    procs = []
    for rank in range(2):
        cfg = json.dumps(
            {
                "coord": f"127.0.0.1:{port}",
                "world": 2,
                "rank": rank,
                "corpus": corpus,
                "out": out,
                "partitions": 4,
            }
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER_SCRIPT, cfg],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=280)
        outputs.append(stdout.decode())
        assert p.returncode == 0, stdout.decode()[-2000:]

    import glob

    files = sorted(glob.glob(out + "/img_emb/*.npy"))
    assert len(files) == 4
    total = sum(np.load(f).shape[0] for f in files)
    assert total == 11
    # ranks split the partitions: [0,1] and [2,3]
    assert "done: [0, 1]" in outputs[0]
    assert "done: [2, 3]" in outputs[1]
