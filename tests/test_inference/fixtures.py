"""Fixture builders: tiny image/caption corpora and webdataset tar shards."""

import io
import json
import os
import tarfile

import numpy as np
from PIL import Image


def make_image(seed: int, size=(60, 40)) -> bytes:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def make_files_corpus(
    folder, n=7, with_text=True, with_meta=False, start=0
):
    os.makedirs(folder, exist_ok=True)
    for i in range(start, start + n):
        stem = os.path.join(folder, f"img_{i:03d}")
        with open(stem + ".jpg", "wb") as f:
            f.write(make_image(i))
        if with_text:
            with open(stem + ".txt", "w") as f:
                f.write(f"caption number {i}")
        if with_meta:
            with open(stem + ".json", "w") as f:
                json.dump({"idx": i, "tag": f"t{i % 3}"}, f)
    return folder


def make_tar(path, n, start=0, with_text=True, with_meta=False):
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            key = f"{i:05d}"

            def add(name, data: bytes):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

            add(key + ".jpg", make_image(i))
            if with_text:
                add(key + ".txt", f"caption number {i}".encode())
            if with_meta:
                add(key + ".json", json.dumps({"idx": i}).encode())
    return path


def make_tar_corpus(folder, sizes=(3, 3, 3, 2), **kw):
    os.makedirs(folder, exist_ok=True)
    urls = []
    start = 0
    for j, n in enumerate(sizes):
        urls.append(make_tar(os.path.join(folder, f"shard{j}.tar"), n, start, **kw))
        start += n
    return urls
