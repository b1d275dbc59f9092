"""Reader tests: the modulo-Sampler partition contract, batch-size sequences,
corrupt-image skipping — mirrors the reference's
tests/test_clip_inference/test_reader.py expectations."""

import os

import numpy as np
import pytest

from clip_retrieval_tpu.inference.reader import FilesReader, WebdatasetReader
from clip_retrieval_tpu.inference.runner import Sampler
from clip_retrieval_tpu.models.tokenizer import CLIPTokenizer

from .fixtures import make_files_corpus, make_tar_corpus

TOK = CLIPTokenizer.byte_fallback()


def _tokenize(texts):
    return TOK(texts, context_length=16)


@pytest.mark.parametrize("file_format", ["files", "webdataset"])
def test_reader_partition_batches(file_format, tmp_path):
    if file_format == "files":
        input_dataset = make_files_corpus(str(tmp_path / "imgs"), n=7)
    else:
        input_dataset = make_tar_corpus(str(tmp_path / "tars"), sizes=(3, 3, 3, 2))
    batch_size = 2
    actual = []
    for pid in range(2):
        sampler = Sampler(pid, 2)
        cls = FilesReader if file_format == "files" else WebdatasetReader
        reader = cls(
            sampler,
            16,  # image size
            _tokenize,
            input_dataset,
            batch_size,
            num_prepro_workers=2,
            enable_text=False,
            enable_image=True,
            enable_metadata=False,
        )
        actual.append([b["image_tensor"].shape[0] for b in reader])
    if file_format == "files":
        # 7 keys → partitions of 4 and 3
        assert actual == [[2, 2], [2, 1]]
    else:
        # sampler picks shards: (3+3) and (3+2)
        assert actual == [[2, 2, 2], [2, 2, 1]]


def test_files_reader_all_modalities(tmp_path):
    folder = make_files_corpus(str(tmp_path / "c"), n=4, with_text=True, with_meta=True)
    reader = FilesReader(
        lambda x: x,
        16,
        _tokenize,
        folder,
        batch_size=4,
        num_prepro_workers=2,
        enable_text=True,
        enable_image=True,
        enable_metadata=True,
    )
    batches = list(reader)
    assert len(batches) == 1
    b = batches[0]
    assert b["image_tensor"].shape == (4, 16, 16, 3)
    assert b["image_tensor"].dtype == np.uint8
    assert b["text_tokens"].shape == (4, 16)
    assert len(b["text"]) == 4
    assert "idx" in b["metadata"][0]


def test_corrupt_image_skipped(tmp_path):
    folder = make_files_corpus(str(tmp_path / "c"), n=3, with_text=False)
    with open(os.path.join(folder, "img_999.jpg"), "wb") as f:
        f.write(b"this is not a jpeg")
    reader = FilesReader(
        lambda x: x,
        16,
        _tokenize,
        folder,
        batch_size=8,
        num_prepro_workers=2,
        enable_text=False,
        enable_image=True,
    )
    batches = list(reader)
    assert sum(b["image_tensor"].shape[0] for b in batches) == 3


def test_wds_missing_key_filtered(tmp_path):
    urls = make_tar_corpus(str(tmp_path / "t"), sizes=(3,), with_text=False)
    reader = WebdatasetReader(
        lambda x: x,
        16,
        _tokenize,
        urls,
        batch_size=8,
        num_prepro_workers=1,
        enable_text=True,  # requires txt, which the tar lacks
        enable_image=True,
    )
    assert list(reader) == []


def test_wds_shard_cache(tmp_path, monkeypatch):
    """cache_path (reference reader.py:142): shards are copied into the
    local cache on first read and re-read from it afterwards."""
    import clip_retrieval_tpu.inference.reader as reader_mod

    urls = make_tar_corpus(str(tmp_path / "tars"), sizes=(3, 2))
    cache_dir = str(tmp_path / "cache")

    def make_reader():
        return WebdatasetReader(
            Sampler(0, 1), 16, _tokenize, urls, 2,
            num_prepro_workers=0, enable_text=False, enable_image=True,
            cache_path=cache_dir,
        )

    n1 = sum(b["image_tensor"].shape[0] for b in make_reader())
    assert n1 == 5
    import os

    cached = sorted(os.listdir(cache_dir))
    assert len(cached) == 2 and not any(c.endswith(".wip") for c in cached)

    # second pass must read only from the cache: remote fetches forbidden
    calls = {"n": 0}
    orig_open = reader_mod.ShardCache.fetch

    def counting_fetch(self, url):
        local = self._local_name(url)
        assert os.path.exists(local), f"cache miss for {url}"
        calls["n"] += 1
        return orig_open(self, url)

    monkeypatch.setattr(reader_mod.ShardCache, "fetch", counting_fetch)
    n2 = sum(b["image_tensor"].shape[0] for b in make_reader())
    assert n2 == 5 and calls["n"] == 2


def test_shard_cache_eviction(tmp_path):
    """The cache evicts least-recently-used shards to honor its bound."""
    from clip_retrieval_tpu.inference.reader import ShardCache
    import os, time

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        (src / f"s{i}.tar").write_bytes(bytes(400))
    cache = ShardCache(str(tmp_path / "cache"), size_bytes=1000)
    p0 = cache.fetch(str(src / "s0.tar"))
    time.sleep(0.02)
    p1 = cache.fetch(str(src / "s1.tar"))
    time.sleep(0.02)
    os.utime(p1)  # s1 most recent
    cache.fetch(str(src / "s2.tar"))  # 1200 > 1000 → evict oldest (s0)
    assert not os.path.exists(p0)
    assert os.path.exists(p1)


def test_wds_pipe_url(tmp_path):
    """`pipe:<cmd>` shard urls stream the command's stdout (reference
    README.md:257-265: hdfs/s3 shards via `pipe:hdfs dfs -cat`...)."""
    tars = make_tar_corpus(str(tmp_path / "tars"), sizes=(3,))
    direct = WebdatasetReader(
        Sampler(0, 1), 16, _tokenize, tars, 8,
        num_prepro_workers=0, enable_text=False, enable_metadata=False,
    )
    piped = WebdatasetReader(
        Sampler(0, 1), 16, _tokenize, [f"pipe:cat {u}" for u in tars], 8,
        num_prepro_workers=0, enable_text=False, enable_metadata=False,
    )
    a = [b for b in direct]
    b = [b for b in piped]
    assert [x["image_tensor"].shape for x in a] == [
        x["image_tensor"].shape for x in b
    ]
    np.testing.assert_array_equal(a[0]["image_tensor"], b[0]["image_tensor"])


def test_wds_pipe_url_failing_command(tmp_path):
    """A failing pipe command is reported and the shard skipped, matching
    the warn-and-continue contract for unreadable shards."""
    reader = WebdatasetReader(
        Sampler(0, 1), 16, _tokenize, ["pipe:false"], 8,
        num_prepro_workers=0, enable_text=False, enable_metadata=False,
    )
    assert [b for b in reader] == []


def test_shard_cache_evicts_orphaned_wip(tmp_path):
    """A .wip file from a SIGKILLed worker (old mtime) must count against
    the bound and be evictable; a live .wip (fresh mtime) must not."""
    import os
    import time

    from clip_retrieval_tpu.inference.reader import ShardCache

    cache = ShardCache(str(tmp_path / "c"), size_bytes=100)
    orphan = os.path.join(cache.path, "aa.tar.wip.999.dead0000")
    live = os.path.join(cache.path, "bb.tar.wip.123.alive000")
    for p in (orphan, live):
        with open(p, "wb") as f:
            f.write(b"x" * 80)
    old = time.time() - 2 * ShardCache.WIP_ORPHAN_SECONDS
    os.utime(orphan, (old, old))
    cache._evict_to_fit(incoming=80)
    assert not os.path.exists(orphan)  # stale orphan reclaimed
    assert os.path.exists(live)  # in-flight download untouched
