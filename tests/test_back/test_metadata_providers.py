"""Metadata provider + reordering + prepro tests."""

import numpy as np
import pandas as pd
import pytest

from clip_retrieval_tpu.back.metadata import (
    ArrowMetadataProvider,
    Hdf5MetadataProvider,
    ParquetMetadataProvider,
    parquet_to_hdf5,
)
from clip_retrieval_tpu.back.prepro import parquet_to_arrow
from clip_retrieval_tpu.index import IVFPQIndex
from clip_retrieval_tpu.index.metadata_order import (
    DummySink,
    external_sort_parquet,
    get_old_to_new_mapping,
    re_order_parquet,
)


@pytest.fixture()
def meta_folder(tmp_path):
    folder = tmp_path / "metadata"
    folder.mkdir()
    for shard in range(2):
        n = 5
        df = pd.DataFrame(
            {
                "caption": [f"cap {shard}-{i}" for i in range(n)],
                "url": [f"http://x/{shard}/{i}" for i in range(n)],
                "score": np.arange(n, dtype=np.float32) + 10 * shard,
            }
        )
        df.to_parquet(folder / f"metadata_{shard}.parquet")
    return str(folder)


def test_parquet_provider(meta_folder):
    p = ParquetMetadataProvider(meta_folder)
    out = p.get([0, 7], ["caption", "url"])
    assert out[0]["caption"] == "cap 0-0"
    assert out[1]["caption"] == "cap 1-2"
    assert "score" not in out[0]


def test_hdf5_provider(meta_folder, tmp_path):
    h5 = str(tmp_path / "meta.hdf5")
    parquet_to_hdf5(meta_folder, h5, ["caption", "url", "score"])
    p = Hdf5MetadataProvider(h5)
    out = p.get([3, 9])
    assert out[0]["caption"].decode() if isinstance(out[0]["caption"], bytes) else out[0]["caption"]
    assert float(out[1]["score"]) == 14.0


def test_arrow_provider(meta_folder, tmp_path):
    arrow_dir = str(tmp_path / "arrow")
    parquet_to_arrow(meta_folder, arrow_dir)
    p = ArrowMetadataProvider(arrow_dir)
    out = p.get([0, 9], ["caption"])
    assert out[0]["caption"] == "cap 0-0"
    assert out[1]["caption"] == "cap 1-4"


def _tiny_ivf(n=10):
    """IVF index with known list layout: ids reversed across 2 lists."""
    rng = np.random.default_rng(0)
    d, nlist, m = 8, 2, 4
    list_ids = np.array([9, 7, 5, 3, 1, 8, 6, 4, 2, 0], np.int64)
    offsets = np.array([0, 5, 10], np.int64)
    return IVFPQIndex(
        d=d,
        coarse_centroids=rng.normal(size=(nlist, d)).astype(np.float32),
        codebooks=rng.normal(size=(m, 256, d // m)).astype(np.float32),
        rotation=None,
        list_offsets=offsets,
        list_ids=list_ids,
        list_codes=rng.integers(0, 256, (n, m)).astype(np.uint8),
    )


def test_old_to_new_mapping():
    ix = _tiny_ivf()
    mapping = get_old_to_new_mapping(ix)
    # old id 9 sits at position 0 of the ivf-ordered storage
    assert mapping[9] == 0
    assert mapping[0] == 9
    np.testing.assert_array_equal(np.sort(mapping), np.arange(10))


def test_reorder_and_external_sort(tmp_path):
    ix = _tiny_ivf()
    meta = tmp_path / "metadata"
    meta.mkdir()
    pd.DataFrame(
        {"caption": [f"c{i}" for i in range(5)], "url": [f"u{i}" for i in range(5)]}
    ).to_parquet(meta / "m_0.parquet")
    pd.DataFrame(
        {"caption": [f"c{i}" for i in range(5, 10)], "url": [f"u{i}" for i in range(5, 10)]}
    ).to_parquet(meta / "m_1.parquet")

    out = tmp_path / "reordered"
    re_order_parquet(ix, str(meta), str(out), ["caption", "url"])
    sink = DummySink()
    external_sort_parquet(sink, str(out), buffer_size=3)
    new_ids = [r["new_id"] for r in sink.rows]
    assert new_ids == sorted(new_ids)
    assert len(sink.rows) == 10
    # row at new_id 0 must be old id 9 ("c9")
    assert sink.rows[0]["caption"] == "c9"


def test_parquet_to_hdf5_differing_shard_schemas(tmp_path):
    """A column missing from an early shard must stay row-aligned (it was
    previously appended at offset 0, shifting every later row's value onto
    the wrong id)."""
    import pandas as pd

    from clip_retrieval_tpu.back.metadata import (
        Hdf5MetadataProvider,
        parquet_to_hdf5,
    )

    folder = tmp_path / "meta"
    folder.mkdir()
    # shard 0: caption only; shard 1: caption + url
    pd.DataFrame({"caption": ["a", "b"]}).to_parquet(folder / "m0.parquet")
    pd.DataFrame(
        {"caption": ["c", "d"], "url": ["u2", "u3"]}
    ).to_parquet(folder / "m1.parquet")
    out = tmp_path / "meta.hdf5"
    parquet_to_hdf5(str(folder), str(out), ["caption", "url"])
    prov = Hdf5MetadataProvider(str(out))
    def _s(v):
        return v.decode() if isinstance(v, bytes) else v

    rows = prov.get([0, 1, 2, 3])
    assert [_s(r["caption"]) for r in rows] == ["a", "b", "c", "d"]
    # url of global row 2 must be u2 (shard 1's first row), not shifted
    assert _s(rows[2]["url"]) == "u2" and _s(rows[3]["url"]) == "u3"
    assert _s(rows[0]["url"]) == ""  # missing-shard fill


def test_parquet_to_arrow_failure_leaves_no_truncated_file(tmp_path):
    """A mid-write failure must remove the footer-less .arrow (it can't be
    mmap'd and a rerun would pick it up)."""
    import pandas as pd
    import pytest

    folder = tmp_path / "meta"
    folder.mkdir()
    pd.DataFrame({"a": [1, 2]}).to_parquet(folder / "m0.parquet")
    # same-file schema drift → writer.write_table raises mid-stream
    pd.DataFrame({"b": ["x"]}).to_parquet(folder / "m1.parquet")
    out = tmp_path / "arrow"
    with pytest.raises(Exception):
        parquet_to_arrow(str(folder), str(out))
    assert list(out.glob("*.arrow")) == []


def test_parquet_to_arrow_rotation_failure_keeps_complete_files(
    tmp_path, monkeypatch
):
    """A failure while ROTATING to a new file must delete only the new
    partial file, never the just-completed previous one."""
    import pandas as pd
    import pyarrow as pa
    import pytest

    folder = tmp_path / "meta"
    folder.mkdir()
    pd.DataFrame({"a": [1, 2]}).to_parquet(folder / "m0.parquet")
    pd.DataFrame({"a": [3, 4]}).to_parquet(folder / "m1.parquet")
    out = tmp_path / "arrow"

    real_new_file = pa.ipc.new_file
    calls = []

    def failing_new_file(sink, schema, **kw):
        calls.append(1)
        if len(calls) == 2:  # the rotation open
            raise OSError("disk full")
        return real_new_file(sink, schema, **kw)

    monkeypatch.setattr(pa.ipc, "new_file", failing_new_file)
    with pytest.raises(OSError):
        parquet_to_arrow(str(folder), str(out), max_rows_per_file=2)
    remaining = sorted(p.name for p in out.glob("*.arrow"))
    assert remaining == ["0.arrow"]  # complete file preserved
    # and it is a VALID mmap-able IPC file
    with pa.memory_map(str(out / "0.arrow")) as src:
        table = pa.ipc.open_file(src).read_all()
    assert table.num_rows == 2


def test_providers_align_and_blank_invalid_ids(meta_folder, tmp_path):
    """Out-of-range ids must yield {} AT THEIR POSITION: the /metadata
    endpoint zips results with the requested ids, so dropping rows would
    misattribute metadata and raising would 500 the whole batch."""
    h5 = str(tmp_path / "meta2.hdf5")
    parquet_to_hdf5(meta_folder, h5, ["caption", "url"])
    arrow_dir = str(tmp_path / "arrow2")
    parquet_to_arrow(meta_folder, arrow_dir, ["caption", "url"])
    providers = [
        ParquetMetadataProvider(meta_folder),
        Hdf5MetadataProvider(h5),
        ArrowMetadataProvider(arrow_dir),
    ]
    def cap(o):  # hdf5 returns bytes (meta_to_dict decodes at serving)
        c = o["caption"]
        return c.decode() if isinstance(c, bytes) else c

    for prov in providers:
        out = prov.get([3, 10**9, -1, 0], ["caption", "url"])
        assert len(out) == 4, type(prov).__name__
        assert cap(out[0]) == "cap 0-3", type(prov).__name__
        assert out[1] == {}, type(prov).__name__
        assert out[2] == {}, type(prov).__name__
        assert cap(out[3]) == "cap 0-0", type(prov).__name__


def test_providers_duplicate_and_unsorted_ids(meta_folder, tmp_path):
    """The serving path passes ids in result order (arbitrary, possibly
    duplicated); bulk-read optimizations must preserve order."""
    h5 = str(tmp_path / "meta3.hdf5")
    parquet_to_hdf5(meta_folder, h5, ["caption"])
    arrow_dir = str(tmp_path / "arrow3")
    parquet_to_arrow(meta_folder, arrow_dir, ["caption"])
    for prov in [
        ParquetMetadataProvider(meta_folder),
        Hdf5MetadataProvider(h5),
        ArrowMetadataProvider(arrow_dir),
    ]:
        out = prov.get([7, 2, 7, 0], ["caption"])
        caps = [
            o["caption"].decode() if isinstance(o["caption"], bytes)
            else o["caption"]
            for o in out
        ]
        assert caps == ["cap 1-2", "cap 0-2", "cap 1-2", "cap 0-0"], (
            type(prov).__name__, caps
        )
