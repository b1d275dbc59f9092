"""parquet_to_arrow: one-time serving prep for billion-scale metadata.

Reference counterpart: `/root/reference/clip_retrieval/clip_back_prepro/
parquet_to_arrow.py:13-69` — streams metadata parquet shards into large
arrow IPC files that the ArrowMetadataProvider mmaps zero-copy at serve
time.  Files are split when they exceed `max_rows_per_file`; each parquet
read is retried once (transient fs failures).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

LOGGER = logging.getLogger("parquet_to_arrow")


def parquet_to_arrow(
    parquet_folder: str,
    output_arrow_folder: str,
    columns_to_return=None,
    max_rows_per_file: int = 10 ** 10,
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    Path(output_arrow_folder).mkdir(parents=True, exist_ok=True)
    files = sorted(Path(parquet_folder).glob("*.parquet"))
    if not files:
        raise ValueError(f"no parquet files in {parquet_folder}")

    writer = None
    sink = None
    file_idx = 0
    rows_in_file = 0

    def open_writer(schema):
        nonlocal writer, sink, file_idx, rows_in_file
        path = str(Path(output_arrow_folder) / f"{file_idx}.arrow")
        sink = pa.OSFile(path, "wb")
        writer = pa.ipc.new_file(sink, schema)
        file_idx += 1
        rows_in_file = 0

    try:
        for f in files:
            table = None
            last_err = None
            for attempt in range(2):  # retry-once contract
                try:
                    table = pq.read_table(str(f), columns=columns_to_return)
                    break
                except Exception as e:
                    last_err = e
                    LOGGER.warning(
                        "read of %s failed (try %d): %s", f, attempt, e
                    )
                    time.sleep(1)  # the retry exists for transient fs blips
            if table is None:
                raise IOError(f"could not read {f}") from last_err
            if writer is None:
                open_writer(table.schema)
            elif rows_in_file + table.num_rows > max_rows_per_file:
                writer.close()
                sink.close()
                open_writer(table.schema)
            writer.write_table(table)
            rows_in_file += table.num_rows
        if writer is not None:
            writer.close()
            sink.close()
    except BaseException:
        # never leave a footer-less .arrow behind: a truncated IPC file
        # cannot be mmap'd at serve time, and a rerun would pick it up
        if writer is not None:
            try:
                writer.close()
                sink.close()
            except Exception:
                pass
            partial = Path(output_arrow_folder) / f"{file_idx - 1}.arrow"
            if partial.exists():
                partial.unlink()
        raise
    LOGGER.info("wrote %d arrow file(s)", file_idx)
