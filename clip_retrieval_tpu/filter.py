"""clip-filter: extract a subset of an image collection with a kNN query.

Reference counterpart: `/root/reference/clip_retrieval/clip_filter.py:7-74` —
encode a text or image-file query, search the image index (top-k or
range-search threshold), copy matched files to the output folder, print urls.
Query encoding runs on TPU via the same model zoo as the rest of the stack.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path


def clip_filter(
    query: str,
    output_folder: str,
    indice_folder: str,
    num_results: int = 100,
    threshold: float | None = None,
    clip_model: str = "ViT-B/32",
    checkpoint: str | None = None,
):
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from .index.store import load_index
    from .models import clip as jclip
    from .models import zoo

    bundle = zoo.load_model(clip_model, checkpoint)

    data_dir = Path(indice_folder) / "metadata"
    df = pd.concat(
        pd.read_parquet(p) for p in sorted(data_dir.glob("*.parquet"))
    )
    url_list = df["url"].tolist() if "url" in df else None
    image_list = df["image_path"].tolist()
    index = load_index(indice_folder + "/image.index")

    os.makedirs(output_folder, exist_ok=True)

    if query.endswith((".png", ".jpg", ".jpeg", ".bmp")) and os.path.isfile(
        query
    ):
        from .models.preprocess import decode_resize_center_crop

        arr = decode_resize_center_crop(
            Path(query).read_bytes(), bundle.cfg.image_size
        )
        feats = jclip.encode_image(
            bundle.params, bundle.cfg, jnp.asarray(arr[None])
        )
    else:
        tokens = bundle.tokenize([query])
        feats = jclip.encode_text(
            bundle.params, bundle.cfg, jnp.asarray(tokens)
        )
    q = np.asarray(feats, np.float32)

    if threshold is not None:
        if not hasattr(index, "range_search"):
            raise ValueError(
                "threshold filtering requires a flat index (range_search)"
            )
        _, d, i = index.range_search(q, threshold)
        print(f"Found {i.shape} items with query '{query}' and threshold {threshold}")
    else:
        d, i = index.search(q, num_results)
        d, i = d[0], i[0]
        keep = i >= 0
        d, i = d[keep], i[keep]
        print(f"Found {num_results} items with query '{query}'")

    if len(d):
        print(
            f"The minimum distance is {min(d):.2f} and the maximum is "
            f"{max(d):.2f}"
        )
        print(
            "You may want to use these numbers to increase your "
            "--num_results parameter. Or use the --threshold parameter."
        )

    print(f"Copying the images in {output_folder}")
    for ei in i:
        path = image_list[int(ei)]
        if os.path.exists(path):
            shutil.copy(path, output_folder)
        if url_list is not None:
            print(url_list[int(ei)])
