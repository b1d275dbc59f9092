"""Per-index resource bundle + multi-index loading.

Reference: ClipResource / load_clip_index / load_clip_indices
(`/root/reference/clip_retrieval/clip_back.py:769-787,862-949`)."""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Dict, List

from ..index.store import load_index
from ..models import safety as safety_mod
from ..models import zoo
from .metadata import load_metadata_provider
from .options import ClipOptions, dict_to_clip_options

LOGGER = logging.getLogger("clip_back")


@dataclasses.dataclass
class ClipResource:
    bundle: Any  # zoo.ModelBundle (model params + tokenizer)
    model_txt_mclip: Any
    safety_model: Any
    violence_detector: Any
    aesthetic_embeddings: Any
    metadata_provider: Any
    image_index: Any
    text_index: Any
    ivf_old_to_new_mapping: Any
    columns_to_return: List[str]
    metadata_is_ordered_by_ivf: bool


def load_clip_index(clip_options: ClipOptions) -> ClipResource:
    if not clip_options.use_jit:
        LOGGER.warning(
            "use_jit=False is accepted for CLI parity but ignored — query "
            "encoding is always a jitted XLA program"
        )
    bundle = zoo.load_model(clip_options.clip_model, clip_options.checkpoint)

    model_txt_mclip = None
    if clip_options.enable_mclip_option and clip_options.mclip_model:
        from ..models.mclip import load_mclip

        try:
            model_txt_mclip = load_mclip(clip_options.mclip_model)
        except Exception as e:
            LOGGER.warning("mCLIP unavailable (%s); use_mclip disabled", e)

    safety_model = (
        safety_mod.load_safety_model(clip_options.clip_model)
        if clip_options.provide_safety_model
        else None
    )
    violence_detector = (
        safety_mod.load_violence_detector(clip_options.clip_model)
        if clip_options.provide_violence_detector
        else None
    )
    aesthetic_embeddings = (
        safety_mod.get_aesthetic_embedding(clip_options.clip_model)
        if clip_options.provide_aesthetic_embeddings
        else None
    )

    folder = clip_options.indice_folder
    image_path = folder + "/image.index"
    text_path = folder + "/text.index"
    LOGGER.info("loading indices from %s ...", folder)
    image_index = (
        load_index(
            image_path,
            clip_options.enable_faiss_memory_mapping,
            sharded=clip_options.sharded_index,
        )
        if os.path.exists(image_path)
        else None
    )
    text_index = (
        load_index(
            text_path,
            clip_options.enable_faiss_memory_mapping,
            sharded=clip_options.sharded_index,
        )
        if os.path.exists(text_path)
        else None
    )

    # serve-time search parameter overrides (reference pokes nprobe through
    # faiss ParameterSpace, clip_back.py:356-361)
    for index in (image_index, text_index):
        if index is None:
            continue
        if clip_options.nprobe is not None and hasattr(index, "nprobe"):
            index.nprobe = clip_options.nprobe
        if clip_options.rerank_factor is not None and hasattr(
            index, "rerank_factor"
        ):
            index.rerank_factor = clip_options.rerank_factor

    LOGGER.info("loading metadata...")
    metadata_provider, ivf_mapping = load_metadata_provider(
        folder,
        clip_options.enable_hdf5,
        clip_options.reorder_metadata_by_ivf_index,
        image_index,
        clip_options.columns_to_return,
        clip_options.use_arrow,
    )

    return ClipResource(
        bundle=bundle,
        model_txt_mclip=model_txt_mclip,
        safety_model=safety_model,
        violence_detector=violence_detector,
        aesthetic_embeddings=aesthetic_embeddings,
        metadata_provider=metadata_provider,
        image_index=image_index,
        text_index=text_index,
        ivf_old_to_new_mapping=ivf_mapping
        if clip_options.reorder_metadata_by_ivf_index
        else None,
        columns_to_return=clip_options.columns_to_return,
        # only claim IVF ordering when the provider actually produced a
        # mapping — with use_arrow/enable_hdf5 combinations that skip the
        # reorder, a bare flag would make every query np.take(None, ...)
        metadata_is_ordered_by_ivf=(
            clip_options.reorder_metadata_by_ivf_index
            and ivf_mapping is not None
        ),
    )


def load_clip_indices(
    indices_paths: str, clip_options: ClipOptions
) -> Dict[str, ClipResource]:
    with open(indices_paths, "r", encoding="utf-8") as f:
        indices = json.load(f)
    clip_resources = {}
    for name, value in indices.items():
        if isinstance(value, str):
            opts = dict_to_clip_options({"indice_folder": value}, clip_options)
        elif isinstance(value, dict):
            opts = dict_to_clip_options(value, clip_options)
        else:
            raise ValueError("Unknown type for indice_folder")
        clip_resources[name] = load_clip_index(opts)
    return clip_resources
