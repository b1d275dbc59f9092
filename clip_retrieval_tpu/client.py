"""ClipClient: typed remote wrapper over /knn-service.

API-compatible with the reference client
(`/root/reference/clip_retrieval/clip_client.py:12-153`): same constructor
options, same query(text|image|embedding_input) surface, local files are
base64-encoded, num_result_ids pinned to num_images.
"""

from __future__ import annotations

import base64
import enum
import json
from pathlib import Path
from typing import Dict, List, Optional

import requests


class Modality(enum.Enum):
    IMAGE = "image"
    TEXT = "text"


class ClipClient:
    """Remotely query the CLIP backend via REST."""

    def __init__(
        self,
        url: str,
        indice_name: str | None = None,
        use_mclip: bool = False,
        aesthetic_score: int = 9,
        aesthetic_weight: float = 0.5,
        modality: Modality = Modality.IMAGE,
        num_images: int = 40,
        deduplicate: bool = True,
        use_safety_model: bool = True,
        use_violence_detector: bool = True,
    ):
        self.url = url
        self.indice_name = indice_name
        self.use_mclip = use_mclip
        self.aesthetic_score = aesthetic_score
        self.aesthetic_weight = aesthetic_weight
        self.modality = modality.value
        self.num_images = num_images
        self.deduplicate = deduplicate
        self.use_safety_model = use_safety_model
        self.use_violence_detector = use_violence_detector

    def query(
        self,
        text: Optional[str] = None,
        image: Optional[str] = None,
        embedding_input: Optional[list] = None,
    ) -> List[Dict]:
        """Search for semantically similar items given text/image/embedding.

        image may be a local path (base64-encoded client-side) or an http(s)
        url (downloaded server-side)."""
        if text and image:
            raise ValueError("Only one of text or image can be provided.")
        if text:
            return self.__search_knn_api__(text=text)
        if image:
            if image.startswith("http"):
                return self.__search_knn_api__(image_url=image)
            assert Path(image).exists(), f"{image} does not exist."
            return self.__search_knn_api__(image=image)
        if embedding_input:
            return self.__search_knn_api__(embedding_input=embedding_input)
        raise ValueError("Either text or image must be provided.")

    def __search_knn_api__(
        self,
        text: Optional[str] = None,
        image: Optional[str] = None,
        image_url: Optional[str] = None,
        embedding_input: Optional[list] = None,
    ) -> List:
        if image:
            with open(image, "rb") as f:
                image = base64.b64encode(f.read()).decode("utf-8")
        return requests.post(
            self.url,
            data=json.dumps(
                {
                    "text": text,
                    "image": image,
                    "image_url": image_url,
                    "embedding_input": embedding_input,
                    "deduplicate": self.deduplicate,
                    "use_safety_model": self.use_safety_model,
                    "use_violence_detector": self.use_violence_detector,
                    "indice_name": self.indice_name,
                    "use_mclip": self.use_mclip,
                    "aesthetic_score": self.aesthetic_score,
                    "aesthetic_weight": self.aesthetic_weight,
                    "modality": self.modality,
                    "num_images": self.num_images,
                    "num_result_ids": self.num_images,
                }
            ),
            timeout=3600,
        ).json()
