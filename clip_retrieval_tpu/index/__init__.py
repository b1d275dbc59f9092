"""L4: TPU-native vector indices (flat + IVF-PQ), build, combine, metadata
ordering — the FAISS/autofaiss replacement."""

from .flat import FlatIndex  # noqa: F401
from .ivfpq import IVFPQIndex  # noqa: F401
from .store import load_index  # noqa: F401
from .build import calibrate_nprobe, clip_index, score_index  # noqa: F401
