"""L1-L3: reader → mapper → writer pipeline, workers and distributors."""

from .reader import FilesReader, WebdatasetReader, folder_to_keys  # noqa: F401
from .runner import Runner, Sampler  # noqa: F401
from .writer import NumpyWriter  # noqa: F401
from .mapper import ClipMapper  # noqa: F401
