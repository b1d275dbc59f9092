"""Model zoo: resolve a `clip_model` string to (config, params, tokenizer).

Plays the role of `all_clip.load_clip` in the reference
(`/root/reference/clip_retrieval/clip_inference/mapper.py:36`,
`clip_back.py:865-868`) with offline-friendly sources:

- "test-tiny" / any registered config name → deterministic random params
  (seed 0); used by tests and benches (this environment has no model egress);
- "<config>:<checkpoint path>" (e.g. "ViT-B/32:/ckpts/vitb32.npz") → convert
  an openai/open_clip/HF state dict from disk;
- "hf:<local dir>" → transformers CLIPModel.from_pretrained(dir) → convert.

Tokenizer: real CLIP BPE when a merges file is available (CRT_BPE_PATH or
cache), else the byte-level fallback (exact for the test-tiny config).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import configs, loaders
from .clip import Params, init_clip
from .tokenizer import CLIPTokenizer, default_bpe_path


@dataclasses.dataclass
class ModelBundle:
    name: str
    cfg: configs.CLIPConfig
    params: Params
    tokenizer: CLIPTokenizer

    @property
    def image_size(self) -> int:
        return self.cfg.image_size

    def tokenize(self, texts, context_length: int | None = None) -> np.ndarray:
        return self.tokenizer(
            texts, context_length or self.cfg.context_length
        )


def _make_tokenizer(
    cfg: configs.CLIPConfig, real_weights: bool = False
) -> CLIPTokenizer:
    if default_bpe_path() is not None:
        return CLIPTokenizer()
    if real_weights:
        # byte-fallback ids index arbitrary rows of a TRAINED token
        # embedding — every text query would be silently garbage, so this
        # must be loud for real checkpoints (random-weight configs are fine:
        # tests/benches only need shape-valid ids)
        raise ValueError(
            "no CLIP BPE merges file found but a real checkpoint was "
            "loaded; text tokenized with the byte-fallback would embed as "
            "garbage — set CRT_BPE_PATH to the CLIP merges file "
            "(bpe_simple_vocab_16e6.txt.gz)"
        )
    tok = CLIPTokenizer.byte_fallback()
    if tok.vocab_size > cfg.vocab_size:
        raise ValueError(
            f"no BPE vocab file available and byte-fallback vocab "
            f"({tok.vocab_size}) exceeds model vocab ({cfg.vocab_size}); "
            "set CRT_BPE_PATH to the CLIP merges file"
        )
    return tok


def load_model(clip_model: str, checkpoint: str | None = None) -> ModelBundle:
    """Resolve clip_model (see module docstring) to a ModelBundle.

    Reference `clip_model` string prefixes are accepted for CLI/config
    parity (`/root/reference/README.md:179`): `"open_clip:ARCH/PRETRAINED"`
    resolves ARCH as a config name (the PRETRAINED tag names a hosted
    weight set the zero-egress build cannot fetch — pass `checkpoint=` or
    `ARCH:/path/to.pt` to load weights), and `"hf_clip:DIR"` is an alias
    of `"hf:DIR"`.
    """
    if clip_model.startswith("nm:"):
        # reference README.md:201: deepsparse CPU backend for sparse ONNX
        # CLIP models — a CPU-inference accelerator with no TPU meaning
        raise ValueError(
            "deepsparse ('nm:') clip_model backends are sparse-ONNX CPU "
            "accelerators the TPU build does not run; use a config name "
            "(ViT-*/RN*), '<config>:<checkpoint>', or 'hf:<dir>'"
        )
    if clip_model.startswith("open_clip:"):
        arch = clip_model[len("open_clip:") :]
        if ":" in arch and checkpoint is None:  # "ARCH:/local/ckpt.pt"
            arch, checkpoint = arch.split(":", 1)
        if "/" in arch:
            arch, pretrained = arch.split("/", 1)
            if checkpoint is None:
                print(
                    f"WARNING: open_clip pretrained tag {pretrained!r} "
                    "names a hosted weight set; this offline build loads "
                    "weights only from local files — pass "
                    "checkpoint=/path/to/state_dict"
                )
        clip_model = arch
    if clip_model.startswith("hf_clip:"):
        clip_model = "hf:" + clip_model[len("hf_clip:") :]
    if clip_model.startswith("hf:"):
        import transformers

        model = transformers.CLIPModel.from_pretrained(clip_model[3:])
        cfg = loaders.config_from_hf(model.config)
        params = loaders.convert_hf_state_dict(model.state_dict(), cfg)
        return ModelBundle(
            clip_model, cfg, params, _make_tokenizer(cfg, real_weights=True)
        )

    if ":" in clip_model and checkpoint is None:
        clip_model, checkpoint = clip_model.split(":", 1)

    cfg = configs.get_config(clip_model)
    if checkpoint:
        params, cfg = loaders.load_checkpoint(checkpoint, cfg)
    else:
        if cfg.name != "test-tiny":
            print(
                f"WARNING: no checkpoint for {clip_model}; using random "
                "weights (embeddings will be meaningless)"
            )
        params = init_clip(cfg, 0)
    return ModelBundle(
        clip_model,
        cfg,
        params,
        _make_tokenizer(cfg, real_weights=checkpoint is not None),
    )
