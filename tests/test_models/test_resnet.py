"""CLIP ModifiedResNet tower: shapes, conversion, and torch parity.

The reference reaches the RN family via `all_clip.load_clip`
(`/root/reference/clip_retrieval/clip_inference/mapper.py:36` accepts any
openai CLIP name, e.g. clip_model="RN50").  The torch model below is a
self-contained reimplementation of the *published* openai ModifiedResNet
architecture (3-conv stem, avgpool-downsampled bottlenecks, single-query
attention pool), used purely as a parity fixture: random weights + random
BatchNorm running stats are exported under the openai checkpoint key names
and must convert + match our folded-BN JAX tower.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from collections import OrderedDict  # noqa: E402

from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from clip_retrieval_tpu.models import clip as jclip  # noqa: E402
from clip_retrieval_tpu.models.configs import (  # noqa: E402
    CLIPConfig,
    TEST_TINY_RN,
    get_config,
)
from clip_retrieval_tpu.models.loaders import (  # noqa: E402
    convert_openai_resnet_visual,
)
from clip_retrieval_tpu.models.resnet import forward_visual  # noqa: E402


# ---------------------------------------------------------------------------
# torch reference (published openai ModifiedResNet architecture)
# ---------------------------------------------------------------------------


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                OrderedDict(
                    [
                        ("-1", nn.AvgPool2d(stride)),
                        (
                            "0",
                            nn.Conv2d(
                                inplanes, planes * 4, 1, bias=False
                            ),
                        ),
                        ("1", nn.BatchNorm2d(planes * 4)),
                    ]
                )
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _AttentionPool2d(nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim**2 + 1, embed_dim) / embed_dim**0.5
        )
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        b, c, h, w = x.shape
        t = x.reshape(b, c, h * w).permute(2, 0, 1)  # (S, B, C)
        t = torch.cat([t.mean(dim=0, keepdim=True), t], dim=0)
        t = t + self.positional_embedding[:, None, :]
        q, k, v = self.q_proj(t[:1]), self.k_proj(t), self.v_proj(t)
        nh = self.num_heads
        dh = c // nh
        s = t.shape[0]
        q = q.reshape(1, b, nh, dh).permute(1, 2, 0, 3)  # (B, nh, 1, dh)
        k = k.reshape(s, b, nh, dh).permute(1, 2, 0, 3)
        v = v.reshape(s, b, nh, dh).permute(1, 2, 0, 3)
        attn = torch.softmax(q @ k.transpose(-1, -2) * dh**-0.5, dim=-1)
        o = (attn @ v).permute(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
        return self.c_proj(o)


class _ModifiedResNet(nn.Module):
    def __init__(self, layers, width, image_size, heads, output_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU(inplace=True)
        self._inplanes = width

        def make(planes, blocks, stride):
            mods = [_Bottleneck(self._inplanes, planes, stride)]
            self._inplanes = planes * 4
            for _ in range(1, blocks):
                mods.append(_Bottleneck(self._inplanes, planes))
            return nn.Sequential(*mods)

        self.layer1 = make(width, layers[0], 1)
        self.layer2 = make(width * 2, layers[1], 2)
        self.layer3 = make(width * 4, layers[2], 2)
        self.layer4 = make(width * 8, layers[3], 2)
        self.attnpool = _AttentionPool2d(
            image_size // 32, width * 32, heads, output_dim
        )

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return self.attnpool(x)


def _randomize(model: nn.Module, seed=0):
    """Random weights AND random (positive-variance, nonzero-mean) BN
    running stats — folding bugs hide behind default mean=0/var=1."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0.1, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.normal_(1.0, 0.2, generator=g)
                m.bias.normal_(0.0, 0.2, generator=g)
            elif isinstance(m, (nn.Conv2d, nn.Linear)):
                m.weight.normal_(0.0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.02, generator=g)
        if hasattr(model, "attnpool"):
            model.attnpool.positional_embedding.normal_(
                0.0, 0.05, generator=g
            )
    model.eval()
    return model


# config with a multi-block stage so the stacked-tail lax.scan path runs
TINY2 = CLIPConfig(
    name="tiny-rn-2",
    embed_dim=16,
    image_size=64,
    resnet_layers=(1, 2, 1, 1),
    vision_width=8,
    vision_heads=4,
    vocab_size=520,
    context_length=16,
    text_width=32,
    text_layers=2,
    text_heads=4,
)


def test_resnet_init_shapes_and_norm():
    params = jclip.init_clip(TEST_TINY_RN, 0)
    imgs = np.random.default_rng(0).integers(
        0, 255, (3, 64, 64, 3), endpoint=True
    ).astype(np.uint8)
    feats = np.asarray(jclip.encode_image(params, TEST_TINY_RN, jnp.asarray(imgs)))
    assert feats.shape == (3, 16)
    np.testing.assert_allclose(
        np.linalg.norm(feats, axis=1), 1.0, atol=1e-5
    )
    toks = np.random.default_rng(1).integers(1, 500, (3, 16)).astype(np.int32)
    tfeat = np.asarray(jclip.encode_text(params, TEST_TINY_RN, jnp.asarray(toks)))
    assert tfeat.shape == (3, 16)


def test_rn_registry():
    for name, grid, c in (
        ("RN50", 7, 2048),
        ("RN101", 7, 2048),
        ("RN50x4", 9, 2560),
        ("RN50x16", 12, 3072),
        ("RN50x64", 14, 4096),
    ):
        cfg = get_config(name)
        assert cfg.vision_kind == "resnet"
        assert cfg.grid_size == grid
        assert cfg.attnpool_dim == c
        assert cfg.attnpool_dim % cfg.vision_heads == 0


def test_resnet_conversion_parity_vs_torch():
    cfg = TINY2
    tmodel = _randomize(
        _ModifiedResNet(
            cfg.resnet_layers,
            cfg.vision_width,
            cfg.image_size,
            cfg.vision_heads,
            cfg.embed_dim,
        )
    )
    sd = {"visual." + k: v for k, v in tmodel.state_dict().items()}
    vp = convert_openai_resnet_visual(sd, cfg)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(forward_visual(vp, cfg, jnp.asarray(x), jnp.float32))
    assert ours.shape == ref.shape
    cos = np.sum(ours * ref, axis=1) / (
        np.linalg.norm(ours, axis=1) * np.linalg.norm(ref, axis=1)
    )
    assert cos.min() >= 0.9999, f"cos={cos}"
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_resnet_full_state_dict_roundtrip():
    """convert_state_dict dispatches a full openai RN state dict (visual +
    text) and encode_image/encode_text run end to end on the result."""
    from clip_retrieval_tpu.models.loaders import convert_state_dict

    cfg = TINY2
    tmodel = _randomize(
        _ModifiedResNet(
            cfg.resnet_layers,
            cfg.vision_width,
            cfg.image_size,
            cfg.vision_heads,
            cfg.embed_dim,
        ),
        seed=3,
    )
    sd = {"visual." + k: v for k, v in tmodel.state_dict().items()}
    # minimal openai-style text tower
    g = torch.Generator().manual_seed(4)
    tw, L = cfg.text_width, cfg.text_layers
    sd["token_embedding.weight"] = torch.randn(
        cfg.vocab_size, tw, generator=g
    )
    sd["positional_embedding"] = torch.randn(
        cfg.context_length, tw, generator=g
    )
    for i in range(L):
        p = f"transformer.resblocks.{i}."
        sd[p + "attn.in_proj_weight"] = torch.randn(3 * tw, tw, generator=g)
        sd[p + "attn.in_proj_bias"] = torch.randn(3 * tw, generator=g)
        sd[p + "attn.out_proj.weight"] = torch.randn(tw, tw, generator=g)
        sd[p + "attn.out_proj.bias"] = torch.randn(tw, generator=g)
        for ln in ("ln_1", "ln_2"):
            sd[p + ln + ".weight"] = torch.ones(tw)
            sd[p + ln + ".bias"] = torch.zeros(tw)
        sd[p + "mlp.c_fc.weight"] = torch.randn(4 * tw, tw, generator=g)
        sd[p + "mlp.c_fc.bias"] = torch.randn(4 * tw, generator=g)
        sd[p + "mlp.c_proj.weight"] = torch.randn(tw, 4 * tw, generator=g)
        sd[p + "mlp.c_proj.bias"] = torch.randn(tw, generator=g)
    sd["ln_final.weight"] = torch.ones(tw)
    sd["ln_final.bias"] = torch.zeros(tw)
    sd["text_projection"] = torch.randn(tw, cfg.embed_dim, generator=g)
    sd["logit_scale"] = torch.tensor(2.6593)

    params = convert_state_dict(sd, cfg)
    imgs = np.random.default_rng(5).integers(
        0, 255, (2, cfg.image_size, cfg.image_size, 3), endpoint=True
    ).astype(np.uint8)
    feats = np.asarray(jclip.encode_image(params, cfg, jnp.asarray(imgs)))
    assert feats.shape == (2, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)
    toks = np.random.default_rng(6).integers(1, 500, (2, 16)).astype(np.int32)
    tfeat = np.asarray(jclip.encode_text(params, cfg, jnp.asarray(toks)))
    assert tfeat.shape == (2, cfg.embed_dim)
