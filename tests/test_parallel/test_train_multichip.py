"""Multi-chip sharded train step on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from clip_retrieval_tpu.models.configs import TEST_TINY
from clip_retrieval_tpu.parallel.train import (
    clip_contrastive_loss,
    make_train_step,
    param_pspec,
    tree_shardings,
)


def _mesh(dp, tp):
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


def _batch(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(
        0, 255, (n, cfg.image_size, cfg.image_size, 3)
    ).astype(np.uint8)
    tokens = rng.integers(
        1, cfg.vocab_size - 2, (n, cfg.context_length)
    ).astype(np.int32)
    return jnp.asarray(images), jnp.asarray(tokens)


def test_train_step_runs_and_learns():
    cfg = TEST_TINY
    mesh = _mesh(4, 2)
    with mesh:
        init_fn, train_step = make_train_step(cfg, mesh, learning_rate=1e-3)
        params, opt_state = init_fn(0)
        images, tokens = _batch(cfg, 8)
        losses = []
        for _ in range(5):
            params, opt_state, loss = train_step(
                params, opt_state, images, tokens
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # overfits one batch


def test_tp_matches_single_device():
    """Sharded execution must be numerically equivalent to 1-device."""
    cfg = TEST_TINY
    images, tokens = _batch(cfg, 8, seed=3)

    results = []
    for dp, tp in ((1, 1), (2, 4)):
        mesh = _mesh(dp, tp)
        with mesh:
            init_fn, train_step = make_train_step(cfg, mesh, learning_rate=1e-3)
            params, opt_state = init_fn(0)
            _, _, loss = train_step(params, opt_state, images, tokens)
            results.append(float(loss))
    np.testing.assert_allclose(results[0], results[1], rtol=2e-4)


def test_param_shardings_cover_tree():
    cfg = TEST_TINY
    from clip_retrieval_tpu.models.clip import init_clip

    params = init_clip(cfg, 0)
    mesh = _mesh(4, 2)
    sh = tree_shardings(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(sh)
    specs = {
        "/".join(str(getattr(p, "key", p)) for p in path): s.spec
        for path, s in flat
    }
    # spot-check the Megatron layout
    wq = [v for k, v in specs.items() if k.endswith("attn/wq")][0]
    assert tuple(wq) == (None, None, "tp")
    wo = [v for k, v in specs.items() if k.endswith("attn/wo")][0]
    assert tuple(wo) == (None, "tp", None)


def test_graft_entry_dryrun():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "__graft_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, (params, images) = mod.entry()
    # flagship compile check is the driver's job (slow); here just check the
    # tiny dryrun and that entry() returns a jittable closure + args
    assert images.shape[0] == 8


def test_contrastive_loss_sanity():
    feats = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    loss_aligned = clip_contrastive_loss(feats, feats, 100.0)
    rng = np.random.default_rng(0)
    other = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    loss_random = clip_contrastive_loss(feats, other, 100.0)
    assert float(loss_aligned) < 0.01
    assert float(loss_random) > float(loss_aligned)
