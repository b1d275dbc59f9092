"""Multi-chip CLIP contrastive training step (dp × tp over a Mesh).

The reference is inference-only (SURVEY §2c: no TP/PP anywhere), but the TPU
build carries a real sharded train step for two reasons: (1) fine-tuning CLIP
towers on TPU pods is the natural extension of an embedding factory, and
(2) it exercises the framework's multi-chip path end to end.

Parallelism layout (idiomatic jit-with-shardings — XLA inserts collectives):
- batch axis sharded over "dp";
- Megatron-style tensor parallelism over "tp": attention q/k/v and MLP
  fc_in are column-parallel (output dim sharded), attention out-proj and
  MLP fc_out are row-parallel (input dim sharded) — XLA emits the psum
  after each row-parallel matmul over ICI;
- the contrastive loss is computed on the global logits matrix
  (img @ txtᵀ over the full batch): expressing it on sharded features makes
  XLA insert the all_gather, equivalent to the manual gather in
  open_clip-style distributed losses.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import clip as jclip
from ..models.configs import CLIPConfig


def param_pspec(path: tuple, leaf) -> P:
    """Partition rule for a param leaf, keyed on its tree path."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    name = keys[-1] if keys else ""
    in_blocks = "blocks" in keys
    if in_blocks:
        # leading axis is the layer stack (scanned) — never sharded
        if name in ("wq", "wk", "wv"):
            return P(None, None, "tp")  # column parallel
        if name in ("bq", "bk", "bv"):
            return P(None, "tp")
        if name == "wo":
            return P(None, "tp", None)  # row parallel
        if name == "w_in":
            return P(None, None, "tp")
        if name == "b_in":
            return P(None, "tp")
        if name == "w_out":
            return P(None, "tp", None)
    if name == "token_emb":
        return P("tp", None)  # vocab-sharded embedding table
    return P()  # replicate


def tree_shardings(tree, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_pspec(path, leaf)), tree
    )


def clip_contrastive_loss(img_feats, txt_feats, scale):
    """Symmetric InfoNCE over the global batch."""
    logits = scale * jnp.dot(
        img_feats, txt_feats.T, preferred_element_type=jnp.float32
    )
    n = logits.shape[0]
    labels = jnp.arange(n)
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return (jnp.mean(li) + jnp.mean(lt)) / 2


def make_train_step(
    cfg: CLIPConfig,
    mesh: Mesh,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.05,
    compute_dtype=jnp.float32,
):
    """Returns (init_fn, train_step) jitted over the mesh.

    init_fn(seed) → (params, opt_state) laid out per the tp/dp rules.
    train_step(params, opt_state, images, tokens) → (params, opt_state, loss).
    """
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    data_sh = NamedSharding(mesh, P("dp"))
    scalar_sh = NamedSharding(mesh, P())

    def loss_fn(params, images, tokens):
        img, txt, scale = jclip.clip_forward(
            params, cfg, images, tokens,
            compute_dtype=compute_dtype, attn_impl="xla",
        )
        return clip_contrastive_loss(img, txt, scale)

    def _train_step(params, opt_state, images, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, tokens)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_fn(seed: int = 0):
        params = jclip.init_clip(cfg, seed)
        p_sh = tree_shardings(params, mesh)
        params = jax.tree.map(jax.device_put, params, p_sh)
        opt_state = tx.init(params)
        return params, opt_state

    train_step = jax.jit(
        _train_step,
        in_shardings=(None, None, data_sh, data_sh),
        out_shardings=(None, None, scalar_sh),
        donate_argnums=(0, 1),
    )
    return init_fn, train_step
