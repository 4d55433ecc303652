"""GradCache: contrastive batches bigger than the chip's activation memory.

Contrastive quality scales with the negative pool, but the reference's only
batch lever is whole-GPU memory (its DDP trainer replicates activations for
the full per-GPU batch, ``src/clip/train/trainer.py:160-185``; here, L/14
at batch 64 already OOMs a 16 GB chip without remat). GradCache (Gao et
al. 2021, arXiv:2101.06983) decouples the two:

1. **Embedding pass** — encode the batch in C chunks inside a
   ``lax.scan`` (one chunk's activations live at a time), producing the
   full ``[B, D]`` embedding tables. Nothing is differentiated, so XLA
   retains no intermediates.
2. **Loss pass** — compute the contrastive loss and its gradient with
   respect to the *embeddings* only. Embeddings are tiny (``[B, D]``), so
   this costs O(B^2 D) FLOPs but O(B D) memory regardless of model size.
3. **Re-forward pass** — re-encode each chunk under ``jax.vjp`` and pull
   the cached embedding cotangents back to parameter gradients,
   accumulating across chunks in a second ``lax.scan``.

The result is *bit-for-the-same-math* equal to the direct
``value_and_grad`` over the whole batch (the loss is a function of the
embedding tables only — chunking the encoder changes no per-example math),
at ~2x encoder forward cost and 1/C activation memory. This is a different
trade than ``grad_accum_steps``: accumulation shrinks the *negative pool*
per optimizer step (each micro-batch contrasts only against itself);
GradCache keeps the full pool.

TPU notes: both scans compile to one program — static chunk count, static
chunk shapes, no host round trips; composes with DP global negatives
(stage 2 differentiates through the loss's ``all_gather``, whose transpose
``psum_scatter`` routes each shard's cotangent contributions home over
ICI) and with the QAT / FLIP / matryoshka seams, which all live inside the
encoder or loss callables.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["gradcache_value_and_grad"]


def _chunk(arrays: Sequence[jax.Array], n_chunks: int) -> Tuple[jax.Array, ...]:
    out = []
    for x in arrays:
        b = x.shape[0]
        if b % n_chunks:
            raise ValueError(
                f"grad-cache chunk count {n_chunks} must divide the local "
                f"batch {b} (got shape {x.shape})"
            )
        out.append(x.reshape(n_chunks, b // n_chunks, *x.shape[1:]))
    return tuple(out)


def _chunked_embeddings(encode, params, inputs, n_chunks: int) -> jax.Array:
    """[B, ...] inputs -> [B, D] embeddings, one chunk's activations live."""
    chunked = _chunk(inputs, n_chunks)

    def body(_, xs):
        return None, encode(params, *xs)

    _, embs = lax.scan(body, None, chunked)
    return embs.reshape(embs.shape[0] * embs.shape[1], *embs.shape[2:])


def _chunked_param_grads(encode, params, inputs, g_emb: jax.Array, n_chunks: int):
    """Accumulate d(loss)/d(params) from cached embedding cotangents."""
    chunked = _chunk(list(inputs) + [g_emb], n_chunks)

    def body(acc, xs):
        *chunk_in, g = xs
        _, vjp = jax.vjp(lambda p: encode(p, *chunk_in), params)
        (gp,) = vjp(g)
        return jax.tree_util.tree_map(jnp.add, acc, gp), None

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    acc, _ = lax.scan(body, zeros, chunked)
    return acc


def gradcache_value_and_grad(
    emb_loss: Callable[..., Tuple[jax.Array, Any]],
    towers: Sequence[Tuple[Callable, Sequence[jax.Array]]],
    params,
    n_chunks: int,
):
    """Value-and-grad of ``emb_loss(*embeddings)`` w.r.t. ``params``.

    ``towers`` is a sequence of ``(encode, inputs)`` pairs, one per
    embedding table the loss consumes, where ``encode(params, *inputs)``
    maps a [chunk, ...] input slice to [chunk, D] embeddings and
    ``emb_loss`` returns ``(loss, aux)`` (``has_aux`` semantics). Returns
    ``((loss, aux), grads)`` exactly like
    ``jax.value_and_grad(..., has_aux=True)`` on the un-chunked
    composition, but with 1/``n_chunks`` the activation memory.
    """
    if n_chunks < 1:
        raise ValueError(f"n_chunks must be >= 1, got {n_chunks}")
    embs = [
        _chunked_embeddings(enc, params, tuple(ins), n_chunks)
        for enc, ins in towers
    ]
    argnums = tuple(range(len(embs)))
    (loss, aux), g_embs = jax.value_and_grad(emb_loss, argnums=argnums, has_aux=True)(
        *embs
    )
    grads = None
    for (enc, ins), g in zip(towers, g_embs):
        gp = _chunked_param_grads(enc, params, tuple(ins), g, n_chunks)
        grads = gp if grads is None else jax.tree_util.tree_map(jnp.add, grads, gp)
    return (loss, aux), grads
