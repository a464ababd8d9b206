"""Cross-modal attention fusion transformer.

Counterpart of src/TransformerFusion.py:9-343. Notable reference semantics
preserved:
  * ``RelationUnit`` attention L2-normalizes keys/queries, softmaxes over
    the key axis, then renormalizes the affinity over the query axis
    (TransformerFusion.py:100-104), and outputs
    ``relu(trans_conv(query - attn))``.
  * ``_get_clones`` shares ONE module instance across all layers
    (TransformerFusion.py:244-245) — every encoder/decoder layer ties its
    weights; additionally the same self-attention module instance is shared
    between the encoder and the decoder stacks (TransformerFusion.py:291-309).
    Reproduced here by binding the attention modules once at the top level
    and calling them repeatedly.
  * InstanceNorm1d has no affine parameters (torch default), so it is a
    plain per-(batch, channel) normalization over the sequence axis.

Internal layout is (B, N, C) (the reference permutes to (N, B, C) and back;
the math is identical).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

def _instance_norm(x, eps: float = 1e-5):
    """InstanceNorm1d over the sequence axis of (B, N, C), biased variance."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def _relation_init(key_dim):
    import math

    return nn.initializers.normal(stddev=math.sqrt(2.0 / key_dim))


class TransNonlinear(nn.Module):
    """Residual MLP + LayerNorm. TransformerFusion.py:9-25."""

    d_model: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, deterministic: bool = True):
        x = nn.Dense(self.dim_feedforward, name="linear1")(src)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(nn.relu(x))
        x = nn.Dense(self.d_model, name="linear2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        # epsilon: torch nn.LayerNorm default (flax defaults to 1e-6)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + x)


class RelationUnit(nn.Module):
    """Single-head normalized-key attention. TransformerFusion.py:65-113."""

    feature_dim: int = 512
    key_feature_dim: int = 64

    @nn.compact
    def __call__(self, query, key, value):
        init_k = _relation_init(self.key_feature_dim)
        init_v = _relation_init(self.feature_dim)
        w_k = nn.Dense(self.key_feature_dim, use_bias=False, kernel_init=init_k,
                       name="WK")(key)
        w_k = w_k / (jnp.linalg.norm(w_k, axis=-1, keepdims=True) + 1e-12)
        w_q = nn.Dense(self.key_feature_dim, use_bias=False, kernel_init=init_k,
                       name="WQ")(query)
        w_q = w_q / (jnp.linalg.norm(w_q, axis=-1, keepdims=True) + 1e-12)

        dot = jnp.einsum("bqk,blk->bql", w_q, w_k)       # (B, Lq, Lk)
        affinity = jax.nn.softmax(dot, axis=-1)
        affinity = affinity / (1e-9 + jnp.sum(affinity, axis=1, keepdims=True))

        w_v = nn.Dense(self.feature_dim, use_bias=False, kernel_init=init_v,
                       name="WV")(value)
        out = jnp.einsum("bql,blc->bqc", affinity, w_v)
        out = nn.Dense(self.feature_dim, use_bias=False, name="trans_conv")(
            query - out
        )
        return nn.relu(out)


class MultiheadAttention(nn.Module):
    """Concat of RelationUnit heads each followed by TransNonlinear.

    TransformerFusion.py:28-62.
    """

    feature_dim: int = 512
    n_head: int = 8
    key_feature_dim: int = 64
    extra_nonlinear: bool = True

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True):
        outs = []
        for n in range(self.n_head):
            h = RelationUnit(self.feature_dim, self.key_feature_dim,
                             name=f"head{n}")(query, key, value)
            if self.extra_nonlinear:
                h = TransNonlinear(self.feature_dim, self.key_feature_dim,
                                   name=f"extra_nonlinear{n}")(
                    h, deterministic=deterministic
                )
            outs.append(h)
        return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


class PositionEmbeddingLearned(nn.Module):
    """Pointwise conv MLP positional embedding. TransformerFusion.py:248-266."""

    num_pos_feats: int = 256

    @nn.compact
    def __call__(self, xyz, train: bool = True):
        x = nn.Dense(self.num_pos_feats, name="conv1")(xyz)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_pos_feats, name="conv2")(x)


class TransformerFusion(nn.Module):
    """Encoder-decoder fusion. TransformerFusion.py:269-333.

    ``__call__(search_feature, search_coord, template_feature,
    template_coord)``: the template stream is self-encoded, the search
    stream cross-attends into it. All layers share one self-attention and
    one cross-attention module (the reference's clone semantics).
    """

    use_xyz: bool = True
    input_size: int = 2048
    d_model: int = 32
    num_layers: int = 1
    key_feature_dim: int = 128
    with_pos_embed: bool = True
    encoder_pos_embed_input_dim: int = 3
    decoder_pos_embed_input_dim: int = 3

    def setup(self):
        self.self_attn = MultiheadAttention(
            feature_dim=self.d_model, n_head=1,
            key_feature_dim=self.key_feature_dim, name="self_attn",
        )
        self.cross_attn = MultiheadAttention(
            feature_dim=self.d_model, n_head=1,
            key_feature_dim=self.key_feature_dim, name="cross_attn",
        )
        if self.with_pos_embed:
            self.encoder_pos_embed = PositionEmbeddingLearned(
                self.d_model, name="encoder_pos_embed"
            )
            self.decoder_pos_embed = PositionEmbeddingLearned(
                self.d_model, name="decoder_pos_embed"
            )

    def _encode(self, src, pos, deterministic, train):
        for _ in range(self.num_layers):
            q = src if pos is None else src + pos
            src2 = self.self_attn(q, q, q, deterministic=deterministic)
            src = _instance_norm(src + src2)
            src = nn.relu(src)
        return src

    def _decode(self, tgt, memory, pos, deterministic, train):
        for _ in range(self.num_layers):
            q = tgt if pos is None else tgt + pos
            tgt2 = self.self_attn(q, q, q, deterministic=deterministic)
            tgt = nn.relu(_instance_norm(tgt + tgt2))
            mask = self.cross_attn(tgt, memory, memory, deterministic=deterministic)
            tgt = nn.relu(_instance_norm(tgt + mask))
        return tgt

    def __call__(self, search_feature, search_coord, template_feature,
                 template_coord, deterministic: bool = True, train: bool = False):
        enc_pos = dec_pos = None
        if self.with_pos_embed and template_coord is not None:
            enc_pos = self.encoder_pos_embed(template_coord, train=train)
            dec_pos = self.decoder_pos_embed(search_coord, train=train)
        # honor the caller's deterministic flag (train-mode dropout in the
        # reference's TransNonlinear, p=0.1); callers enabling it must
        # provide a 'dropout' rng to apply()
        memory = self._encode(template_feature, enc_pos, deterministic, train)
        return self._decode(search_feature, memory, dec_pos, deterministic,
                            train)
