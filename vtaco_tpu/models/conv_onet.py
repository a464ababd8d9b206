"""Composite convolutional occupancy network.

Counterpart of src/conv_onet/models/__init__.py:15-197: holds up to five
optional submodules — object encoder, hand encoder, tactile image encoder,
a nested pretrained tactile→depth+pose model (t2d), and the occupancy
decoder — and exposes the reference's method surface
(encode_inputs / encode_hand_inputs / encode_hand_mano / encode_img_inputs /
encode_t2d / decode / decode_img / decode_contact).

Differences by design:
  * decode* return raw logits (the reference wraps them in a Bernoulli
    distribution and immediately unwraps `.logits`).
  * The parameter-free MANO layer lives on the composite (not inside the
    point encoder), keeping the linen parameter tree purely learnable.
  * Images are NHWC stacks (B, F, H, W, C); the reference's per-sample
    python loop (models/__init__.py:122-131) is a single batched reshape.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vtaco_tpu.models.mano import ManoLayer


class ConvOccupancyNetwork(nn.Module):
    decoder: Optional[nn.Module] = None
    encoder: Optional[nn.Module] = None
    encoder_hand: Optional[nn.Module] = None
    encoder_img: Optional[nn.Module] = None
    encoder_t2d: Optional[nn.Module] = None
    mano_layer: Optional[ManoLayer] = None
    hand_out_dim: int = 0  # encoder_hand's out_dim (51 runs the MANO layer)

    def encode_inputs(self, inputs, train: bool = True):
        """Object feature field. models/__init__.py:74-87."""
        if self.encoder is None:
            return jnp.zeros((inputs.shape[0], 0))
        return self.encoder(inputs, train=train)

    def encode_hand_inputs(self, inputs, train: bool = True):
        """Hand parameters (+ MANO geometry when out_dim > 30).

        models/__init__.py:89-102 plus the MANO call the reference keeps in
        the encoder (src/encoder/pointnet.py:190-198): the wrist translation
        is zeroed and the 45-dof pose (param[6:]) is decoded to vertices
        and joints in the canonical wrist frame.
        """
        if self.encoder_hand is None:
            return jnp.zeros((inputs.shape[0], 0))
        fea = self.encoder_hand(inputs, train=train)
        if self.hand_out_dim > 30 and self.mano_layer is not None:
            fea_m = fea["mano_param"]
            wrist_pos = jnp.zeros((fea_m.shape[0], 3), fea_m.dtype)
            fea_m_full = jnp.concatenate([wrist_pos, fea_m[:, 6:]], axis=1)
            mano = self.mano_layer(fea_m_full)
            fea = dict(fea)
            fea["mano_verts"] = mano[0]
            fea["mano_joints"] = mano[1]
            fea["mano_faces"] = self.mano_layer.faces
        return fea

    def encode_hand_mano(self, fea_m_full):
        """Run the MANO layer on explicit (B, 48) coefficients.

        models/__init__.py:104-112 / pointnet.py:202-210.
        """
        mano = self.mano_layer(fea_m_full)
        return {
            "mano_verts": mano[0],
            "mano_joints": mano[1],
            "mano_faces": self.mano_layer.faces,
        }

    def encode_img_inputs(self, imgs, train: bool = True):
        """Tactile image features: (B, F, H, W, C) → (B, F, K).

        For a ResNet encoder K = num_classes (per-finger feature vector);
        for the tactile U-Net K = H*W (per-finger depth map), matching the
        reference's flattening (models/__init__.py:115-136).
        """
        if self.encoder_img is None:
            return jnp.zeros((imgs.shape[0], 0))
        B, F = imgs.shape[0], imgs.shape[1]
        flat = imgs.reshape((B * F,) + imgs.shape[2:])
        out = self.encoder_img(flat, train=train)
        return out.reshape(B, F, -1)

    def encode_t2d(self, inputs, imgs, train: bool = True):
        """Nested tactile→(depth, sensor pose) model. models/__init__.py:138-147."""
        pred_depth = self.encoder_t2d.encode_img_inputs(imgs, train=train)
        c_hand = self.encoder_t2d.encode_hand_inputs(inputs, train=train)
        return pred_depth, c_hand

    def decode(self, p, c, **kwargs):
        """Occupancy logits at query points. models/__init__.py:151-161."""
        return self.decoder(p, c, **kwargs)

    def decode_img(self, p, c, c_img, **kwargs):
        """Occupancy logits with per-point tactile features.
        models/__init__.py:163-174."""
        return self.decoder.forward_img(p, c, c_img, **kwargs)

    def decode_contact(self, p, c, **kwargs):
        """(occupancy logits, contact logits). models/__init__.py:176-187."""
        return self.decoder.forward_contact(p, c, **kwargs)

    def __call__(self, p, inputs, imgs=None, train: bool = True, **kwargs):
        """Plain forward: encode object + hand, decode occupancy.
        models/__init__.py:54-71."""
        c = self.encode_inputs(inputs, train=train)
        _ = self.encode_hand_inputs(inputs, train=train)
        return self.decode(p, c, **kwargs)
