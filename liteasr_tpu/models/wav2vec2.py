"""wav2vec 2.0 contrastive pretraining model.

Reference: liteasr/models/wav2vec2.py:29-388 — conv feature extractor
(/320 downsample), span masking with a learned mask embedding, transformer
context network, Gumbel-VQ quantized targets, 100 in-sample negatives,
cosine-similarity logits / 0.1 temperature, CE against index 0.

TPU-native redesign: the host-numpy span mask + boolean gather
(wav2vec2.py:319-334, x[mask].view(B,-1,D)) become an on-device PRNG span
mask (static policy) and a *weighted* contrastive loss over all frames —
masked positions carry weight 1 — so every shape is static under jit.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteasr_tpu.config import LiteasrDataclass
from liteasr_tpu.models import LiteasrModel, register_model
from liteasr_tpu.nets.common import LayerNorm
from liteasr_tpu.nets.wav2vec2 import (
    ConvFeatureExtractor,
    GumbelVectorQuantizer,
    Wav2Vec2TransformerEncoder,
)

DEFAULT_CONV_LAYERS = "[(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512,2,2)] + [(512,2,2)]"


@dataclass
class Wav2Vec2Config(LiteasrDataclass):
    name: Optional[str] = field(default="wav2vec2")

    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12

    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    dropout_input: float = 0.0
    dropout_features: float = 0.0

    final_dim: int = 0
    conv_feature_layers: str = DEFAULT_CONV_LAYERS
    conv_bias: bool = False
    logit_temp: float = 0.1
    quantize_targets: bool = True
    latent_vars: int = 320
    latent_groups: int = 2
    latent_dim: int = 0

    mask_length: int = 10
    mask_prob: float = 0.65
    no_mask_overlap: bool = False
    mask_min_space: int = 1

    num_negatives: int = 100
    negatives_from_everywhere: bool = False

    conv_pos: int = 128
    conv_pos_groups: int = 16

    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)

    dtype: str = "float32"


def device_span_mask(rng, batch: int, frame: int, prob: float, length: int,
                     min_mask_num: int = 2) -> jnp.ndarray:
    """Static-policy span mask on device (True = masked).

    Equivalent to the reference's numpy span_mask with policy='static' and
    overlap allowed (liteasr/utils/mask.py:93-230), except the span count is
    the deterministic expectation (fixed shapes under jit) and per-row masked
    counts are not equalized — downstream losses weight by the mask instead
    of gathering.
    """
    mask_num = max(min_mask_num, int(prob * frame / float(length) + 0.5))
    span_max = max(frame - length, 1)
    starts = jax.random.randint(
        rng, (batch, mask_num), 0, span_max)  # (B, M)
    pos = jnp.arange(frame)[None, None, :]  # (1, 1, F)
    in_span = (pos >= starts[:, :, None]) & (pos < starts[:, :, None] + length)
    return in_span.any(axis=1)  # (B, F)


@register_model("wav2vec2", dataclass=Wav2Vec2Config)
class Wav2Vec2(LiteasrModel):
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    dropout: float = 0.1
    attention_dropout: float = 0.1
    dropout_input: float = 0.0
    dropout_features: float = 0.0
    final_dim: int = 0
    conv_feature_layers: str = DEFAULT_CONV_LAYERS
    conv_bias: bool = False
    logit_temp: float = 0.1
    latent_vars: int = 320
    latent_groups: int = 2
    latent_dim: int = 0
    mask_length: int = 10
    mask_prob: float = 0.65
    num_negatives: int = 100
    negatives_from_everywhere: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        conv_layers = tuple(eval(self.conv_feature_layers))  # noqa: S307
        self.embed_dim = conv_layers[-1][0]
        self.feature_extractor = ConvFeatureExtractor(
            conv_layers=conv_layers, conv_bias=self.conv_bias,
            dtype=self.dtype)
        self.layer_norm = LayerNorm(dtype=self.dtype)
        self.linear_input = nn.Dense(self.encoder_embed_dim, dtype=self.dtype)
        self.drop_input = nn.Dropout(self.dropout_input)
        self.drop_features = nn.Dropout(self.dropout_features)

        final_dim = self.final_dim if self.final_dim > 0 else self.encoder_embed_dim
        vq_dim = self.latent_dim if self.latent_dim > 0 else final_dim
        self.quantizer = GumbelVectorQuantizer(
            num_vars=self.latent_vars, groups=self.latent_groups,
            vq_dim=vq_dim, dtype=self.dtype)
        self.linear_quantizer = nn.Dense(final_dim, dtype=self.dtype)

        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(scale=1.0),
            (self.encoder_embed_dim,))

        self.encoder = Wav2Vec2TransformerEncoder(
            h_dim=self.encoder_embed_dim,
            ff_dim=self.encoder_ffn_embed_dim,
            n_head=self.encoder_attention_heads,
            n_layer=self.encoder_layers,
            dropout_rate=self.dropout,
            attn_dropout_rate=self.attention_dropout,
            ff_dropout_rate=self.dropout,
            conv_pos=self.conv_pos,
            conv_pos_groups=self.conv_pos_groups,
            dtype=self.dtype,
        )
        self.linear_final = nn.Dense(final_dim, dtype=self.dtype)

    def __call__(self, source, train: bool = False, temp: float = 2.0):
        """source: (B, T) waveform. Returns (logits (N+1, B, F), mask (B, F))."""
        # 1. feature extraction
        features = self.feature_extractor(source, train=train)  # (B, F, C)
        features = self.layer_norm(features)
        unmasked_features = self.drop_features(
            features, deterministic=not train)
        features = self.linear_input(features)
        features = self.drop_input(features, deterministic=not train)

        B, F, _ = features.shape

        # 2. span masking with the learned mask embedding
        if self.has_rng("mask"):
            mask_rng = self.make_rng("mask")
        else:
            mask_rng = jax.random.PRNGKey(0)
        mask = device_span_mask(
            mask_rng, B, F, self.mask_prob, self.mask_length)  # (B, F)
        x = jnp.where(mask[:, :, None],
                      self.mask_emb[None, None, :].astype(features.dtype),
                      features)

        # 3. contextualized representations
        x = self.encoder(x, train=train)
        x = self.linear_final(x)  # (B, F, final)

        # 4. quantized targets
        y, _ = self.quantizer(unmasked_features, temp=temp, train=train)
        y = self.linear_quantizer(y)  # (B, F, final)

        # 5. in-sample negatives: for each position, num_negatives others
        if self.has_rng("negatives"):
            neg_rng = self.make_rng("negatives")
        else:
            neg_rng = jax.random.PRNGKey(1)
        neg_idx = jax.random.randint(
            neg_rng, (B, F * self.num_negatives), 0, max(F - 1, 1))
        self_idx = jnp.repeat(jnp.arange(F), self.num_negatives)[None, :]
        neg_idx = jnp.where(neg_idx >= self_idx, neg_idx + 1, neg_idx)
        neg_idx = jnp.clip(neg_idx, 0, F - 1)
        negs = jnp.take_along_axis(
            y, neg_idx[:, :, None], axis=1)  # (B, F*N, final)
        negs = negs.reshape(B, F, self.num_negatives, -1)
        negs = jnp.moveaxis(negs, 2, 0)  # (N, B, F, final)

        logits = self.compute_logits(x, y, negs)
        return logits, mask

    def compute_logits(self, x, pos, negs):
        """Cosine-similarity logits / temp (reference wav2vec2.py:366-380)."""
        tgt = jnp.concatenate([pos[None], negs], axis=0)  # (N+1, B, F, D)
        x32 = x[None].astype(jnp.float32)
        tgt32 = tgt.astype(jnp.float32)
        dot = (x32 * tgt32).sum(-1)
        norm = jnp.linalg.norm(x32, axis=-1) * jnp.linalg.norm(tgt32, axis=-1)
        logits = dot / jnp.maximum(norm, 1e-8) / self.logit_temp  # (N+1, B, F)

        neg_is_pos = (negs == pos[None]).all(-1)  # (N, B, F)
        logits = logits.at[1:].set(
            jnp.where(neg_is_pos, -jnp.inf, logits[1:]))
        return logits

    def get_pred_len(self, xlens):
        return xlens

    def get_target(self, ys, ylens):
        return ys

    @staticmethod
    def _normalize_conv_layers(cl) -> str:
        """Canonicalize conv_feature_layers to a python-literal string.

        CLI/YAML may deliver it as a string, a parsed list, or a
        yaml-mangled list of fragments like ['(512', '10', '5)'].
        """
        if isinstance(cl, str):
            layers = eval(cl)  # noqa: S307
        elif any(isinstance(x, (str, int)) for x in cl):
            # yaml-mangled flat fragments: rejoin and re-parse
            layers = eval(
                "[" + ",".join(str(x) for x in cl) + "]")  # noqa: S307
        else:
            layers = [tuple(x) for x in cl]
        return repr([tuple(layer) for layer in layers])

    @classmethod
    def build_model(cls, cfg, task=None):
        lt = cfg.latent_temp
        if isinstance(lt, str):
            lt = tuple(eval(lt))  # noqa: S307
        cfg.conv_feature_layers = cls._normalize_conv_layers(
            cfg.conv_feature_layers)
        return cls(
            encoder_layers=cfg.encoder_layers,
            encoder_embed_dim=cfg.encoder_embed_dim,
            encoder_ffn_embed_dim=cfg.encoder_ffn_embed_dim,
            encoder_attention_heads=cfg.encoder_attention_heads,
            dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            dropout_input=cfg.dropout_input,
            dropout_features=cfg.dropout_features,
            final_dim=cfg.final_dim,
            conv_feature_layers=cfg.conv_feature_layers,
            conv_bias=cfg.conv_bias,
            logit_temp=cfg.logit_temp,
            latent_vars=cfg.latent_vars,
            latent_groups=cfg.latent_groups,
            latent_dim=cfg.latent_dim,
            mask_length=cfg.mask_length,
            mask_prob=cfg.mask_prob,
            num_negatives=cfg.num_negatives,
            negatives_from_everywhere=cfg.negatives_from_everywhere,
            conv_pos=cfg.conv_pos,
            conv_pos_groups=cfg.conv_pos_groups,
            latent_temp=tuple(lt),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
