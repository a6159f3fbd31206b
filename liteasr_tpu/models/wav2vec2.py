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
    # span-width policy (reference mask.py:93-230; the reference model pins
    # 'static' with its selection knob commented out, wav2vec2.py:138-144)
    mask_policy: str = "static"
    mask_other: float = 0.0
    no_mask_overlap: bool = False
    mask_min_space: int = 1

    num_negatives: int = 100
    negatives_from_everywhere: bool = False

    conv_pos: int = 128
    conv_pos_groups: int = 16

    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)

    dtype: str = "float32"


def device_span_mask(rng, batch: int, frame: int, prob: float, length: int,
                     min_mask_num: int = 2,
                     flens: Optional[jnp.ndarray] = None,
                     policy: str = "static",
                     other: float = 0.0) -> jnp.ndarray:
    """Span mask on device (True = masked), all four reference width
    policies (liteasr/utils/mask.py:93-230, overlap allowed):

    * static  — every span is exactly ``length`` wide
    * uniform — widths ~ U{0, .., 2*length} (reference randint bound)
    * normal  — widths ~ max(1, round(N(length, other)))
    * poisson — widths ~ Poisson(length)

    Deviations from the host/numpy path, both required by static shapes
    under jit: the span count is the deterministic expectation of the
    reference's stochastically rounded ``int(prob*frame/length + rand())``
    (tests/test_wav2vec2.py A/Bs the resulting masked-frame distribution
    against the host oracle), and per-row masked counts are not equalized —
    downstream losses weight by the mask instead of gathering.

    ``flens`` (per-row valid frame counts) restricts spans to the valid
    region and keeps the mask off padding. Randomness is folded in per row,
    so a row's mask does not depend on the batch it is collated into.
    """
    mask_num = max(min_mask_num, int(prob * frame / float(length) + 0.5))
    if flens is None:
        flens = jnp.full((batch,), frame, jnp.int32)
    row_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        rng, jnp.arange(batch))

    def row_widths(k):
        if policy == "static":
            return jnp.full((mask_num,), length, jnp.int32)
        if policy == "uniform":
            return jax.random.randint(k, (mask_num,), 0, 2 * length + 1)
        if policy == "normal":
            w = jax.random.normal(k, (mask_num,)) * other + length
            return jnp.maximum(1, jnp.round(w)).astype(jnp.int32)
        if policy == "poisson":
            # inverse-CDF over a truncated support: jax.random.poisson only
            # supports the threefry PRNG, but production training runs the
            # TPU-fast rbg impl (config common.prng_impl). Support capped at
            # 4*lambda + 16 (tail mass < 1e-12 at lambda = mask_length).
            support = jnp.arange(4 * length + 16)
            logpmf = (support * jnp.log(float(length)) - length
                      - jax.lax.lgamma(support.astype(jnp.float32) + 1.0))
            cdf = jnp.cumsum(jnp.exp(logpmf))
            u = jax.random.uniform(k, (mask_num,))
            return jnp.searchsorted(cdf, u * cdf[-1]).astype(jnp.int32)
        raise ValueError(f"unknown mask selection {policy}")

    # widths draw from a split key so the static path (no width randomness)
    # produces bit-identical masks to the pre-policy implementation
    w_key = jax.random.split(rng)[1]
    w_keys = jax.vmap(jax.random.fold_in, (None, 0))(w_key, jnp.arange(batch))
    widths = jax.vmap(row_widths)(w_keys)  # (B, M)
    # reference start range: [0, frame - min_span); per-row valid region here
    min_span = jnp.min(widths, axis=1)  # (B,)
    span_max = jnp.maximum(flens - min_span, 1).astype(jnp.float32)  # (B,)
    u = jax.vmap(lambda k: jax.random.uniform(k, (mask_num,)))(row_keys)
    starts = jnp.floor(u * span_max[:, None]).astype(jnp.int32)  # (B, M)
    pos = jnp.arange(frame)[None, None, :]  # (1, 1, F)
    in_span = (pos >= starts[:, :, None]) & (
        pos < starts[:, :, None] + widths[:, :, None])
    return in_span.any(axis=1) & (jnp.arange(frame)[None, :] < flens[:, None])


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
    mask_policy: str = "static"
    mask_other: float = 0.0
    num_negatives: int = 100
    negatives_from_everywhere: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        conv_layers = tuple(eval(self.conv_feature_layers))  # noqa: S307
        self.conv_geometry = tuple((k, s) for _, k, s in conv_layers)
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

    def feature_lengths(self, xlens: jnp.ndarray) -> jnp.ndarray:
        """Waveform sample counts -> conv feature-frame counts."""
        lens = xlens
        for k, s in self.conv_geometry:
            lens = (lens - k) // s + 1
        return jnp.maximum(lens, 1)

    def __call__(self, source, xlens=None, train: bool = False,
                 temp: float = 2.0):
        """source: (B, T) waveform; xlens: optional (B,) valid sample counts.

        Returns (logits (N+1, B, F), mask (B, F), code_probs (G, V)).
        ``mask`` is True only on masked *valid* frames, so downstream losses
        can weight by it directly; ``code_probs`` is the mask-weighted
        codebook usage for the diversity loss / perplexity metric.
        """
        # 1. feature extraction
        features = self.feature_extractor(source, train=train)  # (B, F, C)
        features = self.layer_norm(features)
        unmasked_features = self.drop_features(
            features, deterministic=not train)
        features = self.linear_input(features)
        features = self.drop_input(features, deterministic=not train)

        B, F, _ = features.shape
        if xlens is not None:
            flens = jnp.minimum(self.feature_lengths(xlens), F)
        else:
            flens = jnp.full((B,), F, jnp.int32)

        # 2. span masking with the learned mask embedding
        if self.has_rng("mask"):
            mask_rng = self.make_rng("mask")
        else:
            mask_rng = jax.random.PRNGKey(0)
        mask = device_span_mask(
            mask_rng, B, F, self.mask_prob, self.mask_length,
            flens=flens, policy=self.mask_policy,
            other=self.mask_other)  # (B, F)
        x = jnp.where(mask[:, :, None],
                      self.mask_emb[None, None, :].astype(features.dtype),
                      features)

        # 3. contextualized representations
        x = self.encoder(x, train=train)
        x = self.linear_final(x)  # (B, F, final)

        # 4. quantized targets (every frame; the reference gathers masked
        # frames first — here shapes stay static and the loss weights by
        # mask). Code-usage stats are weighted by the masked valid frames —
        # the positions the contrastive loss actually reads — so the
        # diversity penalty / perplexity metric mirror fairseq's
        # prob_perplexity semantics.
        y, code_probs = self.quantizer(
            unmasked_features, temp=temp, train=train, frame_weight=mask)
        y = self.linear_quantizer(y)  # (B, F, final)

        # 5. negatives: num_negatives distractor frames per target position,
        # drawn within the same sample. Candidate pool per reference
        # (wav2vec2.py:298-312): masked frames by default; every (valid)
        # frame when negatives_from_everywhere is set. Randomness folds in
        # per row so batch padding cannot perturb a row's negatives.
        if self.has_rng("negatives"):
            neg_rng = self.make_rng("negatives")
        else:
            neg_rng = jax.random.PRNGKey(1)
        row_keys = jax.vmap(jax.random.fold_in, (None, 0))(
            neg_rng, jnp.arange(B))
        u = jax.vmap(
            lambda k: jax.random.uniform(k, (F, self.num_negatives)))(
            row_keys)  # (B, F, N)

        if self.negatives_from_everywhere:
            # pool = all valid frames, self-excluded
            pool = jnp.maximum(flens - 1, 1)[:, None, None]  # (B, 1, 1)
            draw = jnp.floor(u * pool).astype(jnp.int32)
            self_pos = jnp.arange(F)[None, :, None]
            frame_idx = jnp.where(draw >= self_pos, draw + 1, draw)
            frame_idx = jnp.clip(frame_idx, 0, F - 1)  # (B, F, N)
        else:
            # pool = masked frames, self-excluded among them. order lists
            # masked frame indices first; rank is each frame's position in
            # that list (meaningful only where mask is True, which is the
            # only place the loss looks).
            order = jnp.argsort(~mask, axis=1, stable=True)  # (B, F)
            rank = jnp.cumsum(mask, axis=1) - 1  # (B, F)
            m_row = jnp.maximum(mask.sum(axis=1), 2)  # (B,)
            draw = jnp.floor(
                u * (m_row[:, None, None] - 1)).astype(jnp.int32)
            draw = jnp.where(draw >= rank[:, :, None], draw + 1, draw)
            draw = jnp.clip(draw, 0, m_row[:, None, None] - 1)
            frame_idx = jnp.take_along_axis(
                order, draw.reshape(B, F * self.num_negatives), axis=1
            ).reshape(B, F, self.num_negatives)

        negs = jnp.take_along_axis(
            y, frame_idx.reshape(B, -1)[:, :, None], axis=1)
        negs = negs.reshape(B, F, self.num_negatives, -1)
        negs = jnp.moveaxis(negs, 2, 0)  # (N, B, F, final)

        logits = self.compute_logits(x, y, negs)
        return logits, mask, code_probs

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
            mask_policy=str(cfg.get("mask_policy", "static")),
            mask_other=float(cfg.get("mask_other", 0.0)),
            num_negatives=cfg.num_negatives,
            negatives_from_everywhere=cfg.negatives_from_everywhere,
            conv_pos=cfg.conv_pos,
            conv_pos_groups=cfg.conv_pos_groups,
            latent_temp=tuple(lt),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
